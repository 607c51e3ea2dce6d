#!/bin/bash
# Round-3 same-window scaling campaign (idle box required).
# C1: raw memory-bandwidth ceiling sweep (zero Spark) — the host-physics
#     evidence for the multi-JVM attribution argument
# C2: coordinated local-cluster[1,8] vs [4,8], 2 repeats, 16g executors
#     (registration barrier now fences the pretouch storm out of timing)
# C3: same A/B at 4g executors, 1 repeat — settles the heap-size default
# C4: independent-jobs ceiling at the 4x8 shape, alone ref SAME-WINDOW
# C5: 20M-turn soak — does turns/sec hold when the corpus grows 3.6x?
set -x
cd /root/repo
date
python tools/membw_probe.py 1,2,4,8,16,32            2>&1 | tail -8
date
TERA_SPARK_EXEC_MEM_MB=16384 python tools/scaling_bench.py --cluster 600000 8 2  2>&1 | tail -4
date
TERA_SPARK_EXEC_MEM_MB=4096  python tools/scaling_bench.py --cluster 600000 8 1  2>&1 | tail -4
date
python tools/concurrent_probe.py 600000 4 8          2>&1 | tail -4
date
python tools/scaling_bench.py 2100000 8 1            2>&1 | tail -4
date
python tools/scaling_bench.py --report
echo CAMPAIGN_DONE
