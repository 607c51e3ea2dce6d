#!/bin/bash
# Round-3 scaling measurement campaign — run sequentially on an idle box.
# E1: independent-jobs control at the 4x2-core shape (host/JVM-multiplicity
#     ceiling with ZERO engine coordination; alone ref = recorded local[2]
#     warm floor 614.72s from BENCH/scaling_runs.jsonl)
# E2: coordinated local-cluster[1,2] vs [4,2] pairs (2 repeats)
# E3: spark-submit --py-files parity pair (1 run/size)
# E4: 20M-turn soak: local[8] vs local[32] at ~2.1M convs
set -x
cd /root/repo
date
python tools/concurrent_probe.py 600000 4 2 614.72   2>&1 | tail -5
date
python tools/scaling_bench.py --cluster 600000 2 2   2>&1 | tail -5
date
python tools/submit_demo.py 600000 1                 2>&1 | tail -5
date
python tools/scaling_bench.py 2100000 8 1            2>&1 | tail -5
date
echo CAMPAIGN_DONE
