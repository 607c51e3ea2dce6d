"""Corpus-growth soak driver: one more 3× step toward the 10^12-turn
design point (5.7M → 20M → 66M → ~200M turns).

Reuses tools/scaling_bench.py's measured-child machinery (host-CPU
window stamping, peak-RSS capture, per-stage metrics, history append)
but differs from a criterion invocation in three ways:

- single COLD run per level (TERA_SPARK_BENCH_RUNS=1) — at this size one
  run is ~45-90 min and the claim is throughput *shape* vs corpus size,
  not an interleaved A/B efficiency pair;
- local[32] runs FIRST so the headline design-point row lands even if
  the wall-clock budget runs out before local[8];
- generation uses the full box (32 cores, 128 partitions) and its own
  generous timeout — the corpus is written once to tmpfs and reused.

Usage: python tools/soak.py [n_convs] [levels...]   # default 21000000 32 8
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scaling_bench as sb  # noqa: E402

_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from tera_spark.session import get_spark
from tera_spark.fixtures.transcripts import transcripts_spark_df_dist
spark = get_spark("soak_gen", cores=32, shuffle_partitions=32)
transcripts_spark_df_dist(spark, n_convs={n_convs}, parts=128).write.mode(
    "overwrite").parquet({src!r})
spark.stop()
"""


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 21_000_000
    levels = [int(x) for x in sys.argv[2:]] or [32, 8]

    os.makedirs(sb.SHM, exist_ok=True)
    src = os.path.join(sb.SHM, f"transcripts_{n_convs}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        t0 = time.time()
        code = _GEN.format(repo=sb.REPO, n_convs=n_convs, src=src)
        env = dict(os.environ, TERA_SPARK_DRIVER_MEM="16g")
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=4 * 3600, env=env)
        print(f"gen {n_convs} convs: {time.time() - t0:.0f}s", file=sys.stderr)

    os.environ["TERA_SPARK_BENCH_RUNS"] = "1"
    os.environ.setdefault("TERA_SPARK_BENCH_TIMEOUT", "14400")
    source = f"soak-{int(time.time())}-{os.getpid()}"
    for cores in levels:
        try:
            rec = sb.run(cores, src, source)
        except Exception as e:  # keep later levels alive
            print(f"level local[{cores}] failed: {e}", file=sys.stderr)
            continue
        sb._append_history(rec)
        print(f"local[{cores}]: {rec['turns']} turns in {rec['seconds']}s "
              f"= {rec['turns_per_sec']} t/s, jvm peak "
              f"{rec['jvm_peak_rss_mb']} MB", file=sys.stderr)
    sb.write_report()


if __name__ == "__main__":
    main()
