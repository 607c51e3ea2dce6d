"""Scaling-efficiency evidence (north_rule): run the identical KG pipeline
on the identical input at two parallelism levels (local[N] vs local[4N])
in separate JVMs, report turns/sec at both plus efficiency = (rate_4N /
rate_N) / 4. Writes BENCH/BASELINE.md.

Measurement discipline for this virtualized sandbox (host CPU-steal and
page-fault costs cause multi-x wall-clock variance):
- corpus generated DISTRIBUTED (mapInPandas, per-conv seeding — identical
  bytes at any parallelism) and written once to tmpfs parquet; both levels
  read the same files (no generator or disk noise in the timed region);
- stage outputs also land on tmpfs;
- each JVM runs the pipeline twice (second is warm) and reports the
  fastest; the two levels are interleaved A/B/A/B and the per-level
  minimum is taken;
- the driver JVM heap is pinned (Xms=Xmx + AlwaysPreTouch, session.py) —
  without it the guest kernel burns >60% of all CPU in page-fault handling
  at 32 threads and the measurement is meaningless.

Usage: python tools/scaling_bench.py [n_convs] [N] [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM = "/dev/shm/tera_scaling"

_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from tera_spark.session import get_spark
from tera_spark.fixtures.transcripts import transcripts_spark_df_dist
spark = get_spark("scaling_gen", cores=16, shuffle_partitions=16)
transcripts_spark_df_dist(spark, n_convs={n_convs}, parts=64).write.mode(
    "overwrite").parquet({src!r})
spark.stop()
"""

_CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from tera_spark.session import get_spark
from tera_spark.fixtures.transcripts import lexicon_spark_df

cores = {cores}
spark = get_spark("scaling_bench", cores=cores, shuffle_partitions=cores)
transcripts = spark.read.parquet({src!r})
n_turns = transcripts.count()
lexicon = lexicon_spark_df(spark)

from tera_spark.pipeline.run import run_pipeline

def once(i):
    out = {shm!r} + f"/out_{cores}_{{i}}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    run_pipeline(spark, transcripts, lexicon, out)
    secs = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return secs

# the real pipeline (stage-checkpointed writes) — warm second run, faster of
# the two (first run also pays python-worker spawn, which a long-lived
# production job pays once)
secs = min(once(0), once(1))
print(json.dumps({{"cores": cores, "turns": n_turns, "seconds": round(secs, 2),
                  "turns_per_sec": round(n_turns / secs, 1)}}))
spark.stop()
"""


def run(cores: int, src: str) -> dict:
    code = _CHILD.format(repo=REPO, cores=cores, src=src, shm=SHM)
    env = dict(os.environ, TERA_SPARK_DRIVER_MEM="16g")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600, env=env
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(1)
    return json.loads(lines[-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    os.makedirs(SHM, exist_ok=True)
    src = os.path.join(SHM, f"transcripts_{n_convs}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        code = _GEN.format(repo=REPO, n_convs=n_convs, src=src)
        env = dict(os.environ, TERA_SPARK_DRIVER_MEM="8g")
        subprocess.run([sys.executable, "-c", code], check=True, timeout=3600, env=env)

    smalls, bigs = [], []
    for i in range(repeats):
        smalls.append(run(n, src))
        bigs.append(run(4 * n, src))
        print(f"round {i}: {smalls[-1]} | {bigs[-1]}", file=sys.stderr)
    small = min(smalls, key=lambda r: r["seconds"])
    big = min(bigs, key=lambda r: r["seconds"])
    eff = (big["turns_per_sec"] / small["turns_per_sec"]) / 4
    report = {
        "input_turns": small["turns"],
        f"local[{n}]": small,
        f"local[{4 * n}]": big,
        "scaling_efficiency": round(eff, 3),
        "runs": {"small": smalls, "big": bigs},
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — measured scaling evidence\n\n"
            "Same KG-construction job (extraction → linking → canonicalization →\n"
            "graph materialization with stage checkpoints, `pipeline/run.py`),\n"
            "identical deterministic parquet input, two parallelism levels in\n"
            "separate JVMs (north_rule criterion; sandbox stand-in for N vs 4N\n"
            "executors). Interleaved repeats, warm-run minimum per JVM.\n\n"
            f"| config | turns | seconds | turns/sec |\n|---|---|---|---|\n"
            f"| local[{n}] (N) | {small['turns']} | {small['seconds']} | {small['turns_per_sec']} |\n"
            f"| local[{4 * n}] (4N) | {big['turns']} | {big['seconds']} | {big['turns_per_sec']} |\n\n"
            f"**Scaling efficiency (rate_4N / rate_N) / 4 = {eff:.3f}** (target ≥ 0.8).\n\n"
            "What it took to make this measurable on a shared microVM (round 2):\n"
            "the guest kernel was burning >60% of ALL cpu in page-fault handling\n"
            "during 32-thread runs (JVM heap grow/uncommit churn) — fixed by\n"
            "pinning the heap (Xms=Xmx + AlwaysPreTouch, session.py); the fuzzy\n"
            "scorer was being collapsed to ONE task by AQE byte-based coalescing\n"
            "and pushed below its blocking prefilter by Catalyst — fixed with an\n"
            "explicit numbered repartition and asNondeterministic() (link.py,\n"
            "similarity.py); python workers now fork from a pandas-preloaded\n"
            "daemon (warm_daemon.py); per-stage lineage/metrics ride the stage\n"
            "write via observe() instead of extra jobs (run.py).\n\n"
            f"Raw: `{json.dumps(report)}`\n"
        )


if __name__ == "__main__":
    main()
