"""Scaling-efficiency evidence (north_rule): run the identical KG pipeline
on the identical input at two parallelism levels (local[N] vs local[4N])
in separate JVMs, report turns/sec at both plus efficiency = (rate_4N /
rate_N) / 4. Writes BENCH/BASELINE.md.

Measurement discipline for this virtualized sandbox (host CPU-steal causes
2-5x wall-clock variance): each JVM runs the pipeline twice (the second is
warm) and reports the fastest; the two parallelism levels are interleaved
A/B/A/B and the per-level minimum is taken.

Usage: python tools/scaling_bench.py [n_convs] [N] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from tera_spark.session import get_spark
from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df
from tera_spark.pipeline.run import run_pipeline

cores = {cores}
spark = get_spark("scaling_bench", cores=cores, shuffle_partitions=cores)
transcripts = transcripts_spark_df(spark, n_convs={n_convs}).cache()
n_turns = transcripts.count()
lexicon = lexicon_spark_df(spark)

def once():
    out = tempfile.mkdtemp(prefix="kg_scale_")
    t0 = time.time()
    run_pipeline(spark, transcripts, lexicon, out)
    secs = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return secs

# the real pipeline (stage-checkpointed writes) — small per-stage plans,
# which is the production shape; warm second run, take the faster
secs = min(once(), once())
print(json.dumps({{"cores": cores, "turns": n_turns, "seconds": round(secs, 2),
                  "turns_per_sec": round(n_turns / secs, 1)}}))
spark.stop()
"""


def run(cores: int, n_convs: int) -> dict:
    code = _CHILD.format(repo=REPO, cores=cores, n_convs=n_convs)
    env = dict(os.environ, TERA_SPARK_DRIVER_MEM="32g")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600, env=env
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    smalls, bigs = [], []
    for i in range(repeats):
        smalls.append(run(n, n_convs))
        bigs.append(run(4 * n, n_convs))
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
            "triple materialization, noop sink), identical deterministic input,\n"
            "two parallelism levels in separate JVMs (north_rule criterion;\n"
            "sandbox stand-in for N vs 4N executors). Interleaved repeats,\n"
            "warm-run minimum per JVM (this VM shows heavy host CPU-steal).\n\n"
            f"| config | turns | seconds | turns/sec |\n|---|---|---|---|\n"
            f"| local[{n}] (N) | {small['turns']} | {small['seconds']} | {small['turns_per_sec']} |\n"
            f"| local[{4 * n}] (4N) | {big['turns']} | {big['seconds']} | {big['turns_per_sec']} |\n\n"
            f"**Scaling efficiency (rate_4N / rate_N) / 4 = {eff:.3f}** (target ≥ 0.8).\n\n"
            "Local-mode caveat: one shared driver JVM schedules every task and\n"
            "runs the Python workers on the same host, so fixed per-job overhead\n"
            "counts fully against the 4N run; on a real multi-executor cluster\n"
            "the same physical plan shards across executors without shared-driver\n"
            "contention. The per-stage profile (extraction scales linearly; the\n"
            "small-data CC/link stages are scheduler-bound) is in tools/ and the\n"
            "raw interleaved runs below.\n\n"
            f"Raw: `{json.dumps(report)}`\n"
        )


if __name__ == "__main__":
    main()
