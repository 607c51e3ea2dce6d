"""Interleaved A/B of the STAGED pipeline (pipeline/run.py — the
scaling-criterion shape: every stage written to parquet, mentions re-read
from disk) across two trees. Guards against a bench-focused optimization
round regressing the production path.

Each child: fresh JVM, generate the transcript corpus once to tmpfs
parquet, then run run_pipeline twice into fresh dirs (cold + warm; WARM
reported, matching the scaling bench's discipline).

Usage: python tools/bench_ab_staged.py TREE_A TREE_B reps [n_convs]
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from tera_spark.session import get_spark

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("ab_staged", cores=cores, shuffle_partitions=cores)
spark.range(0, 10_000_000, 1, cores).select(F.sum("id")).collect()

from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df_dist
from tera_spark.pipeline.run import run_pipeline

n_convs = int(sys.argv[2])
base = tempfile.mkdtemp(prefix="ab_staged_", dir="/dev/shm")
src = os.path.join(base, "transcripts")
transcripts_spark_df_dist(spark, n_convs=n_convs).write.mode("overwrite").parquet(src)
t = spark.read.parquet(src)
n = t.count()
lexicon = lexicon_spark_df(spark)

def once(tag):
    out = os.path.join(base, tag)
    t0 = time.time()
    run_pipeline(spark, t, lexicon, out)
    return round(time.time() - t0, 3)

cold = once("run_cold")
warm = once("run_warm")
shutil.rmtree(base, ignore_errors=True)
print("ABRESULT " + json.dumps(
    {"staged": {"cold": cold, "warm": warm, "turns": n,
                "warm_tps": round(n / warm, 1)}}))
"""


def run_tree(tree: str, n_convs: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree, str(n_convs)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result from {tree}: {p.stderr[-2000:]}")


def main():
    tree_a, tree_b, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    n_convs = int(sys.argv[4]) if len(sys.argv) > 4 else 200000
    rows = []
    for r in range(reps):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            res = run_tree(tree, n_convs)["staged"]
            rows.append({"rep": r, "tree": label, **res})
            print(json.dumps(rows[-1]), flush=True)
    med = lambda s: s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    a = sorted(x["warm"] for x in rows if x["tree"] == "A")
    b = sorted(x["warm"] for x in rows if x["tree"] == "B")
    print(json.dumps({
        "A_warm": a, "B_warm": b, "A_median": med(a), "B_median": med(b),
        "ratio_B_over_A": round(med(b) / med(a), 3) if med(a) else None,
    }))


if __name__ == "__main__":
    main()
