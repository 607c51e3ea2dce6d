"""Interleaved A/B micro-bench for single registry queries across two
source trees — the BENCH/BASELINE.md same-window discipline applied to
per-query regressions (round-4 verdict next-round #3: t9_tests_triples
+33% and dedup_minhash_lsh +24% r3→r4 at sf0.1 warm).

Runs one subprocess per (tree, rep): fresh JVM, one full-width warmup
job, then cold+warm run of each named query; the WARM number is
reported, matching bench.py's headline definition. Trees alternate
A B A B ... inside one host window so host-steal drift hits both
equally.

Usage:
  python tools/bench_ab.py TREE_A TREE_B reps q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from tera_spark.session import get_spark
from tera_spark.entry_queries import QUERIES

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("bench_ab", cores=cores, shuffle_partitions=cores)
spark.range(0, 10_000_000, 1, cores).select(F.sum("id")).collect()
out = {}
for name in sys.argv[2:]:
    fn = QUERIES[name]
    t0 = time.time(); fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = time.time() - t0
    t0 = time.time(); fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = {"cold": round(cold, 3), "warm": round(time.time() - t0, 3)}
print("ABRESULT " + json.dumps(out))
"""


def run_tree(tree: str, queries: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree, *queries],
        capture_output=True, text=True, timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result from {tree}: {p.stderr[-2000:]}")


def main():
    tree_a, tree_b, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    queries = sys.argv[4:]
    rows = []
    for i in range(reps):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            r = run_tree(tree, queries)
            rows.append((label, r))
            print(f"rep{i} {label}: " + " ".join(
                f"{q}={r[q]['warm']}" for q in queries), flush=True)
    for q in queries:
        a = sorted(r[q]["warm"] for lbl, r in rows if lbl == "A")
        b = sorted(r[q]["warm"] for lbl, r in rows if lbl == "B")
        med = lambda xs: xs[len(xs) // 2] if len(xs) % 2 else (xs[len(xs)//2-1]+xs[len(xs)//2])/2
        print(f"{q}: A(median {med(a)}, {a}) vs B(median {med(b)}, {b}) "
              f"ratio B/A={med(b)/med(a):.3f}")


if __name__ == "__main__":
    main()
