"""Interleaved A/B for the bench.py kg_pipeline block across two trees —
same discipline as tools/bench_ab.py (fresh JVM per child, warmup job,
cold+warm, trees alternating inside one host window; WARM is the headline).

Usage: python tools/bench_ab_kg.py TREE_A TREE_B reps [n_convs]
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from tera_spark.session import get_spark

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("bench_ab_kg", cores=cores, shuffle_partitions=cores)
spark.range(0, 10_000_000, 1, cores).select(F.sum("id")).collect()

from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df_dist
from tera_spark.operators.canonical import canonical_mapping
from tera_spark.operators.triples import replace_entities
from tera_spark.pipeline.extract import extract_mentions
from tera_spark.pipeline.kg import build_triples
from tera_spark.pipeline.link import link_mentions

n_convs = int(sys.argv[2])
transcripts = transcripts_spark_df_dist(spark, n_convs=n_convs).cache()
transcripts.count()
lexicon = lexicon_spark_df(spark)

def once():
    t0 = time.time()
    mentions = extract_mentions(transcripts)
    linked, alias_edges = link_mentions(mentions, lexicon)
    triples = replace_entities(
        build_triples(transcripts, linked, deduplicate=False),
        canonical_mapping(alias_edges),
    )
    triples.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)

cold = once()
warm = once()
print("ABRESULT " + json.dumps({"kg_pipeline": {"cold": cold, "warm": warm}}))
"""


def run_tree(tree: str, n_convs: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree, str(n_convs)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result from {tree}: {p.stderr[-2000:]}")


def main():
    tree_a, tree_b, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    n_convs = int(sys.argv[4]) if len(sys.argv) > 4 else 20000
    rows = []
    for r in range(reps):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            res = run_tree(tree, n_convs)["kg_pipeline"]
            rows.append({"rep": r, "tree": label, **res})
            print(json.dumps(rows[-1]), flush=True)
    a = sorted(x["warm"] for x in rows if x["tree"] == "A")
    b = sorted(x["warm"] for x in rows if x["tree"] == "B")
    med = lambda s: s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    print(json.dumps({
        "A_warm": a, "B_warm": b,
        "A_median": med(a), "B_median": med(b),
        "ratio_B_over_A": round(med(b) / med(a), 3) if med(a) else None,
    }))


if __name__ == "__main__":
    main()
