"""Capture .explain('formatted') output for headline queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence trail
(spark_optimization_guide.md §1: record plan shape before/after).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r06 before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tera_spark.entry_queries import QUERIES  # noqa: E402
from tera_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "t9_tests_triples", "t10_results_triples", "q14_endpoint_star",
    "q14_endpoint_relational", "a_tpch_q1", "w2_top1_per_group",
    "cc_components", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "ann_topk_cosine", "text_quality",
    "text_bigram_lm", "graph_pagerank", "ev_sessionize",
    "curation_dsir_weights", "dedup_semantic", "text_bm25_topk",
    "dedup_resolve_clusters", "graph_triangles",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans", cores=cores, shuffle_partitions=cores)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
