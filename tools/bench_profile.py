"""Profile the headline bench queries: run each twice in one session and
report cold vs warm seconds — separates one-time cost (codegen, parquet
footers, python-daemon fork, broadcast builds) from steady-state dataflow.

Usage: python tools/bench_profile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tera_spark.entry_queries import QUERIES  # noqa: E402
from tera_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "t9_tests_triples", "t10_results_triples", "q14_endpoint_star",
    "q14_endpoint_relational", "a_tpch_q1", "w2_top1_per_group",
    "cc_components", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "ann_topk_cosine", "text_quality",
    "graph_pagerank", "ev_sessionize",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or HEADLINE
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_profile", cores=cores, shuffle_partitions=cores)

    out = {}
    for name in names:
        runs = []
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"cold": runs[0], "warm": runs[1]}
        print(f"{name}: cold={runs[0]} warm={runs[1]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
