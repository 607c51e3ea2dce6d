"""Where does t10_results_triples' time go? Cumulative sub-plan timings
(guide §1.4: noop sink; warm = second run).

Usage: python tools/t10_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from tera_spark.entry_queries import QUERIES, lineitem_as_results
    from tera_spark.operators.extract.effects import RESULTS_COLS, clean_results
    from tera_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("t10_profile", cores=cores, shuffle_partitions=cores)
    spark.range(0, 10_000_000, 1, cores).select(F.sum("id")).collect()

    out = {}

    def timed(name, fn):
        vals = []
        for _ in range(2):
            t0 = time.time()
            fn()
            vals.append(round(time.time() - t0, 3))
        out[name] = vals
        print(f"{name}: {vals}", file=sys.stderr)

    spark.sparkContext.setJobDescription("t10: scan+map as results")
    timed("scan_map", lambda: _noop(lineitem_as_results(spark, sf)))

    spark.sparkContext.setJobDescription("t10: + clean")
    timed("clean", lambda: _noop(clean_results(lineitem_as_results(spark, sf))))

    def _grouped():
        results = clean_results(lineitem_as_results(spark, sf))
        grouped = (
            results.groupBy(RESULTS_COLS)
            .agg(F.count(F.lit(1)).alias("_n"))
            .withColumn("dup_seq", F.explode(F.sequence(F.lit(1), F.col("_n"))))
            .drop("_n")
        )
        _noop(grouped)

    spark.sparkContext.setJobDescription("t10: + groupBy + reexpand")
    timed("grouped", _grouped)

    spark.sparkContext.setJobDescription("t10: full")
    timed("full_t10", lambda: _noop(QUERIES["t10_results_triples"](spark, sf)))

    spark.sparkContext.setJobDescription("t9: full")
    timed("full_t9", lambda: _noop(QUERIES["t9_tests_triples"](spark, sf)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
