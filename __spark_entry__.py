"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship Q14 endpoint star join (SURVEY.md §3.2) over
the ECOTOX-shaped mapping of the driver tables at sf0.001. ``queries`` /
``oracle_sql`` pair every implemented SURVEY.md §2 operator with a DuckDB
oracle (see tera_spark/entry_queries.py). Round 2 oracle upgrades:
simhash/winnowing run md5-prefix portable hashes, and the hyperplane-LSH
entries replay the deterministic hyperplanes as SQL float literals — the
only remaining rows-only entries are the fuzzy WRatio scorer (Python
difflib, by design) and the end-to-end transcript KG pipeline (golden-
tested in pytest instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tera_spark.entry_queries import QUERIES

    return QUERIES["q14_endpoint_star"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tera_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tera_spark.entry_queries import ORACLES

    return dict(ORACLES)
