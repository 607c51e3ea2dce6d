"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship Q14 endpoint star join (SURVEY.md §3.2) over
the ECOTOX-shaped mapping of the driver tables at sf0.001. ``queries`` /
``oracle_sql`` pair every implemented SURVEY.md §2 operator with a DuckDB
oracle (see tera_spark/entry_queries.py); entries without an oracle are
the documented non-SQL-expressible ops (fuzzy WRatio scoring, xxhash64
simhash/winnowing, hyperplane LSH, the mention-extraction pandas UDF).
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
