"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship Q14 endpoint star join (SURVEY.md §3.2) over
the ECOTOX-shaped mapping of the driver tables at sf0.001. ``queries`` /
``oracle_sql`` pair every implemented SURVEY.md §2 operator with a DuckDB
oracle (see tera_spark/entry_queries.py). Round 3 oracle upgrades: the
IVF-ANN path (md5-portable k-means seeding; SQL replays seeding + Lloyd
rounds + probe/rerank), the multimodal feature path (payload hex embedded,
DuckDB recomputes byte counts + hashes), and the KG pipeline's
deterministic slices (structure triples + exact/rule-linked mention
triples, with term/code extraction and the exact lexicon join replayed in
SQL from raw text). The only remaining rows-only entries are the fuzzy
WRatio scorer (Python difflib, by design) and the end-to-end transcript
KG pipeline whose only unverified band is that same scorer (golden-tested
in pytest instead).
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
