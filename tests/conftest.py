from __future__ import annotations

import pytest

from tera_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tera_spark_tests", cores=4, shuffle_partitions=8)
    yield s


def df_from_rows(spark, rows, schema):
    return spark.createDataFrame(rows, schema)
