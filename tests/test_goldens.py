"""Frozen-golden oracles (tools/freeze_goldens.py): the WRatio-scored
entries whose difflib scorer no SQL engine can replay get their driver
oracle from a frozen row set instead of a recomputation. These tests pin
the plumbing — the golden files parse, the generated VALUES SQL runs in
DuckDB, and the types survive the round trip — without needing Spark."""

import duckdb

from tera_spark.entry_queries import _sql_frozen_golden


def test_frozen_golden_sql_round_trips():
    for fname, n_rows, cols in [
        ("j6_string_matching.sf001.json", 138, ["from_id", "to_id", "score"]),
        ("kg_pipeline_triples.json", 1553, ["subject", "predicate", "object", "obj_is_literal"]),
    ]:
        sql = _sql_frozen_golden(fname)
        res = duckdb.sql(sql)
        assert [c.lower() for c in res.columns] == cols
        tbl = res.fetch_arrow_table()
        assert tbl.num_rows == n_rows
        # exact driver-visible types: strings stay strings, score is
        # float64, the literal flag is bool (mirrors the Spark schema)
        kinds = {f.name.lower(): str(f.type) for f in tbl.schema}
        if "score" in kinds:
            assert kinds["score"] == "double"
        if "obj_is_literal" in kinds:
            assert kinds["obj_is_literal"] == "bool"


def test_frozen_golden_registered_as_oracles():
    from tera_spark.entry_queries import ORACLES, QUERIES

    for name in ["j6_string_matching", "kg_pipeline_triples"]:
        assert name in QUERIES and name in ORACLES
        assert "VALUES" in ORACLES[name]
