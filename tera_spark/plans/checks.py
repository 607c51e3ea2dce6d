"""Physical-plan inspection helpers — the ".explain and iterate" loop as
code. Used by tests to pin the plan properties that matter at 100 TB:
filters reach the parquet scan, small sides broadcast, hot paths stay in
whole-stage codegen, and shuffle counts don't regress.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan."""
    return "\n".join(
        line for line in explain_str(df).splitlines() if "PushedFilters" in line
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple") or "BroadcastNestedLoopJoin" in explain_str(df, "simple")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle boundaries in the (pre-AQE) physical plan."""
    plan = explain_str(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "reused" not in line.lower()
    )


def codegen_stage_count(df: DataFrame) -> int:
    plan = explain_str(df, "simple")
    ids = set()
    for line in plan.splitlines():
        if "WholeStageCodegen" in line:
            ids.add(line.split("WholeStageCodegen")[-1].strip(" ()"))
    return len(ids)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    out = []
    for line in explain_str(df).splitlines():
        if "ReadSchema" in line:
            cols = line.split("struct<")[-1].rstrip(">\n")
            out.extend(c.split(":")[0] for c in cols.split(",") if ":" in c)
    return out
