"""Row→triples emission harness.

The reference drives every loader through a per-row Python closure
(``DataObject.apply_func``, /root/reference/tera/DataAggregation.py:90-97).
Here each loader is a *flatMap expressed declaratively*: build an
``array<struct<subject,predicate,object,obj_is_literal>>`` per row (elements
conditionally null), drop the nulls with a higher-order ``filter``, and
``explode``. Everything stays inside whole-stage codegen — no Python in the
emission hot path at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def t(s: Column, p: Column | str, o: Column, lit: bool | Column = False,
      when: Column | None = None) -> Column:
    """One conditional triple: a struct, or null when ``when`` is false."""
    if isinstance(p, str):
        p = F.lit(p)
    if isinstance(lit, bool):
        lit = F.lit(lit)
    s = s.cast("string").alias("subject")
    trip = F.struct(
        s,
        p.cast("string").alias("predicate"),
        o.cast("string").alias("object"),
        lit.alias("obj_is_literal"),
    )
    if when is not None:
        return F.when(when, trip)
    return trip


def emit(df: DataFrame, *elems: Column) -> DataFrame:
    """Explode conditional triples into the triple schema. Null structs
    (failed guards) and null-valued terms are dropped, mirroring the
    reference's ``if`` guards around ``graph.add``."""
    arr = F.filter(F.array(*elems), lambda x: x.isNotNull())
    out = df.select(F.explode(arr).alias("_t")).select(
        F.col("_t.subject").alias("subject"),
        F.col("_t.predicate").alias("predicate"),
        F.col("_t.object").alias("object"),
        F.col("_t.obj_is_literal").alias("obj_is_literal"),
    )
    return out.na.drop(subset=["subject", "predicate", "object"])


def uri(prefix: str, local: Column | str) -> Column:
    """URI mint (P9; e.g. DataAggregation.py:141): ``concat(lit(ns), id)``."""
    if isinstance(local, str):
        local = F.col(local)
    return F.concat(F.lit(prefix), local.cast("string"))
