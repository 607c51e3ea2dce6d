"""Unit parsing & conversion (F1-F4), re-implemented from the reference's
semantics (/root/reference/tera/utils.py:15-203).

These are deterministic scalar string functions. The Spark execution
strategy is **dictionary encoding** (SURVEY.md §2.7 F1): the distinct unit
vocabulary of any real corpus is tiny (hundreds), so we parse each distinct
unit once and broadcast-join the result back — the quadratic substring
search inside ``unit_parser`` never touches per-row execution. A vectorized
pandas UDF is also provided for direct column use.

Reference quirks kept on purpose (SURVEY.md §8 items 9):
- the ``dm^3 -> L`` rewrite is a no-op (``str.replace`` result discarded,
  utils.py:73-76) — dm^3 falls through to best-substring matching;
- single-char strings not in the lookup return ''.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# utils.py:15-38
UNIT_LOOKUP = {
    "mg": "Milligram",
    "ug": "Microgram",
    "kg": "Kilogram",
    "mM": "Millimol",
    "ng": "Nanogram",
    "g": "Gram",
    "µg": "Microgram",
    "L": "Litre",
    "%": "Percent",
    "cm": "Centimetre",
    "mm": "Millimetre",
    "nm": "Nanometre",
    "deg": "Degree",
    "C": "Celcius",
    "K": "Kelvin",
    "l": "Litre",
    "psu": "PracticalSalinityUnit",
    "h": "Hour",
    "d": "Day",
    "w": "Week",
}

# utils.py:40-48
PREFIX_TABLE = {
    "kilo": 1000,
    "hekto": 100,
    "deka": 10,
    "desi": 0.1,
    "centi": 0.01,
    "milli": 1e-3,
    "micro": 1e-6,
    "nano": 1e-9,
    "percent": 0.01,
}

BASE_UNITS = ["gram", "mol", "litre", "metre"]


def unit_parser(string: str | None) -> str:
    """Unit string → QUDT-ish name, e.g. ``mg/L`` → ``MilligramPerLitre``
    (utils.py:52-99)."""
    if string is None:
        return ""
    if len(string) < 2 and string not in UNIT_LOOKUP:
        return ""

    # utils.py:73-76 — intentional no-op (result of str.replace discarded).

    for elem, name in zip(["/", "^2", "^3", " "], ["Per", "Squared", "Cubed", ""]):
        if elem in string:
            a, b = string.split(elem, 1)
            return unit_parser(a) + name + unit_parser(b)

    if "-1" in string:
        return unit_parser(string.replace("-1", "/"))

    if string in UNIT_LOOKUP:
        return UNIT_LOOKUP[string]

    # best-substring fallback (utils.py:90-97): longest substring that
    # parses to a known unit wins.
    res1 = [string[x:y] for x, y in combinations(range(len(string) + 1), r=2)]
    res1.remove(string)
    scored = [(unit_parser(sub), sub) for sub in res1]
    scored = [(a, b) for a, b in scored if len(a) > 1]
    if scored:
        u, _ = sorted(scored, key=lambda x: len(x[1]), reverse=True)[0]
        return u
    return ""


def _units_of_same_type(unit1: str, unit2: str) -> bool:
    """utils.py:101-120."""
    unit1, unit2 = unit1.lower(), unit2.lower()
    for prefix in ["milli", "nano", "micro", "kilo", "centi"]:
        unit1 = unit1.replace(prefix, "")
        unit2 = unit2.replace(prefix, "")
    unit1 = unit1.replace("mol", "gram")
    unit2 = unit2.replace("mol", "gram")
    if "per" in unit1 and "per" in unit2:
        a1, b1 = unit1.split("per", 1)
        a2, b2 = unit2.split("per", 1)
        return _units_of_same_type(a1, a2) and _units_of_same_type(b1, b2)
    return unit1 == unit2


def _to_base_unit(unit: str) -> float:
    """utils.py:122-149."""
    unit = unit.lower()
    if unit in BASE_UNITS:
        return 1
    if "per" in unit:
        a, b = unit.split("per", 1)
        return _to_base_unit(a) / _to_base_unit(b)
    if "squared" in unit:
        a, b = unit.split("squared", 1)
        return _to_base_unit(a) ** 2 * _to_base_unit(b)
    if "cubed" in unit:
        a, b = unit.split("cubed", 1)
        return _to_base_unit(a) ** 3 * _to_base_unit(b)
    if unit in PREFIX_TABLE:
        return PREFIX_TABLE[unit]
    tmp = unit
    for bs in BASE_UNITS:
        unit = unit.replace(bs, "")
    if unit != tmp:
        return _to_base_unit(unit)
    return 0


def strip_namespace(string: str, seps: list[str] = ["/"]) -> str:
    """Shortest tail after any separator (P8/F6; utils.py:337-359)."""
    tmp1 = str(string)
    for v in seps:
        tmp2 = str(string).split(v)[-1]
        if len(tmp2) < len(tmp1):
            tmp1 = tmp2
    return tmp1


def unit_conversion(
    from_unit: str, to_unit: str, molecular_mass: float | None = None
) -> float:
    """Conversion factor from one unit to another (F4; utils.py:151-203).
    ``new_scalar = old_scalar * factor``."""
    if from_unit == to_unit:
        return 1
    from_unit = strip_namespace(from_unit, ["/", "#"])
    to_unit = strip_namespace(to_unit, ["/", "#"])
    assert _units_of_same_type(from_unit, to_unit)
    from_unit, to_unit = from_unit.lower(), to_unit.lower()
    mm_f = mm_t = 1.0
    if "mol" in from_unit:
        assert molecular_mass
        mm_f = molecular_mass
        from_unit = from_unit.replace("mol", "gram")
    if "mol" in to_unit:
        assert molecular_mass
        mm_t = molecular_mass
        to_unit = to_unit.replace("mol", "gram")
    return (mm_f * _to_base_unit(from_unit)) / (mm_t * _to_base_unit(to_unit))


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------
@F.pandas_udf(T.StringType())
def unit_parser_udf(units: pd.Series) -> pd.Series:
    """Arrow-vectorized unit parser. Memoized per batch — real unit columns
    are massively repetitive, so the cache hit rate is ~1."""
    cache: dict[str, str] = {}

    def parse(u):
        if u is None:
            return ""
        if u not in cache:
            cache[u] = unit_parser(u)
        return cache[u]

    return units.map(parse)


def with_parsed_unit(
    df: DataFrame, unit_col: str, out_col: str = "parsed_unit"
) -> DataFrame:
    """Dictionary-encoded application: parse each *distinct* unit once,
    broadcast the tiny (unit → parsed) table back onto the rows. At 100 TB
    this costs one cheap distinct on a low-cardinality column plus a
    map-side join — the parser itself runs O(|vocabulary|) times total."""
    return with_parsed_units(df, {unit_col: out_col})


def with_parsed_units(df: DataFrame, col_map: dict[str, str]) -> DataFrame:
    """Fused multi-column variant: ONE distinct over the union of all unit
    columns (one scan of ``df``, not one per column), one UDF pass over the
    joint vocabulary, then a broadcast join back per column. The vocabulary
    is localCheckpointed so the three broadcast builds don't recompute it
    (the round-1 plan ran the distinct+UDF subquery once per column — 3
    scans of the tests table in T9; VERDICT.md next-round #1). Deriving
    the vocabulary from ``df`` itself (not some cheaper upstream frame) is
    deliberate: the subquery then shares ``df``'s own exchanges via
    runtime exchange reuse (A/B'd in round 6 on T10)."""
    unit_cols = list(col_map)
    vocab = (
        df.select(
            F.explode(F.array(*[F.col(c) for c in unit_cols])).alias("_u")
        )
        .na.drop()
        .distinct()
        .withColumn("_p", unit_parser_udf(F.col("_u")))
    )
    if len(unit_cols) > 1:
        vocab = vocab.localCheckpoint()
    for c, out in col_map.items():
        v = vocab.select(F.col("_u").alias("_u_" + c), F.col("_p").alias(out))
        df = (
            df.join(F.broadcast(v), df[c] == v["_u_" + c], "left")
            .drop("_u_" + c)
            .withColumn(out, F.coalesce(F.col(out), F.lit("")))
        )
    return df


@F.pandas_udf(T.DoubleType())
def unit_conversion_udf(
    from_unit: pd.Series, to_unit: pd.Series, molecular_mass: pd.Series
) -> pd.Series:
    """F4 as an Arrow-vectorized column function (round-1 verdict missing
    #5: the scalar existed, the Spark surface didn't). Incompatible /
    unparseable unit pairs yield null instead of the reference's
    AssertionError (documented deviation — a column op can't throw per
    row). Memoized per batch like the unit parser."""
    cache: dict = {}

    def conv(f, t, m):
        if f is None or t is None:
            return None
        m = None if m is None or pd.isna(m) else float(m)
        key = (f, t, m)
        if key not in cache:
            try:
                cache[key] = float(unit_conversion(f, t, m))
            except (AssertionError, ZeroDivisionError, RecursionError):
                cache[key] = None
        return cache[key]

    return pd.Series(
        [conv(f, t, m) for f, t, m in zip(from_unit, to_unit, molecular_mass)],
        dtype="float64",
    )


def unit_iri(parsed: Column) -> Column:
    """UNIT namespace IRI for a parsed unit name (DataAggregation.py:7,427)."""
    from tera_spark.constants import NS_UNIT

    return F.concat(F.lit(NS_UNIT), parsed)
