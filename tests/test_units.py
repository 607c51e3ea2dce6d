import math

import pytest
from pyspark.sql import functions as F

from tera_spark.functions.units import (
    _to_base_unit,
    _units_of_same_type,
    strip_namespace,
    unit_conversion,
    unit_parser,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("mg/L", "MilligramPerLitre"),
        ("ug/L", "MicrogramPerLitre"),
        ("g/kg", "GramPerKilogram"),
        ("mM", "Millimol"),
        ("%", "Percent"),
        ("h", "Hour"),
        ("d", "Day"),
        ("mg", "Milligram"),
        ("x", ""),  # single char, not in lookup
        ("", ""),
        ("mg%/L", "MilligramPerLitre"),  # misprint filter via substring match
        ("deg C", "DegreeCelcius"),  # space → concat
        ("m^2", "Squared"),  # 'm' alone is not a unit → empty parts (reference behavior)
        ("cm^2", "CentimetreSquared"),
        ("L-1", "LitrePer"),  # -1 → '/' → trailing Per (reference behavior)
    ],
)
def test_unit_parser(raw, expected):
    assert unit_parser(raw) == expected


def test_units_of_same_type():
    assert _units_of_same_type("MilligramPerLitre", "KilogramPerLitre")
    assert _units_of_same_type("MillimolPerLitre", "MilligramPerLitre")  # mol→gram
    assert not _units_of_same_type("MillimetrePerLitre", "MilligramPerLitre")


def test_to_base_unit():
    assert _to_base_unit("gram") == 1
    assert _to_base_unit("milligram") == pytest.approx(1e-3)
    assert _to_base_unit("kilogramperlitre") == pytest.approx(1000)


def test_unit_conversion_factor():
    # mg/L → g/L = 1e-3
    f = unit_conversion("MilligramPerLitre", "GramPerLitre")
    assert f == pytest.approx(1e-3)
    # identical units
    assert unit_conversion("Hour", "Hour") == 1
    # molar conversion needs molecular mass
    f = unit_conversion("MillimolPerLitre", "MilligramPerLitre", molecular_mass=100.0)
    assert f == pytest.approx(100.0)


def test_unit_conversion_type_mismatch():
    with pytest.raises(AssertionError):
        unit_conversion("MillimetrePerLitre", "MilligramPerLitre")


def test_strip_namespace():
    assert strip_namespace("http://a/b/c", ["/"]) == "c"
    assert strip_namespace("http://a/b#c", ["/", "#"]) == "c"
    assert strip_namespace("http://x/CID123", ["/", "#", "CID"]) == "123"


def test_parser_round_trip_conversion():
    # parse two unit strings, then compute the factor between them
    a, b = unit_parser("ug/L"), unit_parser("mg/L")
    assert unit_conversion(a, b) == pytest.approx(1e-3)


def test_with_parsed_unit_dictionary_encode(spark):
    df = spark.createDataFrame(
        [("1", "mg/L"), ("2", "mg/L"), ("3", "ug/L"), ("4", None)],
        "id string, unit string",
    )
    from tera_spark.functions.units import with_parsed_unit

    out = {r.id: r.parsed_unit for r in with_parsed_unit(df, "unit").collect()}
    assert out == {
        "1": "MilligramPerLitre",
        "2": "MilligramPerLitre",
        "3": "MicrogramPerLitre",
        "4": "",
    }


def test_unit_conversion_udf(spark):
    from tera_spark.functions.units import unit_conversion_udf

    df = spark.createDataFrame(
        [
            ("Milligram", "Kilogram", None),
            ("Hour", "Gram", None),   # incompatible → null (scalar raises)
            ("Millimol", "Gram", 10.0),
        ],
        "f string, t string, mm double",
    )
    out = df.select(F.col("f"), unit_conversion_udf("f", "t", "mm").alias("x")).collect()
    got = {r.f: r.x for r in out}
    assert got["Milligram"] == 1e-6
    assert got["Hour"] is None
    assert got["Millimol"] == 0.01


# --------------------------------------------------------------------------
# Z-order layout key (functions/layout.py)
# --------------------------------------------------------------------------
def _py_morton(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_python_reference(spark):
    import pyspark.sql.functions as F

    from tera_spark.functions.layout import zorder_key2

    rows = [(x, y) for x in (0, 1, 2, 3, 255, 65535) for y in (0, 1, 7, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key2(F.col("x"), F.col("y"), 16).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y, 16), (x, y)
    # interleave basics: (1,0)→2, (0,1)→1, (1,1)→3
    assert got[(1, 0)] == 2 and got[(0, 1)] == 1 and got[(1, 1)] == 3


def test_zorder_locality_beats_lexicographic(spark):
    # the property that justifies the key: sorting by z keeps BOTH dims
    # clustered — max per-chunk y-range under z-sort ≪ under x-sort
    import pyspark.sql.functions as F

    from tera_spark.functions.layout import zorder_key2

    n = 32
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    zs = (
        df.select("x", "y", zorder_key2(F.col("x"), F.col("y"), 5).alias("z"))
        .orderBy("z")
        .collect()
    )
    chunk = 64  # pretend 64-row files
    def spread(rows_sorted, dim):
        worst = 0
        for i in range(0, len(rows_sorted), chunk):
            c = rows_sorted[i : i + chunk]
            worst = max(worst, max(getattr(r, dim) for r in c) - min(getattr(r, dim) for r in c))
        return worst

    lex = sorted(rows)  # x-major sort: y spans the whole range in every chunk
    assert spread(zs, "y") <= 8
    assert max(y for _, y in lex[:chunk]) - min(y for _, y in lex[:chunk]) == n - 1


def test_zorder_bits_validation(spark):
    import pyspark.sql.functions as F
    import pytest as _pt

    from tera_spark.functions.layout import zorder_key2

    with _pt.raises(ValueError, match="bits"):
        zorder_key2(F.col("x"), F.col("y"), 32)
