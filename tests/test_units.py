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
