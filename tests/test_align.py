from pyspark.sql import functions as F

from tera_spark.operators.align import (
    NO_MAPPING,
    convert,
    convert_via_base,
    merge_mappings,
    pick_one,
    reverse_mapping,
    string_matching_mapping,
    threshold_dedup,
)

M_SCHEMA = "from_id string, to_id string"


def test_pick_one_deterministic(spark):
    m = spark.createDataFrame(
        [("a", "z"), ("a", "b"), ("c", "d")], M_SCHEMA
    )
    out = {r.from_id: r.to_id for r in pick_one(m).collect()}
    assert out == {"a": "b", "c": "d"}  # smallest to_id wins


def test_convert_with_default(spark):
    ids = spark.createDataFrame([("x",), ("y",), ("z",)], "id string")
    m = spark.createDataFrame([("x", "X"), ("y", "Y")], M_SCHEMA)
    out = {r.id: r.converted for r in convert(ids, m).collect()}
    assert out == {"x": "X", "y": "Y", "z": NO_MAPPING}


def test_convert_reverse(spark):
    ids = spark.createDataFrame([("X",)], "id string")
    m = spark.createDataFrame([("x", "X")], M_SCHEMA)
    out = convert(ids, m, reverse=True).collect()[0]
    assert out.converted == "x"


def test_convert_via_base(spark):
    # f→base mapping stored as base→f (reverse probe), base→t forward
    ids = spark.createDataFrame([("cas1",), ("cas2",)], "id string")
    base_to_f = spark.createDataFrame([("ik1", "cas1")], M_SCHEMA)
    base_to_t = spark.createDataFrame([("ik1", "cid1")], M_SCHEMA)
    out = {r.id: r.converted for r in convert_via_base(ids, base_to_f, base_to_t).collect()}
    assert out == {"cas1": "cid1", "cas2": NO_MAPPING}


def test_merge_mappings_right_wins(spark):
    a = spark.createDataFrame([("k", "va"), ("only_a", "x")], M_SCHEMA)
    b = spark.createDataFrame([("k", "vb")], M_SCHEMA)
    out = {r.from_id: r.to_id for r in merge_mappings(a, b).collect()}
    assert out == {"k": "vb", "only_a": "x"}


def test_threshold_dedup(spark):
    a = spark.createDataFrame(
        [("e1", "e2", 0.96), ("e1", "e2", 0.99), ("e1", "e3", 0.5)],
        "e1 string, e2 string, score double",
    )
    out = threshold_dedup(a, 0.95, unique=True).collect()
    assert len(out) == 1 and out[0].score == 0.99


def test_string_matching_finds_exact_and_fuzzy(spark):
    l1 = spark.createDataFrame(
        [("n1", "Pimephales promelas"), ("n2", "Daphnia magna"), ("n3", "Zebrafish")],
        "entity string, label string",
    )
    l2 = spark.createDataFrame(
        [("e1", "Pimephales promelas"), ("e2", "Daphnia magnaa"), ("e9", "Oak tree")],
        "entity string, label string",
    )
    out = {(r.from_id, r.to_id): r.score for r in string_matching_mapping(l1, l2, threshold=90).collect()}
    assert ("n1", "e1") in out and out[("n1", "e1")] == 100.0
    assert ("n2", "e2") in out and out[("n2", "e2")] >= 90
    assert all(k[0] != "n3" for k in out)  # no shared token → never scored


def test_string_matching_blocks_cross_product(spark):
    # hot token removal: a token shared by everything must not explode
    l1 = spark.createDataFrame(
        [(f"a{i}", f"species common{i}") for i in range(30)], "entity string, label string"
    )
    l2 = spark.createDataFrame(
        [(f"b{i}", f"species common{i}") for i in range(30)], "entity string, label string"
    )
    out = string_matching_mapping(l1, l2, threshold=95, max_candidates_per_token=10)
    pairs = out.collect()
    # 'species' token is hot (30 > 10) and dropped; 'commonN' still matches 1:1
    assert {(r.from_id, r.to_id) for r in pairs} == {(f"a{i}", f"b{i}") for i in range(30)}
