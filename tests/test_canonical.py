from tera_spark.operators.canonical import (
    canonical_mapping,
    canonicalize,
    connected_components,
    replace_entities_salted,
)
from tera_spark.operators.triples import replace_entities

E_SCHEMA = "u string, v string"
T_SCHEMA = "subject string, predicate string, object string, obj_is_literal boolean"


def test_cc_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "y"), ("z", "z")], E_SCHEMA
    )
    labels = {r.node: r.component for r in connected_components(edges).collect()}
    assert labels["a"] == labels["b"] == labels["c"] == labels["d"] == "a"
    assert labels["x"] == labels["y"] == "x"
    assert "z" not in labels  # self-loop only → dropped (no aliasing info)


def test_cc_long_chain_converges(spark):
    n = 40
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], E_SCHEMA
    )
    labels = connected_components(edges).collect()
    assert len(labels) == n + 1
    assert {r.component for r in labels} == {"n000"}


def test_canonical_mapping_transitive(spark):
    edges = spark.createDataFrame([("b", "a"), ("c", "b")], E_SCHEMA)
    m = {r.old: r.new for r in canonical_mapping(edges).collect()}
    assert m == {"b": "a", "c": "a"}


def test_canonicalize_rewrites_chains(spark):
    g = spark.createDataFrame(
        [
            ("c", "p", "lit", True),
            ("x", "p", "b", False),
            ("a", "p", "o", False),
        ],
        T_SCHEMA,
    )
    edges = spark.createDataFrame([("b", "a"), ("c", "b")], E_SCHEMA)
    out = {(r.subject, r.object) for r in canonicalize(g, edges).collect()}
    assert out == {("a", "lit"), ("x", "a"), ("a", "o")}


def test_salted_rewrite_equals_broadcast(spark):
    g = spark.createDataFrame(
        [(f"s{i % 3}", "p", f"o{i % 5}", False) for i in range(50)]
        + [("s0", "p", "hot", False)] * 1,
        T_SCHEMA,
    )
    mapping = spark.createDataFrame(
        [("s0", "S0"), ("o1", "O1"), ("hot", "HOT")], "old string, new string"
    )
    a = {tuple(r) for r in replace_entities(g, mapping).collect()}
    b = {tuple(r) for r in replace_entities_salted(g, mapping, salts=4).collect()}
    assert a == b
