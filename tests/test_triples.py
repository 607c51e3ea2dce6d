from pyspark.sql import functions as F

from tera_spark.operators.triples import (
    dedup,
    filter_pattern,
    replace_entities,
    to_ntriples,
    triple_count,
    union_graphs,
)

SCHEMA = "subject string, predicate string, object string, obj_is_literal boolean"


def g(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_union_set_semantics(spark):
    a = g(spark, [("s1", "p", "o1", False), ("s1", "p", "o1", False)])
    b = g(spark, [("s1", "p", "o1", False), ("s2", "p", "lit", True)])
    u = union_graphs(a, b)
    assert u.count() == 2
    assert triple_count(a) == 1


def test_filter_pattern(spark):
    gr = g(spark, [("s1", "p1", "o1", False), ("s1", "p2", "o2", False), ("s2", "p1", "o1", False)])
    assert filter_pattern(gr, subject="s1").count() == 2
    assert filter_pattern(gr, predicate="p1", obj="o1").count() == 2
    assert filter_pattern(gr, subject="s2", predicate="p1", obj="o1").count() == 1


def test_replace_entities(spark):
    gr = g(
        spark,
        [
            ("old1", "p", "x", False),
            ("x", "p", "old1", False),
            ("x", "p", "old1", True),  # literal object: not rewritten
            ("y", "p", "z", False),
        ],
    )
    mapping = spark.createDataFrame([("old1", "new1")], "old string, new string")
    out = replace_entities(gr, mapping)
    rows = {(r.subject, r.predicate, r.object, r.obj_is_literal) for r in out.collect()}
    assert rows == {
        ("new1", "p", "x", False),
        ("x", "p", "new1", False),
        ("x", "p", "old1", True),
        ("y", "p", "z", False),
    }


def test_replace_collapses_duplicates(spark):
    gr = g(spark, [("a", "p", "t", False), ("b", "p", "t", False)])
    mapping = spark.createDataFrame([("a", "c"), ("b", "c")], "old string, new string")
    assert replace_entities(gr, mapping).count() == 1


def test_ntriples_render(spark):
    gr = g(spark, [("http://e/s", "http://e/p", 'say "hi"', True)])
    line = to_ntriples(gr).collect()[0].line
    assert line == '<http://e/s> <http://e/p> "say \\"hi\\"" .'
