"""Q15 SPARQL passthrough: the BGP→DataFrame compiler on a hand-built
graph, plus parser rejection of out-of-fragment constructs. The flagship
SPARQL string itself is oracle-checked end to end by the driver entry
q15_sparql_endpoint (same DuckDB oracle as q14_endpoint_star)."""

import pytest

from tera_spark.operators.sparql import (
    SparqlSyntaxError,
    SparqlUnsupported,
    query_graph,
)

NS = "urn:t:"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

TRIPLES = [
    # (subject, predicate, object, obj_is_literal)
    (NS + "c1", RDF + "type", NS + "Chem", False),
    (NS + "c2", RDF + "type", NS + "Chem", False),
    (NS + "t1", RDF + "type", NS + "Test", False),
    (NS + "c1", NS + "label", "copper", True),
    (NS + "c2", NS + "label", "zinc", True),
    (NS + "t1", NS + "chemical", NS + "c1", False),
    (NS + "t1", NS + "result", NS + "r1", False),
    (NS + "r1", RDF + "value", "42", True),
    # a literal whose value collides with a URI string: isURI must split them
    (NS + "c2", NS + "ref", NS + "c1", False),
    (NS + "c2", NS + "note", NS + "c1", True),
]


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(
        TRIPLES, "subject string, predicate string, object string, obj_is_literal boolean"
    ).cache()


def test_label_lookup(graph):
    q = "SELECT ?h WHERE { <%s> <%s> ?h . }" % (NS + "c1", NS + "label")
    assert [r.h for r in query_graph(graph, q).collect()] == ["copper"]


def test_type_query_with_prefixes_and_a(graph):
    q = "PREFIX t: <%s> SELECT ?s WHERE { ?s a t:Chem . }" % NS
    assert {r.s for r in query_graph(graph, q).collect()} == {NS + "c1", NS + "c2"}


def test_join_on_shared_var(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?lab ?v WHERE {
            ?test t:chemical ?c .
            ?c t:label ?lab .
            ?test t:result [ <%s> ?v ] .
        }""" % (RDF + "value")
    rows = query_graph(graph, q).collect()
    assert [(r.lab, r.v) for r in rows] == [("copper", "42")]


def test_optional_left_join(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s ?lab WHERE {
            ?s a t:Chem .
            OPTIONAL { ?s t:missingpred ?lab . }
        }"""
    rows = {(r.s, r.lab) for r in query_graph(graph, q).collect()}
    assert rows == {(NS + "c1", None), (NS + "c2", None)}


def test_filter_isuri_and_strstarts(graph):
    # the compounds() query shape (DataAccess.py:650-654)
    q = """
        PREFIX t: <urn:t:>
        SELECT ?z {
            ?s ?o ?z
            FILTER (isURI(?z) && STRSTARTS(str(?z), str(t:)) )
        }"""
    vals = {r.z for r in query_graph(graph, q).collect()}
    # NS+"c1" appears as a URI object (t:ref) AND a literal (t:note);
    # isURI keeps the URI binding, drops literals like "copper"/"42"
    assert NS + "c1" in vals and "copper" not in vals and "42" not in vals
    assert all(v.startswith(NS) for v in vals)


def test_filter_eq_and_limit(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(?l = "zinc") } LIMIT 5
    """
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c2"]
    q2 = "PREFIX t: <urn:t:> SELECT ?s WHERE { ?s a t:Chem . } LIMIT 1"
    assert len(query_graph(graph, q2).collect()) == 1


def test_distinct_set_semantics(graph):
    # two patterns both matching c1's label should still yield one row
    q = """
        PREFIX t: <urn:t:>
        SELECT ?lab WHERE { ?s t:label ?lab . ?s a t:Chem . }
    """
    labs = [r.lab for r in query_graph(graph, q).collect()]
    assert sorted(labs) == ["copper", "zinc"]


def test_unsupported_constructs_raise(graph):
    with pytest.raises(SparqlUnsupported):
        query_graph(graph, "SELECT ?s WHERE { { ?s ?p ?o } UNION { ?s ?p ?o } }")
    with pytest.raises((SparqlUnsupported, SparqlSyntaxError)):
        query_graph(graph, "SELECT ?s WHERE { ?s ?p ?o . FILTER(?s > 3) }")
    with pytest.raises(SparqlSyntaxError):
        query_graph(graph, "SELECT ?s WHERE { ?s unknown:px ?o . }")


def test_select_star_excludes_bnode_vars(graph):
    q = "PREFIX t: <urn:t:> SELECT * WHERE { ?s t:result [ ?p ?v ] . }"
    rows = query_graph(graph, q).collect()
    assert set(rows[0].asDict()) == {"s", "p", "v"}


def test_bnode_chain_plan_all_equijoins(spark, graph):
    # the flagship shape: bnode chain written properties-first — the
    # compiler must greedy-order joins so no step is a cross join
    q = """
        PREFIX t: <urn:t:>
        SELECT ?c ?v WHERE {
            ?test a t:Test ;
              t:chemical ?c ;
              t:result [ <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> ?v ] .
        }"""
    from tera_spark.operators.sparql import query_graph

    df = query_graph(graph, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert [(r.c, r.v) for r in df.collect()] == [(NS + "c1", "42")]
