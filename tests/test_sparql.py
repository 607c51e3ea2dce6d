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
        query_graph(graph, "SELECT ?s WHERE { GRAPH <urn:t:g> { ?s ?p ?o } }")
    with pytest.raises((SparqlUnsupported, SparqlSyntaxError)):
        query_graph(graph, 'SELECT ?s WHERE { ?s ?p ?o . FILTER(langMatches(lang(?o), "en")) }')
    # numeric < > against a non-numeric constant is refused, not guessed
    with pytest.raises(SparqlUnsupported):
        query_graph(graph, 'SELECT ?s WHERE { ?s ?p ?o . FILTER(?o > "abc") }')
    with pytest.raises(SparqlSyntaxError):
        query_graph(graph, "SELECT ?s WHERE { ?s unknown:px ?o . }")
    # UNION branches binding different variable sets would need NULL
    # bindings — refused rather than mis-joined
    with pytest.raises(SparqlUnsupported, match="different variable sets"):
        query_graph(
            graph,
            "PREFIX t: <urn:t:> SELECT ?s WHERE "
            "{ { ?s t:label ?l } UNION { ?s a t:Chem } }",
        )
    # zero-length path with both ends unbound has an unrestricted domain
    with pytest.raises(SparqlUnsupported, match="unrestricted domain"):
        query_graph(graph, "PREFIX t: <urn:t:> SELECT ?a ?b WHERE { ?a t:sub* ?b }")


# ---------------------------------------------------------------------------
# UNION and property paths


def test_union_same_vars(graph):
    # alternate predicates — the fragment's canonical UNION use
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s ?x WHERE {
            { ?s t:label ?x } UNION { ?s t:ref ?x }
        }"""
    rows = {(r.s, r.x) for r in query_graph(graph, q).collect()}
    assert rows == {
        (NS + "c1", "copper"),
        (NS + "c2", "zinc"),
        (NS + "c2", NS + "c1"),
    }


def test_union_joined_with_outer_pattern(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s ?x WHERE {
            ?s a t:Chem .
            { ?s t:label ?x } UNION { ?s t:note ?x }
        }"""
    rows = {(r.s, r.x) for r in query_graph(graph, q).collect()}
    assert rows == {
        (NS + "c1", "copper"),
        (NS + "c2", "zinc"),
        (NS + "c2", NS + "c1"),  # the literal-typed note
    }


def test_union_three_branches_dedup(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE {
            { ?s t:label "copper" } UNION { ?s t:label "zinc" } UNION { ?s a t:Chem }
        }"""
    assert {r.s for r in query_graph(graph, q).collect()} == {NS + "c1", NS + "c2"}


@pytest.fixture(scope="module")
def chain_graph(spark):
    # a 4-deep subClassOf-style chain with a branch:
    #   d1 -> c1 -> b1 -> a1 ;  d2 -> c1 ;  unrelated x1 -> x0
    NSB = "urn:t:"
    rows = [
        (NSB + "d1", NSB + "sub", NSB + "c1", False),
        (NSB + "d2", NSB + "sub", NSB + "c1", False),
        (NSB + "c1", NSB + "sub", NSB + "b1", False),
        (NSB + "b1", NSB + "sub", NSB + "a1", False),
        (NSB + "x1", NSB + "sub", NSB + "x0", False),
        (NSB + "d1", NSB + "label", "dee-one", True),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string, obj_is_literal boolean"
    ).cache()


def test_path_star_descendants(chain_graph):
    # all classes under b1, b1 itself included (zero-length arm)
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { ?x t:sub* t:b1 }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {
        NS + "b1",
        NS + "c1",
        NS + "d1",
        NS + "d2",
    }


def test_path_plus_excludes_seed(chain_graph):
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { ?x t:sub+ t:b1 }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {
        NS + "c1",
        NS + "d1",
        NS + "d2",
    }


def test_path_star_ancestors(chain_graph):
    # constant subject, variable object: forward reachability
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { t:d1 t:sub* ?x }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {
        NS + "d1",
        NS + "c1",
        NS + "b1",
        NS + "a1",
    }


def test_path_plus_var_var_pairs(chain_graph):
    q = "PREFIX t: <urn:t:> SELECT ?a ?b WHERE { ?a t:sub+ ?b }"
    pairs = {(r.a, r.b) for r in query_graph(chain_graph, q).collect()}
    assert (NS + "d1", NS + "a1") in pairs  # 3-hop transitivity
    assert (NS + "x1", NS + "x0") in pairs
    assert (NS + "d1", NS + "d2") not in pairs
    assert len(pairs) == 10


def test_path_joined_with_bgp(chain_graph):
    # path slice participates in the join tree like any pattern
    q = """
        PREFIX t: <urn:t:>
        SELECT ?lab WHERE { ?x t:sub+ t:a1 . ?x t:label ?lab }"""
    assert [r.lab for r in query_graph(chain_graph, q).collect()] == ["dee-one"]


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


# ---------------------------------------------------------------------------
# VALUES, ORDER BY / OFFSET, GROUP BY / aggregates (SPARQL 1.1 additions
# beyond the reference's fragment — oracle-checked end to end by the
# driver entries q18_sparql_values_order and q19_sparql_groupby_count)


def test_values_single_var(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s ?lab WHERE {
            VALUES ?s { t:c1 t:c2 t:nosuch }
            ?s t:label ?lab .
        }"""
    rows = {(r.s, r.lab) for r in query_graph(graph, q).collect()}
    assert rows == {(NS + "c1", "copper"), (NS + "c2", "zinc")}


def test_values_multi_var_and_literals(graph):
    # multi-var row form; a literal cell must match only literal objects
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE {
            VALUES (?s ?lab) { (t:c1 "copper") (t:c2 "wrong") }
            ?s t:label ?lab .
        }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c1"]
    # the literal "urn:t:c1" (t:note) and the URI <urn:t:c1> (t:ref) must
    # not cross-match a URI VALUES cell
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?p WHERE { VALUES ?o { t:c1 } t:c2 ?p ?o . }"""
    assert {r.p for r in query_graph(graph, q2).collect()} == {NS + "ref"}


def test_values_is_broadcast_joined_first(spark, graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s ?lab WHERE { VALUES ?s { t:c1 } ?s t:label ?lab . }"""
    plan = query_graph(graph, q)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_order_by_offset_limit(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?lab WHERE { ?s t:label ?lab . } ORDER BY DESC(?lab) LIMIT 1
    """
    assert [r.lab for r in query_graph(graph, q).collect()] == ["zinc"]
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?lab WHERE { ?s t:label ?lab . } ORDER BY ?lab OFFSET 1 LIMIT 1
    """
    assert [r.lab for r in query_graph(graph, q2).collect()] == ["zinc"]


def test_group_by_count(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?type (COUNT(*) AS ?n) WHERE { ?s a ?type . }
        GROUP BY ?type ORDER BY DESC(?n)
    """
    rows = [(r.type, r.n) for r in query_graph(graph, q).collect()]
    assert rows == [(NS + "Chem", 2), (NS + "Test", 1)]


def test_global_aggregates_and_count_distinct(graph):
    q = "PREFIX t: <urn:t:> SELECT (COUNT(?s) AS ?n) WHERE { ?s t:label ?o . }"
    assert query_graph(graph, q).collect()[0].n == 2
    # bag semantics: ?s ?p ?o over 10 triples counts 10, not DISTINCT subjects
    q2 = "SELECT (COUNT(*) AS ?n) (COUNT(DISTINCT ?s) AS ?d) WHERE { ?s ?p ?o . }"
    row = query_graph(graph, q2).collect()[0]
    assert (row.n, row.d) == (10, 4)
    q3 = """
        PREFIX t: <urn:t:> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT (SUM(?v) AS ?tot) (MIN(?v) AS ?lo) WHERE { ?r rdf:value ?v . }
    """
    row = query_graph(graph, q3).collect()[0]
    assert (row.tot, row.lo) == (42.0, "42")


def test_aggregate_misuse_raises(graph):
    # non-aggregated SELECT var outside GROUP BY
    with pytest.raises(SparqlSyntaxError, match="outside GROUP BY"):
        query_graph(
            graph, "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o . }"
        ).collect()
    with pytest.raises(SparqlUnsupported, match="UNDEF"):
        query_graph(graph, "SELECT ?s WHERE { VALUES ?s { UNDEF } ?s ?p ?o . }")
    with pytest.raises(SparqlUnsupported, match="expression"):
        query_graph(graph, "SELECT (SUM(STRLEN(?s)) AS ?x) WHERE { ?s ?p ?o . }")
    # ORDER BY a variable the projection dropped
    with pytest.raises(SparqlUnsupported, match="unprojected"):
        query_graph(graph, "SELECT ?s WHERE { ?s ?p ?o . } ORDER BY ?p")


# ---------------------------------------------------------------------------
# BIND, MINUS, FILTER || / != (round-4 fragment extensions)


def test_bind_concat_str_const(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s ?tag WHERE {
            ?s t:label ?l .
            BIND(CONCAT("chem/", STR(?l), "!") AS ?tag)
        }"""
    rows = {(r.s, r.tag) for r in query_graph(graph, q).collect()}
    assert rows == {
        (NS + "c1", "chem/copper!"),
        (NS + "c2", "chem/zinc!"),
    }


def test_bind_var_copy_preserves_isuri(graph):
    # copying a URI-bound variable keeps term identity: isURI(?alias) holds
    q = """
        PREFIX t: <urn:t:>
        SELECT ?alias WHERE {
            ?t t:chemical ?c .
            BIND(?c AS ?alias)
            FILTER(isURI(?alias))
        }"""
    assert [r.alias for r in query_graph(graph, q).collect()] == [NS + "c1"]
    # while a CONCAT result is a plain literal: isURI(?tag) filters all rows
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?tag WHERE {
            ?t t:chemical ?c .
            BIND(CONCAT(STR(?c)) AS ?tag)
            FILTER(isURI(?tag))
        }"""
    assert query_graph(graph, q2).count() == 0


def test_bind_misuse_raises(graph):
    # output-only rule: a bind consumed by a pattern is refused loudly
    with pytest.raises((SparqlUnsupported, SparqlSyntaxError)):
        query_graph(
            graph,
            'PREFIX t: <urn:t:> SELECT ?s WHERE '
            '{ BIND("copper" AS ?l) ?s t:label ?l . }',
        )
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        query_graph(
            graph,
            "PREFIX t: <urn:t:> SELECT ?x WHERE "
            "{ ?s t:label ?l . BIND(CONCAT(?nope) AS ?x) }",
        )
    with pytest.raises(SparqlUnsupported, match="fragment"):
        query_graph(
            graph,
            "PREFIX t: <urn:t:> SELECT ?x WHERE "
            "{ ?s t:label ?l . BIND(NOW() AS ?x) }",
        )


def test_minus_removes_compatible(graph):
    # chems that are NOT referenced by any test
    q = """
        PREFIX t: <urn:t:>
        SELECT ?c WHERE {
            ?c a t:Chem .
            MINUS { ?t t:chemical ?c . }
        }"""
    assert {r.c for r in query_graph(graph, q).collect()} == {NS + "c2"}


def test_minus_disjoint_domain_is_noop(graph):
    # SPARQL 1.1 §8.3: no shared variable -> nothing is compatible ->
    # MINUS removes nothing (even though the right side has rows)
    q = """
        PREFIX t: <urn:t:>
        SELECT ?c WHERE {
            ?c a t:Chem .
            MINUS { ?z t:label "copper" . }
        }"""
    assert query_graph(graph, q).count() == 2


def test_minus_respects_term_identity(graph):
    # c2 t:ref  c1 (URI)  and  c2 t:note "urn:t:c1" (literal with the same
    # lexical form): MINUS over the URI binding must not remove the literal
    q = """
        PREFIX t: <urn:t:>
        SELECT ?v WHERE {
            <urn:t:c2> t:note ?v .
            MINUS { <urn:t:c2> t:ref ?v . }
        }"""
    assert [r.v for r in query_graph(graph, q).collect()] == [NS + "c1"]


def test_minus_over_optional_binding_raises(graph):
    with pytest.raises(SparqlUnsupported, match="OPTIONAL"):
        query_graph(
            graph,
            """
            PREFIX t: <urn:t:>
            SELECT ?c WHERE {
                ?c a t:Chem .
                OPTIONAL { ?c t:label ?l . }
                MINUS { ?x t:label ?l . }
            }""",
        )


def test_filter_or_and_neq(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE {
            ?s t:label ?l .
            FILTER(?l = "copper" || ?l = "zinc")
            FILTER(?s != <urn:t:c1>)
        }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c2"]
    # nested parens mix && under ||
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE {
            ?s t:label ?l .
            FILTER((?l = "copper" && ?s = <urn:t:c1>) || ?l = "zinc")
        }"""
    assert {r.s for r in query_graph(graph, q2).collect()} == {NS + "c1", NS + "c2"}
    # unparenthesized mixing is refused, not guessed
    with pytest.raises(SparqlUnsupported, match="parenthesize"):
        query_graph(
            graph,
            'PREFIX t: <urn:t:> SELECT ?s WHERE '
            '{ ?s t:label ?l . FILTER(?l = "a" && ?l = "b" || ?l = "c") }',
        )


def test_filter_exists_correlated(graph):
    # chems referenced by at least one test
    q = """
        PREFIX t: <urn:t:>
        SELECT ?c WHERE {
            ?c a t:Chem .
            FILTER EXISTS { ?t t:chemical ?c . }
        }"""
    assert {r.c for r in query_graph(graph, q).collect()} == {NS + "c1"}


def test_filter_not_exists_correlated(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?c WHERE {
            ?c a t:Chem .
            FILTER NOT EXISTS { ?t t:chemical ?c . }
        }"""
    assert {r.c for r in query_graph(graph, q).collect()} == {NS + "c2"}


def test_filter_exists_uncorrelated_global(graph):
    # no shared variable: a GLOBAL emptiness test, not a no-op (the
    # §8.1.1 difference from MINUS) — inner matches, so all rows survive
    q = """
        PREFIX t: <urn:t:>
        SELECT ?c WHERE {
            ?c a t:Chem .
            FILTER EXISTS { ?z t:label "copper" . }
        }"""
    assert query_graph(graph, q).count() == 2
    # inner empty -> EXISTS keeps nothing, NOT EXISTS keeps everything
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?c WHERE {
            ?c a t:Chem .
            FILTER EXISTS { ?z t:label "nope" . }
        }"""
    assert query_graph(graph, q2).count() == 0
    q3 = """
        PREFIX t: <urn:t:>
        SELECT ?c WHERE {
            ?c a t:Chem .
            FILTER NOT EXISTS { ?z t:label "nope" . }
        }"""
    assert query_graph(graph, q3).count() == 2


def test_not_exists_respects_term_identity(graph):
    # the literal "urn:t:c1" note must survive NOT EXISTS over the URI ref
    q = """
        PREFIX t: <urn:t:>
        SELECT ?v WHERE {
            <urn:t:c2> t:note ?v .
            FILTER NOT EXISTS { <urn:t:c2> t:ref ?v . }
        }"""
    assert [r.v for r in query_graph(graph, q).collect()] == [NS + "c1"]


def test_ask_true_false(graph):
    q = 'PREFIX t: <urn:t:> ASK { ?c a t:Chem . FILTER(?c = <urn:t:c1>) }'
    assert [r.ask for r in query_graph(graph, q).collect()] == [True]
    q2 = 'PREFIX t: <urn:t:> ASK WHERE { ?s t:label "nope" . }'
    assert [r.ask for r in query_graph(graph, q2).collect()] == [False]


def test_construct_basic(graph):
    # rewrite label edges into a new vocabulary; tag the subject type
    q = """
        PREFIX t: <urn:t:>
        PREFIX o: <urn:o:>
        CONSTRUCT {
            ?c o:name ?l .
            ?c a o:Thing .
        } WHERE { ?c t:label ?l . }"""
    out = query_graph(graph, q)
    assert out.columns == ["subject", "predicate", "object", "obj_is_literal"]
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        (NS + "c1", "urn:o:name", "copper", True),
        (NS + "c2", "urn:o:name", "zinc", True),
        (NS + "c1", RDF + "type", "urn:o:Thing", False),
        (NS + "c2", RDF + "type", "urn:o:Thing", False),
    }


def test_construct_composes_with_query(graph):
    # a constructed graph is itself queryable (closure property)
    q = """
        PREFIX t: <urn:t:>
        PREFIX o: <urn:o:>
        CONSTRUCT { ?c o:name ?l . } WHERE { ?c t:label ?l . }"""
    derived = query_graph(graph, q)
    back = query_graph(
        derived, 'PREFIX o: <urn:o:> SELECT ?l WHERE { <urn:t:c2> o:name ?l . }'
    )
    assert [r.l for r in back.collect()] == ["zinc"]


def test_construct_skips_literal_in_subject_position(graph):
    # ?v binds the literal "urn:t:c1" (note) AND the URI urn:t:c1 (ref);
    # using ?v as CONSTRUCT subject must keep only the URI instantiation
    q = """
        PREFIX t: <urn:t:>
        CONSTRUCT { ?v t:seen "y" . } WHERE { <urn:t:c2> ?p ?v . }"""
    rows = {tuple(r) for r in query_graph(graph, q).collect()}
    assert rows == {
        (NS + "c1", NS + "seen", "y", True),
        (NS + "Chem", NS + "seen", "y", True),
    }


def test_construct_skips_unbound_optional(graph):
    # t1 has no t:label; the OPTIONAL leaves ?l null -> no triple emitted
    q = """
        PREFIX t: <urn:t:>
        CONSTRUCT { ?s t:copy ?l . } WHERE {
            ?s a ?type .
            OPTIONAL { ?s t:label ?l . }
        }"""
    rows = {tuple(r) for r in query_graph(graph, q).collect()}
    assert rows == {
        (NS + "c1", NS + "copy", "copper", True),
        (NS + "c2", NS + "copy", "zinc", True),
    }


def test_construct_rejects_out_of_fragment():
    import pyspark.sql.functions as F  # noqa: F401 - parse-only tests below

    from tera_spark.operators.sparql import _Parser, _tokenize

    with pytest.raises(SparqlSyntaxError):
        _Parser(
            _tokenize('CONSTRUCT { ?s ?p ?o . FILTER(?s = "x") } WHERE { ?s ?p ?o . }'),
            {},
        ).parse_query()
    with pytest.raises(SparqlSyntaxError):
        _Parser(
            _tokenize('CONSTRUCT { "lit" <urn:p> ?o . } WHERE { ?s <urn:p> ?o . }'),
            {},
        ).parse_query()


# ---------------------------------------------------------------------------
# Generalized property paths: sequence / alternation / inverse / '?' /
# closures nested in sequences (SPARQL 1.1 §9 fragment)


def test_path_sequence(graph):
    # two-hop sequence ending at a literal
    q = "PREFIX t: <urn:t:> SELECT ?l WHERE { ?t t:chemical/t:label ?l }"
    assert [r.l for r in query_graph(graph, q).collect()] == ["copper"]


def test_path_alternation(graph):
    # c2's label (literal "zinc") OR note (literal whose lexical form
    # collides with the c1 URI) — both come back, with literal kind
    q = "PREFIX t: <urn:t:> SELECT ?v WHERE { t:c2 (t:label|t:note) ?v }"
    assert {r.v for r in query_graph(graph, q).collect()} == {"zinc", NS + "c1"}


def test_path_inverse(graph):
    q = "PREFIX t: <urn:t:> SELECT ?t WHERE { t:c1 ^t:chemical ?t }"
    assert [r.t for r in query_graph(graph, q).collect()] == [NS + "t1"]


def test_path_inverse_in_sequence(graph):
    # t1 --chemical--> c1 <--ref-- c2 : inverse step mid-sequence
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { t:t1 t:chemical/^t:ref ?x }"
    assert [r.x for r in query_graph(graph, q).collect()] == [NS + "c2"]


def test_path_respects_term_identity_through_literals(graph):
    # c2 t:note "urn:t:c1" is a LITERAL whose lexical form equals the c1
    # URI; the sequence's middle node after t:chemical is the c1 URI, so
    # ^t:note (whose source side is that literal) must NOT join it.
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { t:t1 t:chemical/^t:note ?x }"
    assert query_graph(graph, q).count() == 0


def test_path_opt_modifier(chain_graph):
    # d2 --sub--> c1 (--sub--> b1)? : zero-or-one arm
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { t:d2 t:sub/t:sub? ?x }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {
        NS + "c1",
        NS + "b1",
    }


def test_path_star_in_seeded_sequence(chain_graph):
    # the zero-length arm of t:sub* keeps the seed d1 itself in the node
    # set, so its own label is reachable
    q = "PREFIX t: <urn:t:> SELECT ?l WHERE { t:d1 t:sub*/t:label ?l }"
    assert [r.l for r in query_graph(chain_graph, q).collect()] == ["dee-one"]


def test_path_star_mid_sequence_var_var(chain_graph):
    # ?x t:sub/t:sub* ?y == t:sub+ pairs: the accumulated prefix relation
    # bounds the closure's zero arm
    q = "PREFIX t: <urn:t:> SELECT ?a ?b WHERE { ?a t:sub/t:sub* ?b }"
    pairs = {(r.a, r.b) for r in query_graph(chain_graph, q).collect()}
    assert (NS + "d1", NS + "a1") in pairs
    assert len(pairs) == 10


def test_path_alt_under_closure(chain_graph):
    # closure over an alternation: sub+ pairs plus d1's one label edge
    q = "PREFIX t: <urn:t:> SELECT ?a ?b WHERE { ?a (t:sub|t:label)+ ?b }"
    pairs = {(r.a, r.b) for r in query_graph(chain_graph, q).collect()}
    assert (NS + "d1", "dee-one") in pairs
    assert (NS + "d1", NS + "a1") in pairs
    assert len(pairs) == 11


def test_path_star_leading_unseeded_sequence_raises(chain_graph):
    q = "PREFIX t: <urn:t:> SELECT ?a ?b WHERE { ?a t:sub*/t:label ?b }"
    with pytest.raises(SparqlUnsupported, match="unrestricted domain"):
        query_graph(chain_graph, q)


def test_path_same_var_both_ends(chain_graph):
    # cycles only — the chain fixture is acyclic, so no solutions
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { ?x t:sub+ ?x }"
    assert query_graph(chain_graph, q).count() == 0


def test_path_negated_property_set_forward(graph):
    # everything except label/ref/note/type: chemical, result, value edges
    q = (
        "PREFIX t: <urn:t:> "
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "SELECT ?s ?o WHERE { ?s !(t:label|t:ref|t:note|rdf:type) ?o }"
    )
    pairs = {(r.s, r.o) for r in query_graph(graph, q).collect()}
    assert pairs == {
        (NS + "t1", NS + "c1"),
        (NS + "t1", NS + "r1"),
        (NS + "r1", "42"),
    }


def test_path_negated_property_set_single_iri(graph):
    # constant subject + bare !iri form: seeded evaluation; t1's
    # non-result edges are rdf:type -> Test and chemical -> c1
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { t:t1 !t:result ?x }"
    assert {r.x for r in query_graph(graph, q).collect()} == {
        NS + "c1",
        NS + "Test",
    }


def test_path_negated_property_set_inverse_members(chain_graph):
    # only ^-members → reversed edges only, with pred ∉ {label}
    q = "PREFIX t: <urn:t:> SELECT ?x ?y WHERE { ?x !(^t:label) ?y }"
    pairs = {(r.x, r.y) for r in query_graph(chain_graph, q).collect()}
    assert pairs == {
        (NS + "c1", NS + "d1"),
        (NS + "c1", NS + "d2"),
        (NS + "b1", NS + "c1"),
        (NS + "a1", NS + "b1"),
        (NS + "x0", NS + "x1"),
    }


def test_path_quantifier_exact(chain_graph):
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { ?x t:sub{2} t:a1 }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {NS + "c1"}


def test_path_quantifier_range(chain_graph):
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { t:d1 t:sub{1,2} ?x }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {
        NS + "c1",
        NS + "b1",
    }


def test_path_quantifier_open_upper(chain_graph):
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { ?x t:sub{2,} t:a1 }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {
        NS + "c1",
        NS + "d1",
        NS + "d2",
    }


def test_path_quantifier_zero_lower(chain_graph):
    # {0,m} keeps the zero-length arm: the seed itself is a solution
    q = "PREFIX t: <urn:t:> SELECT ?x WHERE { t:d1 t:sub{0,2} ?x }"
    assert {r.x for r in query_graph(chain_graph, q).collect()} == {
        NS + "d1",
        NS + "c1",
        NS + "b1",
    }


def test_path_quantifier_bad_bounds(chain_graph):
    with pytest.raises(SparqlSyntaxError, match="upper bound"):
        query_graph(
            chain_graph, "PREFIX t: <urn:t:> SELECT ?x WHERE { t:d1 t:sub{3,2} ?x }"
        )
    with pytest.raises(SparqlUnsupported, match="zero-length-only"):
        query_graph(
            chain_graph, "PREFIX t: <urn:t:> SELECT ?x WHERE { t:d1 t:sub{0} ?x }"
        )


# ---------------------------------------------------------------------------
# Numeric FILTER comparisons, HAVING, DESCRIBE


def test_filter_numeric_compare(graph):
    rdfp = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    q = (
        f"PREFIX rdf: <{rdfp}> SELECT ?r WHERE "
        "{ ?r rdf:value ?v . FILTER(?v > 40) }"
    )
    assert [r.r for r in query_graph(graph, q).collect()] == [NS + "r1"]
    q2 = (
        f"PREFIX rdf: <{rdfp}> SELECT ?r WHERE "
        "{ ?r rdf:value ?v . FILTER(?v <= 40) }"
    )
    assert query_graph(graph, q2).count() == 0


def test_filter_numeric_drops_non_numeric_lexicals(graph):
    # every object is either a URI or a non-numeric literal except "42";
    # non-numeric lexical forms cast to NULL and the solution drops
    # (SPARQL type-error semantics), never errors
    q = "SELECT ?s WHERE { ?s ?p ?o . FILTER(?o > 1000) }"
    assert query_graph(graph, q).count() == 0
    q2 = "SELECT ?o WHERE { ?s ?p ?o . FILTER(?o >= 42) }"
    assert [r.o for r in query_graph(graph, q2).collect()] == ["42"]


def test_having_filters_groups(graph):
    q = """
        SELECT ?t (COUNT(?s) AS ?n) WHERE { ?s a ?t }
        GROUP BY ?t HAVING(COUNT(?s) >= 2)"""
    rows = query_graph(graph, q).collect()
    assert [(r.t, r.n) for r in rows] == [(NS + "Chem", 2)]


def test_having_without_select_aggregate(graph):
    q = "SELECT ?t WHERE { ?s a ?t } GROUP BY ?t HAVING(COUNT(?s) = 1)"
    assert [r.t for r in query_graph(graph, q).collect()] == [NS + "Test"]


def test_having_chained_and_non_numeric_raises(graph):
    q = """
        SELECT ?t WHERE { ?s a ?t }
        GROUP BY ?t HAVING(COUNT(?s) >= 1 && COUNT(DISTINCT ?s) < 2)"""
    assert [r.t for r in query_graph(graph, q).collect()] == [NS + "Test"]
    with pytest.raises(SparqlUnsupported):
        query_graph(
            graph,
            'SELECT ?t WHERE { ?s a ?t } GROUP BY ?t HAVING(COUNT(?s) > "x")',
        )


def test_describe_constant(graph):
    out = query_graph(graph, "DESCRIBE <urn:t:c2>")
    assert out.columns == ["subject", "predicate", "object", "obj_is_literal"]
    rows = out.collect()
    assert len(rows) == 4 and {r.subject for r in rows} == {NS + "c2"}


def test_describe_var_where_composes(graph):
    q = "PREFIX t: <urn:t:> DESCRIBE ?c WHERE { ?c a t:Chem }"
    desc = query_graph(graph, q)
    assert desc.count() == 6  # c1: type+label ; c2: type+label+ref+note
    # the description is a graph frame: query it again
    labs = query_graph(
        desc, "PREFIX t: <urn:t:> SELECT ?l WHERE { ?c t:label ?l }"
    )
    assert {r.l for r in labs.collect()} == {"copper", "zinc"}


def test_describe_var_without_where_raises(graph):
    with pytest.raises(SparqlSyntaxError, match="without a WHERE"):
        query_graph(graph, "DESCRIBE ?x")


# ---------------------------------------------------------------------------
# Subqueries (SPARQL 1.1 §12)


def test_subquery_aggregate_joined_with_outer(graph):
    # per-type counts computed in a subquery, joined to the outer pattern
    # binding each type's instances — the "aggregate per key then use it"
    # shape subqueries exist for
    q = """
        SELECT ?s ?t ?n WHERE {
            { SELECT ?t (COUNT(?x) AS ?n) WHERE { ?x a ?t } GROUP BY ?t }
            ?s a ?t .
        }"""
    rows = {(r.s, r.t, r.n) for r in query_graph(graph, q).collect()}
    assert rows == {
        (NS + "c1", NS + "Chem", 2),
        (NS + "c2", NS + "Chem", 2),
        (NS + "t1", NS + "Test", 1),
    }


def test_subquery_plain_projection_narrows(graph):
    # subquery projects a narrower binding set; outer OPTIONAL hangs off it
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s ?lab WHERE {
            { SELECT ?s WHERE { ?s a t:Chem } }
            OPTIONAL { ?s t:label ?lab }
        }"""
    rows = {(r.s, r.lab) for r in query_graph(graph, q).collect()}
    assert rows == {(NS + "c1", "copper"), (NS + "c2", "zinc")}


def test_subquery_respects_term_identity(graph):
    # the subquery projects object bindings: URI c1 (via t:ref) and the
    # LITERAL "urn:t:c1" (via t:note) are different terms — joining the
    # outer type pattern must keep only the URI
    q = """
        PREFIX t: <urn:t:>
        SELECT ?z WHERE {
            { SELECT ?z WHERE { ?s ?p ?z } }
            ?z a t:Chem .
        }"""
    rows = [r.z for r in query_graph(graph, q).collect()]
    assert rows == [NS + "c1"]  # c1 is the only Chem in object position


def test_subquery_group_by_groups_on_term_identity(graph):
    # GROUP BY ?z must keep the URI c1 and the literal "urn:t:c1" apart:
    # both lexical forms appear in object position (t:ref vs t:note)
    q = """
        SELECT ?z (COUNT(?s) AS ?n) WHERE { ?s ?p ?z } GROUP BY ?z
    """
    rows = [(r.z, r.n) for r in query_graph(graph, q).collect()]
    counts = {}
    for z, n in rows:
        counts[z] = counts.get(z, 0) + 1
    assert counts[NS + "c1"] == 2  # two groups with the same lexical form


def test_subquery_select_star_raises(graph):
    with pytest.raises(SparqlUnsupported, match="subquery"):
        query_graph(
            graph,
            "SELECT ?s WHERE { { SELECT * WHERE { ?s ?p ?o } } }",
        )


# ---------------------------------------------------------------------------
# Group-scoped FILTER: BOUND / ! / IN (filters run after OPTIONAL per
# SPARQL 1.1 §18.2.2.7)


def test_filter_not_bound_after_optional(graph):
    # the "antijoin via OPTIONAL + !BOUND" classic: Chems WITHOUT a ref
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE {
            ?s a t:Chem .
            OPTIONAL { ?s t:ref ?r }
            FILTER(!BOUND(?r))
        }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c1"]


def test_filter_bound_after_optional(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE {
            ?s a t:Chem .
            OPTIONAL { ?s t:ref ?r }
            FILTER(BOUND(?r))
        }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c2"]


def test_filter_eq_on_optional_var_drops_unbound(graph):
    # comparison against an unbound binding is a type error: the row
    # drops instead of erroring (NULL propagation == SPARQL error-drop)
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE {
            ?s a t:Chem .
            OPTIONAL { ?s t:ref ?r }
            FILTER(?r = t:c1)
        }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c2"]


def test_filter_in_and_not_in(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(?l IN ("copper", "lead")) }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c1"]
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(?l NOT IN ("copper", "lead")) }"""
    assert [r.s for r in query_graph(graph, q2).collect()] == [NS + "c2"]


def test_filter_negated_isuri(graph):
    # !isURI over object bindings keeps only literals
    q = """
        PREFIX t: <urn:t:>
        SELECT ?z WHERE { <urn:t:c2> ?p ?z . FILTER(!isURI(?z)) }"""
    vals = {r.z for r in query_graph(graph, q).collect()}
    assert vals == {"zinc", NS + "c1"}  # the literal-typed note, not the ref


# ---------------------------------------------------------------------------
# FILTER string functions: CONTAINS / STRENDS / REGEX / STRLEN


def test_filter_contains_and_strends(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(CONTAINS(?l, "opp")) }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c1"]
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(STRENDS(?l, "nc")) }"""
    assert [r.s for r in query_graph(graph, q2).collect()] == [NS + "c2"]


def test_filter_regex_with_flag(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(REGEX(?l, "^COP.*R$", "i")) }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c1"]
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(!REGEX(?l, "c")) }"""
    # 'copper' matches, 'zinc' matches; negation keeps nothing
    assert query_graph(graph, q2).count() == 0


def test_filter_regex_bad_flags_raises(graph):
    with pytest.raises(SparqlUnsupported):
        query_graph(
            graph,
            'SELECT ?s WHERE { ?s <urn:t:label> ?l . FILTER(REGEX(?l, "x", "q")) }',
        )


def test_filter_strlen(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(STRLEN(?l) > 4) }"""
    assert [r.s for r in query_graph(graph, q).collect()] == [NS + "c1"]
    q2 = """
        PREFIX t: <urn:t:>
        SELECT ?s WHERE { ?s t:label ?l . FILTER(STRLEN(?l) = 4) }"""
    assert [r.s for r in query_graph(graph, q2).collect()] == [NS + "c2"]


# ---------------------------------------------------------------------------
# GROUP_CONCAT / SAMPLE aggregates


def test_group_concat_sorted_with_separator(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?k (GROUP_CONCAT(?l; SEPARATOR="|") AS ?labs) WHERE {
            ?s a t:Chem . ?s t:label ?l . ?s a ?k .
        } GROUP BY ?k"""
    rows = query_graph(graph, q).collect()
    assert [(r.k, r.labs) for r in rows] == [(NS + "Chem", "copper|zinc")]


def test_group_concat_default_separator_and_distinct(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT (GROUP_CONCAT(DISTINCT ?l) AS ?labs) WHERE { ?s t:label ?l }"""
    assert query_graph(graph, q).collect()[0].labs == "copper zinc"


def test_sample_is_deterministic_min(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT (SAMPLE(?l) AS ?one) WHERE { ?s t:label ?l }"""
    assert query_graph(graph, q).collect()[0].one == "copper"


# ---------------------------------------------------------------------------
# SELECT projection expressions: (expr AS ?v)


def test_select_expression_concat(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT ?s (CONCAT("label:", STR(?l)) AS ?tag) WHERE { ?s t:label ?l }"""
    rows = {(r.s, r.tag) for r in query_graph(graph, q).collect()}
    assert rows == {(NS + "c1", "label:copper"), (NS + "c2", "label:zinc")}


def test_select_expression_rename_and_const(graph):
    q = """
        PREFIX t: <urn:t:>
        SELECT (?l AS ?name) ("x" AS ?mark) WHERE { <urn:t:c1> t:label ?l }"""
    r = query_graph(graph, q).collect()[0]
    assert (r.name, r.mark) == ("copper", "x")


def test_select_expression_with_groupby_raises(graph):
    with pytest.raises(SparqlUnsupported, match="BIND the expression"):
        query_graph(
            graph,
            """PREFIX t: <urn:t:>
            SELECT (STR(?k) AS ?x) (COUNT(*) AS ?n)
            WHERE { ?s a ?k } GROUP BY ?k""",
        )
