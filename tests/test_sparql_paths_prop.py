"""Property-based check of the SPARQL path compiler: random tiny graphs ×
random path ASTs, compared against an independent pure-Python set
evaluator. The brute evaluator computes PAIRS for every shape directly
(full closure over term space) and answers constant-object patterns by
filtering pairs on the destination — it never uses the compiler's AST
inversion or seeded node-set fold, so those transformations are validated
independently, term-identity flags and all.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tera_spark.operators.sparql import SparqlUnsupported, query_graph

NODES = ["n0", "n1", "n2", "n3"]
# "urn:b:n1" as a LITERAL collides lexically with node n1's URI after
# prefixing: the term-identity trap every join must survive
LITS = ["urn:b:n1", "v"]
PREDS = ["p", "q"]


# ---------------------------------------------------------------------------
# Brute evaluator: terms are (value, isuri); relations are pair sets.


def _atom_pairs(triples, pred):
    return {
        ((s, True), (o, not lit))
        for (s, p, o, lit) in triples
        if p == pred
    }


def _compose(a, b):
    return {(x, z) for (x, y1) in a for (y2, z) in b if y1 == y2}


def _closure(rel):
    out = set(rel)
    while True:
        nxt = _compose(out, rel) - out
        if not nxt:
            return out
        out |= nxt


def _terms(triples):
    out = set()
    for s, _p, o, lit in triples:
        out.add((s, True))
        out.add((o, not lit))
    return out


def brute_pairs(ast, triples):
    """Pairs of the path. Zero-length arms (star/opt) use the WHOLE term
    domain for their identity component — correct because the caller
    always intersects with a neighbor relation or a constant end, exactly
    the contexts the compiler supports."""
    k = ast[0]
    if k == "p":
        return _atom_pairs(triples, ast[1])
    if k == "inv":
        return {(b, a) for (a, b) in brute_pairs(ast[1], triples)}
    if k == "alt":
        out = set()
        for sub in ast[1]:
            out |= brute_pairs(sub, triples)
        return out
    if k == "seq":
        parts = [brute_pairs(sub, triples) for sub in ast[1]]
        out = parts[0]
        for p in parts[1:]:
            out = _compose(out, p)
        return out
    sub = brute_pairs(ast[1], triples)
    ident = {(t, t) for t in _terms(triples)}
    if k == "plus":
        return _closure(sub)
    if k == "star":
        return _closure(sub) | ident
    if k == "opt":
        return sub | ident
    raise AssertionError(k)


def render(ast) -> str:
    k = ast[0]
    if k == "p":
        return f"<urn:b:{ast[1]}>"
    if k == "inv":
        return f"(^{render(ast[1])})"
    if k == "alt":
        return "(" + "|".join(render(s) for s in ast[1]) + ")"
    if k == "seq":
        return "(" + "/".join(render(s) for s in ast[1]) + ")"
    mod = {"star": "*", "plus": "+", "opt": "?"}[k]
    return f"({render(ast[1])}){mod}"


# ---------------------------------------------------------------------------
# Strategies


def _paths(depth: int):
    atom = st.sampled_from(PREDS).map(lambda p: ("p", p))
    if depth == 0:
        return atom
    sub = _paths(depth - 1)
    return st.one_of(
        atom,
        sub.map(lambda s: ("inv", s)),
        st.lists(sub, min_size=2, max_size=2).map(lambda xs: ("alt", xs)),
        st.lists(sub, min_size=2, max_size=2).map(lambda xs: ("seq", xs)),
        atom.map(lambda s: ("star", s)),
        atom.map(lambda s: ("plus", s)),
        atom.map(lambda s: ("opt", s)),
    )


triples_st = st.lists(
    st.tuples(
        st.sampled_from(NODES),
        st.sampled_from(PREDS),
        st.sampled_from(NODES + LITS),
        st.booleans(),
    ),
    min_size=1,
    max_size=10,
    unique=True,
)


def _graph_df(spark, triples):
    return spark.createDataFrame(
        [(f"urn:b:{s}", f"urn:b:{p}", o if lit else f"urn:b:{o}", lit) for (s, p, o, lit) in triples],
        "subject string, predicate string, object string, obj_is_literal boolean",
    )


def _brute_term_pairs(ast, triples):
    """Brute pairs with the graph's URI prefixing applied, so values line
    up with what query_graph returns."""
    out = set()
    for (sv, si), (ov, oi) in brute_pairs(ast, triples):
        out.add(
            (
                (f"urn:b:{sv}" if si else sv, si),
                (f"urn:b:{ov}" if oi else ov, oi),
            )
        )
    return out


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(triples=triples_st, ast=_paths(2), mode=st.sampled_from(["vv", "cs", "co"]))
def test_path_compiler_matches_brute(spark, triples, ast, mode):
    g = _graph_df(spark, triples)
    expected = _brute_term_pairs(ast, triples)
    if mode == "vv":
        q = f"SELECT ?a ?b WHERE {{ ?a {render(ast)} ?b }}"
        try:
            got = {
                ((r.a, None), (r.b, None))
                for r in query_graph(g, q).collect()
            }
        except SparqlUnsupported:
            return  # refusal is the documented contract for unbounded zero arms
        assert {(a[0], b[0]) for a, b in got} == {
            (a[0], b[0]) for a, b in expected
        }
        return
    # constant end: pick the seed among subjects so cases aren't vacuous
    seed = triples[0][0]
    seed_term = (f"urn:b:{seed}", True)
    if mode == "cs":
        q = f"SELECT ?b WHERE {{ <urn:b:{seed}> {render(ast)} ?b }}"
        want = {b for (a, b) in expected if a == seed_term}
    else:
        q = f"SELECT ?a WHERE {{ ?a {render(ast)} <urn:b:{seed}> }}"
        want = {a for (a, b) in expected if b == seed_term}
    try:
        rows = query_graph(g, q).collect()
    except SparqlUnsupported:
        return
    col = "b" if mode == "cs" else "a"
    got_vals = {r[col] for r in rows}
    assert got_vals == {v for (v, _isuri) in want}
