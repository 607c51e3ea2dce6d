"""Q15 — raw SPARQL passthrough (``DataAccess.query``,
/root/reference/tera/DataAccess.py:85-105), the one reference surface
previously out of scope.

The reference hands arbitrary SPARQL strings to rdflib. A Spark-first
engine can't embed a SPARQL endpoint, but every query the reference's own
code issues (DataAccess.py:650, 695-775, 978-1022) lives in one small
fragment: basic graph patterns with ``;``/``,`` abbreviations and ``[...]``
blank-node property lists, ``OPTIONAL`` groups, and ``FILTER`` over
``isURI`` / ``STRSTARTS`` / equality, plus ``PREFIX`` and ``LIMIT``. This
module compiles exactly that fragment into DataFrame dataflow over the
triples frame (subject, predicate, object, obj_is_literal):

- each triple pattern → a filtered/renamed slice of the graph (constant
  terms become pushed-down scan filters — on the predicate-partitioned
  materialized graph each slice is a partition-pruned read);
- shared variables between patterns → equi-joins (Catalyst orders them);
- ``OPTIONAL`` group → left join on the shared variables;
- ``FILTER`` → column predicates (``isURI(?v)`` uses the captured
  ``obj_is_literal`` flag when ``?v`` was bound in object position);
- result → DISTINCT over the projected variables (rdflib's
  ``query_graph`` wraps results in a set — DataAccess.py:103-105).

Anything outside the fragment (property paths, UNION, subqueries,
aggregates) raises ``SparqlUnsupported`` loudly rather than mis-answering.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlUnsupported(ValueError):
    pass


class SparqlSyntaxError(ValueError):
    pass


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<lit>"(?:[^"\\]|\\.)*")
  | (?P<var>\?[A-Za-z_]\w*)
  | (?P<pname>[A-Za-z_][\w-]*:[\w.-]*|:[\w.-]+)
  | (?P<word>[A-Za-z_]\w*)
  | (?P<num>\d+)
  | (?P<punct>&&|\|\||[{}();,.=\[\]*])
""",
    re.X,
)

_KEYWORDS = {"prefix", "select", "where", "optional", "filter", "limit", "distinct"}


def _tokenize(q: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise SparqlSyntaxError(f"cannot tokenize at: {q[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind in ("ws", "comment"):
            continue
        if kind == "pname" and val.endswith("."):
            # 'ns:Test.' — statement terminator glued to the name
            toks.append(("pname", val[:-1]))
            toks.append(("punct", "."))
            continue
        if kind == "word" and val.lower() in _KEYWORDS:
            toks.append(("kw", val.lower()))
            continue
        toks.append((kind, val))
    return toks


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

# term = ("var", name) | ("iri", value) | ("lit", value)


@dataclass
class Group:
    patterns: list = field(default_factory=list)  # [(s, p, o)]
    filters: list = field(default_factory=list)  # filter ASTs
    optionals: list = field(default_factory=list)  # [Group]


@dataclass
class Query:
    select: list  # var names, or ["*"]
    where: Group
    limit: int | None
    distinct: bool  # explicit DISTINCT keyword (set semantics apply anyway)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], prefixes: dict[str, str]):
        self.toks = toks
        self.i = 0
        self.prefixes = dict(prefixes)
        self.bnode_n = 0

    # -- token helpers ------------------------------------------------
    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise SparqlSyntaxError(f"expected {val or kind}, got {v!r}")
        return v

    # -- grammar ------------------------------------------------------
    def parse_query(self) -> Query:
        while self.peek() == ("kw", "prefix"):
            self.next()
            pk, pv = self.next()
            if pk != "pname":
                raise SparqlSyntaxError(f"bad PREFIX name {pv!r}")
            iri = self.expect("iri")
            self.prefixes[pv[:-1] if pv.endswith(":") else pv.split(":")[0]] = iri[1:-1]
        self.expect("kw", "select")
        distinct = False
        if self.peek() == ("kw", "distinct"):
            self.next()
            distinct = True
        select: list[str] = []
        while True:
            k, v = self.peek()
            if k == "var":
                select.append(v[1:])
                self.next()
            elif (k, v) == ("punct", "*"):
                select = ["*"]
                self.next()
            else:
                break
        if not select:
            raise SparqlSyntaxError("empty SELECT clause")
        if self.peek() == ("kw", "where"):
            self.next()
        self.expect("punct", "{")
        where = self.parse_group()
        self.expect("punct", "}")
        limit = None
        if self.peek() == ("kw", "limit"):
            self.next()
            limit = int(self.expect("num"))
        k, v = self.peek()
        if k != "eof":
            raise SparqlUnsupported(f"trailing syntax not in the supported fragment: {v!r}")
        return Query(select=select, where=where, limit=limit, distinct=distinct)

    def parse_group(self) -> Group:
        g = Group()
        while True:
            k, v = self.peek()
            if (k, v) == ("punct", "}"):
                return g
            if k == "eof":
                raise SparqlSyntaxError("unterminated group")
            if (k, v) == ("kw", "optional"):
                self.next()
                self.expect("punct", "{")
                g.optionals.append(self.parse_group())
                self.expect("punct", "}")
            elif (k, v) == ("kw", "filter"):
                self.next()
                g.filters.extend(self.parse_filter())
            elif k == "word" and v.lower() in ("union", "minus", "graph", "service", "bind", "values"):
                raise SparqlUnsupported(f"{v.upper()} is outside the supported fragment")
            elif (k, v) == ("punct", "{"):
                raise SparqlUnsupported(
                    "nested group (UNION / subquery syntax) is outside the supported fragment"
                )
            else:
                self.parse_statement(g)
            if self.peek() == ("punct", "."):
                self.next()

    def parse_statement(self, g: Group) -> None:
        subj = self.parse_term_or_bnode(g)
        self.parse_predobj(subj, g)

    def parse_predobj(self, subj, g: Group) -> None:
        while True:
            pred = self.parse_term(allow_a=True)
            if pred[0] == "lit":
                raise SparqlSyntaxError("literal in predicate position")
            while True:
                obj = self.parse_term_or_bnode(g)
                g.patterns.append((subj, pred, obj))
                if self.peek() == ("punct", ","):
                    self.next()
                else:
                    break
            if self.peek() == ("punct", ";"):
                self.next()
                # a dangling ';' before '.', ']' or '}' is legal turtle
                k, v = self.peek()
                if (k, v) in (("punct", "."), ("punct", "]"), ("punct", "}")):
                    return
                continue
            return

    def parse_term_or_bnode(self, g: Group):
        if self.peek() == ("punct", "["):
            self.next()
            self.bnode_n += 1
            bvar = ("var", f"_bn{self.bnode_n}")
            if self.peek() != ("punct", "]"):  # '[]' is just a fresh node
                self.parse_predobj(bvar, g)
            self.expect("punct", "]")
            return bvar
        return self.parse_term()

    def parse_term(self, allow_a: bool = False):
        k, v = self.next()
        if k == "var":
            return ("var", v[1:])
        if k == "iri":
            return ("iri", v[1:-1])
        if k == "lit":
            return ("lit", v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if k == "pname":
            return ("iri", self.expand_pname(v))
        if k == "word" and v == "a" and allow_a:
            return ("iri", RDF_TYPE_IRI)
        raise SparqlSyntaxError(f"unexpected term {v!r}")

    def expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"unknown prefix {pfx!r} (pass it via prefixes=...)")
        return self.prefixes[pfx] + local

    # FILTER ( cond && cond ... ) — the fragment the reference issues
    def parse_filter(self) -> list:
        self.expect("punct", "(")
        conds = [self.parse_condition()]
        while self.peek() == ("punct", "&&"):
            self.next()
            conds.append(self.parse_condition())
        if self.peek() == ("punct", "||"):
            raise SparqlUnsupported("|| in FILTER is outside the supported fragment")
        self.expect("punct", ")")
        return conds

    def parse_condition(self):
        k, v = self.peek()
        if k == "word" and v.lower() == "isuri":
            self.next()
            self.expect("punct", "(")
            var = self.expect("var")[1:]
            self.expect("punct", ")")
            return ("isuri", var)
        if k == "word" and v.lower() == "strstarts":
            self.next()
            self.expect("punct", "(")
            var = self._parse_str_arg_var()
            self.expect("punct", ",")
            prefix = self._parse_str_arg_const()
            self.expect("punct", ")")
            return ("strstarts", var, prefix)
        if k == "var":
            self.next()
            self.expect("punct", "=")
            rhs = self.parse_term()
            return ("eq", v[1:], rhs)
        raise SparqlUnsupported(f"FILTER condition at {v!r} is outside the supported fragment")

    def _parse_str_arg_var(self) -> str:
        # str(?v) or bare ?v
        k, v = self.next()
        if k == "word" and v.lower() == "str":
            self.expect("punct", "(")
            var = self.expect("var")[1:]
            self.expect("punct", ")")
            return var
        if k == "var":
            return v[1:]
        raise SparqlSyntaxError(f"expected variable, got {v!r}")

    def _parse_str_arg_const(self) -> str:
        # str(ns:) / str(<iri>) / "literal"
        k, v = self.next()
        if k == "word" and v.lower() == "str":
            self.expect("punct", "(")
            kk, vv = self.next()
            if kk == "iri":
                out = vv[1:-1]
            elif kk == "pname":
                out = self.expand_pname(vv)
            else:
                raise SparqlSyntaxError(f"bad str() argument {vv!r}")
            self.expect("punct", ")")
            return out
        if k == "lit":
            return v[1:-1]
        raise SparqlSyntaxError(f"expected constant, got {v!r}")


# --------------------------------------------------------------------------
# Compiler
# --------------------------------------------------------------------------

_POS = ("subject", "predicate", "object")


def _compile_pattern(graph: DataFrame, pat) -> DataFrame:
    """One triple pattern → filtered/renamed slice. Constant terms become
    scan filters (pushed down / partition-pruned); variables become the
    binding columns. ``__isuri_<v>`` carries the URI-ness of object-bound
    variables for FILTER isURI."""
    df = graph
    proj, seen = [], {}
    for term, col in zip(pat, _POS):
        kind, val = term
        if kind == "var":
            if val in seen:  # repeated variable inside one pattern
                df = df.filter(F.col(col) == F.col(seen[val]))
                continue
            seen[val] = col
            proj.append(F.col(col).alias(val))
            flag = ~F.col("obj_is_literal") if col == "object" else F.lit(True)
            proj.append(flag.alias(f"__isuri_{val}"))
        else:
            df = df.filter(F.col(col) == F.lit(val))
            if col == "object":
                df = df.filter(F.col("obj_is_literal") == F.lit(kind == "lit"))
    return df.select(*proj)


def _merge(a: DataFrame, b: DataFrame, how: str = "inner") -> DataFrame:
    keys = [c for c in a.columns if c in b.columns and not c.startswith("__isuri_")]
    b = b.drop(*[c for c in b.columns if c.startswith("__isuri_") and c in a.columns])
    if keys:
        return a.join(b, keys, how)
    if how != "inner":
        raise SparqlUnsupported("OPTIONAL group shares no variable with the outer group")
    return a.crossJoin(b)


def _filter_col(df: DataFrame, cond) -> F.Column:
    op = cond[0]
    if op == "isuri":
        v = cond[1]
        col = f"__isuri_{v}"
        return F.col(col) if col in df.columns else F.lit(True)
    if op == "strstarts":
        return F.col(cond[1]).startswith(cond[2])
    if op == "eq":
        _, v, rhs = cond
        return F.col(v) == (F.col(rhs[1]) if rhs[0] == "var" else F.lit(rhs[1]))
    raise SparqlUnsupported(f"filter {op}")


def _pattern_vars(pat) -> set:
    return {val for kind, val in pat if kind == "var"}


def _compile_group(graph: DataFrame, g: Group) -> DataFrame:
    """BGP → join tree. SPARQL pattern order is NOT join order: the
    ``[...]`` bnode syntax appends the linking pattern after the bnode's
    own properties, so naive left-to-right joining hits a disconnected
    pattern and cross-joins (measured: 67.5e9 intermediate rows on the
    flagship at sf0.001). Greedy connected ordering instead: always join
    the next pattern that shares a variable with the bound set — every
    join stays an equi-join; a genuine cross join only happens for a
    genuinely disconnected BGP."""
    if not g.patterns:
        raise SparqlUnsupported("group with no triple pattern")
    remaining = list(g.patterns)
    # start at the most-constant (most selective) pattern
    remaining.sort(key=lambda p: sum(1 for k, _ in p if k != "var"), reverse=True)
    first = remaining.pop(0)
    df = _compile_pattern(graph, first)
    bound = _pattern_vars(first)
    while remaining:
        i = next(
            (j for j, p in enumerate(remaining) if _pattern_vars(p) & bound),
            0,  # disconnected BGP: fall back to a real cross join
        )
        pat = remaining.pop(i)
        df = _merge(df, _compile_pattern(graph, pat))
        bound |= _pattern_vars(pat)
    for cond in g.filters:
        df = df.filter(_filter_col(df, cond))
    for opt in g.optionals:
        df = _merge(df, _compile_group(graph, opt), how="left")
    return df


def query_graph(
    graph: DataFrame, q: str, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """Run a SPARQL SELECT (the reference's fragment) over a triples frame.
    Returns one column per selected variable; results are DISTINCT (the
    reference materializes rdflib rows into a set)."""
    parser = _Parser(_tokenize(q), prefixes or {})
    ast = parser.parse_query()
    df = _compile_group(graph, ast.where)
    if ast.select == ["*"]:
        out_cols = [c for c in df.columns if not c.startswith("__isuri_") and not c.startswith("_bn")]
    else:
        missing = [v for v in ast.select if v not in df.columns]
        if missing:
            raise SparqlSyntaxError(f"SELECT variables never bound: {missing}")
        out_cols = ast.select
    out = df.select(*out_cols).distinct()
    if ast.limit is not None:
        out = out.limit(ast.limit)
    return out
