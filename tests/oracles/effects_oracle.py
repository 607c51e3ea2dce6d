"""Pure-Python oracle for T9/T10 — a faithful port of the reference's
emission rules (/root/reference/tera/DataAggregation.py:398-470) with the
rebuild's deterministic bnode rule, no rdflib/Spark dependency.

The reference's BNode() ids are random per run, so triple-set equality is
defined up to bnode relabeling; both this oracle and the Spark pipeline use
the same content-hash ids, making the comparison exact (SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib
from collections import Counter

from tera_spark.constants import MISSING, NAN_VALUES, NS_BNODE, NS_ECOTOX, NS_UNIT, RDF_TYPE, RDF_VALUE
from tera_spark.functions.units import unit_parser


def bnode(tag: str, *parts) -> str:
    payload = "\x1f".join([tag] + [str(p) for p in parts])
    return NS_BNODE + hashlib.md5(payload.encode("utf-8")).hexdigest()


def _clean_cell(v):
    if v is None:
        return None
    v = str(v).strip()
    return None if v in NAN_VALUES else v


def clean_rows(rows, cols, drop_subset, fill=MISSING):
    out = []
    for row in rows:
        d = {c: _clean_cell(row.get(c)) for c in cols}
        if any(d[c] is None for c in drop_subset):
            continue
        out.append({c: (d[c] if d[c] is not None else fill) for c in cols})
    return out


def tests_triples_oracle(rows) -> set:
    """T9 (DataAggregation.py:410-434)."""
    ns = NS_ECOTOX
    g = set()
    cols = [
        "test_id", "test_cas", "species_number",
        "study_duration_mean", "study_duration_unit",
        "organism_habitat", "organism_lifestage",
        "organism_age_mean", "organism_age_unit",
        "organism_init_wt_mean", "organism_init_wt_unit",
    ]
    for r in clean_rows(rows, cols, ["test_id", "test_cas", "species_number"]):
        t = ns + "test/" + r["test_id"]
        g.add((t, RDF_TYPE, ns + "Test", False))
        g.add((t, ns + "species", ns + "taxon/" + r["species_number"], False))
        g.add((t, ns + "chemical", ns + "cas/" + r["test_cas"], False))
        for v, u, p in [
            (r["study_duration_mean"], r["study_duration_unit"], "studyDuration"),
            (r["organism_age_mean"], r["organism_age_unit"], "organismAge"),
            (r["organism_init_wt_mean"], r["organism_init_wt_unit"], "organismWeight"),
        ]:
            if v != MISSING:
                b = bnode("test-q", r["test_id"], p, v, u)
                g.add((b, RDF_VALUE, v, True))
                if u != MISSING:
                    parsed = unit_parser(u)
                    if parsed:
                        g.add((b, NS_UNIT + "units", NS_UNIT + parsed, False))
                g.add((t, ns + p, b, False))
        if r["organism_habitat"] != MISSING:
            g.add((t, ns + "organismHabitat", ns + "habitat/" + r["organism_habitat"], False))
        if r["organism_lifestage"] != MISSING:
            g.add((t, ns + "organismLifestage", ns + "lifestage/" + r["organism_lifestage"], False))
    return g


def results_triples_oracle(rows) -> set:
    """T10 (DataAggregation.py:436-456)."""
    ns = NS_ECOTOX
    g = set()
    cols = ["test_id", "endpoint", "conc1_mean", "conc1_unit", "effect"]
    cleaned = clean_rows(rows, cols, cols)
    seen: Counter = Counter()
    for r in cleaned:
        key = tuple(r[c] for c in cols)
        seen[key] += 1
        dup_seq = seen[key]
        parts = list(key) + [dup_seq]
        rb = bnode("result", *parts)
        cb = bnode("conc", *parts)
        t = ns + "test/" + r["test_id"]
        g.add((rb, ns + "endpoint", ns + "endpoint/" + r["endpoint"], False))
        g.add((rb, ns + "effect", ns + "effect/" + r["effect"], False))
        digits = "".join(filter(str.isdigit, r["conc1_mean"]))
        if digits:
            g.add((cb, RDF_VALUE, digits, True))
            if r["conc1_unit"] != MISSING:
                parsed = unit_parser(r["conc1_unit"])
                if parsed:
                    g.add((cb, NS_UNIT + "units", NS_UNIT + parsed, False))
        g.add((rb, ns + "concentration", cb, False))
        g.add((t, ns + "hasResult", rb, False))
    return g
