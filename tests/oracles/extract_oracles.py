"""Pure-Python oracles for T1-T8 and T11-T14 — ports of the reference
emission rules (/root/reference/tera/DataAggregation.py), no rdflib/Spark.

Shared conventions with the Spark implementation: deterministic bnodes,
trim-then-NaN-match cleaning, our URL regex (functions/validation.py).
"""

from __future__ import annotations

from tera_spark.constants import (
    NS_ECOTOX,
    NS_EOL,
    NS_NCBI,
    OWL_SUBPROPERTYOF,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_SUBCLASSOF,
    SKOS_PREFLABEL,
)
from tera_spark.functions.validation import is_url_py
from tests.oracles.effects_oracle import clean_rows


# --- Taxonomy (T1-T3) ------------------------------------------------------
def hierarchy_oracle(rows, ns=NS_NCBI) -> set:
    """DataAggregation.py:139-157."""
    g = set()
    for r in clean_rows(rows, ["child", "parent", "rank", "division"],
                        ["child", "parent", "rank", "division"]):
        c = ns + "taxon/" + r["child"]
        rc = r["rank"]
        rk = rc.replace(" ", "_")
        if rk != "no_rank":
            g.add((c, ns + "rank", ns + "rank/" + rk, False))
            g.add((ns + "rank/" + rk, RDFS_LABEL, rc, True))
            g.add((ns + "rank/" + rk, RDF_TYPE, ns + "Rank", False))
        p = ns + "taxon/" + r["parent"]
        d = ns + "division/" + r["division"].replace(" ", "_")
        if rc == "species":
            g.add((c, RDF_TYPE, p, False))
            g.add((c, RDF_TYPE, d, False))
        else:
            g.add((c, RDFS_SUBCLASSOF, p, False))
            g.add((c, RDFS_SUBCLASSOF, d, False))
    return g


def names_oracle(rows, ns=NS_NCBI) -> set:
    """DataAggregation.py:166-184."""
    g = set()
    for r in clean_rows(rows, ["taxon", "name", "unique_name", "name_type"],
                        ["taxon", "name", "unique_name", "name_type"]):
        c = ns + "taxon/" + r["taxon"]
        if len(r["unique_name"]) > 0:
            g.add((c, ns + "uniqueName", r["unique_name"], True))
            g.add((ns + "uniqueName", OWL_SUBPROPERTYOF, RDFS_LABEL, False))
            g.add((ns + "uniqueName", OWL_SUBPROPERTYOF, SKOS_PREFLABEL, False))
        if len(r["name"]) > 0:
            nt = ns + r["name_type"].replace(" ", "_")
            g.add((nt, OWL_SUBPROPERTYOF, RDFS_LABEL, False))
            g.add((c, nt, r["name"], True))
            g.add((nt, RDFS_LABEL, r["name_type"], True))
            g.add((nt, RDFS_DOMAIN, ns + "Taxon", False))
    return g


def divisions_oracle(rows, ns=NS_NCBI) -> set:
    """DataAggregation.py:191-198."""
    g = set()
    for r in clean_rows(rows, ["division", "acronym", "name"],
                        ["division", "acronym", "name"]):
        d = ns + "division/" + r["division"]
        g.add((d, RDF_TYPE, ns + "Division", False))
        g.add((d, RDFS_LABEL, r["name"], True))
    return g


# --- ECOTOX taxa (T11-T13) -------------------------------------------------
def ecotox_taxa_oracle(rows, ns=NS_ECOTOX) -> set:
    """DataAggregation.py:509-529."""
    g = set()
    cols = ["species_number", "common_name", "latin_name", "ecotox_group"]
    for r in clean_rows(rows, cols, cols):
        s = ns + "taxon/" + r["species_number"]
        group = r["ecotox_group"].replace(" ", "")
        for n in group.split(","):
            if len(n) < 1:
                continue
            gri = ns + "group/" + n  # '\W' literal replace is a no-op
            g.add((s, ns + "ecotoxGroup", gri, False))
            g.add((gri, RDFS_LABEL, n, True))
        g.add((s, ns + "commonName", r["common_name"], True))
        g.add((s, ns + "latinName", r["latin_name"], True))
    return g


def ecotox_synonyms_oracle(rows, ns=NS_ECOTOX) -> set:
    """DataAggregation.py:700-705."""
    g = set()
    for r in clean_rows(rows, ["species_number", "latin_name"],
                        ["species_number", "latin_name"]):
        g.add((ns + "taxon/" + r["species_number"], ns + "synonym", r["latin_name"], True))
    return g


LINEAGE_COLS = [
    "species_number", "genus", "family", "tax_order", "class",
    "superclass", "subphylum_div", "phylum_division", "kingdom",
]


def ecotox_hierarchy_oracle(rows, ns=NS_ECOTOX) -> set:
    """DataAggregation.py:723-748, including the rank off-by-one."""
    import re

    g = set()
    for raw in rows:
        d = {}
        for c in LINEAGE_COLS:
            v = raw.get(c)
            if v is not None:
                v = str(v).strip()
                from tera_spark.constants import NAN_VALUES

                v = None if v in NAN_VALUES else v
            d[c] = re.sub(r"\W", "", v) if v is not None else None
        if d["species_number"] is None:
            continue
        lineage_vals = [d[c] for c in LINEAGE_COLS[1:]]
        # faithful port of DataAggregation.py:726-729 incl. the off-by-one:
        # rank = k assigned each iteration, break on first non-null value.
        rank_names = ["species", "genus", "family", "tax_order", "class",
                      "superclass", "subphylum_div", "phylum_division"]
        rank = "phylum_division"
        for name, val in zip(rank_names, lineage_vals):
            rank = name
            if val is not None:
                break
        rank_uri = ns + "rank/" + rank
        g.add((rank_uri, RDF_TYPE, ns + "Rank", False))
        s = ns + "taxon/" + d["species_number"]
        g.add((s, ns + "rank", rank_uri, False))
        chain = [s] + [ns + "taxon/" + v for v in lineage_vals if v is not None]
        for child, parent in zip(chain, chain[1:]):
            if rank == "species":
                g.add((child, RDF_TYPE, parent, False))
            else:
                g.add((child, RDFS_SUBCLASSOF, parent, False))
    return g


# --- ECOTOX chemicals (T14) --------------------------------------------------
def ecotox_chemicals_oracle(rows, ns=NS_ECOTOX) -> set:
    """DataAggregation.py:777-796."""
    g = set()
    cols = ["cas_number", "chemical_name", "ecotox_group"]
    for r in clean_rows(rows, cols, cols):
        c = ns + "cas/" + r["cas_number"]
        g.add((c, RDF_TYPE, ns + "Chemical", False))
        for a in r["chemical_name"].split(", "):
            g.add((c, RDFS_LABEL, a, True))
        names = r["ecotox_group"].split(",")
        scrubbed = r["ecotox_group"].replace("/", "").replace(".", "").replace(" ", "")
        for gr, n in zip(scrubbed.split(","), names):
            gri = ns + "group/" + gr
            g.add((c, RDFS_SUBCLASSOF, gri, False))
            g.add((gri, RDFS_LABEL, n, True))
            g.add((gri, RDF_TYPE, ns + "ChemicalGroup", False))
    return g


# --- EOL traits (T5, T7, T8) -------------------------------------------------
def traits_oracle(rows, ns=NS_EOL) -> set:
    """DataAggregation.py:305-319."""
    g = set()
    cols = ["page_id", "predicate", "value_uri"]
    for r in clean_rows(rows, cols, cols):
        s = ns + r["page_id"]
        o_is_uri = is_url_py(r["value_uri"])
        if is_url_py(s) and is_url_py(r["predicate"]):
            g.add((s, r["predicate"], r["value_uri"], not o_is_uri))
    return g


def terms_oracle(rows) -> set:
    """DataAggregation.py:347-353."""
    g = set()
    for r in clean_rows(rows, ["uri", "name"], ["uri", "name"]):
        if is_url_py(r["uri"]) and r["name"]:
            g.add((r["uri"], RDFS_LABEL, r["name"], True))
    return g


def subclass_oracle(rows) -> set:
    """DataAggregation.py:371-377."""
    g = set()
    for r in clean_rows(rows, ["child", "parent"], ["child", "parent"]):
        if is_url_py(r["child"]) and is_url_py(r["parent"]):
            g.add((r["child"], RDFS_SUBCLASSOF, r["parent"], False))
    return g
