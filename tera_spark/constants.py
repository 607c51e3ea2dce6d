"""Shared vocabulary: RDF terms, namespaces, and the NaN vocabulary.

Mirrors the constants of the reference implementation
(/root/reference/tera/DataAggregation.py:5-18, /root/reference/tera/utils.py:13-48)
so the emitted triples are IRI-identical to the reference's.
"""

from __future__ import annotations

# --- RDF / RDFS / OWL terms used by the reference -------------------------
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_VALUE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#value"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL_SUBPROPERTYOF = "http://www.w3.org/2002/07/owl#subPropertyOf"
# NB: the reference emits the typo'd term OWL.disjoinWith (rdflib fabricates
# the IRI) — we keep it verbatim for triple-set parity
# (DataAggregation.py:215 et al.; SURVEY.md §8 item 11).
OWL_DISJOINWITH = "http://www.w3.org/2002/07/owl#disjoinWith"
SKOS_PREFLABEL = "http://www.w3.org/2004/02/skos/core#prefLabel"

# --- Source namespaces (DataAggregation.py defaults) -----------------------
NS_NCBI = "https://www.ncbi.nlm.nih.gov/taxonomy/"  # DataAggregation.py:102
NS_EOL = "https://eol.org/pages/"  # DataAggregation.py:274
NS_ECOTOX = "https://cfpub.epa.gov/ecotox/"  # DataAggregation.py:383,478,758
NS_PUBCHEM = "http://rdf.ncbi.nlm.nih.gov/pubchem/compound/"  # :800
NS_CHEBI = "http://purl.obolibrary.org/obo/"  # :821
NS_MESH = "http://id.nlm.nih.gov/mesh/"  # :842
NS_UNIT = "http://qudt.org/vocab/unit#"  # DataAggregation.py:7
NS_BNODE = "urn:tera-bnode:"  # deterministic surrogate for rdflib BNode()

# Transcript-KG namespace (the graft's own graph; no reference counterpart).
NS_KG = "urn:tera-kg:"

# --- NaN vocabulary (DataAggregation.py:18) --------------------------------
# The reference's list also carries float('nan') and -1 (int); as cell
# *strings* the observable vocabulary is:
NAN_VALUES = [
    "nan", "--", "-X", "NA", "NC", "-1", "", "sp.", "sp,", "var.",
    "variant", "NR", "sp", "ssp", "ssp.", "ssp,",
]

# Sentinel used by the ECOTOX loaders after dropna (DataAggregation.py:403,407).
MISSING = "missing"
