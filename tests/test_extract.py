"""Golden tests: T1-T8, T11-T14 Spark emission vs pure-Python oracles."""

import pandas as pd
import pytest

from tera_spark.operators.extract import ecotox_chem, ecotox_taxa, taxonomy, traits
from tera_spark.sources.readers import clean_strings
from tests.oracles import extract_oracles as O
from tests.util import assert_triples_match


def _df(spark, rows):
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf.astype(object).where(pd.notnull(pdf), None))


# --- NCBI taxonomy ----------------------------------------------------------
NODES = [
    dict(child="1", parent="1", rank="no rank", division="0"),
    dict(child="2", parent="1", rank="superkingdom", division="0"),
    dict(child="9", parent="2", rank="species", division="2 A"),  # space → _
    dict(child="10", parent="2", rank="genus", division="2"),
    dict(child="NC", parent="2", rank="species", division="2"),  # dropped (nan vocab)
]
NAMES = [
    dict(taxon="2", name="Bacteria", unique_name="Bacteria <bact>", name_type="scientific name"),
    dict(taxon="9", name="Buchnera", unique_name="x", name_type="synonym"),
    dict(taxon="9", name="Buch", unique_name=None, name_type="common name"),  # dropped
]
DIVISIONS = [
    dict(division="0", acronym="BCT", name="Bacteria"),
    dict(division="2", acronym="MAM", name="Mammals"),
]


def test_taxonomy_hierarchy(spark):
    got = taxonomy.hierarchy_triples(clean_strings(_df(spark, NODES)))
    assert_triples_match(got, O.hierarchy_oracle(NODES))


def test_taxonomy_names(spark):
    got = taxonomy.names_triples(clean_strings(_df(spark, NAMES)))
    assert_triples_match(got, O.names_oracle(NAMES))


def test_taxonomy_divisions(spark):
    got = taxonomy.divisions_triples(clean_strings(_df(spark, DIVISIONS)))
    assert_triples_match(got, O.divisions_oracle(DIVISIONS))


def test_taxonomy_axioms(spark):
    ax = taxonomy.axiom_triples(spark)
    # 2 domain/range + 34 disjointness axioms (7+6+3+5+4+1+1+7)
    assert ax.count() == 2 + 34


# --- ECOTOX taxa -------------------------------------------------------------
TAXA = [
    dict(species_number="101", common_name="Fathead Minnow",
         latin_name="Pimephales promelas", ecotox_group="Fish,Standard Test Species"),
    dict(species_number="102", common_name="Worm", latin_name="Lumbricus",
         ecotox_group="Worms, Soil"),
    dict(species_number="103", common_name=None, latin_name="X y",
         ecotox_group="Fish"),  # dropped: common_name nan
]
SYNONYMS = [
    dict(species_number="101", latin_name="Pimephales promelas promelas"),
    dict(species_number="NC", latin_name="Dropped"),
]
HIER = [
    dict(species_number="101", genus="Pimephales", family="Cyprinidae",
         tax_order=None, **{"class": "Actinopterygii"},
         superclass=None, subphylum_div="Vertebrata", phylum_division="Chordata",
         kingdom="Animalia"),
    dict(species_number="102", genus=None, family=None, tax_order=None,
         **{"class": None}, superclass=None, subphylum_div=None,
         phylum_division=None, kingdom="Animalia"),
    dict(species_number="103", genus=None, family=None, tax_order=None,
         **{"class": None}, superclass=None, subphylum_div=None,
         phylum_division=None, kingdom=None),
]


def test_ecotox_taxa(spark):
    got = ecotox_taxa.taxa_triples(clean_strings(_df(spark, TAXA)))
    assert_triples_match(got, O.ecotox_taxa_oracle(TAXA))


def test_ecotox_synonyms(spark):
    cleaned = clean_strings(_df(spark, SYNONYMS), drop_subset=["species_number", "latin_name"])
    got = ecotox_taxa.synonyms_triples(cleaned)
    assert_triples_match(got, O.ecotox_synonyms_oracle(SYNONYMS))


def test_ecotox_hierarchy(spark):
    cleaned = clean_strings(_df(spark, HIER), drop_subset=["species_number"])
    got = ecotox_taxa.hierarchy_triples(cleaned)
    assert_triples_match(got, O.ecotox_hierarchy_oracle(HIER))


# --- ECOTOX chemicals --------------------------------------------------------
CHEMS = [
    dict(cas_number="50000", chemical_name="Formaldehyde, Formalin",
         ecotox_group="Aldehydes/Ketones, Organics"),
    dict(cas_number="71432", chemical_name="Benzene", ecotox_group="Org. Solvents"),
    dict(cas_number="NA", chemical_name="Dropped", ecotox_group="X"),
]


def test_ecotox_chemicals(spark):
    got = ecotox_chem.chemicals_triples(clean_strings(_df(spark, CHEMS)))
    assert_triples_match(got, O.ecotox_chemicals_oracle(CHEMS))


# --- EOL traits ---------------------------------------------------------------
TRAITS = [
    dict(page_id="1045608", predicate="http://purl.obolibrary.org/obo/RO_0002303",
         value_uri="http://www.wikidata.org/entity/Q101998"),
    dict(page_id="1045608", predicate="http://example.org/p", value_uri="just a literal"),
    dict(page_id="bad page", predicate="not a url", value_uri="http://x.org/y"),  # gated out
]
TERMS = [
    dict(uri="http://www.wikidata.org/entity/Q101998", name="biome"),
    dict(uri="not-a-url", name="junk"),
]
RELS = [
    dict(child="http://eol.org/1", parent="http://eol.org/2"),
    dict(child="nope", parent="http://eol.org/2"),
]


def test_traits(spark):
    got = traits.traits_triples(clean_strings(_df(spark, TRAITS)))
    # subjects are ns-prefixed page ids → always URLs; 'bad page' row:
    # subject becomes ns+'bad page' (invalid: space) → gated
    assert_triples_match(got, O.traits_oracle(TRAITS))


def test_terms(spark):
    got = traits.terms_triples(clean_strings(_df(spark, TERMS)))
    assert_triples_match(got, O.terms_oracle(TERMS))


def test_subclasses(spark):
    got = traits.subclass_triples(clean_strings(_df(spark, RELS)))
    assert_triples_match(got, O.subclass_oracle(RELS))
