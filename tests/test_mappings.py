from tera_spark.operators.mappings import (
    load_endpoint_sameas,
    load_inchikey_to_cas,
    ncbi_to_ecotox,
)


def test_inchikey_to_cas_dash_strip(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("from,to\nIK1,50-00-0\nIK2,71-43-2\n")
    out = {r.from_id: r.to_id for r in load_inchikey_to_cas(spark, str(p)).collect()}
    assert out == {"IK1": "50000", "IK2": "71432"}


def test_endpoint_sameas(spark):
    g = spark.createDataFrame(
        [
            ("a", "http://www.w3.org/2002/07/owl#sameAs", "b", False),
            ("a", "p", "c", False),
        ],
        "subject string, predicate string, object string, obj_is_literal boolean",
    )
    rows = load_endpoint_sameas(g).collect()
    assert [(r.from_id, r.to_id) for r in rows] == [("a", "b")]


def test_ncbi_to_ecotox_alignment(spark):
    """The reference's marquee integration (NCBIToEcotox): align NCBI name
    labels against ECOTOX latin/common names via the blocked fuzzy join."""
    from tera_spark.operators.extract.ecotox_taxa import taxa_triples
    from tera_spark.operators.extract.taxonomy import names_triples
    from tera_spark.sources.readers import clean_strings
    import pandas as pd

    ncbi_names = spark.createDataFrame(
        pd.DataFrame(
            [
                dict(taxon="1", name="Pimephales promelas", unique_name="Pimephales promelas", name_type="scientific name"),
                dict(taxon="2", name="Daphnia magna", unique_name="Daphnia magna", name_type="scientific name"),
                dict(taxon="3", name="Quercus robur", unique_name="Quercus robur", name_type="scientific name"),
            ]
        )
    )
    eco_taxa = spark.createDataFrame(
        pd.DataFrame(
            [
                dict(species_number="101", common_name="Fathead Minnow", latin_name="Pimephales promelas", ecotox_group="Fish"),
                dict(species_number="102", common_name="Water Flea", latin_name="Daphnia magnaa", ecotox_group="Crustaceans"),
            ]
        )
    )
    g1 = names_triples(clean_strings(ncbi_names))
    g2 = taxa_triples(clean_strings(eco_taxa))
    out = {
        (r.from_id, r.to_id): r.score
        for r in ncbi_to_ecotox(g1, g2, threshold=90).collect()
    }
    ncbi, eco = "https://www.ncbi.nlm.nih.gov/taxonomy/", "https://cfpub.epa.gov/ecotox/"
    assert (ncbi + "taxon/1", eco + "taxon/101") in out
    assert out[(ncbi + "taxon/1", eco + "taxon/101")] == 100.0
    assert (ncbi + "taxon/2", eco + "taxon/102") in out  # 1-edit misspelling
    assert all(k[0] != ncbi + "taxon/3" for k in out)
