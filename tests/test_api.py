from pyspark.sql import functions as F

from tera_spark.constants import NS_ECOTOX
from tera_spark.operators.api import EffectsAPI, GraphAPI, TaxonomyAPI, label_dictionary
from tera_spark.operators.extract.effects import effects_graph
from tests.test_effects import RESULTS_ROWS, TESTS_ROWS, _spark_df

T_SCHEMA = "subject string, predicate string, object string, obj_is_literal boolean"


def test_label_dictionary(spark):
    g = spark.createDataFrame(
        [("e1", "p", "Name", True), ("e1", "p", "iri", False), ("e1", "q", "Name", True)],
        T_SCHEMA,
    )
    rows = {(r.entity, r.label) for r in label_dictionary(g).collect()}
    assert rows == {("e1", "Name")}


def test_convert_id_directions(spark):
    g = spark.createDataFrame([], T_SCHEMA)
    cas = spark.createDataFrame([("ik1", "cas1")], "from_id string, to_id string")
    cid = spark.createDataFrame([("ik1", "cid1")], "from_id string, to_id string")
    api = GraphAPI(g, "urn:t:", mappings={"cas": cas, "cid": cid}, base_identifier="inchikey")

    out = {r.id: r.converted for r in api.convert_id(["ik1"], "inchikey", "cas").collect()}
    assert out == {"ik1": "cas1"}
    out = {r.id: r.converted for r in api.convert_id(["cas1", "zz"], "cas", "inchikey").collect()}
    assert out == {"cas1": "ik1", "zz": "no mapping"}
    out = {r.id: r.converted for r in api.convert_id(["cas1"], "cas", "cid").collect()}
    assert out == {"cas1": "cid1"}
    assert api.available_conversions() == {"inchikey", "cas", "cid"}


def test_taxonomy_api(spark):
    from tera_spark.operators.extract.taxonomy import taxonomy_graph
    from tests.test_extract import DIVISIONS, NAMES, NODES, _df

    g = taxonomy_graph(_df(spark, NODES), _df(spark, NAMES), _df(spark, DIVISIONS))
    api = TaxonomyAPI(g)
    ranks = {r.s for r in api.get_ranks().collect()}
    assert "https://www.ncbi.nlm.nih.gov/taxonomy/rank/superkingdom" in ranks
    div = api.get_division("https://www.ncbi.nlm.nih.gov/taxonomy/division/0")
    assert {r.s for r in div.collect()} >= {"https://www.ncbi.nlm.nih.gov/taxonomy/taxon/1"}


def test_effects_api(spark):
    g = effects_graph(_spark_df(spark, TESTS_ROWS), _spark_df(spark, RESULTS_ROWS))
    api = EffectsAPI(g)
    assert api.get_chemicals().count() >= 3
    sp = api.get_species_from_chemicals([NS_ECOTOX + "cas/50000"])
    assert {r.c for r in sp.collect()} == {NS_ECOTOX + "taxon/101"}
    assert api.get_endpoint().count() > 0


def test_chemical_api_surface(spark):
    from tera_spark.operators.api import ChemicalAPI

    g = spark.createDataFrame([], T_SCHEMA)
    api = ChemicalAPI(g, "urn:c:")

    syn = spark.createDataFrame(
        [("c1", "aspirin"), ("c1", "ASA"), ("c2", "x")], "id string, synonym string"
    )
    names = {(r.id, r.synonym) for r in api.get_names(syn, ["c1"]).collect()}
    assert names == {("c1", "aspirin"), ("c1", "ASA")}

    feats = spark.createDataFrame(
        [("c1", "charge", "0"), ("c1", "xlogp", "1.2"), ("c2", "charge", "1")],
        "id string, feature string, value string",
    )
    out = {(r.id, r.feature, r.value) for r in api.get_features(feats, ["c1"], params=["charge"]).collect()}
    assert out == {("c1", "charge", "0")}
    assert {r.feature for r in api.which_features(feats).collect()} == {"charge", "xlogp"}

    fps = spark.createDataFrame(
        [("a", [12]), ("b", [10]), ("c", [12])], "id string, fingerprint array<long>"
    )
    sim = {r.id: r.tanimoto for r in api.similarity(fps, "a").collect()}
    assert sim["c"] == 1.0
    assert abs(sim["b"] - 1 / 3) < 1e-6  # 1100 vs 1010: inter=1, union=3


def test_chemical_api_class_hierarchy(spark):
    from tera_spark.operators.api import ChemicalAPI

    g = spark.createDataFrame(
        [
            ("urn:c:C1", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "urn:c:C0", False),
            ("urn:c:M1", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "urn:c:M0", False),
            ("urn:c:Z9", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "urn:c:Z0", False),
        ],
        T_SCHEMA,
    )
    cid = spark.createDataFrame([("ik1", "urn:c:C1")], "from_id string, to_id string")
    mesh = spark.createDataFrame([("ik1", "urn:c:M1")], "from_id string, to_id string")
    api = ChemicalAPI(
        g, "urn:c:", mappings={"cid": cid, "mesh": mesh}, base_identifier="inchikey"
    )
    subs = {r.subject for r in api.class_hierarchy(["ik1"]).collect()}
    # reference semantics: subgraph(cid form) | subgraph(mesh form)
    assert subs == {"urn:c:C1", "urn:c:M1"}


def test_pack_fingerprint_hex(spark):
    from tera_spark.operators.api import pack_fingerprint_hex

    df = spark.createDataFrame([("ff" * 16,)], "h string")  # 32 hex chars
    arr = df.select(pack_fingerprint_hex(F.col("h")).alias("fp")).collect()[0].fp
    assert len(arr) == 3  # 15 + 15 + 2 hex chars
    assert arr[0] == (1 << 60) - 1 and arr[1] == (1 << 60) - 1 and arr[2] == 255
