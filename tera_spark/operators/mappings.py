"""Named id-mapping loaders — the reference's ``WikidataMapping`` family
(/root/reference/tera/DataIntegration.py:331-408) re-expressed over static
mapping tables (S15/S18): the rebuild never queries query.wikidata.org at
runtime; the six canned property-pair queries define table schemas that are
shipped as downloaded CSV/parquet fixtures (FIXTURES.md §7).

Each loader returns the canonical ``(from_id, to_id)`` DataFrame used by
operators/align.py. ``load_inchikey_to_cas`` applies the reference's
dash-strip (``REPLACE(?tmp, "-", "")``, DataIntegration.py:338).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.sources.readers import read_mapping_csv


def _load(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".parquet"):
        df = spark.read.parquet(path)
        return df.select(
            F.col(df.columns[0]).alias("from_id"), F.col(df.columns[1]).alias("to_id")
        )
    return read_mapping_csv(spark, path)


def load_inchikey_to_cas(spark: SparkSession, path: str) -> DataFrame:
    """InchikeyToCas (DataIntegration.py:331-344): cas numbers are
    dash-stripped."""
    return _load(spark, path).withColumn("to_id", F.regexp_replace("to_id", "-", ""))


def load_inchikey_to_pubchem(spark: SparkSession, path: str) -> DataFrame:
    """InchikeyToPubChem (DataIntegration.py:346-357)."""
    return _load(spark, path)


def load_inchikey_to_chebi(spark: SparkSession, path: str) -> DataFrame:
    """InchikeyToChEBI (DataIntegration.py:359-370)."""
    return _load(spark, path)


def load_inchikey_to_chembl(spark: SparkSession, path: str) -> DataFrame:
    """InchikeyToChEMBL (DataIntegration.py:372-383)."""
    return _load(spark, path)


def load_inchikey_to_mesh(spark: SparkSession, path: str) -> DataFrame:
    """InchikeyToMeSH (DataIntegration.py:385-396)."""
    return _load(spark, path)


def load_ncbi_to_eol(spark: SparkSession, path: str) -> DataFrame:
    """NCBIToEOL (DataIntegration.py:398-408)."""
    return _load(spark, path)


def load_endpoint_sameas(triples: DataFrame) -> DataFrame:
    """EndpointMapping (DataIntegration.py:121-141): owl:sameAs pairs —
    from a triples DataFrame instead of a SPARQL endpoint."""
    return triples.filter(
        F.col("predicate") == "http://www.w3.org/2002/07/owl#sameAs"
    ).select(F.col("subject").alias("from_id"), F.col("object").alias("to_id"))


def ncbi_to_ecotox(ncbi_graph: DataFrame, ecotox_graph: DataFrame, threshold: float = 95.0) -> DataFrame:
    """NCBIToEcotox (DataIntegration.py:411-417): fuzzy alignment of the
    two taxonomies' label dictionaries — StringGraphMapping semantics via
    the token-blocked similarity join (J6)."""
    from tera_spark.operators.align import string_matching_mapping
    from tera_spark.operators.api import label_dictionary

    return string_matching_mapping(
        label_dictionary(ncbi_graph), label_dictionary(ecotox_graph), threshold=threshold
    )
