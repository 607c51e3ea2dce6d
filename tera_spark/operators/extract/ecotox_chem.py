"""ECOTOX chemicals extraction — T14 (SURVEY.md §2.3).

Reference: ``EcotoxChemicals._load_chemicals``
(/root/reference/tera/DataAggregation.py:758-796).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.constants import NS_ECOTOX, RDF_TYPE, RDFS_LABEL, RDFS_SUBCLASSOF
from tera_spark.operators.extract._emit import emit, t, uri
from tera_spark.operators.triples import union_graphs
from tera_spark.sources.readers import clean_strings, read_pipe_csv


def chemicals_triples(chemicals: DataFrame, ns: str = NS_ECOTOX) -> DataFrame:
    """T14. Columns: cas_number, chemical_name, ecotox_group.

    - chemical_name is ', '-separated synonyms → one rdfs:label each;
    - ecotox_group is ','-separated; group URIs from the '/ . space'
      scrubbed string (DataAggregation.py:783-787), labels keep the raw
      (unscrubbed) name — reference zips raw names with scrubbed URIs.
    """
    cas = uri(ns + "cas/", "cas_number")
    typed = emit(chemicals, t(cas, RDF_TYPE, F.lit(ns + "Chemical")))

    labels = emit(
        chemicals.select(
            cas.alias("_cas"), F.explode(F.split("chemical_name", ", ")).alias("_n")
        ),
        t(F.col("_cas"), RDFS_LABEL, F.col("_n"), lit=True),
    )

    # zip raw-name-split with scrubbed-split positionally (same delimiter ',')
    scrubbed = F.regexp_replace(F.col("ecotox_group"), r"[/\. ]", "")
    groups = chemicals.select(
        cas.alias("_cas"),
        F.explode(
            F.arrays_zip(
                F.split(scrubbed, ",").alias("g"),
                F.split(F.col("ecotox_group"), ",").alias("n"),
            )
        ).alias("_z"),
    )
    group_uri = F.concat(F.lit(ns + "group/"), F.col("_z.g"))
    group_triples = emit(
        groups,
        t(F.col("_cas"), RDFS_SUBCLASSOF, group_uri),
        t(group_uri, RDFS_LABEL, F.col("_z.n"), lit=True),
        t(group_uri, RDF_TYPE, F.lit(ns + "ChemicalGroup")),
    )
    return typed.unionByName(labels).unionByName(group_triples)


def ecotox_chemicals_graph(chemicals_raw: DataFrame, ns: str = NS_ECOTOX) -> DataFrame:
    cleaned = clean_strings(
        chemicals_raw.select("cas_number", "chemical_name", "ecotox_group")
    )
    return union_graphs(chemicals_triples(cleaned, ns))


def load_ecotox_chemicals(spark: SparkSession, directory: str, ns: str = NS_ECOTOX) -> DataFrame:
    return ecotox_chemicals_graph(
        read_pipe_csv(spark, directory + "validation/chemicals.txt"), ns
    )
