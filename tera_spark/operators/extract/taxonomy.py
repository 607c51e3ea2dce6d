"""NCBI Taxonomy extraction — T1-T4 (SURVEY.md §2.3).

Reference: ``Taxonomy`` (/root/reference/tera/DataAggregation.py:100-271).
Three .dmp scans → hierarchy/name/division triples + static axioms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.constants import (
    NS_NCBI,
    OWL_DISJOINWITH,
    OWL_SUBPROPERTYOF,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    SKOS_PREFLABEL,
)
from tera_spark.operators.extract._emit import emit, t, uri
from tera_spark.operators.triples import TRIPLE_SCHEMA, union_graphs
from tera_spark.sources.readers import clean_strings, read_dmp


def hierarchy_triples(nodes: DataFrame, ns: str = NS_NCBI) -> DataFrame:
    """T1 (DataAggregation.py:139-157). Input: cleaned frame with columns
    child, parent, rank, division."""
    df = nodes.withColumn("rank_us", F.regexp_replace("rank", " ", "_")).withColumn(
        "division_us", F.regexp_replace("division", " ", "_")
    )
    taxon = uri(ns + "taxon/", "child")
    parent = uri(ns + "taxon/", "parent")
    rank_uri = uri(ns + "rank/", "rank_us")
    division = uri(ns + "division/", "division_us")
    is_species = F.col("rank") == "species"
    has_rank = F.col("rank_us") != "no_rank"
    return emit(
        df,
        t(taxon, ns + "rank", rank_uri, when=has_rank),
        t(rank_uri, RDFS_LABEL, F.col("rank"), lit=True, when=has_rank),
        t(rank_uri, RDF_TYPE, F.lit(ns + "Rank"), when=has_rank),
        t(taxon, RDF_TYPE, parent, when=is_species),
        t(taxon, RDF_TYPE, division, when=is_species),
        t(taxon, RDFS_SUBCLASSOF, parent, when=~is_species),
        t(taxon, RDFS_SUBCLASSOF, division, when=~is_species),
    )


def names_triples(names: DataFrame, ns: str = NS_NCBI) -> DataFrame:
    """T2 (DataAggregation.py:166-184). Columns: taxon, name, unique_name,
    name_type. The name_type *value* is minted into a predicate IRI
    (dynamic schema); subproperty axioms attach per minted predicate."""
    df = names.withColumn("nt_us", F.regexp_replace("name_type", " ", "_"))
    taxon = uri(ns + "taxon/", "taxon")
    nt_pred = uri(ns, "nt_us")
    has_un = F.length("unique_name") > 0
    has_n = F.length("name") > 0
    return emit(
        df,
        # uniqueName + its subproperty axioms (DataAggregation.py:122-125,170-171)
        t(taxon, ns + "uniqueName", F.col("unique_name"), lit=True, when=has_un),
        t(F.lit(ns + "uniqueName"), OWL_SUBPROPERTYOF, F.lit(RDFS_LABEL), when=has_un),
        t(F.lit(ns + "uniqueName"), OWL_SUBPROPERTYOF, F.lit(SKOS_PREFLABEL), when=has_un),
        # minted name_type predicate
        t(nt_pred, OWL_SUBPROPERTYOF, F.lit(RDFS_LABEL), when=has_n),
        t(taxon, nt_pred, F.col("name"), lit=True, when=has_n),
        t(nt_pred, RDFS_LABEL, F.col("name_type"), lit=True, when=has_n),
        t(nt_pred, RDFS_DOMAIN, F.lit(ns + "Taxon"), when=has_n),
    )


def divisions_triples(divisions: DataFrame, ns: str = NS_NCBI) -> DataFrame:
    """T3 (DataAggregation.py:191-198). Columns: division, acronym, name."""
    division = uri(ns + "division/", "division")
    return emit(
        divisions,
        t(division, RDF_TYPE, F.lit(ns + "Division")),
        t(division, RDFS_LABEL, F.col("name"), lit=True),
    )


# T4: static axioms (DataAggregation.py:200-271). (subject-division → list of
# disjoint divisions), verbatim from the reference.
_DISJOINT_DIVISIONS = {
    "0": ["1", "2", "4", "5", "6", "9", "10"],
    "1": ["2", "4", "5", "6", "9", "10"],
    "2": ["4", "9", "10"],
    "3": ["2", "4", "5", "6", "10"],
    "4": ["2", "5", "6", "10"],
    "5": ["1"],
    "6": ["1"],
    "9": ["1", "0", "2", "4", "5", "6", "10"],
}


def axiom_triples(spark: SparkSession, ns: str = NS_NCBI) -> DataFrame:
    """T4: domain/range of ns:rank + pairwise division disjointness
    (DataAggregation.py:200-271) as a constant DataFrame."""
    rows = [
        (ns + "rank", RDFS_DOMAIN, ns + "Taxon", False),
        (ns + "rank", RDFS_RANGE, ns + "Rank", False),
    ]
    for d, others in _DISJOINT_DIVISIONS.items():
        for o in others:
            rows.append(
                (ns + "division/" + d, OWL_DISJOINWITH, ns + "division/" + o, False)
            )
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def taxonomy_graph(
    nodes_raw: DataFrame,
    names_raw: DataFrame,
    divisions_raw: DataFrame,
    ns: str = NS_NCBI,
) -> DataFrame:
    """Full ``Taxonomy`` DataObject (DataAggregation.py:127-132)."""
    spark = nodes_raw.sparkSession
    return union_graphs(
        hierarchy_triples(clean_strings(nodes_raw), ns),
        names_triples(clean_strings(names_raw), ns),
        divisions_triples(clean_strings(divisions_raw), ns),
        axiom_triples(spark, ns),
    )


def load_taxonomy(spark: SparkSession, directory: str, ns: str = NS_NCBI) -> DataFrame:
    """``Taxonomy(directory=...)`` — S1-S3 scans + T1-T4."""
    nodes = read_dmp(spark, directory + "nodes.dmp", {0: "child", 1: "parent", 2: "rank", 4: "division"})
    names = read_dmp(spark, directory + "names.dmp", {0: "taxon", 1: "name", 2: "unique_name", 3: "name_type"})
    divisions = read_dmp(spark, directory + "division.dmp", {0: "division", 1: "acronym", 2: "name"})
    return taxonomy_graph(nodes, names, divisions, ns)
