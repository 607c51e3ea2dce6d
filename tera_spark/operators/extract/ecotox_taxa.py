"""ECOTOX taxonomy extraction — T11-T13 + axioms (SURVEY.md §2.3).

Reference: ``EcotoxTaxonomy`` (/root/reference/tera/DataAggregation.py:
476-755). Species lexicon, synonyms, and the lineage-chain loader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.constants import (
    NS_ECOTOX,
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
from tera_spark.sources.readers import clean_strings, read_pipe_csv

LINEAGE_COLS = [
    "species_number", "genus", "family", "tax_order", "class",
    "superclass", "subphylum_div", "phylum_division", "kingdom",
]


def taxa_triples(taxa: DataFrame, ns: str = NS_ECOTOX) -> DataFrame:
    """T11 (DataAggregation.py:509-529). Columns: species_number,
    common_name, latin_name, ecotox_group. The comma-separated group list
    explodes relationally; group URIs keep the raw name minus spaces
    (the reference's ``.replace('\\W','')`` is a literal-string no-op)."""
    df = taxa.withColumn("_group_nospace", F.regexp_replace("ecotox_group", " ", ""))
    taxon = uri(ns + "taxon/", "species_number")

    base = emit(
        df,
        t(taxon, ns + "commonName", F.col("common_name"), lit=True),
        t(taxon, ns + "latinName", F.col("latin_name"), lit=True),
    )
    groups = (
        df.select(
            taxon.alias("_taxon"),
            F.explode(F.split(F.col("_group_nospace"), ",")).alias("_g"),
        )
        .filter(F.length("_g") >= 1)
    )
    group_uri = uri(ns + "group/", "_g")
    group_triples = emit(
        groups,
        t(F.col("_taxon"), ns + "ecotoxGroup", group_uri),
        t(group_uri, RDFS_LABEL, F.col("_g"), lit=True),
    )
    return base.unionByName(group_triples)


def synonyms_triples(synonyms: DataFrame, ns: str = NS_ECOTOX) -> DataFrame:
    """T12 (DataAggregation.py:700-705)."""
    return emit(
        synonyms,
        t(uri(ns + "taxon/", "species_number"), ns + "synonym", F.col("latin_name"), lit=True),
    )


def hierarchy_triples(species: DataFrame, ns: str = NS_ECOTOX) -> DataFrame:
    """T13 — the lineage-chain loader (DataAggregation.py:723-748).

    Per row: non-word chars scrubbed from every cell
    (``str.replace('\\W','')`` — regex in the reference's pandas); the rank
    is determined by the *first non-null* lineage ancestor with an
    off-by-one the reference has (``zip(['species']+ks[1:], lineage)``
    pairs rank names one level below the tested value; all-null rows land
    on 'subphylum_div'); consecutive non-null lineage entries chain with
    rdf:type (species rank) or rdfs:subClassOf.

    Array-native: ``filter(array(...), isNotNull)`` + consecutive-pair zip
    via ``arrays_zip(slice, slice)`` — no Python in the loop.
    """
    df = species.select(
        [F.regexp_replace(F.col(c), r"\W", "").alias(c) for c in LINEAGE_COLS]
    )

    # Reference pairing (DataAggregation.py:726-729): rank names zip one
    # level *below* the tested lineage value — genus non-null → 'species',
    # …, kingdom non-null → 'phylum_division'; all-null → 'phylum_division'
    # (the loop's last assignment). Faithful port incl. the off-by-one.
    rank_names = ["species", "genus", "family", "tax_order", "class",
                  "superclass", "subphylum_div", "phylum_division"]
    lineage_vals = [F.col(c) for c in LINEAGE_COLS[1:]]
    rank_expr = F.lit("phylum_division")
    for name, val in reversed(list(zip(rank_names, lineage_vals))):
        rank_expr = F.when(val.isNotNull(), F.lit(name)).otherwise(rank_expr)

    taxon = uri(ns + "taxon/", "species_number")
    df = df.withColumn("_rank", rank_expr).withColumn(
        "_chain",
        F.concat(
            F.array(taxon),
            F.transform(
                F.filter(F.array(*lineage_vals), lambda x: x.isNotNull()),
                lambda x: F.concat(F.lit(ns + "taxon/"), F.trim(x)),
            ),
        ),
    )
    rank_uri = uri(ns + "rank/", "_rank")
    head = emit(
        df,
        t(rank_uri, RDF_TYPE, F.lit(ns + "Rank")),
        t(taxon, ns + "rank", rank_uri),
    )
    pairs = df.select(
        F.col("_rank"),
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_chain"), 1, F.size("_chain") - 1).alias("child"),
                F.slice(F.col("_chain"), 2, F.size("_chain") - 1).alias("parent"),
            )
        ).alias("_pair"),
    )
    chain = emit(
        pairs,
        t(
            F.col("_pair.child"),
            F.when(F.col("_rank") == "species", F.lit(RDF_TYPE)).otherwise(F.lit(RDFS_SUBCLASSOF)),
            F.col("_pair.parent"),
        ),
    )
    return head.unionByName(chain)


def subproperty_axioms(spark: SparkSession, ns: str = NS_ECOTOX) -> DataFrame:
    """DataAggregation.py:498-501 + 753-755 (label subproperties, rank
    domain/range)."""
    rows = [
        (ns + "latinName", OWL_SUBPROPERTYOF, RDFS_LABEL, False),
        (ns + "latinName", OWL_SUBPROPERTYOF, SKOS_PREFLABEL, False),
        (ns + "commonName", OWL_SUBPROPERTYOF, RDFS_LABEL, False),
        (ns + "rank", RDFS_DOMAIN, ns + "Taxon", False),
        (ns + "rank", RDFS_RANGE, ns + "Rank", False),
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


# DataAggregation.py:531-692 — verbatim group-disjointness table.
_DISJOINT_GROUPS = {
    "Birds": ["Worms", "Algae", "Insects/Spiders", "Trees", "Mammals", "Fish",
              "Reptiles", "Moss", "Ferns", "Fungi", "Crustaceans", "Flowers", "Shrubs"],
    "Amphibians": ["Insects/Spiders", "Trees", "Moss", "Ferns", "Fungi"],
    "Algae": ["Insects/Spiders", "Trees", "Moss", "Ferns", "Fungi", "Mammals",
              "Vertebrates", "Reptiles", "Crustaceans"],
    "Invertebrates": ["Trees", "Moss", "Ferns", "Fungi", "Fish", "Mammals", "Vertebrates"],
    "Insects/Spiders": ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Mammals",
                        "Vertebrates", "Fish"],
    "Trees": ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Mammals", "Vertebrates", "Fish"],
    "Mammals": ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Invertebrates", "Fish",
                "Flowers", "Crustaceans"],
    "Fish": ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Mammals", "Flowers", "Crustaceans"],
    "Reptiles": ["Trees", "Moss", "Ferns", "Fungi", "Mammals", "Fish", "Insects/Spiders",
                 "Crustaceans", "Flowers"],
    "Moss": ["Mammals", "Fish", "Crustaceans", "Insects/Spiders", "Worms", "Birds"],
    "Ferns": ["Mammals", "Fish", "Crustaceans", "Insects/Spiders", "Worms", "Birds"],
    "Fungi": ["Mammals", "Fish", "Vertebrates", "Invertebrates", "Crustaceans",
              "Insects/Spiders", "Worms", "Birds"],
    "Crustaceans": ["Mammals", "Fish", "Vertebrates", "Insects/Spiders", "Worms", "Birds"],
}


def disjoint_axioms(spark: SparkSession, ns: str = NS_ECOTOX) -> DataFrame:
    base = ns + "group/"
    rows = [
        (base + a, OWL_DISJOINWITH, base + b, False)
        for a, others in _DISJOINT_GROUPS.items()
        for b in others
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def ecotox_taxonomy_graph(
    species_raw: DataFrame, synonyms_raw: DataFrame, ns: str = NS_ECOTOX
) -> DataFrame:
    """Full ``EcotoxTaxonomy`` (DataAggregation.py:476-497). Note the
    reference reads species.txt twice with different usecols (S9) — here
    both passes prune from one scan."""
    spark = species_raw.sparkSession
    taxa = clean_strings(
        species_raw.select("species_number", "common_name", "latin_name", "ecotox_group")
    )
    syn = clean_strings(
        synonyms_raw, drop_subset=["species_number", "latin_name"]
    ).select("species_number", "latin_name")
    hier = clean_strings(
        species_raw.select(LINEAGE_COLS), drop_subset=["species_number"], fill=None
    )
    return union_graphs(
        taxa_triples(taxa, ns),
        synonyms_triples(syn, ns),
        hierarchy_triples(hier, ns),
        subproperty_axioms(spark, ns),
        disjoint_axioms(spark, ns),
    )


def load_ecotox_taxonomy(spark: SparkSession, directory: str, ns: str = NS_ECOTOX) -> DataFrame:
    return ecotox_taxonomy_graph(
        read_pipe_csv(spark, directory + "validation/species.txt"),
        read_pipe_csv(spark, directory + "validation/species_synonyms.txt"),
        ns,
    )
