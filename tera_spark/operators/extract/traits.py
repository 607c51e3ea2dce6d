"""EOL Traits extraction — T5-T8 (SURVEY.md §2.3).

Reference: ``Traits`` (/root/reference/tera/DataAggregation.py:274-377).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.constants import NS_EOL, RDF_VALUE, RDFS_LABEL, RDFS_SUBCLASSOF
from tera_spark.functions.validation import is_url
from tera_spark.operators.extract._emit import emit, t, uri
from tera_spark.operators.triples import bnode, union_graphs
from tera_spark.sources.readers import (
    clean_strings,
    read_csv,
    read_csv_schema_fallback,
)


def traits_triples(traits: DataFrame, ns: str = NS_EOL) -> DataFrame:
    """T5 (DataAggregation.py:305-319). Columns: page_id, predicate,
    value_uri. Object is IRI when it validates as a URL, else literal;
    subject and predicate must both validate (P6)."""
    s = uri(ns, "page_id")
    o_is_uri = is_url(F.col("value_uri"))
    gate = is_url(s) & is_url(F.col("predicate"))
    return emit(
        traits,
        t(s, F.col("predicate"), F.col("value_uri"), lit=~o_is_uri, when=gate),
    )


def literal_traits_triples(traits: DataFrame, ns: str = NS_EOL) -> DataFrame:
    """T6 (DataAggregation.py:321-340) — dead code in the reference (bad
    caller column list, SURVEY.md §8 item 10); implemented with the
    *intended* reified-quantity semantics for completeness. Columns:
    page_id, predicate, measurement, units_uri."""
    s = uri(ns, "page_id")
    b = bnode(F.col("page_id"), F.col("predicate"), F.col("measurement"), F.col("units_uri"), tag="eol-q")
    return emit(
        traits,
        t(b, RDF_VALUE, F.col("measurement"), lit=True),
        t(b, "http://qudt.org/vocab/unit#units", F.col("units_uri")),
        t(s, F.col("predicate"), b),
    )


def terms_triples(terms: DataFrame) -> DataFrame:
    """T7 (DataAggregation.py:347-353). Columns: uri, name."""
    return emit(
        terms,
        t(F.col("uri"), RDFS_LABEL, F.col("name"), lit=True, when=is_url(F.col("uri"))),
    )


def subclass_triples(rels: DataFrame) -> DataFrame:
    """T8 (DataAggregation.py:371-377). Columns: child, parent; both must
    validate as URLs."""
    gate = is_url(F.col("child")) & is_url(F.col("parent"))
    return emit(rels, t(F.col("child"), RDFS_SUBCLASSOF, F.col("parent"), when=gate))


def traits_graph(
    traits_raw: DataFrame,
    terms_raw: DataFrame,
    rels_raws: list[DataFrame],
    ns: str = NS_EOL,
) -> DataFrame:
    parts = [
        traits_triples(clean_strings(traits_raw.select("page_id", "predicate", "value_uri")), ns),
        terms_triples(clean_strings(terms_raw.select("uri", "name"))),
    ]
    parts += [subclass_triples(clean_strings(r)) for r in rels_raws]
    return union_graphs(*parts)


def load_traits(spark: SparkSession, directory: str, ns: str = NS_EOL) -> DataFrame:
    """``Traits(directory=...)`` (DataAggregation.py:294-298): traits.csv +
    terms.csv + every eol_rels/*.csv (schema-fallback reader S6)."""
    import glob as _glob

    traits = read_csv(spark, directory + "trait_bank/traits.csv", ["page_id", "predicate", "value_uri"])
    terms = read_csv(spark, directory + "trait_bank/terms.csv", ["uri", "name"])
    rels = [read_csv_schema_fallback(spark, f) for f in sorted(_glob.glob(directory + "eol_rels/*.csv"))]
    return traits_graph(traits, terms, rels, ns)
