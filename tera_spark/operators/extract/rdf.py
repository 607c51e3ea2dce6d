"""RDF-file DataObjects — PubChem / ChEBI / MeSH (S12-S14).

Reference: /root/reference/tera/DataAggregation.py:798-859 — each just
parses every ``*.ttl`` / ``*.nt`` in a directory into the graph.
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql import DataFrame, SparkSession

from tera_spark.operators.triples import empty_graph, union_graphs
from tera_spark.sources.readers import read_ntriples, read_pc_ttl


def load_pubchem(spark: SparkSession, directory: str) -> DataFrame:
    """``PubChem`` (DataAggregation.py:798-817): pc_compound-profile TTLs."""
    files = sorted(_glob.glob(directory + "*.ttl"))
    if not files:
        return empty_graph(spark)
    return union_graphs(*[read_pc_ttl(spark, f) for f in files])


# ChEBI uses the same TTL profile loader (DataAggregation.py:819-838).
load_chebi = load_pubchem


def load_mesh(spark: SparkSession, directory: str) -> DataFrame:
    """``MeSH`` (DataAggregation.py:840-859): N-Triples files."""
    files = sorted(_glob.glob(directory + "*.nt"))
    if not files:
        return empty_graph(spark)
    return union_graphs(*[read_ntriples(spark, f) for f in files])


def load_rdf_file(spark: SparkSession, path: str) -> DataFrame:
    """S14 — ``rdfAPI`` file load, format from extension
    (/root/reference/tera/DataAccess.py:335-336)."""
    ext = path.rsplit(".", 1)[-1]
    if ext == "nt":
        return read_ntriples(spark, path)
    if ext == "ttl":
        return read_pc_ttl(spark, path)
    raise ValueError(f"unsupported rdf extension: {ext}")
