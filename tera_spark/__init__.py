"""tera_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of NIVA-Knowledge-Graph/TERA
(reference at /root/reference; semantics documented in SURVEY.md), expressed
as Spark DataFrame/SQL dataflow:

- ``sources``   — scans for the reference's file formats (pipe-CSV, .dmp,
                  N-Triples, pc-compound Turtle, mapping CSVs) and sinks.
- ``operators`` — triple model (union/dedup/replace), per-source triple
                  extractors (T1-T14), alignment joins (J2-J7), iterative
                  canonicalization (connected components), graph query API
                  (Q1-Q14), plus training-data ops (dedup, ANN, text).
- ``functions`` — scalar/vectorized functions: unit parsing & conversion,
                  similarity scoring, text quality, hashing.
- ``pipeline``  — the transcript KG-construction pipeline: mention
                  extraction -> entity linking -> canonicalization ->
                  graph materialization, with stage checkpoints + lineage.
- ``streaming`` — Structured Streaming variant of the extraction stage.

Everything is DataFrame-first: Catalyst plans the physical execution; the
only Python-side compute is Arrow-vectorized pandas UDFs (mention
extraction, fuzzy scoring, unit parsing).
"""

__version__ = "0.1.0"
