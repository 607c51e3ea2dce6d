"""Pipeline orchestration: extraction → linking → canonicalization →
materialization, with stage-boundary checkpoints, per-partition lineage and
metrics (north_rule: "resumable from checkpoint with per-partition lineage
+ metrics").

Checkpoint model: every stage writes its output table under
``<out_dir>/<stage>/`` (Iceberg table or parquet dir, sources/writers.py);
a stage is skipped when its output already exists (parquet ``_SUCCESS`` /
table snapshot). Because every operator is a pure function of its input
(content-hash bnodes, deterministic pick-one rules), a resumed run is
bit-identical to an uninterrupted one — asserted in tests.

Lineage: one row per (stage, conv bucket) with row counts; metrics: one
row per stage with rows_in/rows_out/wall seconds. Both are append tables.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.operators.canonical import canonical_mapping, replace_entities_salted
from tera_spark.operators.triples import replace_entities
from tera_spark.pipeline.extract import extract_mentions
from tera_spark.pipeline.kg import build_triples
from tera_spark.pipeline.link import link_mentions
from tera_spark.sources.writers import read_table, write_table

N_BUCKETS = 32


@dataclass
class PipelineResult:
    out_dir: str
    stages_run: list = field(default_factory=list)
    stages_skipped: list = field(default_factory=list)
    metrics: list = field(default_factory=list)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS")) or (
        os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
    )


def _lineage(df: DataFrame, stage: str, key: str, out_dir: str) -> int:
    """Per-partition lineage rows: counts by conv bucket (or entity bucket
    for graph tables). Returns the stage's total row count — computed from
    the same aggregation, so lineage + count is ONE job, not two (serial
    job count is the measured local-mode bottleneck, BENCH/BASELINE.md)."""
    rows = (
        df.groupBy(F.pmod(F.xxhash64(F.col(key)), F.lit(N_BUCKETS)).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("stage", F.lit(stage))
        .select("stage", "bucket", "rows")
        .collect()
    )
    spark = df.sparkSession
    spark.createDataFrame(rows or [], "stage string, bucket int, rows long").write.mode(
        "append"
    ).parquet(os.path.join(out_dir, "lineage"))
    return sum(r["rows"] for r in rows)


def _metric(spark: SparkSession, out_dir: str, stage: str, rows_out: int, seconds: float, result: PipelineResult) -> None:
    m = {"stage": stage, "rows_out": rows_out, "seconds": round(seconds, 3)}
    result.metrics.append(m)
    spark.createDataFrame(
        [(stage, rows_out, float(seconds))], "stage string, rows_out long, seconds double"
    ).write.mode("append").parquet(os.path.join(out_dir, "metrics"))


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    lexicon: DataFrame,
    out_dir: str,
    fuzzy_threshold: float = 88.0,
    salts: int | None = None,
    force: bool = False,
) -> PipelineResult:
    """Run (or resume) the 4-stage KG construction over a transcripts
    DataFrame. ``salts``: use the salted rewrite instead of broadcast for
    the canonicalization join (the >broadcast-size mapping path)."""
    res = PipelineResult(out_dir=out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def stage(name: str, key: str, produce):
        path = os.path.join(out_dir, name)
        if not force and _done(path):
            res.stages_skipped.append(name)
            return read_table(spark, path)
        t0 = time.time()
        df = produce()
        write_table(df, path, bucket_by=(N_BUCKETS, key))
        out = read_table(spark, path)
        n = _lineage(out, name, key, out_dir)
        _metric(spark, out_dir, name, n, time.time() - t0, res)
        res.stages_run.append(name)
        return out

    mentions = stage("mentions", "conv_id", lambda: extract_mentions(transcripts))

    def _link():
        linked, alias_edges = link_mentions(mentions, lexicon, fuzzy_threshold)
        write_table(alias_edges, os.path.join(out_dir, "alias_edges"), bucket_by=(8, "u"))
        return linked

    linked = stage("linked", "conv_id", _link)

    def _canon():
        alias_edges = read_table(spark, os.path.join(out_dir, "alias_edges"))
        triples = build_triples(transcripts, linked)
        mapping = canonical_mapping(alias_edges)
        if salts is None:
            return replace_entities(triples, mapping, broadcast_mapping=True)
        return replace_entities_salted(triples, mapping, salts)

    triples = stage("triples", "subject", _canon)

    def _nodes():
        from tera_spark.constants import RDF_TYPE, RDFS_LABEL

        types = triples.filter(F.col("predicate") == RDF_TYPE).select(
            F.col("subject").alias("id"), F.col("object").alias("kind")
        )
        labels = triples.filter(F.col("predicate") == RDFS_LABEL).select(
            F.col("subject").alias("id"), F.col("object").alias("label")
        )
        return (
            types.join(labels, "id", "left")
            .groupBy("id")
            .agg(F.min("kind").alias("kind"), F.min("label").alias("label"))
        )

    stage("nodes", "id", _nodes)
    stage(
        "edges",
        "src",
        lambda: triples.filter(~F.col("obj_is_literal")).select(
            F.col("subject").alias("src"),
            F.col("predicate").alias("pred"),
            F.col("object").alias("dst"),
        ),
    )
    return res
