"""Incremental KG maintenance: apply a batch of NEW transcripts to an
existing ``run_pipeline`` output without recomputing the per-turn stages
over the old corpus.

Why this exists: at the design-point corpus (10^12 turns) a full re-run per
ingest batch is a non-starter — the per-turn stages (extraction, linking)
are 95%+ of the work and are embarrassingly parallel *per conversation*, so
a new batch only needs them over ITS conversations. The only global state
is entity canonicalization (connected components over alias edges) and the
tables derived from it. The update exploits two structural facts:

1. **Alias edges are append-only** (linking is a pure per-surface-form
   function of the lexicon — the same normalized mention always produces
   the same edge, new batches can only ADD edges), so canonical components
   only ever MERGE. An id stored in the old triples table is by
   construction its own old canonical representative; after the merge its
   new representative is ``new_mapping[id]``. Hence the exact rewrite map
   for STORED values is ``new_mapping`` minus keys the old mapping already
   rewrote — delta-sized, broadcastable.
2. **Every derived table is hash-bucketed by its subject-side key** with
   the same ``pmod(xxhash64(key), N)`` function, so a triple, its node row
   and its edge rows land in the SAME bucket id. Rewriting a bounded set
   of buckets updates all three tables consistently, via Spark's dynamic
   partition overwrite (only the touched ``_bucket=`` dirs are replaced —
   the job commit swaps them atomically, so a crashed batch leaves the old
   data and a retry is safe).

Cost model (per batch): per-turn stages O(|delta|); one map-side
broadcast-probe scan of the old triples table to find rows whose canonical
id changed (no shuffle, no index needed); then reads/writes proportional
to the TOUCHED buckets only. Nothing scales with corpus size except the
single probe scan — and on the Iceberg path that scan can additionally
prune by a bloom filter on ``subject``/``object``.

Idempotency: a fully-applied batch re-submitted is dropped by the
seen-conversation guard; a batch retried after a mid-run crash recomputes
deterministically and every table update is a full-row (or natural-key)
dedup-then-overwrite, so replays converge to the same bytes. Equivalence
with a from-scratch run over (old ∪ delta) is asserted in
tests/test_pipeline.py.

Sandbox note: before overwriting a table we also read from, the final
contents are ``localCheckpoint``-ed to break the self-read (Spark refuses
or corrupts overwrite-while-reading on file sources). The production
target is Iceberg (sources/writers.py), whose snapshot isolation makes
that checkpoint unnecessary — MERGE INTO / dynamic overwrite read the old
snapshot while writing the new one.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from tera_spark.constants import NS_KG, RDF_TYPE, RDFS_LABEL
from tera_spark.operators.canonical import canonical_mapping
from tera_spark.operators.triples import replace_entities
from tera_spark.pipeline.extract import extract_mentions
from tera_spark.pipeline.kg import build_triples
from tera_spark.pipeline.link import link_mentions, prepare_lexicon
from tera_spark.pipeline.run import (
    N_BUCKETS,
    PipelineResult,
    _done,
    _lineage_exprs,
    _record,
)
from tera_spark.sources.writers import bucketize

TABLES = ("mentions", "linked", "alias_edges", "triples", "nodes", "edges")
_TRIPLE_COLS = ["subject", "predicate", "object", "obj_is_literal"]


def _bucket_of(col: str, n: int):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n)).cast("int")


def _overwrite_buckets(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    targets: list[int],
    n: int,
    dedup_cols: list[str] | None,
) -> dict:
    """Replace exactly the ``_bucket=`` partition dirs in ``targets`` with
    ``df``'s contents (dynamic partition overwrite). ``df`` must carry a
    ``_bucket`` column and cover every bucket whose contents changed.
    Buckets in ``targets`` that receive ZERO rows are deleted afterwards
    (dynamic overwrite only replaces partitions it writes — a bucket whose
    rows all moved elsewhere would otherwise keep its stale files).
    Returns the observed lineage values (rows + per-bucket counts)."""
    assert n <= N_BUCKETS, "lineage expressions cover up to N_BUCKETS buckets"
    # break the self-read before overwriting (see module docstring)
    df = df.repartition(max(1, len(targets)), "_bucket")
    if dedup_cols:
        df = df.dropDuplicates(["_bucket", *dedup_cols])
    df = df.localCheckpoint(eager=True)
    obs = Observation()
    df = df.observe(obs, *_lineage_exprs())
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    vals = obs.get
    for b in targets:
        if int(vals[f"b{b}"]) == 0:
            shutil.rmtree(os.path.join(path, f"_bucket={b}"), ignore_errors=True)
    return vals


def _distinct_buckets(df: DataFrame, col: str = "_bucket") -> list[int]:
    return sorted(int(r[0]) for r in df.select(col).distinct().collect())


def run_pipeline_incremental(
    spark: SparkSession,
    new_transcripts: DataFrame,
    lexicon: DataFrame,
    out_dir: str,
    fuzzy_threshold: float = 88.0,
    batch_id: str = "delta",
    guard_seen_convs: bool = True,
) -> PipelineResult:
    """Apply ``new_transcripts`` to the completed pipeline output at
    ``out_dir``. Result tables are equal (set-wise, and bit-identical
    after ordering) to a from-scratch ``run_pipeline`` over old ∪ new.

    ``guard_seen_convs``: drop conversations already applied (tracked in
    the small ``convs_applied`` table) — makes re-submitting an applied
    batch a no-op. ``batch_id`` scopes the lineage/metrics rows
    (``<stage>@<batch_id>``)."""
    res = PipelineResult(out_dir=out_dir)
    paths = {t: os.path.join(out_dir, t) for t in TABLES}
    missing = [t for t in TABLES if not _done(paths[t])]
    if missing:
        raise ValueError(
            f"incremental run needs a completed pipeline at {out_dir}; "
            f"missing stages: {missing}"
        )

    # Applied-conversation bookkeeping: a conversation with zero mentions
    # never reaches the mentions table, so the guard keys off a dedicated
    # small table of applied conv_ids. Bootstrapped once from the base
    # run's Conversation-type triples (every conversation emits one);
    # updated LAST below, so a crashed batch leaves the guard conservative
    # and the retry reconverges via the dedup-overwrite writes.
    convs_path = os.path.join(out_dir, "convs_applied")
    if not _done(convs_path):
        prefix = NS_KG + "conv/"
        seen0 = (
            spark.read.parquet(paths["triples"])
            .filter(
                (F.col("predicate") == RDF_TYPE)
                & (F.col("object") == NS_KG + "Conversation")
            )
            .select(F.col("subject").substr(len(prefix) + 1, 1 << 30).alias("conv_id"))
            .distinct()
        )
        bucketize(seen0, 8, "conv_id").write.mode("overwrite").partitionBy(
            "_bucket"
        ).parquet(convs_path)

    delta = new_transcripts
    if guard_seen_convs:
        seen = spark.read.parquet(convs_path).select("conv_id")
        delta = delta.join(seen, "conv_id", "left_anti")
    # checkpoint NOW: every downstream read of the old tables must see the
    # pre-batch state, and the guard's anti-join must run before any write
    delta = delta.localCheckpoint(eager=True)
    if delta.limit(1).count() == 0:
        res.stages_skipped = [f"{t}@{batch_id}" for t in TABLES]
        return res

    def stage(name: str, df: DataFrame, path: str, targets, n, dedup_cols):
        t0 = time.time()
        vals = _overwrite_buckets(spark, df, path, targets, n, dedup_cols)
        _record(out_dir, f"{name}@{batch_id}", vals, time.time() - t0, res)
        res.stages_run.append(f"{name}@{batch_id}")

    # ---- old canonical state, captured before anything is written
    old_edges = spark.read.parquet(paths["alias_edges"]).select("u", "v")
    old_mapping = canonical_mapping(old_edges).localCheckpoint(eager=True)

    # ---- per-turn delta stages (pure functions of the batch + lexicon)
    m_delta = bucketize(extract_mentions(delta), N_BUCKETS, "conv_id").localCheckpoint(
        eager=True
    )
    prepared = prepare_lexicon(lexicon)
    linked_raw, edges_delta = link_mentions(
        m_delta.drop("_bucket"), prepared, fuzzy_threshold
    )
    linked_delta = bucketize(linked_raw, N_BUCKETS, "conv_id").localCheckpoint(eager=True)
    edges_delta = edges_delta.localCheckpoint(eager=True)

    # ---- global step: components over the UNION of alias edges (small —
    # vocabulary-sized, not corpus-sized)
    new_mapping = canonical_mapping(
        old_edges.unionByName(edges_delta)
    ).localCheckpoint(eager=True)
    # stored-value rewrite map: ids the new mapping rewrites that the old
    # one didn't (everything stored in the old triples is its own old
    # canonical — see module docstring, fact 1)
    stored_rewrite = new_mapping.join(
        old_mapping.select("old"), "old", "left_anti"
    ).localCheckpoint(eager=True)

    # ---- delta triples, canonicalized with the new mapping
    t_delta = replace_entities(
        build_triples(delta, linked_delta.drop("_bucket")),
        new_mapping,
        deduplicate=False,
    ).withColumn("_bucket", _bucket_of("subject", N_BUCKETS))

    # ---- old rows whose canonical id changed: one map-side broadcast
    # probe over the old triples (subject side always, object side only
    # for non-literals), rewritten and re-bucketed by their new subject
    old_t = spark.read.parquet(paths["triples"])
    sr_s = F.broadcast(
        stored_rewrite.select(F.col("old").alias("_s_old"), F.col("new").alias("_s_new"))
    )
    sr_o = F.broadcast(
        stored_rewrite.select(F.col("old").alias("_o_old"), F.col("new").alias("_o_new"))
    )

    def _probe(t: DataFrame) -> DataFrame:
        return t.join(sr_s, t["subject"] == sr_s["_s_old"], "left").join(
            sr_o, (t["object"] == sr_o["_o_old"]) & (~t["obj_is_literal"]), "left"
        )

    hit = F.col("_s_new").isNotNull() | F.col("_o_new").isNotNull()
    rewritten = (
        _probe(old_t)
        .filter(hit)
        .select(
            F.coalesce("_s_new", "subject").alias("subject"),
            F.col("predicate"),
            F.coalesce("_o_new", "object").alias("object"),
            F.col("obj_is_literal"),
            F.col("_bucket").alias("_old_bucket"),
        )
        .localCheckpoint(eager=True)
    )
    upd = (
        rewritten.withColumn("_bucket", _bucket_of("subject", N_BUCKETS))
        .select(*_TRIPLE_COLS, "_bucket")
        .unionByName(t_delta.select(*_TRIPLE_COLS, "_bucket"))
        .localCheckpoint(eager=True)
    )
    targets = sorted(
        set(_distinct_buckets(rewritten, "_old_bucket")) | set(_distinct_buckets(upd))
    )

    # keep = untouched rows of the touched buckets (partition-pruned read)
    keep = (
        _probe(old_t.filter(F.col("_bucket").isin(targets)))
        .filter(~hit)
        .select(*_TRIPLE_COLS, "_bucket")
    )
    stage(
        "triples",
        keep.unionByName(upd),
        paths["triples"],
        targets,
        N_BUCKETS,
        ["subject", "predicate", "object"],
    )

    # ---- per-turn tables: the guard guarantees the batch's conversations
    # are unseen, so every delta row is new by construction — plain file
    # APPEND into the bucket dirs (delta-sized write, old files untouched).
    # The merge-overwrite path runs only when a crashed earlier attempt
    # left partial rows for these conversations (detected with a cheap
    # column-pruned semi-join), making retries byte-identical too.
    delta_convs = F.broadcast(delta.select("conv_id").distinct())
    for name, d in (("mentions", m_delta), ("linked", linked_delta)):
        partial = (
            spark.read.parquet(paths[name])
            .join(delta_convs, "conv_id", "left_semi")
            .limit(1)
            .count()
            > 0
        )
        if partial:
            tb = _distinct_buckets(d)
            old = spark.read.parquet(paths[name]).filter(F.col("_bucket").isin(tb))
            cols = [c for c in d.columns if c != "_bucket"]
            stage(name, old.unionByName(d), paths[name], tb, N_BUCKETS, cols)
        else:
            t0 = time.time()
            obs = Observation()
            d_obs = d.observe(obs, *_lineage_exprs())
            d_obs.write.mode("append").partitionBy("_bucket").parquet(paths[name])
            _record(out_dir, f"{name}@{batch_id}", obs.get, time.time() - t0, res)
            res.stages_run.append(f"{name}@{batch_id}")

    e_delta_b = bucketize(edges_delta, 8, "u")
    tb = _distinct_buckets(e_delta_b)
    old_e_b = spark.read.parquet(paths["alias_edges"]).filter(F.col("_bucket").isin(tb))
    stage("alias_edges", old_e_b.unionByName(e_delta_b), paths["alias_edges"], tb, 8, ["u", "v"])

    # ---- derived tables: nodes/edges are keyed by the triple's subject,
    # so bucket b of each derives exactly from triples bucket b — the
    # touched triple buckets are recomputed whole (reads the just-updated
    # triples, which is a different path from the table being written)
    upd_t = spark.read.parquet(paths["triples"]).filter(F.col("_bucket").isin(targets))
    types = upd_t.filter(F.col("predicate") == RDF_TYPE).select(
        F.col("subject").alias("id"), F.col("object").alias("kind")
    )
    labels = upd_t.filter(F.col("predicate") == RDFS_LABEL).select(
        F.col("subject").alias("id"), F.col("object").alias("label")
    )
    nodes = (
        types.join(labels, "id", "left")
        .groupBy("id")
        .agg(F.min("kind").alias("kind"), F.min("label").alias("label"))
        .withColumn("_bucket", _bucket_of("id", N_BUCKETS))
    )
    stage("nodes", nodes, paths["nodes"], targets, N_BUCKETS, None)

    edges = upd_t.filter(~F.col("obj_is_literal")).select(
        F.col("subject").alias("src"),
        F.col("predicate").alias("pred"),
        F.col("object").alias("dst"),
        "_bucket",
    )
    stage("edges", edges, paths["edges"], targets, N_BUCKETS, None)

    # record the batch's conversations LAST (see bootstrap note above)
    batch_convs = bucketize(delta.select("conv_id").distinct(), 8, "conv_id")
    tb = _distinct_buckets(batch_convs)
    old_c = spark.read.parquet(convs_path).filter(F.col("_bucket").isin(tb))
    _overwrite_buckets(
        spark, old_c.unionByName(batch_convs), convs_path, tb, 8, ["conv_id"]
    )
    return res
