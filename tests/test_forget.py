"""Decremental maintenance (pipeline/forget.py): forgetting conversations
from a built KG yields tables set-equal to a build that never saw them —
including entity un-merges — through the live view AND after compact();
forgotten conversations can be re-ingested; unknown/already-forgotten ids
no-op."""

import pytest
from pyspark.sql import functions as F

from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df
from tera_spark.pipeline.forget import run_pipeline_forget
from tera_spark.pipeline.incremental import (
    compact,
    read_live,
    read_refcounts,
    run_pipeline_incremental,
)
from tera_spark.pipeline.run import run_pipeline

TABLES = ("triples", "nodes", "edges", "mentions", "linked", "alias_edges")


def _rc_rows(spark, out_dir):
    return {
        tuple(r)
        for r in read_refcounts(spark, out_dir).select("rk", "k1", "k2", "n").collect()
    }


def _rows(spark, out_dir, table, live):
    df = (
        read_live(spark, out_dir, table)
        if live
        else spark.read.parquet(f"{out_dir}/{table}").drop("_bucket")
    )
    cols = sorted(df.columns)
    return {tuple(r) for r in df.select(cols).collect()}


def _assert_equal(spark, ref_dir, got_dir, live=True, tables=TABLES):
    for t in tables:
        a = _rows(spark, ref_dir, t, live=False)
        b = _rows(spark, got_dir, t, live=live)
        assert a == b, (
            f"{t}: expected {len(a)} rows, got {len(b)} "
            f"(missing {len(a - b)}, extra {len(b - a)})"
        )


def test_forget_equals_never_ingested(spark, lexicon_fixture, tmp_path):
    """The whole forget contract in one chained scenario (expensive
    fixtures reused): forget(B) == build(A); re-forget no-ops; compaction
    preserves it; re-ingesting B restores build(A ∪ B)."""
    lexicon = lexicon_fixture
    t_all = transcripts_spark_df(spark, n_convs=40).cache()
    convs = sorted(r[0] for r in t_all.select("conv_id").distinct().collect())
    keep, drop = convs[:28], convs[28:]
    t_a = t_all.filter(F.col("conv_id").isin(keep))

    work = str(tmp_path / "work")
    ref_a = str(tmp_path / "ref_a")
    ref_all = str(tmp_path / "ref_all")
    run_pipeline(spark, t_all, lexicon, work)
    run_pipeline(spark, t_a, lexicon, ref_a)
    run_pipeline(spark, t_all, lexicon, ref_all)

    map_pre = _rows(spark, work, "canonical_map", live=True)
    edges_pre = _rows(spark, work, "alias_edges", live=True)

    res = run_pipeline_forget(spark, drop, lexicon, work)
    assert res.stages_run  # something was actually written

    # the forgotten convs carried unique misspelling norms: edges were
    # removed and at least one canonical merge was undone — the split
    # path genuinely ran, this is not an append-only degenerate case
    map_post = _rows(spark, work, "canonical_map", live=True)
    edges_post = _rows(spark, work, "alias_edges", live=True)
    assert edges_post < edges_pre
    assert map_pre - map_post, "no canonical entry was retracted"

    _assert_equal(spark, ref_a, work, live=True)
    _assert_equal(
        spark, ref_a, work, live=True, tables=("canonical_map", "ent_index")
    )
    # the emission refcounts decrement to exactly the never-ingested
    # build's counts (counts are additive over conv-disjoint batches)
    assert _rc_rows(spark, work) == _rc_rows(spark, ref_a)

    # idempotent: same ids again (and unknown ids) are guarded no-ops
    res2 = run_pipeline_forget(spark, drop, lexicon, work)
    assert res2.stages_run == []
    res3 = run_pipeline_forget(spark, ["no-such-conv"], lexicon, work)
    assert res3.stages_run == []

    # compaction folds the forget batch into the base without drift
    compact(spark, work)
    _assert_equal(spark, ref_a, work, live=False)
    _assert_equal(
        spark, ref_a, work, live=False, tables=("canonical_map", "ent_index")
    )
    assert _rc_rows(spark, work) == _rc_rows(spark, ref_a)

    # a forgotten conversation is re-ingestable: tombstones are sequenced,
    # so the re-add wins and the graph returns to the full-corpus state
    res4 = run_pipeline_incremental(
        spark, t_all.filter(F.col("conv_id").isin(drop)), lexicon, work
    )
    assert res4.stages_run
    _assert_equal(spark, ref_all, work, live=True)
    assert _rc_rows(spark, work) == _rc_rows(spark, ref_all)


def test_forget_then_reingest_after_compact(spark, lexicon_fixture, tmp_path):
    """Same re-ingest guarantee when the forget was compacted first (the
    tombstones are gone from the log; the guard state must still allow the
    conversation back). Also exercises the refcounts bootstrap: the side
    table is deleted before the forget, which must rebuild it from the
    live linked table (the legacy-layout path)."""
    import shutil

    lexicon = lexicon_fixture
    t_all = transcripts_spark_df(spark, n_convs=14).cache()
    convs = sorted(r[0] for r in t_all.select("conv_id").distinct().collect())
    drop = convs[10:]

    work = str(tmp_path / "work")
    ref_all = str(tmp_path / "ref_all")
    run_pipeline(spark, t_all, lexicon, work)
    run_pipeline(spark, t_all, lexicon, ref_all)

    shutil.rmtree(f"{work}/refcounts")
    run_pipeline_forget(spark, drop, lexicon, work)
    compact(spark, work)
    res = run_pipeline_incremental(
        spark, t_all.filter(F.col("conv_id").isin(drop)), lexicon, work
    )
    assert res.stages_run
    _assert_equal(spark, ref_all, work, live=True)
    # the re-ingested batch's refcounts_adds restore the full-corpus counts
    assert _rc_rows(spark, work) == _rc_rows(spark, ref_all)


@pytest.fixture(scope="module")
def lexicon_fixture(spark):
    return lexicon_spark_df(spark).cache()


def test_forget_crash_retry(spark, lexicon_fixture, tmp_path, monkeypatch):
    """A crash mid-forget leaves the live view bit-identical to the
    pre-batch state (the half-written batch dir has no commit marker),
    and the retry converges to the never-ingested build."""
    import pytest as _pytest

    import tera_spark.pipeline.forget as fg

    lexicon = lexicon_fixture
    t_all = transcripts_spark_df(spark, n_convs=14).cache()
    convs = sorted(r[0] for r in t_all.select("conv_id").distinct().collect())
    drop = convs[10:]

    work = str(tmp_path / "work")
    ref_a = str(tmp_path / "ref_a")
    run_pipeline(spark, t_all, lexicon, work)
    run_pipeline(
        spark, t_all.filter(~F.col("conv_id").isin(drop)), lexicon, ref_a
    )

    pre = {t: _rows(spark, work, t, live=True) for t in ("triples", "nodes")}

    real = fg._write_part

    def boom(out_dir, batch_dir, name, df, **kw):
        if name == "nodes_adds":
            raise RuntimeError("injected crash before nodes write")
        return real(out_dir, batch_dir, name, df, **kw)

    monkeypatch.setattr(fg, "_write_part", boom)
    with _pytest.raises(RuntimeError, match="injected crash"):
        fg.run_pipeline_forget(spark, drop, lexicon, work, batch_id="crash")

    for t, rows in pre.items():
        assert _rows(spark, work, t, live=True) == rows, t

    monkeypatch.setattr(fg, "_write_part", real)
    res = fg.run_pipeline_forget(spark, drop, lexicon, work, batch_id="crash")
    assert res.stages_run
    _assert_equal(spark, ref_a, work, live=True)
