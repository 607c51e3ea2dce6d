import os

import pytest
from pyspark.sql import functions as F

from tera_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media_df,
)


def test_multimodal_features(spark):
    media = synth_media_df(spark, n=24)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 24
    for r in rows:
        assert r.decode_ok
        assert len(r.feat) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feat)
        assert r.n_bytes > 0
    # deterministic: same payload → same sha1/features
    again = {r.media_id: (r.sha1, tuple(r.feat)) for r in extract_features(media, dim=8).collect()}
    first = {r.media_id: (r.sha1, tuple(r.feat)) for r in rows}
    assert again == first


def test_frame_sample_plan(spark):
    media = synth_media_df(spark, n=12)
    plan = frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert all(r.frame_ts_ms % 500 == 0 for r in rows)
    vids = media.filter(F.col("kind") == "video").collect()
    expected = sum((v.duration_ms + 499) // 500 for v in vids)
    assert len(rows) == expected


def test_streaming_extraction_parity(spark, tmp_path):
    """foreachBatch reuses the batch operators — stream output over a
    static directory equals the batch run on the same data."""
    from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df
    from tera_spark.pipeline.extract import extract_mentions
    from tera_spark.pipeline.link import link_mentions
    from tera_spark.streaming.extract_stream import stream_mentions

    transcripts = transcripts_spark_df(spark, n_convs=8)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    transcripts.write.parquet(in_dir)
    lexicon = lexicon_spark_df(spark)

    q = stream_mentions(spark, in_dir, out_dir, ck_dir, lexicon)
    q.awaitTermination(120)
    q.stop()

    got = spark.read.parquet(out_dir)
    batch_linked, _ = link_mentions(extract_mentions(spark.read.parquet(in_dir)), lexicon)
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch_linked.collect()}
    assert a == b


def test_streaming_windowed_rate(spark, tmp_path):
    from tera_spark.fixtures.transcripts import transcripts_spark_df
    from tera_spark.streaming.extract_stream import windowed_mention_rate

    in_dir = str(tmp_path / "in2")
    transcripts_spark_df(spark, n_convs=6).write.parquet(in_dir)
    agg = windowed_mention_rate(spark, in_dir, window="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("mention_rate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql("select * from mention_rate").collect()
    assert len(rows) > 0
    assert {r.kind for r in rows} <= {"term", "code", "quantity"}
