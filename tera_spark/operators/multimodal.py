"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schema, batching, partition sizing, UDF
signatures) is real and tested; the *codec* calls are stubbed behind
``_HAS_CODECS`` because the decode libraries aren't in this container —
swap ``_fake_decode_*`` for PIL/librosa/av calls in production and nothing
else changes.

Execution model: ``mapInPandas`` with an Arrow-batch iterator — binary
payloads stream batch-by-batch through Python without materializing a
partition in memory; ``spark.sql.files.maxPartitionBytes`` (set in
session.py) keeps per-task byte volume bounded when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    import PIL  # noqa: F401

    _HAS_CODECS = True
except Exception:
    _HAS_CODECS = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha1 string, "
    "feat array<float>, decode_ok boolean"
)


def _fake_decode_features(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→feature step: a hash-
    derived vector. Replace with a real decoder when codecs exist."""
    if not _HAS_CODECS:
        h = hashlib.sha1(payload or b"").digest()
        return [int.from_bytes(h[i : i + 2], "big") / 65535.0 for i in range(0, dim * 2, 2)]
    raise NotImplementedError("real codec path: decode payload, extract features")


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Per-item features via mapInPandas (Arrow batch iterator)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "sha1": payloads.map(
                        lambda b: hashlib.sha1(b or b"").hexdigest()
                    ),
                    "feat": payloads.map(
                        lambda b, k=None: _fake_decode_features(b, k, dim)
                    ),
                    "decode_ok": payloads.map(lambda b: b is not None),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows — the
    distributed fan-out a real frame extractor would consume. Pure
    expression (sequence/explode)."""
    vids = media.filter(F.col("kind") == "video").filter(F.col("duration_ms").isNotNull())
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (no external data): payload =
    seeded bytes; metadata follows kind."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 4)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                1000 * (1 + i % 5) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
