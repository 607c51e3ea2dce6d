"""Deduplication operators for large-scale training-data pipelines.

All five variants follow the same scale shape: candidate generation by
*blocking* (never a cross join), pair scoring with JVM-side expressions,
verdicts per pair. Hash functions are engine-portable (md5 / explicit
arithmetic) so results are reproducible and oracle-checkable.

- exact        : hash-groupBy on normalized text (one shuffle)
- minhash LSH  : shingle → minhash (md5) → band buckets → bucket join
- simhash      : token hash → 64-bit signature → band-blocked Hamming
- n-gram Jaccard: shingle → inverted-index join → |∩|/|∪|
- embedding    : cosine over LSH-bucketed (or brute-forced) vectors
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_text(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def word_shingles(col, n: int = 3):
    """Distinct word n-grams, JVM-side."""
    toks = F.split(_norm_text(col), " ")
    return F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )).otherwise(F.array(_norm_text(col)))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: (doc_id, keep_id) for every doc; keep_id = min id among
    docs with identical normalized text. Map-side partial agg on the md5
    key; no skew (near-unique keys)."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(_norm_text(F.col(text_col))).alias("_k")
    )
    reps = keyed.groupBy("_k").agg(F.min("doc_id").alias("keep_id"))
    return keyed.join(reps, "_k").select("doc_id", "keep_id")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_freq: int = 200,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard ≥ threshold. Inverted-index
    blocking: only pairs sharing ≥1 (non-hot) shingle are considered;
    |∩| from the join group-count, |∪| = |a|+|b|-|∩|. Shingles appearing
    in > max_shingle_freq docs are dropped (boilerplate/skew control) —
    a standard recall trade documented at the call site."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    ).dropDuplicates(["doc_id", "sh"])
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_c")).filter(
        F.col("_c") > max_shingle_freq
    ).select("sh")
    sh = sh.join(F.broadcast(hot), "sh", "left_anti")

    a = sh.select(F.col("doc_id").alias("a"), "sh")
    b = sh.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: h_i = min(md5(i || shingle)). md5 is
    engine-portable (same hex in Spark and DuckDB) so signatures are
    oracle-checkable; min over hex strings ≡ min over the 128-bit value."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i) + "|"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band
    (bands × rows = num_hashes). Returns distinct (a, b) pairs, a < b.
    Band buckets are the blocking keys — the shuffle is on bucket ids,
    and identical docs collapse into the same bucket regardless of count
    (bounded by bucket-size cap upstream if a corpus has degenerate
    boilerplate)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    band_cols = [
        F.concat_ws(
            "|", F.lit(str(b)), *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bucket"))
    a = banded.select(F.col("doc_id").alias("a"), "bucket")
    b = banded.select(F.col("doc_id").alias("b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: per token xxhash64, each bit votes ±1,
    signature bit = sign of the vote sum. Pure aggregation — one shuffle."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    # bit 63 would overflow signed long via 1<<63; keep 63 bits (bit 63 unused)
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Blocking: split
    the signature into ``bands`` chunks — any pair within distance
    ``bands-1`` shares ≥1 exact chunk (pigeonhole), so candidates join on
    chunk value, then the exact Hamming check filters."""
    sig = simhash_signatures(docs, id_col, text_col, bits=63)
    chunk_bits = 63 // bands
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        F.shiftrightunsigned(F.col("simhash"), b * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1).cast("long"))
                        .cast("string"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    a = chunks.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"), "bucket")
    b = chunks.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold — brute-force variant (the
    correctness baseline; the scale path buckets by hyperplane LSH first,
    see operators/ann.py). Self-join pruned to a<b; dot products via
    zip_with/aggregate, JVM-side."""
    from tera_spark.operators.ann import cosine

    v = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = v.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )
