"""Corpus-level curation operators: statistical LM quality scoring and
fingerprint-containment near-dup detection.

These are the two training-data ops whose state is the CORPUS, not the
row: the bigram model's counts and the winnow inverted index are both
distributed tables, so each op is a fixed number of shuffles regardless
of corpus size (no driver-side model, no collect). No reference
counterpart — these extend the engine for LLM-data curation at the
100 TB design point (SURVEY.md §2 "beyond the reference" block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tera_spark.operators.textops import _tokens, with_fingerprint


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count-based bigram language-model scoring (the KenLM-style quality
    signal used by CCNet/Gopher to rank web documents): train add-one-
    smoothed bigram counts over the WHOLE corpus, then score every doc by
    its mean log-probability.

        p(w2 | w1) = (c(w1, w2) + 1) / (c(w1) + V)

    where c(w1) counts w1 as a bigram context and V is the corpus unigram
    vocabulary size. Self-trained on the scored corpus — deterministic,
    no external model — which is exactly the CCNet trick of ranking each
    document against the corpus's own statistics.

    Scale shape: one groupBy for bigram counts (map-side partial agg on
    zipfian keys), context counts derived from it (no second scan), V as
    a scalar join, then a re-join of the exploded bigrams against the
    count table (the count side is zipf-small relative to the corpus and
    AQE broadcast-joins it when it fits). Everything is JVM expressions;
    the mean is rounded to 6dp so the double-summation order can't leak
    into comparisons.

    Returns (doc_id, n_bigrams, avg_logprob); docs with < 2 tokens get
    n_bigrams = 0 and NULL avg_logprob.
    """
    toks = _tokens(F.col(text_col))
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    n = F.size("_t")
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),  # F.get is 0-based
            lambda i: F.struct(
                F.get(F.col("_t"), i).alias("w1"),
                F.get(F.col("_t"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    # Shape note (round 6): the tokenize+explode runs once per broadcast
    # build here (3x over the corpus) — but the A/B'd alternative (one
    # shared repartition(w1, w2) exchange) was 1.4x SLOWER: it ships every
    # bigram OCCURRENCE through a full sort+shuffle while this shape only
    # ever shuffles partially-aggregated zipf-small count tables and keeps
    # the scoring probe side broadcast-joined at scan parallelism. Left as
    # measured-fastest.
    bg = t.select("doc_id", F.explode(grams).alias("_g")).select(
        "doc_id", F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2")
    )

    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab_n = (
        t.select(F.explode("_t").alias("w")).agg(F.countDistinct("w").alias("v"))
    )

    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .withColumn("_lp", F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v"))))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("avg_logprob"),
        )
    )
    # left join back so <2-token docs appear with n_bigrams = 0
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        "avg_logprob",
    )


def quota_sample(
    docs: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum quota sampling — the domain-mix rebalance
    step of a training-data pipeline (cap each domain/language/source at k
    docs). Selection order is md5(stratum || id): a fixed pseudo-random
    permutation, so the sample is reproducible across runs/engines and
    adding documents never evicts a previously-chosen one unless they
    hash earlier (stable under append, unlike rand()-based sampling).

    One shuffle (hash by stratum) + per-partition top-k. Skew note: a
    stratum's rows all land on one reducer; at 100 TB with a dominant
    domain, prefilter with a hash threshold first (keep md5 < k/est_count
    × safety, computed from a count agg) so the windowed sort only sees
    ~k×safety rows per stratum — same result, bounded reducer. The plain
    form here is the small/medium-stratum path.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.concat_ws("|", F.col(strata_col), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def winnow_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fp_freq: int = 200,
    portable: bool = False,
) -> DataFrame:
    """Partial-duplication pairs by winnowing-fingerprint CONTAINMENT:
    |fp(a) ∩ fp(b)| / min(|fp(a)|, |fp(b)|) ≥ threshold. Jaccard misses
    a short doc embedded in a long one (the union dilutes it); containment
    is the standard detector for quote/boilerplate inclusion (Broder 1997's
    second resemblance measure, over Schleimer et al. 2003 winnow sketches).

    Same blocking scale-shape as ``ngram_jaccard_pairs``: explode the
    per-doc winnow set into an inverted index, drop fingerprints shared by
    > max_fp_freq docs (boilerplate/skew cap — the trade is recall on
    corpus-wide templates, documented here), self-join on fingerprint,
    group-count = |∩|. ``portable=True`` uses the md5-prefix gram hash so
    the DuckDB oracle replays the fingerprints value-for-value.
    """
    fp = with_fingerprint(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        portable=portable,
    ).select("doc_id", F.explode("fp_winnow").alias("fp"))
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    hot = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > max_fp_freq)
        .select("fp")
    )
    fp = fp.join(F.broadcast(hot), "fp", "left_anti")

    a = fp.select(F.col("doc_id").alias("a"), "fp")
    b = fp.select(F.col("doc_id").alias("b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_fp").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_fp").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn("containment", F.col("inter") / F.least("na", "nb"))
        .filter(F.col("containment") >= threshold)
        .select("a", "b", F.round("containment", 6).alias("containment"))
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split step of a
    training-data pipeline. Each row's fraction is the first 60 bits of
    ``md5(salt|id)`` scaled to [0, 1); cumulative weight thresholds cut
    the range. Properties a ``rand()`` split lacks: reproducible across
    runs, engines, and partitionings; stable under append (new rows never
    move old rows between splits); re-saltable for independent re-splits.

    Scale shape: a pure projection — zero shuffles, zero state. The md5
    arithmetic is replayed verbatim by the DuckDB oracle.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    frac = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        # round the cumulative threshold so it equals the decimal literal
        # an oracle writes (0.9 + 0.05 in binary is 0.9500000000000001)
        acc = round(acc + weights[name], 12)
        branch = F.when(frac < acc, name)
        expr = branch if expr is None else expr.when(frac < acc, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.withColumn("split", expr)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    batching step: documents are concatenated in a deterministic order
    and the stream is cut every ``budget`` tokens, so every training
    sequence is exactly full (documents may span a cut; the attention
    mask handles the boundary downstream). Returns one row per document
    with its placement: ``shard``, ``offset`` (tokens before it in the
    shard's stream), ``seq_idx`` (the sequence its first token lands in),
    ``offset_in_seq``, and ``n_tokens``.

    Global concat order is inherently sequential, so packing is sharded:
    ``shard = crc32-free md5 bucket of the id``, and within a shard docs
    order by the md5 permutation (append-stable shuffle of the corpus,
    same trick as quota_sample). One window (= one hash-partition sort)
    per call; the cumulative sum is the only state and it is per-shard,
    so a 100 TB corpus packs with reducers bounded by corpus/n_shards —
    raise ``n_shards`` with the corpus (it only changes WHICH stream a
    doc lands in, never the packing rule).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = F.size(_tokens(F.col(text_col)))
    key = F.md5(F.concat_ws("|", F.lit("pack"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    out = (
        docs.select(
            F.col(id_col),
            toks.alias("n_tokens"),
            shard.alias("shard"),
            key.alias("_key"),
        )
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("seq_idx", (F.col("offset") / budget).cast("long"))
        .withColumn("offset_in_seq", F.col("offset") % budget)
        .drop("_key")
    )
    return out


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    portable: bool = False,
) -> DataFrame:
    """Benchmark decontamination — flag training documents whose n-gram
    content CONTAINS a benchmark item: |fp(doc) ∩ fp(bench)| / |fp(bench)|
    ≥ threshold over winnowing fingerprints (the eval-leakage check every
    serious pretraining pipeline runs; containment, not Jaccard, because
    a short benchmark item inside a long document is exactly the case).

    Scale shape: the benchmark is eval-set-sized (thousands of rows, not
    corpus-sized), so its exploded fingerprint table broadcasts; the
    corpus side explodes ONCE and semi-joins the broadcast before any
    aggregation — corpus rows sharing no fingerprint with any benchmark
    item never reach a shuffle. Returns (doc, bench, shared, containment)
    pairs at or above the threshold.
    """
    d_fp = (
        with_fingerprint(docs.select(id_col, text_col), text_col, portable=portable)
        .select(F.col(id_col).alias("_d"), F.explode("fp_winnow").alias("fp"))
        .distinct()
    )
    b_fp = (
        with_fingerprint(
            benchmark.select(bench_id_col, text_col), text_col, portable=portable
        )
        .select(F.col(bench_id_col).alias("_b"), F.explode("fp_winnow").alias("fp"))
        .distinct()
    )
    b_sizes = b_fp.groupBy("_b").agg(F.count("*").alias("_bn"))
    shared = (
        d_fp.join(F.broadcast(b_fp), "fp")
        .groupBy("_d", "_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(F.broadcast(b_sizes), "_b")
        .withColumn("containment", F.round(F.col("shared") / F.col("_bn"), 6))
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("_d").alias(id_col),
            F.col("_b").alias(bench_id_col),
            F.col("shared"),
            F.col("containment"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR — data selection with importance resampling (Xie et al. 2023)


def _hashed_feature_counts(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """Per-doc hashed n-gram feature counts — DSIR's representation: every
    unigram and bigram of the whitespace-normalized token stream hashes
    into one of ``n_buckets`` buckets (md5-based, so any engine replays
    it bit-for-bit). Returns (doc_id, bucket, c) with c = occurrences.
    All JVM array expressions; the only shuffle is the (doc, bucket)
    count aggregate, partially aggregated map-side."""
    toks = _tokens(F.col(text_col))
    t = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    n = F.size("_t")
    uni = F.transform(F.col("_t"), lambda w: F.concat(F.lit("u|"), w))
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat(
                F.lit("b|"),
                F.get(F.col("_t"), i),
                F.lit(" "),
                F.get(F.col("_t"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = t.select("doc_id", F.explode(F.concat(uni, bi)).alias("_f"))
    h = F.conv(F.substring(F.md5(F.col("_f")), 1, 15), 16, 10).cast("long")
    return (
        feats.select("doc_id", F.pmod(h, F.lit(n_buckets)).cast("long").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights: score every raw document by how much more
    likely its hashed-n-gram features are under the TARGET domain's
    distribution than under the raw corpus's own (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").
    Per-bucket add-one-smoothed log ratio

        lr(b) = ln((t_b + 1) / (T + B)) - ln((r_b + 1) / (R + B))

    (t/r = target/raw bucket counts, T/R totals, B = n_buckets); a doc's
    log importance weight is the count-weighted sum of lr over its
    features, and ``logweight_avg`` normalizes by feature count (the
    length-robust form to rank by).

    Scale shape: the two distributions are bucket tables of ≤ B rows —
    aggregated once each, then BROADCAST onto the per-doc feature counts;
    the raw corpus is scanned once and shuffled once (the (doc, bucket)
    partial-agg). No driver-side model, no collect; the target side is
    typically tiny (a quality slice) but nothing assumes it.

    Returns (doc_id, n_feats, logweight_sum, logweight_avg), rounded to
    6dp so double summation order can't leak into comparisons; docs with
    zero features keep n_feats = 0 and NULL weights.
    """
    doc_f = _hashed_feature_counts(docs, id_col, text_col, n_buckets)
    raw = doc_f.groupBy("bucket").agg(F.sum("c").alias("r"))
    tgt = (
        _hashed_feature_counts(target, id_col, text_col, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("c").alias("t"))
    )
    dist = (
        raw.join(tgt, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("t", F.lit(0)).alias("t"),
        )
        .crossJoin(
            F.broadcast(
                raw.agg(F.sum("r").alias("_rtot")).crossJoin(
                    tgt.agg(F.sum("t").alias("_ttot"))
                )
            )
        )
        .select(
            "bucket",
            (
                F.log((F.col("t") + 1) / (F.col("_ttot") + n_buckets))
                - F.log((F.col("r") + 1) / (F.col("_rtot") + n_buckets))
            ).alias("_lr"),
        )
    )
    scored = (
        doc_f.join(F.broadcast(dist), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("_lr")), 6).alias("logweight_sum"),
            F.round(
                F.sum(F.col("c") * F.col("_lr")) / F.sum("c"), 6
            ).alias("logweight_avg"),
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        "logweight_sum",
        "logweight_avg",
    )


def dsir_gumbel_topk(
    weights: DataFrame,
    k: int,
    weight_col: str = "logweight_avg",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR's selection step: importance RESAMPLING without replacement
    via the Gumbel top-k trick — add independent Gumbel(0,1) noise to
    each log weight and take the k largest, which samples k docs
    proportionally to their importance weights. The noise is
    deterministic (md5-derived uniform, inverse-CDF'd), so the sample is
    reproducible across runs/engines and re-saltable for independent
    draws.

    Scale shape: a projection plus a distributed top-k (TakeOrdered —
    per-partition heaps, never a global sort). Score ties break by id;
    scores round to 6dp so the ordering an oracle replays is exact.
    Zero-feature docs (NULL weight) never enter the draw.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    score = F.round(F.col(weight_col) + gumbel, 6)
    return (
        weights.filter(F.col(weight_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.col(weight_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 3,
) -> DataFrame:
    """Top-k keywords per document by TF-IDF over the corpus itself.

    Terms are lowercase alphabetic runs of ≥ ``min_token_len`` chars
    (engine-portable: the same regex runs in a SQL oracle). tf is the raw
    in-document term count; idf is the smoothed
    ``ln((N + 1) / (df + 1)) + 1`` (sklearn's ``smooth_idf`` form, so a
    term present in every document still scores > 0 and an unseen-df=0
    division can't occur). Ranking ties break on the ROUNDED score then
    term text, so the order is identical across engines despite float
    formatting.

    Scale shape: no driver-side vocabulary — term counts and document
    frequencies are distributed aggregates. Two shuffles total: one
    groupBy (doc_id, term) for tf (df rides the same exploded table as a
    second aggregate, and N is a broadcast 1-row count), one window over
    doc_id for the per-doc top-k whose partitions are single documents.
    The df table joins back on term — skew-safe: df is ≤ |vocabulary|
    rows and near-uniform after the min-length filter.

    Returns (doc_id, term, score, rank) with score rounded to 6 places.
    """
    terms = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "), " "),
        lambda t: F.length(t) >= min_token_len,
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(terms).alias("term")
    )
    tf = exploded.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG-style chunking: split each document into whitespace tokens and
    emit overlapping windows of ``chunk_tokens`` tokens every ``stride``
    tokens — the retrieval-unit materialization every embedding/indexing
    pipeline runs before ANN (operators/ann.py) can serve it. Case is
    preserved (unlike the lowercasing stats tokenizer ``textops._tokens``)
    because chunk text feeds an embedder, not a counter.

    Trailing-suffix rule: a final window that is entirely contained in the
    previous window (``chunk_len <= chunk_tokens - stride``) is dropped —
    it adds no new tokens, only an index entry that duplicates its
    predecessor's suffix. The first window is always kept, so every
    non-empty document yields >= 1 chunk and every token appears in >= 1
    chunk.

    Scale shape: shuffle-FREE — tokenize, explode a per-doc start
    sequence, slice: all JVM array expressions inside one codegen stage,
    output rows ~ n_tokens/stride per doc. Documents with NULL or
    whitespace-only text produce no chunks (there is nothing to index).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: F.length(x) > 0
    )
    base = (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .where(F.col("_n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    chunk_len = F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_start"))
    return (
        base.select(
            id_col, "_toks", "_n", F.explode(starts).alias("chunk_start")
        )
        .where(
            (F.col("chunk_start") == 0)
            | (chunk_len > chunk_tokens - stride)
        )
        .select(
            F.col(id_col),
            (F.col("chunk_start") / stride).cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            chunk_len.cast("int").alias("chunk_len"),
            F.array_join(
                F.slice("_toks", F.col("chunk_start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )


def token_pmi_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    min_token_count: int = 5,
    min_pair_count: int = 2,
) -> DataFrame:
    """Windowed token co-occurrence PMI — the word2vec-era association
    statistic (collocations, domain phrase mining, embedding-prep
    counts): for unordered token pairs co-occurring within ``window``
    positions,  pmi = ln(c(a,b)·N / (m(a)·m(b)))  over co-occurrence
    EVENTS (N = total events; m(x) = x's event participation, both
    roles — a same-token pair contributes twice to its own marginal).

    Skew control is the vocabulary FLOOR, not a cap: tokens with corpus
    count < ``min_token_count`` leave the universe before any pairing,
    which removes the long Zipf tail (most of the join fan-out) while
    the head stays exact. Pair fan-out per token position is then at
    most ``window`` — the pair table is O(corpus × window), never
    quadratic in document length.

    Scale shape: one positional explode, one vocabulary semi-join, one
    offset-explode equi-join on (doc, position) — an equi-join, NOT a
    position-range theta-join — then two aggregates (pairs, marginals)
    and a broadcast 1-row N. PMI rounds to 6dp (ln parity well inside
    rounding, as with the entity PMI).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: F.length(x) > 0
    )
    t = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.posexplode(toks).alias("_pos", "_tok")
    )
    vocab = (
        t.groupBy("_tok")
        .agg(F.count("*").alias("_tc"))
        .where(F.col("_tc") >= min_token_count)
        .select("_tok")
    )
    tt = t.join(vocab, "_tok")
    left = tt.select(
        "_id",
        "_tok",
        F.explode(
            F.array(*[F.col("_pos") + d for d in range(1, window + 1)])
        ).alias("_pos2"),
    )
    pairs = left.join(
        tt.select(
            "_id", F.col("_pos").alias("_pos2"), F.col("_tok").alias("_tok2")
        ),
        ["_id", "_pos2"],
    ).select(
        F.least("_tok", "_tok2").alias("tok_a"),
        F.greatest("_tok", "_tok2").alias("tok_b"),
    )
    c = pairs.groupBy("tok_a", "tok_b").agg(F.count("*").alias("n_cooc"))
    m = (
        c.select(F.col("tok_a").alias("_t"), "n_cooc")
        .unionAll(c.select(F.col("tok_b").alias("_t"), "n_cooc"))
        .groupBy("_t")
        .agg(F.sum("n_cooc").alias("_m"))
    )
    n_total = c.agg(F.sum("n_cooc").alias("_n"))
    return (
        c.where(F.col("n_cooc") >= min_pair_count)
        .join(m.select(F.col("_t").alias("tok_a"), F.col("_m").alias("_ma")), "tok_a")
        .join(m.select(F.col("_t").alias("tok_b"), F.col("_m").alias("_mb")), "tok_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "tok_a",
            "tok_b",
            "n_cooc",
            F.round(
                F.log(
                    F.col("n_cooc") * F.col("_n") / (F.col("_ma") * F.col("_mb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def mixture_weights(
    docs: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    token_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled sampling mixture over corpus groups (sources,
    languages, domains): weight_g ∝ mass_g^alpha, normalized to sum 1 —
    the standard multilingual/multi-source LM recipe (alpha=1 is
    proportional sampling, alpha=0 uniform, 0<alpha<1 up-samples the
    tail). ``mass_g`` is the document count, or the sum of ``token_col``
    when given (token-budget mixing, the form training actually uses).

    Returns (group, n_docs long, mass double, weight double), weights
    rounded to 6. NULL group is a real population and keeps its row.

    Scale shape: one map-side-combined groupBy; the normalizing constant
    rides a single-row broadcast join (the same 1-row crossJoin idiom as
    ``bigram_lm_scores`` — broadcast of one aggregate row, not a shuffle
    of the table).
    """
    mass = (
        F.sum(F.col(token_col)).cast("double")
        if token_col
        else F.count(F.lit(1)).cast("double")
    )
    g = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs"), mass.alias("mass")
    )
    powered = g.withColumn("_p", F.pow(F.col("mass"), F.lit(float(alpha))))
    total = powered.agg(F.sum("_p").alias("_z"))
    return (
        powered.crossJoin(F.broadcast(total))
        .select(
            "group",
            "n_docs",
            F.round("mass", 6).alias("mass"),
            F.round(F.col("_p") / F.col("_z"), 6).alias("weight"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    mapping: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment that can NOT leak near-duplicates across
    splits: every document is assigned by the md5 fraction of its dedup
    CLUSTER representative (``mapping`` = (doc_id, keep_id) from
    ``dedup.exact_dedup`` or ``dedup.resolve_duplicate_clusters``), so a
    cluster lands in one split atomically. Splitting raw doc ids instead
    puts a test document's near-twin in train — the eval-contamination
    mode :func:`contamination_pairs` exists to detect; this prevents it
    by construction.

    Unmapped documents (absent from ``mapping``) fall back to their own
    id — equivalent to being their own singleton cluster. Same
    determinism/append-stability/re-salt properties as
    :func:`hash_split`, which does the actual assignment.

    Scale shape: one hash join on doc_id (the mapping is corpus-sized —
    NOT broadcast) + the pure-projection split. Append-stable because
    both the mapping reps (min-id) and the md5 fraction are.
    """
    m = mapping.select(
        F.col(id_col).alias("doc_id"), F.col(mapping.columns[1]).alias("_rep")
    )
    joined = docs.join(m, docs[id_col] == m["doc_id"], "left").drop(m["doc_id"])
    keyed = joined.withColumn(
        "_split_key", F.coalesce(F.col("_rep").cast("string"), F.col(id_col).cast("string"))
    )
    return (
        hash_split(keyed, weights=weights, id_col="_split_key", salt=salt)
        .drop("_rep", "_split_key")
    )
