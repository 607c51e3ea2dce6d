"""Text analysis for training-data curation: token counting, quality
scoring, language ID, document fingerprinting. All JVM-side expressions
(deliberately SQL-expressible so the DuckDB oracle can replay them);
the winnowing fingerprint is the one composition that uses array ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "une"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por"],
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: F.length(x) > 0)


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (regex segmentation:
    word pieces / digits / punctuation — a deterministic proxy for a BPE
    vocabulary)."""
    ws = F.size(_tokens(F.col(text_col)))
    # BPE-ish segmentation: camel-case pieces / caps runs / digit runs /
    # punctuation, via a lookaround-free pattern (portable Java-regex ∩ RE2)
    bpe_ish = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"([A-Z]?[a-z]+|[A-Z]+|[0-9]+|[^\w\s])"), F.lit(1)
        )
    )
    return docs.withColumn("ws_tokens", ws).withColumn("subword_tokens", bpe_ish)


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality heuristics →
    [0,1] score. All ratios rounded for engine-portable comparison."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    toks = _tokens(txt)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(txt, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    en_stop = F.size(F.filter(toks, lambda x: x.isin(LANG_PROFILES["en"])))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, en_stop / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        0.4 * len_score + 0.3 * alpha_ratio + 0.2 * (1 - punct_ratio) + 0.1 * stop_ratio
    )
    return (
        docs.withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax of per-language stopword hits
    (deterministic tie-break by language code)."""
    toks = _tokens(F.col(text_col))

    def stop_counter(words):
        # NB: a 2-arg lambda would be treated as (element, index) by
        # F.filter — keep the closure single-argument.
        return F.size(F.filter(toks, lambda x: x.isin(words)))

    scores = [(lang, stop_counter(words)) for lang, words in sorted(LANG_PROFILES.items())]
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, n in scores:  # strictly-greater keeps the earliest (sorted) lang on ties
        cond = n > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, n).otherwise(best_n)
    return docs.withColumn("lang_pred", best)


def with_repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher-style quality filters,
    Rae et al. 2021 §A1.1): the fraction of duplicate token 3-grams and the
    fraction of duplicate lines. High values flag boilerplate / degenerate
    generations that slip past length and punctuation heuristics. Pure JVM
    array expressions — no shuffle, no UDF — so the filter runs at scan
    speed on a 100 TB corpus and is replayable by the DuckDB oracle.

    Columns added: ``n_3grams``, ``dup_3gram_ratio``, ``n_lines``,
    ``dup_line_ratio`` (ratios rounded to 6dp for engine portability).
    """
    toks = _tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        ),
    ).otherwise(F.array())
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    n_g = F.size(grams)
    n_l = F.size(lines)
    dup_g = F.when(n_g > 0, (n_g - F.size(F.array_distinct(grams))) / n_g).otherwise(F.lit(0.0))
    dup_l = F.when(n_l > 0, (n_l - F.size(F.array_distinct(lines))) / n_l).otherwise(F.lit(0.0))
    return (
        docs.withColumn("n_3grams", n_g.cast("long"))
        .withColumn("dup_3gram_ratio", F.round(dup_g, 6))
        .withColumn("n_lines", n_l.cast("long"))
        .withColumn("dup_line_ratio", F.round(dup_l, 6))
    )


# PII patterns chosen from the Java-regex ∩ RE2 subset (no lookarounds) so
# the DuckDB oracle replays them verbatim. \b is an ASCII word boundary in
# both engines.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
URL_RE = r"https?://[A-Za-z0-9._~:/?#@!$&'*+,;=%()\[\]-]+"


def with_pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction for training-data release: counts of
    email / US-phone shaped spans and the text with each span replaced by a
    typed placeholder. Runs as two regexp passes per row, JVM-side.

    Columns added: ``n_emails``, ``n_phones``, ``redacted_md5`` (md5 of the
    redacted text — the full redacted column exists mid-plan; the hash keeps
    driver-contract results small while still pinning byte equality).
    """
    txt = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(txt, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
    )
    return (
        docs.withColumn(
            "n_emails", F.size(F.regexp_extract_all(txt, F.lit(PII_EMAIL_RE), F.lit(0))).cast("long")
        )
        .withColumn(
            "n_phones", F.size(F.regexp_extract_all(txt, F.lit(PII_PHONE_RE), F.lit(0))).cast("long")
        )
        .withColumn("redacted_md5", F.md5(redacted))
    )


def with_url_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """URL extraction for provenance / domain-mix curation: per-doc URL
    count, distinct registrable-host count, and the sorted distinct host
    list (the group-by-domain input for corpus-level domain quotas).

    Columns added: ``n_urls``, ``n_hosts``, ``hosts`` (array<string>,
    sorted for deterministic comparison).
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
    hosts = F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, r"https?://([^/?#:]+)", 1))
    )
    return (
        docs.withColumn("n_urls", F.size(urls).cast("long"))
        .withColumn("hosts", F.array_sort(F.array_distinct(hosts)))
        .withColumn("n_hosts", F.size(F.array_sort(F.array_distinct(hosts))).cast("long"))
    )


def with_fingerprint(
    docs: DataFrame, text_col: str = "text", portable: bool = False
) -> DataFrame:
    """Document fingerprints:
    - ``fp_md5``: md5 of whitespace-normalized lowercase text (exact-dup key);
    - ``fp_winnow``: winnowing fingerprint — k-gram (k=5 tokens) rolling
      hashes, min per sliding window (w=4) — robust to local edits.

    ``portable=True`` swaps the k-gram hash from xxhash64 (one fused JVM
    op, the scale default) to an md5-prefix bigint reproducible in DuckDB
    (``('0x'||substr(md5(g),1,15))::BIGINT``) so the winnow set is
    oracle-checkable value-for-value.
    """
    toks = _tokens(F.col(text_col))
    k, w = 5, 4
    if portable:
        gram_hash = lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    else:
        gram_hash = F.xxhash64
    kgrams = F.when(F.size(toks) >= k, F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: gram_hash(F.array_join(F.slice(toks, i + 1, k), " ")),
    )).otherwise(F.array(gram_hash(F.array_join(toks, " "))))
    docs = docs.withColumn("_kg", kgrams)
    windows = F.when(F.size("_kg") >= w, F.transform(
        F.sequence(F.lit(0), F.size("_kg") - w),
        lambda i: F.array_min(F.slice(F.col("_kg"), i + 1, w)),
    )).otherwise(F.array(F.array_min("_kg")))
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return (
        docs.withColumn("fp_md5", F.md5(norm))
        .withColumn("fp_winnow", F.array_distinct(windows))
        .drop("_kg")
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level duplicate spans (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find every maximal run
    of token positions whose k-token windows also occur elsewhere in the
    corpus — the span-granular signal (boilerplate, licenses, quoted
    chunks) that doc-level dedup can't see. The paper's suffix array is a
    single-machine structure; the distributed equivalent is rolling
    k-token window hashes: a window repeated ANYWHERE (across docs or
    within one) marks its positions, and adjacent marked positions merge
    into maximal spans via the island trick (pos - row_number() is
    constant within a run — one window sort per doc).

    Output: (doc_id, span_start, span_end, n_windows) with token
    positions 0-based, span_end exclusive-of-window-start + k (i.e. the
    duplicated text is tokens [span_start, span_end)); docs shorter than
    k tokens never emit.

    Scale shape: one explode (corpus token count rows), one groupBy on
    the window hash with map-side partial agg (zipfian — the hot grams
    ARE the result), one join back, one per-doc window sort. The gram
    count table is corpus-sized, so the join is shuffle-hash, not
    broadcast — correct at 100 TB where the dup-gram set doesn't fit a
    driver. md5 grams make any engine replay bit-identical.
    """
    from pyspark.sql import Window

    toks = _tokens(F.col(text_col))
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    n = F.size("_t")
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),  # slice() is 1-based
            lambda i: F.struct(
                (i - 1).cast("long").alias("pos"),
                F.md5(F.array_join(F.slice(F.col("_t"), i, k), " ")).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:long,g:string>>"))
    w = t.select("doc_id", F.explode(grams).alias("_w")).select(
        "doc_id", F.col("_w.pos").alias("pos"), F.col("_w.g").alias("g")
    )
    dup_g = w.groupBy("g").agg(F.count(F.lit(1)).alias("_c")).filter(F.col("_c") > 1)
    marked = w.join(dup_g.select("g"), "g", "left_semi")
    win = Window.partitionBy("doc_id").orderBy("pos")
    island = F.col("pos") - F.row_number().over(win)
    return (
        marked.withColumn("_is", island)
        .groupBy("doc_id", "_is")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_is")
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a bag-of-words query over a document
    table (Robertson & Zaragoza 2009), with Lucene's +1-inside-the-log idf
    so every matched term contributes a positive score.

    Scale shape: the postings explode is filtered to the query's terms
    BEFORE the (doc, term) aggregation, so the shuffle carries only
    |matching docs| x |Q| rows — never the corpus vocabulary; corpus
    stats (N, avgdl) ride a broadcast 1-row aggregate and the per-term
    document frequencies a |Q|-row broadcast join. Scores are rounded
    to 6 decimals before the top-k sort so the (score, doc_id) order —
    and therefore the k-cut — is engine-portable.
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = _tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t")).withColumn(
        "dl", F.size("_t")
    )
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        base.select("doc_id", "dl", F.explode("_t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf is unique per (doc, term), so plain count = document frequency
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_c", contrib)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_c"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)


def top_tokens(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus-level token frequency head (the Zipf table): top-k lowercase
    alphabetic tokens with count, corpus share, and rank. The standard
    first look at any crawl/corpus — vocabulary head inspection,
    stopword-list derivation, boilerplate smells (a too-heavy head is a
    template-duplication signal).

    Scale shape: one explode + one groupBy(token) aggregate (map-side
    partial combine carries the weight — token keys are Zipf-skewed but
    partial aggregation collapses the hot head before the shuffle), then
    a global top-k. The total-token count is a broadcast 1-row aggregate;
    no driver-side vocabulary. Ties break on token text so the ranking is
    engine-portable; share is rounded to 6 places.

    Returns (token, cnt, share, rank), k rows.
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "), " "),
        lambda t: F.length(t) >= 1,
    )
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.select(F.sum("cnt").alias("total"))
    # distributed top-k (TakeOrdered) FIRST, so the ranking window only
    # ever sees k rows — never a single-partition sort of the vocabulary
    head = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        head.join(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt").cast("double") / F.col("total"), 6))
        .withColumn("rank", F.row_number().over(w))
        .select("token", "cnt", "share", "rank")
    )


def length_percentiles(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    percentiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact nearest-rank percentiles of whitespace token counts per
    group — the corpus length profile every curation run reads before
    setting min/max-length filters (Gopher-style) or packing windows.

    Nearest-rank (value at index ceil(p·n) of the sorted multiset) rather
    than interpolated quantiles, deliberately: interpolation definitions
    differ across engines (Spark percentile vs DuckDB quantile_cont), the
    nearest-rank statistic is a real observed value and is byte-portable.
    Tie order inside row_number is irrelevant — the VALUE at a rank of a
    sorted multiset is well-defined regardless of how equal values are
    ordered.

    Scale shape: one projection, ONE sort window per group (spill-backed
    external sort, memory-bounded), one groupBy over rank-selected rows.
    For sketch-grade cheapness at extreme group sizes, pair with
    ``sketches.kmv_distinct``-style sampling upstream; this operator is
    the exact baseline.
    """
    n_tok = F.size(_tokens(F.col(text_col)))
    d = docs.where(F.col(text_col).isNotNull()).select(
        F.col(group_col).alias("grp"), n_tok.alias("n_tokens")
    )
    wo = Window.partitionBy("grp").orderBy("n_tokens")
    wa = Window.partitionBy("grp")
    r = d.withColumn("_rn", F.row_number().over(wo)).withColumn(
        "_cnt", F.count("*").over(wa)
    )
    aggs = [F.max("_cnt").alias("n_docs")]
    for p in percentiles:
        aggs.append(
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.lit(p) * F.col("_cnt")),
                    F.col("n_tokens"),
                )
            )
            .cast("long")
            .alias(f"p{int(round(p * 100))}")
        )
    return r.groupBy("grp").agg(*aggs)


def with_markdown_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Markdown/code structure signals per document: fenced code blocks,
    headers, links, list items — the mix features that let a curation
    pass weight code-heavy and documentation-heavy content differently
    (and catch markdown boilerplate masquerading as prose). All patterns
    sit in the Java-regex ∩ RE2 subset (no lookarounds) so the DuckDB
    oracle replays them verbatim; pure JVM expressions, scan-speed.

    Columns added: ``n_code_blocks`` (fence PAIRS — an unclosed trailing
    fence doesn't count), ``n_headers`` (lines starting '#'{1,6}+space),
    ``n_links`` ([text](url) spans), ``n_list_items`` (lines starting
    -/*/+ or 'digits.' + space).
    """
    txt = F.col(text_col)
    lines = F.split(txt, "\n")
    n_fences = F.size(F.regexp_extract_all(txt, F.lit("(```)"), F.lit(1)))
    return (
        docs.withColumn(
            "n_code_blocks", F.floor(n_fences / 2).cast("long")
        )
        .withColumn(
            "n_headers",
            F.size(
                F.filter(lines, lambda x: x.rlike("^#{1,6} "))
            ).cast("long"),
        )
        .withColumn(
            "n_links",
            F.size(
                F.regexp_extract_all(
                    txt, F.lit(r"(\[[^\]]*\]\([^)]*\))"), F.lit(1)
                )
            ).cast("long"),
        )
        .withColumn(
            "n_list_items",
            F.size(
                F.filter(lines, lambda x: x.rlike("^([-*+]|[0-9]+\\.) "))
            ).cast("long"),
        )
    )


def rrf_fuse(rankings: list, id_col: str = "doc_id", k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N rankings:
    score(d) = sum over lists of 1/(k + rank_d) — the standard hybrid-
    retrieval combiner (BM25 ∪ dense ANN) that needs no score
    calibration because only RANKS enter the sum. Each input DataFrame
    must carry (id_col, rank) with 1-based ranks; documents absent from
    a list simply contribute nothing (the RRF convention).

    Returns (id_col, rrf_score round 6, n_lists) — callers sort by
    (rrf_score desc, id) for a deterministic final ranking.

    Scale shape: plan-free union of the (top-k-sized, NOT corpus-sized)
    ranking tables + one groupBy. The fusion cost is O(Σ list lengths)
    regardless of corpus size — rankings are already cut to top-k
    upstream.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [r.select(F.col(id_col), F.col("rank")) for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.round(F.sum(1.0 / (F.lit(float(k)) + F.col("rank"))), 6).alias(
            "rrf_score"
        ),
        F.count("*").alias("n_lists"),
    )


def _line_key(col: Column) -> Column:
    """Normalized line identity for boilerplate matching: lowercase,
    whitespace collapsed, trimmed — same convention as
    ``dedup._norm_text`` so line- and doc-level dedup agree on what
    "the same text" means."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def boilerplate_line_report(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequent lines: every normalized line occurring in at least
    ``min_docs`` DISTINCT documents, with its document count. CCNet-style
    boilerplate detection (navigation chrome, cookie banners, license
    headers repeat across pages; body text doesn't) — the report is the
    curation-review artifact, :func:`remove_boilerplate` the enforcement.

    Returns (line_key string, n_docs long), empty/NULL lines excluded.

    Scale shape: explode lines → per-doc distinct → one
    map-side-combined ``groupBy(line_key)`` count. The distinct and the
    count share the same hash partitioning (line_key), so Catalyst plans
    ONE exchange; no driver-side state, no collect.
    """
    lines = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(F.split(F.col(text_col), "\n")).alias("_raw"),
    ).select("_d", _line_key(F.col("_raw")).alias("line_key"))
    return (
        lines.filter(F.col("line_key") != "")
        .dropDuplicates(["line_key", "_d"])
        .groupBy("line_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop corpus-frequent lines from every document. Returns one row
    per input document: (``id_col``, clean_text string, n_lines_kept
    long, n_lines_dropped long). Lines are matched by normalized
    identity (:func:`_line_key`) but the ORIGINAL line text and order
    are preserved in ``clean_text``; empty lines never count as
    boilerplate but survive in place (they carry paragraph structure).

    Scale shape: posexplode → left join against the (much smaller)
    boilerplate line set on line_key → ``groupBy(doc)`` reassembly via
    sort_array over (pos, line) structs. Two shuffles total (the
    boilerplate count + the reassembly); the join key is the line hash,
    so hot boilerplate lines are exactly the keys AQE's skew handling
    splits. Documents with zero surviving lines keep an empty string —
    the row is never lost (downstream joins depend on id completeness).
    """
    bp = boilerplate_line_report(
        docs, min_docs=min_docs, text_col=text_col, id_col=id_col
    ).select("line_key", F.lit(True).alias("_bp"))
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_raw"),
    ).withColumn("line_key", _line_key(F.col("_raw")))
    marked = lines.join(bp, "line_key", "left").withColumn(
        "_drop", F.coalesce(F.col("_bp"), F.lit(False)) & (F.col("line_key") != "")
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_drop"),
                                F.struct(F.col("_pos"), F.col("_raw").alias("_line")),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
            ).alias("clean_text"),
            F.count(F.when(~F.col("_drop"), True)).alias("n_lines_kept"),
            F.count(F.when(F.col("_drop"), True)).alias("n_lines_dropped"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    coverage: float = 0.95,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary head needed to cover a target share of token mass —
    the tokenizer-design report ("how large a word vocabulary covers 95%
    of this corpus"): tokens ranked by corpus frequency (ties by token,
    total order), kept while the PREVIOUS token's cumulative share is
    still below ``coverage`` — so the head INCLUDES the token that
    crosses the threshold and ``max(rank)`` is the answer.

    Returns (rank int, tok, cnt long, cum_frac double) for the head
    only; cum_frac rounded to 6 (the inclusion test uses the unrounded
    running sum, which is deterministic because the order is total).

    Scale shape: one map-side-combined token count (corpus-sized scan,
    vocab-sized result), a broadcast 1-row total, then ONE global sort
    of the VOCAB-sized table for the running sum — bounded by distinct
    tokens, never by corpus rows. The global window is the honest cost
    of a ranked report; it never touches corpus-sized data.
    """
    if not (0 < coverage <= 1):
        raise ValueError(f"vocab_coverage: coverage must be in (0, 1], got {coverage}")
    counts = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("_t"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("_cum", F.sum(F.col("cnt") / F.col("_t")).over(w))
    )
    prev_cum = F.col("_cum") - F.col("cnt") / F.col("_t")
    return (
        ranked.filter(prev_cum < F.lit(float(coverage)))
        .select("rank", "tok", "cnt", F.round("_cum", 6).alias("cum_frac"))
    )
