"""Table profiling: per-column health statistics.

The first thing a data platform runs on every new ingest batch — null
rates, cardinalities, value ranges — and the input to schema-drift
alerts (compare the profile of batch N to batch N-1). The reference has
no profiling surface; this extends the engine for data-ops at the
100 TB design point (SURVEY.md §2 "beyond the reference" block).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, null_rate,
    n_distinct, min_value, max_value) — min/max cast to string so every
    column type shares one output schema. Ratios round to 6dp.

    Scale shape: ONE full-table aggregate computes every per-column
    count/min/max simultaneously (single scan, map-side partial
    aggregation), then the 1×(7·|cols|) result row is unpivoted
    driver-side into |cols| rows — the unpivot touches no data.
    n_distinct is EXACT (count_distinct): Catalyst plans the multi-
    distinct aggregate via expand (one scan, |cols|× row multiplication
    before the partial agg). On a corpus where exact per-column
    cardinality is too hot, use ``sketches.kmv_distinct`` per column
    instead — this operator is the exact baseline, same contract as
    ``textops.length_percentiles`` vs a quantile sketch.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            F.count_distinct(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_mn_{c}"),
            F.max(col).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(
            wide.select(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.when(F.col("_n") > 0, F.round((F.col("_n") - F.col(f"_nn_{c}")) / F.col("_n"), 6))
                .otherwise(F.lit(0.0))
                .alias("null_rate"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def key_skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """The pre-join skew probe: the ``top_n`` heaviest values of a key
    column with their counts and share of the table — the number that
    decides whether a planned join/groupBy on this key needs salting or
    AQE skew-join before it ships (one key holding >1/shuffle-partitions
    of the table IS the straggler). NULL keys are reported as a real
    population (they hash to one partition like any hot key).

    Returns (key string, n_rows, share round 6, rank) — ties break on
    the key value for a deterministic cut.

    Scale shape: one map-side-combine count + a distributed TakeOrdered
    top-n (never a global sort); total rows as a broadcast 1-row
    aggregate onto the n-row result.
    """
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_t"))
    w = Window.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_t"), 6).alias("share"),
            "rank",
        )
    )


def metric_drift(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_col: str,
    eps: float = 0.0,
) -> DataFrame:
    """Keyed-metric drift between two snapshots of the same aggregate —
    the monitoring join run after every incremental KG apply or corpus
    refresh ("which entities' PMI/activity/count moved, appeared,
    vanished"). Generic over any (key → numeric) table: PMI edges,
    entity activity, per-source doc counts, bench metrics.

    Returns one row per key in EITHER snapshot: key columns,
    ``old_val``/``new_val`` (null where absent), ``delta`` (new − old,
    absent side treated as 0 so added/removed keys carry their full
    magnitude), and ``status`` ∈ added | removed | changed | stable
    (|delta| ≤ ``eps`` → stable).

    Scale shape: ONE full-outer hash join on the key — both sides are
    already aggregates (snapshot-sized, not corpus-sized); coalesce on
    the join keys keeps the output key NULL-free. No window, no
    collect.
    """
    ov = F.col("old_val")
    nv = F.col("new_val")
    o = old.select(*key_cols, F.col(value_col).cast("double").alias("old_val"))
    n = new.select(*key_cols, F.col(value_col).cast("double").alias("new_val"))
    joined = o.join(n, key_cols, "full_outer")
    delta = F.coalesce(nv, F.lit(0.0)) - F.coalesce(ov, F.lit(0.0))
    status = (
        F.when(ov.isNull(), F.lit("added"))
        .when(nv.isNull(), F.lit("removed"))
        .when(F.abs(delta) <= F.lit(float(eps)), F.lit("stable"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *key_cols,
        "old_val",
        "new_val",
        F.round(delta, 6).alias("delta"),
        status.alias("status"),
    )


def psi_report(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the distribution-level companion to :func:`metric_drift`
    (which watches keyed aggregates): PSI = Σ_b (q_b − p_b)·ln(q_b/p_b)
    over equal-width bins fixed by the OLD snapshot's [min, max] (the
    standard scoring-model drift monitor; <0.1 stable, >0.25 action).

    Returns one row per bin: (bin int, lo double, hi double,
    old_frac, new_frac, contrib, psi) — ``psi`` is the total repeated
    on every row so the table is self-contained. New-snapshot values
    outside the old range clamp into the edge bins (they must count
    somewhere, and the edge is where they semantically belong). Both
    fractions are floored at ``eps`` before the log so empty bins
    contribute finitely. NULLs are excluded. If the OLD snapshot has no
    non-null rows at all, the bin bounds are undefined and every
    numeric column comes back NULL (psi included) — a broken upstream
    snapshot must read as "unknown drift", never as a silent 0.0
    "no drift".

    Scale shape: one aggregate for the old bounds (a broadcast 1-row
    join, same idiom as ``corpus.mixture_weights``), one
    map-side-combined groupBy per side onto ≤ ``bins`` keys, one tiny
    full-outer join. Never a sort, never a collect of data rows.
    """
    if bins < 2:
        raise ValueError(f"psi_report: bins must be ≥ 2, got {bins}")
    bounds = old.where(F.col(value_col).isNotNull()).agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    )

    def binned(df, frac_name):
        x = F.col(value_col).cast("double")
        width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
        raw = F.floor((x - F.col("_lo")) / width)
        b = (
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(F.greatest(F.lit(0), F.least(F.lit(bins - 1), raw)))
            .cast("int")
        )
        counts = (
            df.where(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(bounds))
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        total = counts.agg(F.sum("_n").alias("_t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bin", (F.col("_n") / F.col("_t")).alias(frac_name)
        )

    all_bins = (
        old.sparkSession.range(bins)
        .select(F.col("id").cast("int").alias("bin"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "bin",
            (F.col("_lo") + F.col("bin") * (F.col("_hi") - F.col("_lo")) / bins).alias("lo"),
            (F.col("_lo") + (F.col("bin") + 1) * (F.col("_hi") - F.col("_lo")) / bins).alias("hi"),
        )
    )
    p = binned(old, "old_frac")
    q = binned(new, "new_frac")
    joined = (
        all_bins.join(p, "bin", "left")
        .join(q, "bin", "left")
        .select(
            "bin",
            "lo",
            "hi",
            F.coalesce("old_frac", F.lit(0.0)).alias("old_frac"),
            F.coalesce("new_frac", F.lit(0.0)).alias("new_frac"),
        )
    )
    pf = F.greatest(F.col("old_frac"), F.lit(float(eps)))
    qf = F.greatest(F.col("new_frac"), F.lit(float(eps)))
    # lo IS NULL ⇔ the old snapshot had no non-null rows (bounds agg
    # returned NULL min/max) — poison every numeric output instead of
    # letting the eps floors manufacture a plausible-looking psi.
    ok = F.col("lo").isNotNull()
    contrib = F.when(ok, (qf - pf) * F.log(qf / pf))
    w = Window.partitionBy()
    return joined.select(
        "bin",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.round(F.when(ok, F.col("old_frac")), 6).alias("old_frac"),
        F.round(F.when(ok, F.col("new_frac")), 6).alias("new_frac"),
        F.round(contrib, 6).alias("contrib"),
        F.round(F.when(ok, F.sum(contrib).over(w)), 6).alias("psi"),
    )


def robust_outlier_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier summary per group — the curation filter that
    survives heavy-tailed corpora where mean/stddev thresholds don't
    (one 100 MB document drags a mean; it cannot drag a median). A row
    is an outlier when |x − median| > k · 1.4826 · MAD (the 1.4826
    factor scales MAD to σ under normality, so ``k`` reads like a
    z-score). MAD = 0 (over half the group identical) degenerates to
    flagging every x ≠ median — documented, and exactly what the oracle
    replays.

    Returns (group, n long, median double, mad double, n_outliers
    long), median/mad rounded to 6.

    Scale shape: two exact-median aggregates (Spark's ``median`` is a
    single-pass typed aggregate, no global sort) with a same-key join
    between them, then one count — three map-side-combinable exchanges
    on the group key, nothing corpus-wide.
    """
    x = F.col(value_col).cast("double")
    g = F.col(group_col).alias("group")
    med = df.groupBy(g).agg(
        F.median(x).alias("_med"), F.count(x).alias("n")
    )
    joined = df.select(g, x.alias("_x")).join(med, "group")
    dev = joined.withColumn("_adev", F.abs(F.col("_x") - F.col("_med")))
    mad = dev.groupBy("group").agg(F.median("_adev").alias("_mad"))
    flagged = (
        dev.join(mad, "group")
        .withColumn(
            "_out",
            F.col("_adev") > F.lit(float(k)) * F.lit(1.4826) * F.col("_mad"),
        )
        .groupBy("group")
        .agg(F.count(F.when(F.col("_out"), True)).alias("n_outliers"))
    )
    return (
        med.join(mad, "group")
        .join(flagged, "group")
        .select(
            "group",
            "n",
            F.round("_med", 6).alias("median"),
            F.round("_mad", 6).alias("mad"),
            "n_outliers",
        )
    )
