"""Distributed cardinality sketches.

KMV (k-minimum-values) distinct-count estimation — the mergeable-sketch
answer to "how many distinct X per group" when the distinct set itself is
too large to count cheaply and an ESTIMATE with known error (~1/sqrt(k-2))
is enough: dashboards over 10^12-turn corpora, pre-sizing joins, skew
probes. Deterministic (md5-derived uniform hashes, no RNG), so results are
reproducible and exactly replayable by an independent engine — unlike
HLL-based ``approx_count_distinct``, whose register layout is
implementation-private. No reference counterpart (SURVEY.md §2
"beyond the reference" block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^60 — 15 hex digits of md5 interpreted as a uniform integer in [0, 2^60)
_KMV_SPACE = float(1 << 60)


def _h60(c):
    """md5 → uniform 60-bit non-negative integer (15 hex digits)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def count_min_sketch(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Materialize a count-min sketch of a value column: a
    ``depth × width`` counter table where row d counts values by
    H_d(v) = md5(d|v) mod width. The frequency estimate for any v is
    min_d counter[d][H_d(v)] — always an OVERestimate (collisions only
    add), within eps·N of truth with probability 1-delta for
    width = e/eps, depth = ln(1/delta). The mergeable heavy-hitter
    primitive: sketches of two corpus partitions merge by cell-wise
    addition, so the full-corpus sketch is a fixed-size (depth·width-row)
    table no matter how many trillion tokens feed it.

    Deterministic md5-derived hash rows (no RNG) — replayable by an
    independent engine, unlike implementation-private sketch layouts.

    Scale shape: one explode (×depth — a constant), one groupBy with
    map-side combine onto depth·width keys. The output is driver-sized.

    NULL values carry no frequency signal and are excluded.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    buckets = F.array(
        *[
            F.pmod(
                _h60(
                    F.concat_ws(
                        "|", F.lit(d), F.col(value_col).cast("string")
                    )
                ),
                F.lit(width),
            )
            for d in range(depth)
        ]
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.posexplode(buckets).alias("sketch_row", "bucket"))
        .groupBy("sketch_row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimates(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a count-min sketch for each row of ``items``: adds an
    ``est_count`` column = min over the sketch's depth rows. depth/width
    MUST match the sketch's build parameters (the hash family is derived
    from them). The sketch is depth·width rows — broadcast onto the
    queries, so estimation is join-shuffle-free on the item side.
    """
    buckets = F.array(
        *[
            F.pmod(
                _h60(
                    F.concat_ws(
                        "|", F.lit(d), F.col(value_col).cast("string")
                    )
                ),
                F.lit(width),
            )
            for d in range(depth)
        ]
    )
    probes = items.select(
        "*", F.posexplode(buckets).alias("sketch_row", "bucket")
    )
    keep = [c for c in items.columns]
    return (
        probes.join(F.broadcast(sketch), ["sketch_row", "bucket"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    est = (k-1) / h_(k)  with  h_(k) = the k-th smallest md5-hash of the
    group's distinct values normalized into [0,1); groups with <= k
    distinct values report the EXACT count (``is_exact`` = true). Standard
    KMV estimator (Bar-Yossef et al. 2002); relative error ~ 1/sqrt(k-2).

    Scale shape: one distinct over (group, hash) — map-side partial
    aggregation collapses repeats before the shuffle — then ONE sort-based
    window per group (Spark's external sorter spills, so per-group state
    is disk-bounded, and only the k-th row survives the cut). The sketch
    is mergeable by construction (min-k of a union = min-k of the merged
    min-k sets), which is what makes it valid under any partitioning.

    NULL values carry no cardinality signal and are excluded. The
    estimate is rounded to 6dp so double-summation order can't leak in.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .distinct()
    )
    wo = Window.partitionBy(*group_cols).orderBy("_h")
    wa = Window.partitionBy(*group_cols)
    r = d.withColumn("_rn", F.row_number().over(wo)).withColumn(
        "_cnt", F.count("*").over(wa)
    )
    return (
        r.where(F.col("_rn") == F.least(F.col("_cnt"), F.lit(k)))
        .select(
            *group_cols,
            F.when(F.col("_cnt") <= k, F.col("_cnt").cast("double"))
            .otherwise(
                F.round(
                    F.lit(float(k - 1)) / (F.col("_h") / F.lit(_KMV_SPACE)), 6
                )
            )
            .alias("est_distinct"),
            (F.col("_cnt") <= k).alias("is_exact"),
        )
    )


def bloom_build(
    df: DataFrame, value_col: str, n_bits: int = 4096, k: int = 4
) -> DataFrame:
    """Materialize a Bloom filter of a value column as its SET-BIT table
    (one row per distinct set bit, <= n_bits rows regardless of input
    size) — the seen-set primitive: stream/batch dedup against a
    historical corpus without joining the corpus (probe the driver-sized
    bit table instead). k md5-derived hash positions per value —
    deterministic, mergeable by plain union (OR of bitsets), and exactly
    replayable by an independent engine.

    Guarantee: NO false negatives ever; false-positive rate
    ~ (1 - e^(-k·n/m))^k for n inserted values and m = n_bits.

    Scale shape: one explode (×k, a constant) + one distinct with
    map-side combine onto <= n_bits keys. Output is driver-sized.
    """
    if n_bits < 1 or k < 1:
        raise ValueError("n_bits and k must be >= 1")
    positions = F.array(
        *[
            F.pmod(
                _h60(
                    F.concat_ws("|", F.lit(i), F.col(value_col).cast("string"))
                ),
                F.lit(n_bits),
            )
            for i in range(k)
        ]
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.explode(positions).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    items: DataFrame,
    value_col: str,
    n_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Probe a Bloom bit table for each row of ``items``: adds
    ``maybe_present`` = true iff ALL k positions are set (a false value
    is DEFINITIVE absence — the no-false-negative side of the
    guarantee). n_bits/k MUST match the build parameters. The bit table
    broadcasts, so probing is shuffle-free on the item side apart from
    the final regroup.
    """
    positions = F.array(
        *[
            F.pmod(
                _h60(
                    F.concat_ws("|", F.lit(i), F.col(value_col).cast("string"))
                ),
                F.lit(n_bits),
            )
            for i in range(k)
        ]
    )
    keep = list(items.columns)
    probes = items.select("*", F.explode(positions).alias("bit"))
    return (
        probes.join(
            F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
        )
        .groupBy(*keep)
        .agg((F.count("_set") == k).alias("maybe_present"))
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table with a PORTABLE layout — the md5-derived
    answer to the docstring caveat above: Spark's
    ``approx_count_distinct`` IS HLL, but its registers are
    implementation-private, so they can't be stored, merged across
    engines, or replayed by an oracle. These can.

    Layout: m = 2^p registers; for each value, h = 60-bit md5 hash,
    register j = h mod m, rho = (number of leading zero bits of
    h >> p within its 60-p bit width) + 1 — computed EXACTLY via the
    binary-string length (``bin()``), no float log2 at bucket
    boundaries. Returns one row per present (group, j): sparse —
    absent registers are zero by convention (:func:`hll_estimate`
    accounts for them).

    Mergeable: register tables from any partition/engine/day union +
    ``groupBy(j).max(rho)`` into the corpus sketch — the property that
    makes a 10^12-turn distinct count a fixed 2^p-row table per group.

    Scale shape: one projection + one map-side-combined groupBy onto
    ≤ m·|groups| keys. NULLs carry no cardinality signal and are
    excluded.
    """
    if not (4 <= p <= 16):
        raise ValueError(f"hll_registers: p must be in [4, 16], got {p}")
    group_cols = group_cols or []
    m = 1 << p
    w = 60 - p
    h = _h60(F.col(value_col).cast("string"))
    rest = F.shiftright(h, p)
    rho = (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.lit(w) - F.length(F.bin(rest)) + 1)
        .cast("int")
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.pmod(h, F.lit(m)).alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cardinality estimate from an :func:`hll_registers` table (original
    Flajolet et al. estimator): E = alpha_m·m² / Σ_j 2^-M_j with absent
    registers contributing 2^0 = 1, and the small-range linear-counting
    correction E := m·ln(m/V) when E ≤ 2.5·m and V (zero registers) > 0.
    Returns (group..., n_registers long, estimate double) — estimate
    rounded to 3 (the error is ~1.04/sqrt(m), far coarser than 1e-3).

    One map-side-combined aggregate over the (already register-sized)
    sketch — never touches the raw data.
    """
    if not (4 <= p <= 16):
        raise ValueError(f"hll_estimate: p must be in [4, 16], got {p}")
    group_cols = group_cols or []
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
    )
    v = F.lit(m) - F.col("n_registers")  # zero registers
    raw = F.lit(alpha * m * m) / (F.col("_s") + v.cast("double"))
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(v.cast("double") / F.lit(float(m))) * F.lit(-1.0),
    ).otherwise(raw)
    return agg.select(
        *group_cols, "n_registers", F.round(corrected, 3).alias("estimate")
    )
