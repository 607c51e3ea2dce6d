"""Event-stream operators: as-of join and gap sessionization.

Beyond-reference training-data ops (the reference KG engine has no event
processing; these are the standard feature-engineering primitives a
transcript/event corpus needs before model training — "state of the world
as of this turn" joins and conversation sessionization).

Scale design:

- ``asof_join`` is the union+window formulation: tag both sides, union,
  one window over (key, ts) carrying the last right-side attributes
  forward, keep left rows. Exactly ONE shuffle on the join key — never a
  per-row range probe, never a broadcast of a fact-sized table. This is
  the only as-of formulation that survives a 100 TB event table: the
  alternative (theta-join on ``l.ts >= r.ts`` + argmax) is a quadratic
  blow-up per key in any engine.
- ``sessionize`` is two stacked windows on the same (key, ts) ordering —
  Catalyst plans them as a single sort+window stage, so it is also one
  shuffle end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the right row with the
    greatest ``ts`` ≤ the left row's ``ts`` (same key); nulls where no such
    row. Backward as-of with inclusive match — the same semantics as
    DuckDB/pandas ``ASOF JOIN`` on ``l.ts >= r.ts``.

    ``right_cols`` must be disjoint from ``left``'s columns. For a
    deterministic result the right side must be unique per (key, ts) —
    pre-aggregate if it is not (ties among identical right timestamps are
    otherwise resolved arbitrarily).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: right_cols clash with left columns: {sorted(clash)}")
    l_u = left.withColumn("_side", F.lit(1))
    r_u = right.select(on, ts, *right_cols).withColumn("_side", F.lit(0))
    u = l_u.unionByName(r_u, allowMissingColumns=True)
    # right rows (_side=0) sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(
            c, F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    return u.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts at the first event of
    a key and whenever the gap since the previous event exceeds
    ``gap_seconds``. Adds ``session_idx`` (1-based long per key) and
    ``session_id`` (``key:idx`` string). ``tiebreak`` orders events with
    identical timestamps deterministically (pass the event id column).

    Timestamps compare in microseconds (``unix_micros``) so sub-second
    gaps are exact — a seconds-truncating cast would misjoin dense event
    streams.
    """
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # cast handles TIMESTAMP_NTZ sources (unix_micros rejects them); the
    # session-tz shift cancels in the gap difference, so gaps stay exact
    cur_us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev_us = F.lag(cur_us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (cur_us - prev_us > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = events.withColumn("session_idx", F.sum(new_sess).over(run).cast("long"))
    return out.withColumn(
        "session_id",
        F.concat(F.col(key).cast("string"), F.lit(":"), F.col("session_idx").cast("string")),
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    tolerance_us: int,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Nearest-neighbor as-of: for each left row, attach ``right_cols``
    from the same-key right row with the SMALLEST absolute timestamp
    distance, provided it is within ``tolerance_us`` microseconds; nulls
    otherwise. Ties (a backward and a forward row equidistant) resolve
    to the BACKWARD row — the causality-respecting choice. Adds
    ``asof_gap_us`` (signed: left ts minus matched right ts; positive =
    matched backward). The sensor/log alignment join ``asof_join``
    cannot express (it only looks backward).

    Same right-side contract as ``asof_join``: unique per (key, ts).

    Scale shape: the union+window formulation, run once per direction —
    ONE hash exchange on the key feeding two sort passes (asc/desc).
    Never the quadratic per-row range probe: tolerance filtering happens
    AFTER the O(1)-per-row candidate pick, so cost is independent of the
    tolerance width (a range-join formulation degrades as tolerance
    grows).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_nearest: right_cols clash with left columns: {sorted(clash)}"
        )
    payload = F.struct(
        F.col(ts).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    l_u = left.withColumn("_side", F.lit(1))
    r_u = right.select(on, ts, payload.alias("_p")).withColumn(
        "_side", F.lit(0)
    )
    u = l_u.unionByName(r_u, allowMissingColumns=True)
    rp = F.when(F.col("_side") == 0, F.col("_p"))
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_pb", F.last(rp, ignorenulls=True).over(wb)).withColumn(
        "_pf", F.last(rp, ignorenulls=True).over(wf)
    )
    # cast: parquet NTZ timestamps reject unix_micros directly; the
    # session TZ is pinned UTC (session.py) so the cast is deterministic
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    lts = _us(F.col(ts))
    db = lts - _us(F.col("_pb._rts"))
    df_ = _us(F.col("_pf._rts")) - lts
    valid_b = F.col("_pb").isNotNull() & (db <= tolerance_us)
    valid_f = F.col("_pf").isNotNull() & (df_ <= tolerance_us)
    pick_b = valid_b & (~valid_f | (db <= df_))
    chosen = F.when(pick_b, F.col("_pb")).when(valid_f, F.col("_pf"))
    out = u.filter(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(c, chosen[c])
    out = out.withColumn(
        "asof_gap_us",
        F.when(chosen.isNotNull(), lts - _us(chosen["_rts"])),
    )
    return out.drop("_side", "_p", "_pb", "_pf")


def session_stats(
    sessionized: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Collapse a sessionized event table (``sessionize`` output) to one
    row per session: event count, start/end, duration in exact
    microseconds — the table engagement dashboards and session-length
    curation filters actually read.

    Scale shape: ONE groupBy on (key, session) — map-side combine; the
    key is the same hash the sessionize window already clustered by, so
    AQE typically rides the existing exchange. Duration uses exact
    integer microseconds (UTC-pinned cast, engine-portable).
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    return sessionized.groupBy(key, session_col).agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("start_ts"),
        F.max(ts).alias("end_ts"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str,
    start: str,
    end: str,
    bin_seconds: int = 3600,
    interval_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: attach every same-key interval row whose
    ``[start, end]`` (inclusive both ends) contains the point's ``ts``.
    A point inside k intervals yields k output rows (standard interval-
    join multiplicity); with ``how="left"`` unmatched points survive with
    null interval columns.

    Beyond-reference op: "which incident/session/deployment window was
    active when this event fired" — the maintenance-window join every
    event corpus needs and plain equi-joins can't express.

    Scale design — the bin-bucketing formulation, NOT a theta join:

    - A raw ``l.ts BETWEEN r.start AND r.end`` join is planned as
      (broadcast) nested-loop — per-key quadratic, dead at 100 TB.
    - Instead each interval is exploded to the epoch bins of width
      ``bin_seconds`` it covers (``sequence()`` — JVM-side, no Python),
      points compute their single bin, and the join is a plain EQUI-join
      on (key, bin) followed by the exact range filter. Shuffle cost is
      linear in points + interval-rows×bins-covered; Catalyst plans a
      hash join and AQE handles skewed bins.
    - ``bin_seconds`` trades duplication for selectivity: set it near the
      TYPICAL interval length so each interval explodes to ~2 bins. A
      degenerate interval spanning B bins emits B rows — bound below
      asserts B ≤ 10_000 per row to catch a mis-sized bin before it
      becomes a shuffle explosion.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how must be inner|left, got {how!r}")
    interval_cols = interval_cols or [
        c for c in intervals.columns if c not in (on,)
    ]
    clash = set(interval_cols) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval_join: interval_cols clash with point columns: {sorted(clash)}"
        )
    bin_us = int(bin_seconds) * 1_000_000

    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    iv = (
        intervals.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (_us(start) <= _us(end))
        )
        .withColumn("_b0", F.floor(_us(start) / bin_us))
        .withColumn("_b1", F.floor(_us(end) / bin_us))
    )
    # fail loudly on a mis-sized bin instead of silently exploding the
    # join. The assert is fused INTO _b1 (when(assert.isNull(), _b1)) so
    # column pruning can't optimize it away — a free-standing dropped
    # assert column would never execute.
    iv = iv.withColumn(
        "_b1",
        F.when(
            F.assert_true(
                F.col("_b1") - F.col("_b0") < 10_000,
                F.lit(
                    "interval_join: interval spans ≥10k bins — raise bin_seconds"
                ),
            ).isNull(),
            F.col("_b1"),
        ),
    )
    iv = iv.withColumn(
        "_bin", F.explode(F.sequence(F.col("_b0"), F.col("_b1")))
    ).select(
        F.col(on).alias("_ik"),
        "_bin",
        F.struct(*[F.col(c) for c in interval_cols]).alias("_ip"),
        _us(start).alias("_is"),
        _us(end).alias("_ie"),
    )
    pt = points.withColumn("_bin", F.floor(_us(ts) / bin_us))
    joined = pt.join(
        iv,
        (pt[on] == iv["_ik"])
        & (pt["_bin"] == iv["_bin"])
        & (_us(ts) >= iv["_is"])
        & (_us(ts) <= iv["_ie"]),
        "inner" if how == "inner" else "left_outer",
    )
    out = joined
    for c in interval_cols:
        out = out.withColumn(c, F.col("_ip")[c])
    return out.drop("_ik", "_bin", "_ip", "_is", "_ie")


def coalesce_intervals(
    intervals: DataFrame,
    on: str,
    start: str,
    end: str,
) -> DataFrame:
    """Merge overlapping or touching same-key intervals into maximal
    disjoint spans (gaps-and-islands). Returns one row per merged span:
    ``(on, start, end, n_merged)`` where ``n_merged`` counts the source
    rows absorbed. Intervals touch when the next ``start`` ≤ the running
    max ``end`` (inclusive ends — back-to-back [1,5],[5,9] merge).

    The alert/maintenance/mention-window consolidation step: raw interval
    emissions are heavily overlapping, and every downstream per-window
    cost (interval_join fan-out, storage) scales with their count.

    Scale shape: ONE shuffle — a single (key)-partitioned window ordered
    by (start, end) computes the running max end; island ids are a
    conditional running sum over the same sort; the final groupBy rides
    the same hash partitioning. Microsecond-exact timestamp math (same
    convention as ``sessionize``). NULL-bounded rows are dropped.
    """
    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    w = Window.partitionBy(on).orderBy(_us(start), _us(end))
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    df = (
        intervals.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (_us(start) <= _us(end))
        )
        .withColumn("_s", _us(start))
        .withColumn("_e", _us(end))
        .withColumn("_pmax", F.max("_e").over(wprev))
        .withColumn(
            "_new",
            F.when(
                F.col("_pmax").isNull() | (F.col("_s") > F.col("_pmax")), 1
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w))
    )
    return (
        df.groupBy(F.col(on), F.col("_island"))
        .agg(
            F.timestamp_micros(F.min("_s")).alias(start),
            F.timestamp_micros(F.max("_e")).alias(end),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_island")
    )


def cohort_retention(
    events: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users are
    cohorted by the epoch bucket (``bucket_days``-day granularity) of
    their FIRST event; each later event credits its user to
    (cohort_bucket, offset) where offset counts buckets since the
    cohort's. Returns (cohort_bucket long, bucket_offset long,
    n_users long) with distinct-user counts — offset 0 is the cohort
    size, and retention@k = n_users(k) / n_users(0) downstream.

    Scale shape: one min-aggregate per user (map-side combined), one
    join back on the user key (same hash partitioning), one
    distinct-count groupBy onto (cohort, offset) — tiny result. Epoch
    bucketing (floor of epoch-days / bucket_days) rather than calendar
    weeks keeps the math engine-portable and timezone-free (the session
    pins UTC; a calendar-week variant is a trivial recohort).
    """
    day_us = 86_400_000_000

    def _bucket(c):
        return F.floor(
            F.unix_micros(F.col(c).cast("timestamp"))
            / F.lit(day_us * int(bucket_days))
        )

    ev = events.where(F.col(ts).isNotNull()).select(
        F.col(on).alias("_u"), _bucket(ts).alias("_b")
    )
    first = ev.groupBy("_u").agg(F.min("_b").alias("_cohort"))
    return (
        ev.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_bucket"),
            (F.col("_b") - F.col("_cohort")).alias("bucket_offset"),
        )
        .agg(F.count_distinct(F.col("_u")).alias("n_users"))
    )
