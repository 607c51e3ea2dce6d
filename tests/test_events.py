"""as-of join + sessionization (operators/events.py)."""

import datetime as dt

import pytest

from tera_spark.operators.events import asof_join, sessionize


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [("u1", _ts(5), "a"), ("u1", _ts(10), "b"), ("u1", _ts(2), "c"), ("u2", _ts(7), "d")],
        "k string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(3), 30.0), ("u1", _ts(10), 100.0), ("u2", _ts(8), 80.0)],
        "k string, ts timestamp, snap double",
    )
    got = {
        r.tag: r.snap
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert got["c"] is None          # before any right row
    assert got["a"] == 30.0          # latest ≤ 5 is ts=3
    assert got["b"] == 100.0         # equal ts matches (inclusive)
    assert got["d"] is None          # right row is in the future


def test_asof_join_rejects_column_clash(spark):
    df = spark.createDataFrame([("u1", _ts(0), 1.0)], "k string, ts timestamp, x double")
    with pytest.raises(ValueError, match="clash"):
        asof_join(df, df, on="k", ts="ts")


def test_sessionize_gaps_and_ties(spark):
    rows = [
        # u1: two sessions split by a >60s gap; a same-ts tie ordered by id
        (1, "u1", _ts(0)), (2, "u1", _ts(30)), (3, "u1", _ts(30)), (4, "u1", _ts(200)),
        # u2: sub-second gaps stay one session (microsecond math, not seconds)
        (5, "u2", _ts(0)), (6, "u2", dt.datetime(2024, 1, 1, 0, 0, 0, 500000)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = {
        r.event_id: (r.session_idx, r.session_id)
        for r in sessionize(df, gap_seconds=60, tiebreak="event_id").collect()
    }
    assert out[1] == (1, "u1:1") and out[2] == (1, "u1:1") and out[3] == (1, "u1:1")
    assert out[4] == (2, "u1:2")
    assert out[5] == (1, "u2:1") and out[6] == (1, "u2:1")


def test_sessionize_subsecond_gap_splits(spark):
    # gap_seconds=0 → any positive gap (even 1 µs) starts a new session
    rows = [
        (1, "u", dt.datetime(2024, 1, 1, 0, 0, 0, 0)),
        (2, "u", dt.datetime(2024, 1, 1, 0, 0, 0, 1)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = {r.event_id: r.session_idx for r in sessionize(df, gap_seconds=0).collect()}
    assert out == {1: 1, 2: 2}


def test_asof_nearest_tolerance_and_ties(spark):
    """Forward match beats a farther backward one; equidistant ties go
    backward; out-of-tolerance rows stay null; gap is signed."""
    from datetime import datetime

    from tera_spark.operators.events import asof_nearest

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, "u", t(10)), (2, "u", t(25)), (3, "u", t(50)), (4, "v", t(10))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t(8), 1.0), ("u", t(12), 2.0), ("u", t(30), 3.0)],
        "user_id string, ts timestamp, val double",
    )
    got = {
        r.event_id: r
        for r in asof_nearest(
            left, right, on="user_id", ts="ts", tolerance_us=10_000_000
        ).collect()
    }
    # event 1 at t=10: backward t=8 (gap 2) vs forward t=12 (gap 2) — tie → backward
    assert got[1].val == 1.0 and got[1].asof_gap_us == 2_000_000
    # event 2 at t=25: forward t=30 (gap 5) beats backward t=12 (gap 13)
    assert got[2].val == 3.0 and got[2].asof_gap_us == -5_000_000
    # event 3 at t=50: nearest is t=30, gap 20s > 10s tolerance → null
    assert got[3].val is None and got[3].asof_gap_us is None
    # key v has no right rows at all
    assert got[4].val is None


def test_session_stats_durations(spark):
    from datetime import datetime

    from tera_spark.operators.events import session_stats, sessionize

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    ev = spark.createDataFrame(
        [(1, "u", t(0)), (2, "u", t(10)), (3, "u", t(50)), (4, "v", t(5))],
        "event_id long, user_id string, ts timestamp",
    )
    s = sessionize(ev, gap_seconds=20, tiebreak="event_id")
    got = {r.session_id: r for r in session_stats(s).collect()}
    a = got["u:1"]
    assert a.n_events == 2 and a.duration_us == 10_000_000
    b = got["u:2"]
    assert b.n_events == 1 and b.duration_us == 0
    assert got["v:1"].n_events == 1


# --------------------------------------------------------------------------
# interval_join / coalesce_intervals (operators/events.py)
# --------------------------------------------------------------------------
def test_interval_join_multiplicity_and_bounds(spark):
    from tera_spark.operators.events import interval_join

    points = spark.createDataFrame(
        [("u1", _ts(5), "p5"), ("u1", _ts(10), "p10"), ("u1", _ts(100), "p100"),
         ("u2", _ts(5), "q5")],
        "k string, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [("u1", _ts(0), _ts(10), "A"),     # contains p5, p10 (inclusive end)
         ("u1", _ts(5), _ts(50), "B"),     # contains p5 (inclusive start), p10
         ("u2", _ts(90), _ts(95), "C")],   # matches nothing
        "k string, s timestamp, e timestamp, win string",
    )
    got = sorted(
        (r.tag, r.win)
        for r in interval_join(
            points, intervals, on="k", ts="ts", start="s", end="e",
            bin_seconds=7, interval_cols=["win"],
        ).collect()
    )
    assert got == [("p10", "A"), ("p10", "B"), ("p5", "A"), ("p5", "B")]


def test_interval_join_left_keeps_unmatched(spark):
    from tera_spark.operators.events import interval_join

    points = spark.createDataFrame(
        [("u1", _ts(5), 1), ("u1", _ts(99), 2)], "k string, ts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [("u1", _ts(0), _ts(10), "A")], "k string, s timestamp, e timestamp, win string"
    )
    rows = {r.pid: r.win for r in interval_join(
        points, intervals, on="k", ts="ts", start="s", end="e",
        bin_seconds=60, interval_cols=["win"], how="left",
    ).collect()}
    assert rows == {1: "A", 2: None}


def test_interval_join_rejects_clash_and_bad_how(spark):
    import pytest as _pt

    from tera_spark.operators.events import interval_join

    df = spark.createDataFrame([("u", _ts(0), _ts(1))], "k string, s timestamp, e timestamp")
    pts = spark.createDataFrame([("u", _ts(0), "x")], "k string, ts timestamp, s string")
    with _pt.raises(ValueError, match="clash"):
        interval_join(pts, df, on="k", ts="ts", start="s", end="e")
    with _pt.raises(ValueError, match="how"):
        interval_join(pts, df, on="k", ts="ts", start="s", end="e",
                      interval_cols=["e"], how="full")


def test_coalesce_intervals_islands(spark):
    from tera_spark.operators.events import coalesce_intervals

    iv = spark.createDataFrame(
        [
            # u1: [0,5]+[5,9] touch → merge; [3,4] nested → absorbed; [20,30] alone
            ("u1", _ts(0), _ts(5)), ("u1", _ts(5), _ts(9)), ("u1", _ts(3), _ts(4)),
            ("u1", _ts(20), _ts(30)),
            # u2: strictly disjoint stay apart; inverted row dropped
            ("u2", _ts(0), _ts(1)), ("u2", _ts(2), _ts(3)), ("u2", _ts(9), _ts(4)),
        ],
        "k string, s timestamp, e timestamp",
    )
    got = sorted(
        (r.k, r.s, r.e, r.n_merged)
        for r in coalesce_intervals(iv, on="k", start="s", end="e").collect()
    )
    assert got == [
        ("u1", _ts(0), _ts(9), 3),
        ("u1", _ts(20), _ts(30), 1),
        ("u2", _ts(0), _ts(1), 1),
        ("u2", _ts(2), _ts(3), 1),
    ]


def test_interval_roundtrip_coalesce_then_join(spark):
    # coalesced windows must classify points exactly as the raw set does
    from tera_spark.operators.events import coalesce_intervals, interval_join

    raw = spark.createDataFrame(
        [("u", _ts(0), _ts(10)), ("u", _ts(8), _ts(20)), ("u", _ts(40), _ts(50))],
        "k string, s timestamp, e timestamp",
    )
    pts = spark.createDataFrame(
        [("u", _ts(i), i) for i in (0, 15, 20, 21, 45, 60)],
        "k string, ts timestamp, pid int",
    )
    merged = coalesce_intervals(raw, on="k", start="s", end="e")
    inside = sorted(
        r.pid
        for r in interval_join(
            pts, merged, on="k", ts="ts", start="s", end="e",
            bin_seconds=5, interval_cols=["n_merged"],
        ).collect()
    )
    assert inside == [0, 15, 20, 45]


def test_cohort_retention_matrix(spark):
    from tera_spark.operators.events import cohort_retention

    d0 = dt.datetime(2024, 1, 1)   # epoch-day 19723 → bucket floor(19723/7)
    rows = [
        # u1 first in bucket B, active B and B+1; u2 first B, active B only;
        # u3 first B+1, active B+1 and B+3
        ("u1", d0), ("u1", d0 + dt.timedelta(days=1)), ("u1", d0 + dt.timedelta(days=8)),
        ("u2", d0 + dt.timedelta(days=2)),
        ("u3", d0 + dt.timedelta(days=7)), ("u3", d0 + dt.timedelta(days=22)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (r.cohort_bucket, r.bucket_offset): r.n_users
        for r in cohort_retention(df, bucket_days=7).collect()
    }
    b = (d0 - dt.datetime(1970, 1, 1)).days // 7
    # d0 is a Monday-aligned epoch-week? No: bucket is floor(epoch_days/7)
    b = ((d0 - dt.datetime(1970, 1, 1)).days) // 7
    assert got[(b, 0)] == 2            # u1, u2 in cohort b at offset 0
    assert got[(b, 1)] == 1            # only u1 returns next bucket
    assert got[(b + 1, 0)] == 1        # u3's cohort
    assert got[(b + 1, 2)] == 1        # u3 back two buckets later
    assert (b, 2) not in got
