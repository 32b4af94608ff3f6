"""Unit tests for the time-series operators with handcrafted expected
outputs (the oracle harness checks them statistically; these pin exact
semantics: as-of tie handling, session gap boundaries, range bounds)."""

from __future__ import annotations

import datetime as dt

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_backward_with_equality(spark):
    from olive_spark.ops.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(10), "b"), (2, ts(3), "c"), (3, ts(9), "d")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(5), 100.0), (1, ts(8), 200.0), (2, ts(4), 300.0)],
        "k long, rt timestamp, price double",
    )
    out = asof_join(left, right, on="k", left_time="t",
                    right_time="rt", right_cols=["price"])
    got = {r["tag"]: r["price"] for r in out.collect()}
    # equal timestamps match (<=); no prior row → null; key 3 unmatched
    assert got == {"a": 100.0, "b": 200.0, "c": None, "d": None}


def test_sessionize_gap_boundary(spark):
    from olive_spark.ops.timeseries import sessionize

    rows = [
        (1, ts(0)), (1, ts(20)),          # session 1 (gap 20m < 30m)
        (1, ts(51)),                       # gap 31m > 30m → session 2
        (2, ts(0)), (2, ts(30)),           # gap exactly 30m → SAME session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["dur_us"])
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert out == {
        (1, 1): (2, 20 * 60 * 1_000_000),
        (1, 2): (1, 0),
        (2, 1): (2, 30 * 60 * 1_000_000),
    }


def test_range_join_bounds(spark):
    from pyspark.sql import functions as F

    from olive_spark.ops.timeseries import range_join

    anchors = spark.createDataFrame([(1, 100)], "k long, at long")
    points = spark.createDataFrame(
        [(1, 100), (1, 101), (1, 104), (1, 105), (2, 102)],
        "k long, pt long",
    )
    out = range_join(
        anchors, points, on=("k", "k"), left_time="at", right_time="pt",
        lower=F.lit(1), upper=F.lit(5),
    )
    # (100, 105): pt in [101, 105) → 101, 104; key 2 excluded
    assert sorted(r["pt"] for r in out.collect()) == [101, 104]


def test_funnel_depths_greedy_anchor(spark):
    from olive_spark.ops.timeseries import funnel_depths

    W = 10 * 60 * 1_000_000  # 10-minute window
    rows = [
        # user 1: full chain inside window -> depth 3
        (1, ts(0), "view"), (1, ts(2), "click"), (1, ts(5), "purchase"),
        # user 2: click before any view doesn't count; later click ok -> 2
        (2, ts(0), "click"), (2, ts(1), "view"), (2, ts(3), "click"),
        # user 3: purchase outside the window from the FIRST view -> 2
        # (a later view would re-anchor under optimal semantics; greedy
        # earliest-anchor is the pinned contract)
        (3, ts(0), "view"), (3, ts(2), "click"),
        (3, ts(8), "view"), (3, ts(15), "purchase"),
        # user 4: purchase with no click stays depth 1
        (4, ts(0), "view"), (4, ts(1), "purchase"),
        # user 5: no view at all -> depth 0
        (5, ts(0), "click"), (5, ts(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: r["depth"]
        for r in funnel_depths(
            df,
            stages=[("view", "v"), ("click", "c"), ("purchase", "p")],
            window_us=W,
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 2, 4: 1, 5: 0}


def test_cohort_retention_offsets(spark):
    from olive_spark.ops.timeseries import cohort_retention

    B = 1_000_000  # 1-second buckets for the test
    mk = lambda sec: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)
    rows = [
        # user 1: cohort bucket 0, active at offsets 0, 1, 3
        (1, mk(0)), (1, mk(1)), (1, mk(3)),
        # user 2: same cohort, only offset 0 (two events, one bucket)
        (2, mk(0)), (2, mk(0)),
        # user 3: later cohort (bucket 5), active offsets 0 and 1
        (3, mk(5)), (3, mk(6)),
        # user 4: offset 7 exceeds max_offset=4 -> excluded row
        (4, mk(0)), (4, mk(7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in cohort_retention(
            df, bucket_us=B, max_offset=4
        ).collect()
    }
    t0 = 1_704_067_200 * 1_000_000  # 2024-01-01 epoch us
    assert out == {
        (t0, 0): 3, (t0, 1): 1, (t0, 3): 1,
        (t0 + 5 * B, 0): 1, (t0 + 5 * B, 1): 1,
    }


def test_ewma_recurrence_and_sort_order(spark):
    """EWMA folds y = a*x + (1-a)*y over time order, seeded with the
    first value; a single observation is its own EWMA; ties on the
    timestamp fold in value order (the determinism contract)."""
    import datetime as dt

    from olive_spark.ops.timeseries import ewma

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=1), 20.0),
        (1, t0 + dt.timedelta(hours=2), 30.0),
        (2, t0, 7.5),
        # key 3: tied timestamps — value order pins the fold
        (3, t0, 2.0),
        (3, t0, 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r["user_id"]: (r["n"], r["ewma"])
           for r in ewma(df, alpha=0.5).collect()}
    # key 1: y0=10 → y1=0.5*20+0.5*10=15 → y2=0.5*30+0.5*15=22.5
    assert out[1] == (3, 22.5)
    assert out[2] == (1, 7.5)
    # key 3: sorted (ts,value) → seed 1.0, then 0.5*2+0.5*1 = 1.5
    assert out[3] == (2, 1.5)


def test_interval_join_overlap_semantics(spark):
    """Half-open overlap: boundary touch is NOT overlap; containment
    is; a pair spanning many grid cells emits exactly once with the
    right overlap length."""
    from olive_spark.ops.timeseries import interval_join

    W = 100  # tiny grid so multi-cell spans are easy to construct
    left = spark.createDataFrame(
        [
            (1, 0, 250),      # spans cells 0,1,2
            (2, 300, 400),    # touches r20 at 400 — no overlap
            (3, 1000, 1100),
        ],
        "l_id long, l_start long, l_end long",
    )
    right = spark.createDataFrame(
        [
            (10, 50, 1050),   # overlaps 1 (200), 2 (100), 3 (50)
            (20, 400, 500),   # touches 2 — no overlap
        ],
        "r_id long, r_start long, r_end long",
    )
    out = {(r["l_id"], r["r_id"]): r["overlap_us"]
           for r in interval_join(left, right, bucket_us=W).collect()}
    assert out == {(1, 10): 200, (2, 10): 100, (3, 10): 50}


def test_interval_join_matches_bruteforce_on_random_intervals(spark):
    """300x300 seeded random intervals (lengths from sub-cell to
    many-cell, boundary-aligned values included) must reproduce the
    brute-force O(n^2) overlap set exactly — pins cell math, half-open
    ends, and first-shared-cell dedup across the whole value mix."""
    import random

    from olive_spark.ops.timeseries import interval_join

    rng = random.Random(42)
    W = 1000

    def mk(n, base):
        out = []
        for i in range(n):
            # mix: aligned starts, off-by-one boundaries, random
            s = rng.choice([
                rng.randrange(0, 50_000),
                rng.randrange(0, 50) * W,       # cell-aligned
                rng.randrange(1, 50) * W - 1,   # just below a boundary
            ])
            ln = rng.choice([1, rng.randrange(1, 100), rng.randrange(1, 5 * W)])
            out.append((base + i, s, s + ln))
        return out

    L, R = mk(300, 10_000), mk(300, 20_000)
    expect = {
        (l[0], r[0]): min(l[2], r[2]) - max(l[1], r[1])
        for l in L for r in R
        if l[1] < r[2] and r[1] < l[2]
    }
    left = spark.createDataFrame(L, "l_id long, l_start long, l_end long")
    right = spark.createDataFrame(R, "r_id long, r_start long, r_end long")
    got = {(r["l_id"], r["r_id"]): r["overlap_us"]
           for r in interval_join(left, right, bucket_us=W).collect()}
    assert got == expect


def test_interval_join_two_level_long_intervals_and_negatives(spark):
    """Brute-force parity across the two-level grid's interesting
    regimes: pathological long intervals (hundreds of fine cells —
    routed to the coarse grid), mixes straddling the long/short
    threshold, and pre-epoch (negative) timestamps — pmod cell math
    must floor toward -inf, where Spark's sign-keeping % misbuckets."""
    import random

    from olive_spark.ops.timeseries import interval_join

    rng = random.Random(1234)
    W = 1000

    def mk(n, base, span=(-200_000, 200_000)):
        out = []
        for i in range(n):
            s = rng.choice([
                rng.randrange(*span),
                rng.randrange(span[0] // W, span[1] // W) * W,
                rng.randrange(span[0] // W + 1, span[1] // W) * W - 1,
            ])
            ln = rng.choice([
                1,
                rng.randrange(1, 100),            # sub-cell
                rng.randrange(1, 5 * W),          # few cells
                rng.randrange(30 * W, 34 * W),    # straddles threshold=32
                rng.randrange(100 * W, 400 * W),  # pathological long
            ])
            out.append((base + i, s, s + ln))
        return out

    for thr in (1, 4, 32):
        L, R = mk(150, 10_000), mk(150, 20_000)
        expect = {
            (l[0], r[0]): min(l[2], r[2]) - max(l[1], r[1])
            for l in L for r in R
            if l[1] < r[2] and r[1] < l[2]
        }
        left = spark.createDataFrame(L, "l_id long, l_start long, l_end long")
        right = spark.createDataFrame(R, "r_id long, r_start long, r_end long")
        got = {(r["l_id"], r["r_id"]): r["overlap_us"]
               for r in interval_join(
                   left, right, bucket_us=W, long_threshold_cells=thr
               ).collect()}
        assert got == expect, thr


def test_interval_join_coarse_pass_bounds_explode_fanout(spark):
    """A year-long interval on an hour grid must explode into coarse
    cells (length / (threshold x bucket)), not 8760 fine cells — the
    fan-out bound that makes pathological intervals survivable."""
    from pyspark.sql import functions as F

    from olive_spark.ops.timeseries import interval_join

    HOUR = 3_600_000_000
    YEAR = 365 * 24 * HOUR
    left = spark.createDataFrame(
        [(1, 0, YEAR)], "l_id long, l_start long, l_end long"
    )
    right = spark.createDataFrame(
        [(10, 5 * HOUR, 6 * HOUR)], "r_id long, r_start long, r_end long"
    )
    out = interval_join(left, right, bucket_us=HOUR, long_threshold_cells=32)
    assert [(r["l_id"], r["r_id"], r["overlap_us"]) for r in out.collect()] \
        == [(1, 10, HOUR)]
    # explode fan-out of the long side: ceil(8760/32) = 274 coarse cells
    n_cells = left.select(
        F.explode(F.sequence(
            F.lit(0), F.lit(YEAR - 1) - F.pmod(F.lit(YEAR - 1), F.lit(32 * HOUR)),
            F.lit(32 * HOUR),
        )).alias("c")
    ).count()
    assert n_cells == 274


def test_resample_interpolate_fills_gaps_linearly(spark):
    """Gap ticks interpolate linearly between the neighboring bucket
    observations; observed ticks keep their own (last-in-bucket) value;
    bounds come from the data so every gap has both neighbors."""
    import datetime as dt

    from olive_spark.ops.timeseries import resample_interpolate

    H = 3_600_000_000

    def t(h):
        return dt.datetime(2024, 1, 1, h, 30, tzinfo=dt.timezone.utc)

    rows = [
        # user 1: obs at hours 0 and 3 -> gaps at 1, 2 interpolate 10->40
        (1, t(0), 10.0),
        (1, t(3), 40.0),
        # user 1 hour 5: two obs in one bucket -> later one wins
        (1, t(5).replace(minute=10), 99.0),
        (1, t(5), 100.0),
        # user 2: single obs -> single tick, no gaps
        (2, t(7), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {(r["user_id"], r["bucket_us"]): (r["value_interp"], r["is_gap"])
           for r in resample_interpolate(df).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
               .timestamp() * 1e6)
    assert out[(1, base + 0 * H)] == (10.0, False)
    assert out[(1, base + 1 * H)] == (20.0, True)
    assert out[(1, base + 2 * H)] == (30.0, True)
    assert out[(1, base + 3 * H)] == (40.0, False)
    # gap between 3 and 5 interpolates 40 -> 100 (the last obs in
    # bucket 5 by time wins)
    assert out[(1, base + 4 * H)] == (70.0, True)
    assert out[(1, base + 5 * H)] == (100.0, False)
    assert out[(2, base + 7 * H)] == (5.0, False)
    assert len(out) == 7


def test_ewma_and_funnel_max_series_guard(spark):
    """The collect_list size guard (r7 audit): a key whose gathered
    series exceeds max_series must fail LOUD at execution with the
    streaming-path pointer — not ride into an executor OOM — and the
    guard must be free when disabled or under the limit."""
    import pytest
    from pyspark.sql import functions as F

    from olive_spark.ops.timeseries import ewma, funnel_depths

    rows = [(f"u{i % 3}", float(i), float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))

    ok = ewma(df, max_series=20).collect()       # 20 rows/key: at limit
    assert len(ok) == 3
    assert ewma(df, max_series=None).count() == 3  # guard disabled

    with pytest.raises(Exception, match="max_series"):
        ewma(df, max_series=10).collect()

    ev = df.withColumn("event_type", F.lit("view"))
    assert funnel_depths(
        ev, [("view", "s1")], max_series=20
    ).count() == 3
    with pytest.raises(Exception, match="max_series"):
        funnel_depths(ev, [("view", "s1")], max_series=10).collect()


def test_funnel_chained_matches_array_walk(spark):
    """funnel_depths_chained (the unbounded-key scale path: chained
    min-aggregates, no gathered arrays) must compute the same depths as
    the array walk on unique (key, time) data — including randomized
    event streams."""
    import random

    from olive_spark.ops.timeseries import (
        funnel_depths,
        funnel_depths_chained,
    )

    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)
    rng = random.Random(7)
    types = ["view", "click", "purchase"]
    rows = []
    for u in range(60):
        n = rng.randint(1, 12)
        ts_pool = rng.sample(range(0, 3_000), n)
        for t in ts_pool:
            rows.append((u, base + _dt.timedelta(seconds=t * 30),
                         rng.choice(types)))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    stages = [("view", "v"), ("click", "c"), ("purchase", "p")]
    W = 10 * 60 * 1_000_000
    walk = {
        r["user_id"]: r["depth"]
        for r in funnel_depths(df, stages=stages, window_us=W).collect()
    }
    chained = {
        r["user_id"]: r["depth"]
        for r in funnel_depths_chained(
            df, stages=stages, window_us=W
        ).collect()
    }
    assert chained == walk
    assert set(walk.values()) & {0, 1, 2, 3}  # non-trivial fixture

    # REPEATED stage types (ClickHouse-style 'view -> view -> click'):
    # one event must not satisfy two consecutive identical stages —
    # the chained form needs strict t > m_{i-1} (r9 review finding)
    rep_stages = [("view", "a"), ("view", "b"), ("click", "c")]
    walk_r = {
        r["user_id"]: r["depth"]
        for r in funnel_depths(df, stages=rep_stages, window_us=W).collect()
    }
    chained_r = {
        r["user_id"]: r["depth"]
        for r in funnel_depths_chained(
            df, stages=rep_stages, window_us=W
        ).collect()
    }
    assert chained_r == walk_r
    one_view = spark.createDataFrame(
        [(1, base, "view")], "user_id long, ts timestamp, event_type string"
    )
    got1 = funnel_depths_chained(
        one_view, stages=rep_stages, window_us=W
    ).collect()
    assert [(r["user_id"], r["depth"]) for r in got1] == [(1, 1)]


def test_ewma_chunked_matches_sequential(spark):
    """ewma_chunked (affine segment composition, task memory bounded by
    chunk size) must agree with the sequential fold to FP re-association
    tolerance — with chunk smaller than the series so multiple segments
    actually compose, and chunk boundaries landing mid-series."""
    import math
    import random

    from olive_spark.ops.timeseries import ewma, ewma_chunked

    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)
    rng = random.Random(11)
    rows = []
    for u in range(10):
        n = rng.randint(5, 97)  # not a multiple of chunk
        for i in range(n):
            rows.append((u, base + _dt.timedelta(seconds=i),
                         rng.uniform(-100, 100)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    seq = {r["user_id"]: (r["n"], r["ewma"])
           for r in ewma(df, alpha=0.3).collect()}
    chk = {r["user_id"]: (r["n"], r["ewma"])
           for r in ewma_chunked(df, alpha=0.3, chunk=16).collect()}
    assert set(seq) == set(chk)
    for u in seq:
        assert seq[u][0] == chk[u][0]
        assert math.isclose(seq[u][1], chk[u][1], rel_tol=1e-9, abs_tol=1e-9), (
            u, seq[u], chk[u],
        )
    # degenerate: single-element series seeds correctly (y = x0)
    one = spark.createDataFrame(
        [(99, _dt.datetime(2024, 1, 1), 42.5)],
        "user_id long, ts timestamp, value double",
    )
    got = ewma_chunked(one, alpha=0.3, chunk=4).collect()[0]
    assert (got["n"], got["ewma"]) == (1, 42.5)
