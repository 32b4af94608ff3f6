"""Time-series operators Spark lacks as built-ins (SURVEY.md §2.6 —
the reference implements none of these either; they are part of the
"operators a user of a 100 TB pipeline needs" surface).

- ``asof_join`` — the scalable union-sort formulation: tag both sides,
  one shuffle on the key, one sort by (key, time, side), then a running
  ``last(ignoreNulls)`` window carries the most recent right-side row
  forward. Cost is a single sort-shuffle regardless of time-range span —
  unlike the naive inequality join whose candidate set explodes with
  history length.
- ``range_join`` — equality keys + a bounded time window; expressed as a
  hash join on the key with the range as a post-join predicate so
  Catalyst/AQE pick broadcast vs shuffle. For key-free pure-interval
  joins, bucketize time instead (not needed by the current surface).
- ``sessionize`` — gap-based session assignment: lag + cumulative sum of
  gap-breaks, all window functions over one (key, time) sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _bounded_series(arr: Column, max_series: "int | None", op: str) -> Column:
    """Runtime size guard for per-key gathered series (``collect_list``
    ops buffer ONE key's whole series in one task).  Past ``max_series``
    elements the right tool is the streaming path
    (``applyInPandasWithState``) or a pre-bucketed variant, so fail loud
    at execution time — JVM-side ``assert_true`` inside the same
    expression, no extra job, no driver count — instead of letting the
    executor die on an opaque OOM a few hundred MB later.  ``None``
    disables the guard."""
    if max_series is None:
        return arr
    lim = int(max_series)
    # CASE WHEN with raise_error in the else branch: short-circuit
    # semantics evaluate the error only for an oversized key, and the
    # branches are genuinely different expressions so Catalyst's
    # SimplifyConditionals cannot fold the guard away (it does fold
    # `when(assert_true(c).isNull(), arr).otherwise(arr)` — both
    # branches equal — which silently disables the check).
    return F.when(F.size(arr) <= F.lit(lim), arr).otherwise(
        F.raise_error(
            F.format_string(
                f"{op}: a single key gathered %s series rows "
                f"(max_series={lim}) — an unbounded key belongs on the "
                "streaming path (applyInPandasWithState) or raise "
                "max_series explicitly",
                F.size(arr),
            )
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | tuple[str, str]",
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_time`` ≤ ``left_time`` within the same key (backward as-of);
    ``on`` is a shared column name or a (left_key, right_key) pair.
    Left rows with no prior right row keep nulls.

    Plan shape: union(tagged) → window sort by (key, t, side) → filter.
    One shuffle, one sort; no range-explosion."""
    lk, rk = (on, on) if isinstance(on, str) else on
    lt = left.select(
        F.col(lk).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols]).alias("s"))
            .schema["s"].dataType
        ).alias("_r"),
    )
    rt = right.select(
        F.col(rk).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
    # so a right row at exactly left_time is eligible (<= semantics).
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(rt).withColumn(
        "_asof", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1).select(
        "_l.*", *[F.col("_asof")[c].alias(c) for c in right_cols]
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    left_time: str,
    right_time: str,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """Rows of ``right`` whose time falls in [left_time+lower,
    left_time+upper) for the same key. Equality key keeps this a hash
    join; the range is a cheap post-join filter."""
    lk, rk = on
    cond = (
        (left[lk] == right[rk])
        & (right[right_time] >= left[left_time] + lower)
        & (right[right_time] < left[left_time] + upper)
    )
    return left.join(right, cond)


def resample_locf(
    df: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    interval_us: int = 3_600_000_000,
) -> DataFrame:
    """Downsample to a fixed grid with last-observation-carried-forward
    gap filling (the hypertable `time_bucket_gapfill` + `locf` pattern).

    Plan shape: per-key last-in-bucket aggregate (one shuffle), per-key
    min/max grid bounds derived from the same aggregate (no second scan),
    `sequence()` + explode to generate the dense grid JVM-side, then a
    window `last(value, ignorenulls)` carries observations forward.
    Everything stays keyed on ``key_col`` — grid generation adds no
    shuffle beyond the aggregate's."""
    from pyspark.sql.window import Window

    tus = F.unix_micros(F.col(time_col).cast("timestamp"))
    bucket = (tus - (tus % F.lit(interval_us))).alias("bucket_us")
    per_bucket = (
        df.select(F.col(key_col), bucket, F.col(value_col), tus.alias("_t"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key_col, "bucket_us")
                .orderBy(F.col("_t").desc(), F.col(value_col).desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(key_col, "bucket_us", F.col(value_col).alias("last_value"))
    )
    bounds = per_bucket.groupBy(key_col).agg(
        F.min("bucket_us").alias("_lo"), F.max("bucket_us").alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval_us))
        ).alias("bucket_us"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "bucket_us"], "left")
        .withColumn("value_locf", F.last("last_value", ignorenulls=True).over(w))
        .withColumn("is_gap", F.col("last_value").isNull())
        .select(key_col, "bucket_us", "value_locf", "is_gap")
    )


def resample_interpolate(
    df: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    interval_us: int = 3_600_000_000,
) -> DataFrame:
    """Downsample to a fixed grid with LINEAR-interpolation gap filling
    (the hypertable ``time_bucket_gapfill`` + ``interpolate`` pattern —
    the counterpart of :func:`resample_locf` for continuous signals).

    Same plan skeleton as LOCF — per-key last-in-bucket aggregate (one
    shuffle), per-key grid bounds from that aggregate, ``sequence`` +
    explode grid, left join — then TWO windows over the keyed grid: a
    backward pass carries the previous observation's (value, tick) and
    a forward pass the next observation's; gap ticks evaluate
    ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)``.  All
    tick arithmetic is exact BIGINT subtraction before one double
    division, and the expression shape is identical in the DuckDB
    oracle, so the IEEE results are bit-identical and emitted RAW —
    rounding would reintroduce drift, because the engines disagree on
    round-half ties (33.0428125 → .042813 in Spark's HALF_UP vs
    .042812 in DuckDB, measured).  Grid ticks outside the observed range cannot
    exist (bounds come from the data), and a gap at a key's first/last
    tick cannot happen for the same reason — every gap has both
    neighbors.  Everything stays keyed on ``key_col``: the windows
    reuse the join's partitioning, no extra shuffle."""
    from pyspark.sql.window import Window

    tus = F.unix_micros(F.col(time_col).cast("timestamp"))
    bucket = (tus - (tus % F.lit(interval_us))).alias("bucket_us")
    per_bucket = (
        df.select(F.col(key_col), bucket, F.col(value_col), tus.alias("_t"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key_col, "bucket_us")
                .orderBy(F.col("_t").desc(), F.col(value_col).desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(key_col, "bucket_us", F.col(value_col).alias("last_value"))
    )
    bounds = per_bucket.groupBy(key_col).agg(
        F.min("bucket_us").alias("_lo"), F.max("bucket_us").alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval_us))
        ).alias("bucket_us"),
    )
    wb = (
        Window.partitionBy(key_col)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("bucket_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_tick = F.when(
        F.col("last_value").isNotNull(), F.col("bucket_us")
    )
    joined = (
        grid.join(per_bucket, [key_col, "bucket_us"], "left")
        .withColumn("_pv", F.last("last_value", ignorenulls=True).over(wb))
        .withColumn("_pt", F.last(obs_tick, ignorenulls=True).over(wb))
        .withColumn("_nv", F.first("last_value", ignorenulls=True).over(wf))
        .withColumn("_nt", F.first(obs_tick, ignorenulls=True).over(wf))
    )
    frac = (
        (F.col("bucket_us") - F.col("_pt")).cast("double")
        / (F.col("_nt") - F.col("_pt")).cast("double")
    )
    interp = F.when(
        F.col("last_value").isNotNull(), F.col("last_value").cast("double")
    ).otherwise(
        F.col("_pv").cast("double")
        + (F.col("_nv").cast("double") - F.col("_pv").cast("double")) * frac
    )
    return joined.select(
        key_col,
        "bucket_us",
        interp.alias("value_interp"),
        F.col("last_value").isNull().alias("is_gap"),
    )


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds ``gap_minutes``. Returns
    one row per session: (key, session_id, n_events, t_start_us, dur_us).

    Gap math runs on integer epoch-microseconds (exact; a seconds cast
    would truncate sub-second gaps)."""
    tus = F.unix_micros(F.col(time_col).cast("timestamp"))
    w = Window.partitionBy(key).orderBy(tus)
    gap = tus - F.lag(tus).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = df.withColumn("_tus", tus).withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sess.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("_tus").alias("t_start_us"),
        (F.max("_tus") - F.min("_tus")).alias("dur_us"),
    )


def funnel_depths(
    df: DataFrame,
    stages: "list[tuple[str, str]]",
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    window_us: int = 7 * 24 * 3_600_000_000,
    max_series: "int | None" = 4_000_000,
) -> DataFrame:
    """ClickHouse-style window funnel: per key, how deep into the ordered
    ``stages`` chain the key progressed, anchored at its FIRST stage-1
    event, with every later stage required within ``window_us`` of that
    anchor (greedy earliest-match — deterministic, and equivalent to the
    chained min-aggregate SQL formulation whenever (key, time) pairs are
    unique).

    ``stages`` is [(event_type_value, stage_name), ...] in funnel order.

    Plan shape — ONE shuffle total: collect each key's (t, type) events,
    sort in place (sort_array, JVM-side), then F.aggregate walks the
    sorted array with a (depth, anchor_t, prev_t) state struct.  The
    naive alternative is len(stages) self-joins, i.e. len(stages)
    shuffles of the full event table; this formulation shuffles each
    event exactly once as a 16-byte pair.  Per-key arrays are bounded by
    per-key event counts — the same bound any per-key window sort needs —
    and a JVM-side ``max_series`` guard fails loud (with a pointer to the
    streaming path) if one key's series exceeds it, instead of OOMing.
    For keys that CAN exceed the guard, :func:`funnel_depths_chained`
    computes the same depths with bounded aggregation state (no
    gathered arrays) at the cost of len(stages) sequential jobs.
    """
    types = [s[0] for s in stages]
    evs = df.filter(F.col(type_col).isin(types)).select(
        F.col(key_col),
        F.struct(
            F.unix_micros(F.col(time_col).cast("timestamp")).alias("t"),
            F.col(type_col).alias("et"),
        ).alias("e"),
    )
    per_key = evs.groupBy(key_col).agg(
        _bounded_series(
            F.sort_array(F.collect_list("e")), max_series, "funnel_depths"
        ).alias("seq")
    )
    zero = F.struct(
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("anchor"),
        F.lit(0).cast("long").alias("prev"),
    )

    def step(acc, e):
        out = F.when(
            (acc["depth"] == 0) & (e["et"] == types[0]),
            F.struct(F.lit(1).alias("depth"), e["t"].alias("anchor"), e["t"].alias("prev")),
        )
        for d, t in enumerate(types[1:], start=1):
            out = out.when(
                (acc["depth"] == d)
                & (e["et"] == t)
                & (e["t"] <= acc["anchor"] + F.lit(window_us)),
                F.struct(
                    F.lit(d + 1).alias("depth"),
                    acc["anchor"].alias("anchor"),
                    e["t"].alias("prev"),
                ),
            )
        return out.otherwise(acc)

    return per_key.select(
        key_col, F.aggregate("seq", zero, step)["depth"].alias("depth")
    )


def funnel_depths_chained(
    df: DataFrame,
    stages: "list[tuple[str, str]]",
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    window_us: int = 7 * 24 * 3_600_000_000,
) -> DataFrame:
    """The UNBOUNDED-KEY scale path for :func:`funnel_depths`: the
    chained min-aggregate formulation — no per-key gathered array, so
    per-task memory is bounded by aggregation state (a few longs per
    key) no matter how pathological one key's event count is.

    Semantics: identical to the array-walk whenever a key's (time)
    values are unique across its stage events (greedy earliest-match
    from the first stage-1 anchor) — parity pinned by a randomized
    test.  With duplicate timestamps the walk breaks ties by the sorted
    array's struct order (time, then event-type string) while this
    formulation admits any same-instant event — the same caveat the
    SQL-oracle equivalence of funnel_depths already documents.

    Plan shape: stage i's events are filtered BEFORE its aggregation,
    so each event row enters exactly one slim (key, t) aggregate;
    stage i ≥ 2 equi-joins the per-key stage-(i-1) match time (one row
    per key) back onto its own events.  len(stages) sequential jobs of
    bounded-memory hash aggregates instead of one job whose state is a
    whole per-key series: the right trade once a key can exceed the
    array guard (:func:`_bounded_series`)."""
    types = [s[0] for s in stages]
    tus = F.unix_micros(F.col(time_col).cast("timestamp"))
    evs = df.filter(F.col(type_col).isin(types)).select(
        F.col(key_col), tus.alias("t"), F.col(type_col).alias("et")
    )
    # ONE shuffle establishes the per-key partitioning every downstream
    # step needs (guide §2.4): each stage aggregate, the stage joins,
    # and the distinct-keys pass all cluster on key_col, and because
    # they all branch off this SAME repartitioned frame, ReuseExchange
    # dedups the shuffle (and the scan feeding it) across the branches
    # — the previous shape re-scanned the events source once per stage
    # plus once for the key census, each branch paying its own
    # exchange (measured r16: 4 source scans, ~14 exchange
    # materializations for a 3-stage funnel; now 1 scan + 1 shared
    # exchange + the per-stage in-partition aggregates).
    evs = evs.repartition(key_col)
    # anchor: first stage-1 event per key
    cur = (
        evs.filter(F.col("et") == types[0])
        .groupBy(key_col)
        .agg(F.min("t").alias("m1"))
        .withColumn("anchor", F.col("m1"))
    )
    for i, t in enumerate(types[1:], start=2):
        nxt = (
            evs.filter(F.col("et") == t)
            .join(cur.select(key_col, f"m{i-1}", "anchor"), key_col)
            .filter(
                # STRICT: the walk consumes the matched event, so the
                # next stage matches a strictly-later event — with
                # unique per-key timestamps that is exactly t > m_{i-1}
                # (>= would let one event satisfy two consecutive
                # REPEATED stage types; r9 review finding)
                (F.col("t") > F.col(f"m{i-1}"))
                & (F.col("t") <= F.col("anchor") + F.lit(window_us))
            )
            .groupBy(key_col)
            .agg(F.min("t").alias(f"m{i}"))
        )
        cur = cur.join(nxt, key_col, "left")
    # depth = highest i with m_i non-null (progression is monotone)
    depth = F.lit(0)
    for i in range(1, len(types) + 1):
        depth = F.when(F.col(f"m{i}").isNotNull(), F.lit(i)).otherwise(depth)
    # re-attach keys that had events but never hit stage 1
    keys = evs.select(key_col).distinct()
    hit = cur.select(key_col, depth.alias("depth"))
    return keys.join(hit, key_col, "left").select(
        key_col, F.coalesce(F.col("depth"), F.lit(0)).alias("depth")
    )


def ewma_chunked(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    chunk: int = 65_536,
) -> DataFrame:
    """The UNBOUNDED-KEY scale path for :func:`ewma`: per-task memory is
    bounded by ``chunk`` elements instead of one key's whole series.

    Math: the EWMA recurrence is an affine map — a whole chunk of
    values composes to ``y_out = A·y_in + B`` with ``A = (1-α)^k`` and
    ``B`` the chunk's own fold seeded from 0 — so a key's series splits
    into rank-ordered chunks, each chunk folds independently (gathered
    array bounded by ``chunk``), and the per-key combine folds the FEW
    (A, B) summaries in chunk order.  Three slim hash shuffles (rank
    window, chunk aggregate, summary combine); task state bounded by
    chunk size at every point — no per-key series ever gathers whole.

    Not bit-identical to the sequential fold (FP re-association: A·y+B
    groups operations differently); agreement is ~1e-12 relative —
    pinned by the parity test.  Use :func:`ewma` where bit-stable
    cross-engine parity matters and series fit the guard."""
    a = float(alpha)
    # tie-break matches ewma()'s struct(t, x) sort: (time, value)
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col).cast("timestamp"),
        F.col(value_col).cast("double"),
    )
    ranked = df.select(
        F.col(key_col),
        F.col(time_col),
        F.col(value_col).cast("double").alias("x"),
        ((F.row_number().over(w) - 1) / F.lit(chunk)).cast("long")
        .alias("__chunk"),
        ((F.row_number().over(w) - 1) % F.lit(chunk)).alias("__pos"),
    )
    # per (key, chunk): ordered in-chunk fold seeded from 0, plus A
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("__pos").alias("p"),
                                F.col("x").alias("x")))
    )
    al = F.lit(a)
    fold0 = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, s: al * s["x"] + (F.lit(1.0) - al) * acc,
    )
    seg = ranked.groupBy(key_col, "__chunk").agg(
        F.count("*").alias("k"),
        fold0.alias("B"),
        F.min_by("x", "__pos").alias("x0"),
    ).withColumn("A", F.pow(F.lit(1.0 - a), F.col("k")))
    # per key: fold the few chunk summaries in order.  Chunk 0 seeds
    # with its first RAW value (y_1 = x_1), matching ewma()'s seeding:
    # its exact fold is x0·(1-α)^(k-1) + fold-from-0 of the tail — but
    # expressing the tail-refold cheaply: B0 computed from 0 differs
    # from the seeded fold by (x0 - α·x0)·(1-α)^(k-1) = x0·(1-α)^k.
    combined = F.aggregate(
        F.sort_array(F.collect_list(F.struct(
            F.col("__chunk").alias("c"), F.col("A").alias("A"),
            F.col("B").alias("B"), F.col("x0").alias("x0"),
        ))),
        F.struct(F.lit(True).alias("first"), F.lit(0.0).alias("y")),
        lambda acc, s: F.struct(
            F.lit(False).alias("first"),
            F.when(
                acc["first"],
                # seed correction: y = B + x0·(1-α)^k
                s["B"] + s["x0"] * s["A"],
            ).otherwise(s["A"] * acc["y"] + s["B"]).alias("y"),
        ),
    )["y"]
    return seg.groupBy(key_col).agg(
        F.sum("k").alias("n"),
        F.round(combined, 6).alias("ewma"),
    )


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    bucket_us: int = 7 * 24 * 3_600_000_000,
    max_offset: int = 4,
) -> DataFrame:
    """Cohort retention: users bucketed by their FIRST event's time
    bucket (the cohort); for each cohort and bucket offset k, how many of
    the cohort's users were active k buckets later.

    Plan shape: per-key min (one slim shuffle on key), equi-join of the
    (key, cohort) map back onto the (key, bucket) activity pairs — same
    join key as the aggregate, so a co-partitioned hash join — then one
    small (cohort, offset) count-distinct.  Events shuffle as 16-byte
    pairs, never full rows; distinct-per-(cohort,offset) is bounded by
    cohort sizes."""
    tus = F.unix_micros(F.col(time_col).cast("timestamp"))
    b = (tus - tus % F.lit(bucket_us)).alias("bucket")
    acts = df.select(F.col(key_col), b).distinct()
    cohorts = acts.groupBy(key_col).agg(F.min("bucket").alias("cohort"))
    joined = acts.join(cohorts, key_col)
    offset = ((F.col("bucket") - F.col("cohort")) / F.lit(bucket_us)).cast("int")
    return (
        joined.select(key_col, "cohort", offset.alias("offset"))
        .filter(F.col("offset") <= max_offset)
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(key_col).alias("n_users"))
    )


def ewma(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    max_series: "int | None" = 4_000_000,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the smoothing
    aggregate hypertable engines ship built-in and Spark lacks (the
    recurrence y_t = α·x_t + (1-α)·y_{t-1} is sequential, so no window
    frame expresses it).

    Plan shape: ONE shuffle (the groupBy), values gathered per key as a
    time-sorted array, then a JVM left fold (``aggregate`` HOF) seeded
    with the first element.  Bit-reproducible: the fold order is pinned
    by the (time, value) struct sort, so the same IEEE operations run
    in the same order on every engine — DuckDB's ``list_reduce`` over
    an identically-ordered list yields the identical double.  Per-key
    state is the key's value array: fine for bounded series (sensors,
    user sessions); unbounded keys belong on the streaming path
    (applyInPandasWithState) or :func:`ewma_chunked` (affine segment
    composition, task memory bounded by chunk size) — the JVM-side
    ``max_series`` guard enforces that boundary at execution time (loud
    error naming the offending size, not an executor OOM)."""
    arr = _bounded_series(
        F.sort_array(
            F.collect_list(F.struct(F.col(time_col).alias("t"),
                                    F.col(value_col).cast("double").alias("x")))
        ),
        max_series, "ewma",
    )
    vals = F.transform(arr, lambda s: s["x"])
    a = F.lit(float(alpha))
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return df.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.round(folded, 6).alias("ewma"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bucket_us: int = 3_600_000_000,
    l_id: str = "l_id",
    r_id: str = "r_id",
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    long_threshold_cells: int = 32,
) -> DataFrame:
    """Interval-overlap equi-join: pairs (l, r) with half-open overlap
    ``l_start < r_end AND r_start < l_end`` (epoch-µs longs).

    The naive formulation is a pure inequality join — Spark can only
    execute that as a nested-loop over the cross product, quadratic at
    scale.  Instead intervals explode onto a time grid, the join
    becomes an equi-join on cell id, and the overlap predicate is a
    cheap post-filter.  A pair whose intervals share several grid cells
    would duplicate, so only the FIRST shared cell emits — exactly-once
    without any distinct shuffle.

    TWO-LEVEL grid (the classic refinement, r6 audit item): a single
    fine grid makes one year-long interval explode into 8,760 one-hour
    cells.  Intervals longer than ``long_threshold_cells`` fine cells
    are routed to a COARSE grid (``long_threshold_cells × bucket_us``
    wide) instead.  Pair classes partition exactly — each pair joins in
    exactly one of three equi-joins, each with its own first-shared-cell
    dedup, so no pair can duplicate across branches:

    - short × short on the fine grid (the bulk; small cell buckets);
    - long_left × all_right on the coarse grid;
    - short_left × long_right on the coarse grid (long × long already
      covered by the previous branch).

    A long interval of length L now explodes into
    ``L / (threshold·bucket)`` cells (137 instead of 8,760 for the
    year/hour/32 case) and short intervals add at most 2 coarse cells
    in the branches where a long partner might live.  Short rows never
    equi-join other short rows on coarse cells, so coarse buckets stay
    linear in cell population × resident long intervals — the
    quadratic-within-cell trap of simply coarsening the grid.

    Cell ids are the cell START values, computed with ``pmod`` so
    negative (pre-epoch) timestamps floor toward -∞ like positives —
    Spark's ``%`` keeps the dividend's sign and would silently
    misbucket pre-epoch intervals (ADVICE r6).  Integer modulo
    arithmetic throughout: float division (floor(s / W)) loses
    precision past 2^52-ish quotients and would drop boundary pairs."""
    if long_threshold_cells < 1:
        raise ValueError("long_threshold_cells must be >= 1")
    fine = int(bucket_us)
    coarse = fine * int(long_threshold_cells)

    def cell_of(col, width: int):
        return col - F.pmod(col, F.lit(width))

    def cells(df, id_c, s_c, e_c, width: int):
        s, e = F.col(s_c), F.col(e_c)
        first = cell_of(s, width)
        # half-open end: an interval ending ON a cell boundary does not
        # reach into that cell
        last = cell_of(e - 1, width)
        return df.select(
            id_c, s_c, e_c,
            F.explode(
                F.sequence(first, F.greatest(last, first), F.lit(width))
            ).alias("__cell"),
        )

    def pair(lc, rc, width: int):
        first_shared = F.greatest(
            cell_of(F.col(l_start), width), cell_of(F.col(r_start), width)
        )
        return (
            lc.join(rc, "__cell")
            .filter(
                (F.col(l_start) < F.col(r_end))
                & (F.col(r_start) < F.col(l_end))
                & (F.col("__cell") == first_shared)
            )
            .select(
                l_id, r_id,
                (F.least(F.col(l_end), F.col(r_end))
                 - F.greatest(F.col(l_start), F.col(r_start))).alias("overlap_us"),
            )
        )

    def is_long(s_c: str, e_c: str):
        return (F.col(e_c) - F.col(s_c)) > coarse

    l_short = left.filter(~is_long(l_start, l_end))
    l_long = left.filter(is_long(l_start, l_end))
    r_short = right.filter(~is_long(r_start, r_end))
    r_long = right.filter(is_long(r_start, r_end))

    out = pair(
        cells(l_short, l_id, l_start, l_end, fine),
        cells(r_short, r_id, r_start, r_end, fine),
        fine,
    )
    out = out.unionByName(pair(
        cells(l_long, l_id, l_start, l_end, coarse),
        cells(right, r_id, r_start, r_end, coarse),
        coarse,
    ))
    return out.unionByName(pair(
        cells(l_short, l_id, l_start, l_end, coarse),
        cells(r_long, r_id, r_start, r_end, coarse),
        coarse,
    ))
