"""Hidden partitioning (format/partition.py): days/months/hours/bucket
transforms derive the directory layout from a data column; scans prune
directories from predicates on the SOURCE column; the derived value is
never a data column."""

from __future__ import annotations

import os

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
    from olive_spark import register_olive

    register_olive(s)
    yield s


def _mk_events(spark, path, ndays=6):
    df = spark.range(ndays * 100).selectExpr(
        "id AS k",
        f"timestamp_micros(cast(1700000000000000 + (id % {ndays}) * 86400000000 "
        "+ (id * 1000000) as long)) AS ts",
        "cast(id % 37 as long) AS uid",
    )
    df.coalesce(1).write.format("olive") \
        .option("partitionBy", "days(ts)").mode("append").save(path)
    return df


def _scan_files(spark, path, *preds):
    """Files a pushed-down scan would read (via the reader's planner)."""
    from olive_spark.datasource.olive_datasource import OlivePushdownReader

    sch = spark.read.format("olive").load(path).schema
    r = OlivePushdownReader({"path": path, "pushdown": "true"}, sch)
    r.predicates = list(preds)
    parts = r.partitions()
    return [fp for p in parts for fp in p.files
            if not (p.predicates and p.predicates[0][0] == "__none__")]


def test_days_transform_layout_roundtrip_and_pruning(spark, tmp_path):
    import datetime as dt

    path = str(tmp_path / "t")
    df = _mk_events(spark, path)

    # layout: ts_day=YYYY-MM-DD dirs; the derived column is NOT in the data
    days = sorted(d for d in os.listdir(path) if d.startswith("ts_day="))
    assert len(days) == 6
    got = spark.read.format("olive").load(path)
    assert sorted(got.columns) == ["k", "ts", "uid"]
    assert got.count() == 600
    assert sorted(r["k"] for r in got.collect()) == list(range(600))

    # directory pruning from predicates on ts (the SOURCE column)
    base = dt.datetime(2023, 11, 14, 22, 13, 20)  # epoch 1700000000 UTC
    all_files = _scan_files(spark, path)
    one_day = _scan_files(
        spark, path, ("ts", ">=", base + dt.timedelta(days=2)),
        ("ts", "<", base + dt.timedelta(days=3)),
    )
    assert len(one_day) < len(all_files)
    day_dirs = {os.path.basename(os.path.dirname(f)) for f in one_day}
    assert len(day_dirs) <= 2  # the window straddles two dir days

    # and a full SQL filter returns exact rows (pruning is sound)
    from pyspark.sql import functions as F

    win = got.filter(
        (F.col("ts") >= F.lit(base + dt.timedelta(days=2)))
        & (F.col("ts") < F.lit(base + dt.timedelta(days=3)))
    ).count()
    expect = df.filter(
        (F.col("ts") >= F.lit(base + dt.timedelta(days=2)))
        & (F.col("ts") < F.lit(base + dt.timedelta(days=3)))
    ).count()
    assert win == expect > 0


def test_bucket_transform_prunes_equality(spark, tmp_path):
    path = str(tmp_path / "b")
    spark.range(1000).selectExpr("id AS k", "cast(id as long) AS uid") \
        .coalesce(1).write.format("olive") \
        .option("partitionBy", "bucket(8, uid)").mode("append").save(path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("uid_bucket8="))
    assert len(dirs) == 8
    got = spark.read.format("olive").load(path)
    assert sorted(got.columns) == ["k", "uid"]
    assert got.count() == 1000

    pruned = _scan_files(spark, path, ("uid", "=", 13))
    assert {os.path.basename(os.path.dirname(f)) for f in pruned} \
        == {"uid_bucket8=5"}
    assert got.filter("uid = 13").count() == 1


def _assert_days_layout(path):
    """Every live chunk file sits inside a ts_day= dir (no root strays —
    a root file would flatten the layout and break transform pruning)."""
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        for f in files:
            if f.endswith(".olive"):
                assert os.path.basename(root).startswith("ts_day="), \
                    f"stray file outside a day dir: {os.path.join(root, f)}"


def test_hidden_partition_merge_upsert(spark, tmp_path):
    """MERGE on a days(ts) layout — the canonical 100 TB event-table
    combination: rewritten AND inserted rows re-derive their day dirs
    from the spec, time travel still reads the pre-merge table, and
    transform pruning keeps working on post-merge files."""
    import datetime as dt

    from pyspark.sql import functions as F

    from olive_spark.ops.maintenance import merge_upsert

    path = str(tmp_path / "m")
    _mk_events(spark, path)  # 600 rows over 6 day dirs
    base = dt.datetime(2023, 11, 14, 22, 13, 20)  # epoch 1700000000 UTC

    # 3 updates (existing keys, uid bumped) + 2 inserts on NEW days
    src = spark.createDataFrame(
        [
            (0, base, 900),
            (1, base + dt.timedelta(days=1), 901),
            (7, base + dt.timedelta(days=1), 902),
            (10_000, base + dt.timedelta(days=30), 903),
            (10_001, base + dt.timedelta(days=31), 904),
        ],
        "k long, ts timestamp, uid long",
    )
    # rewrite strategy: the contract under test is that REWRITTEN rows
    # re-derive their day dirs (the DV strategy never moves rows;
    # DV-on-partitioned-layout is covered in tests/test_deletion.py)
    out = merge_upsert(spark, path, src, ["k"], strategy="rewrite")
    assert out["files_rewritten"] >= 1
    got = spark.read.format("olive").load(path)
    assert got.count() == 602
    assert sorted(
        r["uid"] for r in got.filter("k in (0, 1, 7)").collect()
    ) == [900, 901, 902]
    _assert_days_layout(path)
    # inserted rows created their own day dirs
    days = {d for d in os.listdir(path) if d.startswith("ts_day=")}
    assert "ts_day=2023-12-14" in days and "ts_day=2023-12-15" in days

    # time travel: the pre-merge version is intact
    pre = (
        spark.read.format("olive")
        .option("snapshot", out["pre_version"]).load(path)
    )
    assert pre.count() == 600
    assert pre.filter("k = 0").first()["uid"] == 0

    # transform pruning still prunes post-merge files
    all_files = _scan_files(spark, path)
    one_day = _scan_files(
        spark, path,
        ("ts", ">=", base + dt.timedelta(days=30)),
        ("ts", "<", base + dt.timedelta(days=31)),
    )
    assert 0 < len(one_day) < len(all_files)
    assert got.filter(
        (F.col("ts") >= F.lit(base + dt.timedelta(days=30)))
        & (F.col("ts") < F.lit(base + dt.timedelta(days=31)))
    ).count() == 1


def test_hidden_partition_delete_update_compact(spark, tmp_path):
    from olive_spark.ops.maintenance import (
        compact,
        delete_where,
        restore,
        update_where,
    )

    path = str(tmp_path / "g")
    _mk_events(spark, path, ndays=3)  # 300 rows

    out = delete_where(spark, path, "k < 30")
    assert out["rows_deleted"] == 30
    got = spark.read.format("olive").load(path)
    assert got.count() == 270
    _assert_days_layout(path)

    out = update_where(spark, path, {"uid": "uid + 1000"}, "k < 60")
    assert out["rows_updated"] == 30
    got = spark.read.format("olive").load(path)
    assert got.filter("uid >= 1000").count() == 30
    _assert_days_layout(path)

    # retain_history: restore(1) below needs the pre-compact files —
    # pre-r10 the CoW delete/update incidentally stashed the base files
    # into history; the DV strategy leaves them LIVE until this compact
    # retires them, so restore-ability must be asked for explicitly
    # (the documented contract)
    out = compact(spark, path, target_rows=1000, retain_history=True)
    assert out["rows"] == 270
    got = spark.read.format("olive").load(path)
    assert got.count() == 270
    _assert_days_layout(path)

    # restore across the mutations still works
    out = restore(path, 1)
    assert out["restored_to"] == 1
    assert spark.read.format("olive").load(path).count() == 300

    # zorder within partition dirs (r9): layout survives, content exact
    out = compact(spark, path, zorder_by=["k", "uid"], target_rows=1000)
    assert out["rows"] == 300
    _assert_days_layout(path)
    assert spark.read.format("olive").load(path).count() == 300

    # conflicting spec on later appends fails loud
    with pytest.raises(Exception, match="partition spec conflict"):
        spark.range(3).selectExpr(
            "id AS k",
            "timestamp_micros(1700000000000000) AS ts",
            "cast(0 as long) AS uid",
        ).write.format("olive").option("partitionBy", "months(ts)") \
            .mode("append").save(path)


def test_hidden_partition_drop_source_refused(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import drop_column

    path = str(tmp_path / "d")
    _mk_events(spark, path, ndays=2)
    with pytest.raises(ValidationError, match="hidden"):
        drop_column(path, "ts")


def test_transform_spec_parsing_and_validation(spark, tmp_path):
    from olive_spark.format.partition import parse_spec

    assert parse_spec("days(ts),region") == [
        {"kind": "days", "col": "ts", "dir": "ts_day"},
        {"kind": "identity", "col": "region", "dir": "region"},
    ]
    assert parse_spec("bucket(16, uid)") == [
        {"kind": "bucket", "col": "uid", "n": 16, "dir": "uid_bucket16"},
    ]
    with pytest.raises(ValueError, match="bad partitionBy"):
        parse_spec("weeks(ts)")
    # unknown source column fails at plan time
    with pytest.raises(Exception, match="source columns"):
        spark.range(3).selectExpr("id AS k").write.format("olive") \
            .option("partitionBy", "days(nope)") \
            .mode("append").save(str(tmp_path / "x"))
    # non-integral bucket column fails in the first task
    with pytest.raises(Exception, match="integral"):
        spark.range(3).selectExpr(
            "cast(id as string) AS s", "id AS k"
        ).coalesce(1).write.format("olive") \
            .option("partitionBy", "bucket(4, s)") \
            .mode("append").save(str(tmp_path / "y"))


def test_transform_interval_pruning_unit():
    """Pure-unit coverage of the interval math: boundaries at µs
    resolution, months across year ends, conservative fall-through."""
    import datetime as dt

    from olive_spark.format.partition import transform_dir_prunable

    tfs = [{"kind": "days", "col": "ts", "dir": "ts_day"}]
    d = {"ts_day": "2024-02-28"}
    lo = dt.datetime(2024, 2, 28)
    hi = dt.datetime(2024, 2, 29)

    assert transform_dir_prunable(d, [("ts", "<", lo)], tfs)
    assert not transform_dir_prunable(d, [("ts", "<=", lo)], tfs)
    assert transform_dir_prunable(
        d, [("ts", ">=", hi)], tfs
    )
    assert not transform_dir_prunable(
        d, [("ts", ">", hi - dt.timedelta(microseconds=2))], tfs
    )
    assert transform_dir_prunable(
        d, [("ts", "=", hi)], tfs
    )
    assert not transform_dir_prunable(
        d, [("ts", "=", lo + dt.timedelta(hours=5))], tfs
    )
    # december -> january month rollover
    m = [{"kind": "months", "col": "ts", "dir": "ts_month"}]
    dv = {"ts_month": "2023-12"}
    assert not transform_dir_prunable(
        dv, [("ts", "<", dt.datetime(2024, 1, 1))], m
    )
    assert transform_dir_prunable(
        dv, [("ts", ">=", dt.datetime(2024, 1, 1))], m
    )
    # unparseable dir value: conservative keep
    assert not transform_dir_prunable(
        {"ts_day": "garbage"}, [("ts", "=", lo)], tfs
    )


def test_review_fixes_bucket_exactness_tz_and_validation(spark, tmp_path):
    import pyarrow as pa

    from olive_spark.format.partition import (
        derive_array,
        parse_spec,
        read_sidecar,
    )

    # exact pmod beyond float64's 2^53 range (snowflake-ID class)
    big = (1 << 60) + 7
    t = {"kind": "bucket", "col": "x", "n": 8, "dir": "x_bucket8"}
    tbl = pa.table({"x": pa.array([big, -big, 5, -5], pa.int64())})
    got = derive_array(tbl, t).to_pylist()
    assert got == [big % 8, (-big) % 8, 5, 3]

    # non-UTC tz-aware arrays format their UTC day, not wall time
    import datetime as dt

    ts = pa.array(
        [dt.datetime(2024, 1, 10, 3, 0, tzinfo=dt.timezone.utc)],
        pa.timestamp("us", tz="America/New_York"),
    )
    d = derive_array(
        pa.table({"ts": ts}), {"kind": "days", "col": "ts", "dir": "ts_day"}
    ).to_pylist()
    assert d == ["2024-01-10"]  # NY wall time would say 2024-01-09

    # bare identity names keep full hive generality (hyphens etc.)
    assert parse_spec("my-col.x")[0] == {
        "kind": "identity", "col": "my-col.x", "dir": "my-col.x",
    }
    with pytest.raises(ValueError, match="N must be >= 1"):
        parse_spec("bucket(0, uid)")

    # corrupt-but-valid-JSON sidecar degrades to None (advisory)
    import json
    import os

    d2 = str(tmp_path / "c")
    os.makedirs(d2)
    with open(os.path.join(d2, "_olive_partition.json"), "w") as f:
        json.dump({"version": 1, "transforms": [{"col": "ts"}]}, f)
    assert read_sidecar(d2) is None

    # derived dir key colliding with a data column: plan-time refusal
    with pytest.raises(Exception, match="collide"):
        spark.range(3).selectExpr(
            "timestamp_micros(1700000000000000) AS ts",
            "'x' AS ts_day",
        ).write.format("olive").option("partitionBy", "days(ts)") \
            .mode("append").save(str(tmp_path / "z"))


def test_stream_written_hidden_table_records_spec(spark, tmp_path):
    """A STREAM-written days(ts) table must carry the spec sidecar, so
    transform pruning works and rewrite ops preserve the layout — same
    as batch."""
    import pyarrow as pa

    from olive_spark import streaming
    from olive_spark.format.partition import read_sidecar
    from olive_spark.format.writer import write_chunk
    from olive_spark.ops.maintenance import delete_where

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t = pa.table({
        "k": pa.array(list(range(100)), pa.int64()),
        "ts": pa.array(
            [1700000000000000 + (i % 3) * 86400000000 for i in range(100)],
            pa.timestamp("us"),
        ),
    })
    with open(os.path.join(src, "part-00000.olive"), "wb") as f:
        f.write(write_chunk({"data": t}))

    sdf = streaming.read_stream(spark, src)
    (
        sdf.writeStream.format("olive")
        .option("checkpointLocation", ckpt)
        .option("partitionBy", "days(ts)")
        .outputMode("append")
        .trigger(availableNow=True)
        .start(sink)
        .awaitTermination()
    )
    assert read_sidecar(sink) is not None
    dirs = [d for d in os.listdir(sink) if d.startswith("ts_day=")]
    assert len(dirs) == 3
    assert spark.read.format("olive").load(sink).count() == 100
    out = delete_where(spark, sink, "k < 5")
    assert out["rows_deleted"] == 5
    assert spark.read.format("olive").load(sink).count() == 95
    _assert_days_layout(sink)


def test_year_of_day_dirs_prunes_to_predicate_window(spark, tmp_path):
    """Scale shape: 365 day directories, a 3-day predicate window —
    plan-time keeps only the window's files, and the pruned 362 dirs
    never have a header opened (monkeypatched counter)."""
    import datetime as dt
    import json
    import os

    import pyarrow as pa

    from olive_spark.datasource import olive_datasource as ds
    from olive_spark.format.writer import write_chunk

    path = str(tmp_path / "y")
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for i in range(365):
        day = (base + dt.timedelta(days=i)).strftime("%Y-%m-%d")
        d = os.path.join(path, f"ts_day={day}")
        os.makedirs(d)
        t = pa.table({
            "k": pa.array([i], pa.int64()),
            "ts": pa.array(
                [int((base + dt.timedelta(days=i, hours=12)
                      ).timestamp() * 1e6)],
                pa.timestamp("us"),
            ),
        })
        with open(os.path.join(d, "part-00000.olive"), "wb") as f:
            f.write(write_chunk({"data": t}))
    with open(os.path.join(path, "_olive_partition.json"), "w") as f:
        json.dump({"version": 1, "transforms": [
            {"kind": "days", "col": "ts", "dir": "ts_day"},
        ]}, f)

    opened = []
    orig = ds._read_header_bytes

    def counting(fp):
        opened.append(fp)
        return orig(fp)

    sch = spark.read.format("olive").load(path).schema
    r = ds.OlivePushdownReader({"path": path, "pushdown": "true"}, sch)
    r.predicates = [
        ("ts", ">=", base.replace(tzinfo=None) + dt.timedelta(days=100)),
        ("ts", "<", base.replace(tzinfo=None) + dt.timedelta(days=103)),
    ]
    import unittest.mock as mock

    with mock.patch.object(ds, "_read_header_bytes", counting):
        parts = r.partitions()
    kept = [fp for p in parts for fp in p.files
            if not (p.predicates and p.predicates[0][0] == "__none__")]
    assert len(kept) == 3, f"expected the 3-day window, got {len(kept)}"
    assert len(set(opened)) <= 3, (
        f"pruned dirs must never open a header, opened {len(set(opened))}"
    )


def test_truncate_transform_layout_and_pruning(spark, tmp_path):
    """truncate(W, col): Iceberg-style prefix/floor dirs for string IDs
    and integral ranges, with =/IN and range pruning."""
    path = str(tmp_path / "tr")
    spark.range(1000).selectExpr(
        "id AS k", "concat('doc-', lpad(cast(id as string), 4, '0')) AS doc"
    ).coalesce(1).write.format("olive") \
        .option("partitionBy", "truncate(6, doc)").mode("append").save(path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("doc_trunc6="))
    assert len(dirs) == 10  # doc-0 .. doc-9 prefixes (6 codeunits)
    got = spark.read.format("olive").load(path)
    assert sorted(got.columns) == ["doc", "k"]
    assert got.count() == 1000

    pruned = _scan_files(spark, path, ("doc", "=", "doc-0123"))
    assert {os.path.basename(os.path.dirname(f)) for f in pruned} \
        == {"doc_trunc6=doc-01"}
    assert got.filter("doc = 'doc-0123'").count() == 1
    # range: doc < 'doc-02' keeps only the doc-00/doc-01 dirs
    lt = _scan_files(spark, path, ("doc", "<", "doc-02"))
    assert {os.path.basename(os.path.dirname(f)) for f in lt} \
        == {"doc_trunc6=doc-00", "doc_trunc6=doc-01"}

    # integral truncate: floor-to-multiple dirs, range pruning
    ipath = str(tmp_path / "ti")
    spark.range(100).selectExpr("id AS k", "cast(id as long) AS v") \
        .coalesce(1).write.format("olive") \
        .option("partitionBy", "truncate(25, v)").mode("append").save(ipath)
    idirs = sorted(d for d in os.listdir(ipath) if d.startswith("v_trunc25="))
    assert len(idirs) == 4
    igot = spark.read.format("olive").load(ipath)
    eq = _scan_files(spark, ipath, ("v", "=", 60))
    assert {os.path.basename(os.path.dirname(f)) for f in eq} \
        == {"v_trunc25=50"}
    gt = _scan_files(spark, ipath, ("v", ">", 74))
    assert {os.path.basename(os.path.dirname(f)) for f in gt} \
        == {"v_trunc25=75"}
    assert igot.filter("v > 74").count() == 25

    # mutations preserve the truncate layout
    from olive_spark.ops.maintenance import delete_where

    out = delete_where(spark, ipath, "v < 10")
    assert out["rows_deleted"] == 10
    assert spark.read.format("olive").load(ipath).count() == 90
    for root, dirs2, files in os.walk(ipath):
        dirs2[:] = [d for d in dirs2 if not d.startswith("_")]
        for f in files:
            if f.endswith(".olive"):
                assert os.path.basename(root).startswith("v_trunc25=")


def test_transform_pruning_non_utc_host_tz(spark, tmp_path):
    """Spark's filter pushdown materializes timestamp literals as NAIVE
    datetimes in the PROCESS-LOCAL timezone.  On a non-UTC host,
    interpreting them as UTC would shift day-interval pruning by the
    offset and silently DROP matching rows (r8 advice, medium).  The
    pruning path must read naive values back through the local tz."""
    import datetime as dt
    import time

    from olive_spark.format.partition import transform_dir_prunable

    tfs = [{"kind": "days", "col": "ts", "dir": "ts_day"}]
    d = {"ts_day": "2024-06-15"}  # UTC interval [06-15T00:00, 06-16T00:00)

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"  # UTC-4 in June (EDT)
    time.tzset()
    try:
        # 2024-06-15T21:00 EDT == 2024-06-16T01:00 UTC — OUTSIDE the
        # dir's UTC day.  Spark hands the literal to us as this naive
        # local value; treating it as UTC would KEEP a prunable dir on
        # '=' (lost pruning) and, worse, PRUNE the dir for a '>' bound
        # that its last UTC hours still satisfy.
        late_local = dt.datetime(2024, 6, 15, 21, 0, 0)
        assert transform_dir_prunable(d, [("ts", "=", late_local)], tfs)
        # 2024-06-15T19:00 EDT == 2024-06-15T23:00 UTC — inside the day:
        # must NOT prune equality, and  '>' must keep the dir (the last
        # UTC hour of the day exceeds the literal)
        inside_local = dt.datetime(2024, 6, 15, 19, 0, 0)
        assert not transform_dir_prunable(d, [("ts", "=", inside_local)], tfs)
        assert not transform_dir_prunable(d, [("ts", ">", inside_local)], tfs)
        # 2024-06-16T01:00 EDT == 2024-06-16T05:00 UTC — a '>' bound
        # past the whole UTC day: prunable
        past_local = dt.datetime(2024, 6, 16, 1, 0, 0)
        assert transform_dir_prunable(d, [("ts", ">", past_local)], tfs)
        assert transform_dir_prunable(d, [("ts", ">=", past_local)], tfs)
        # '<' at 2024-06-14T20:00 EDT == 06-15T00:00 UTC: everything in
        # the dir is >= the literal instant -> prunable
        lt_local = dt.datetime(2024, 6, 14, 20, 0, 0)
        assert transform_dir_prunable(d, [("ts", "<", lt_local)], tfs)
        assert not transform_dir_prunable(d, [("ts", "<=", lt_local)], tfs)
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_transform_pruning_exclusive_end_no_us_assumption():
    """'>' / '>=' prune only when the literal reaches the interval END:
    timestamp[ns] rows can live in the last microsecond of a day, so
    the old e-1us max-value assumption wrongly pruned them (r8 advice).
    """
    import datetime as dt

    from olive_spark.format.partition import transform_dir_prunable

    tfs = [{"kind": "days", "col": "ts", "dir": "ts_day"}]
    d = {"ts_day": "2024-06-15"}
    end_minus_1us = dt.datetime(
        2024, 6, 15, 23, 59, 59, 999999, tzinfo=dt.timezone.utc
    )
    end = dt.datetime(2024, 6, 16, tzinfo=dt.timezone.utc)
    # a ns-resolution row at 23:59:59.9999995 satisfies ts > end-1us:
    # the dir must be KEPT for that predicate
    assert not transform_dir_prunable(d, [("ts", ">", end_minus_1us)], tfs)
    assert not transform_dir_prunable(d, [("ts", ">=", end_minus_1us)], tfs)
    assert transform_dir_prunable(d, [("ts", ">", end)], tfs)
    assert transform_dir_prunable(d, [("ts", ">=", end)], tfs)


def test_streaming_cdc_merge_into_hidden_partition(spark, tmp_path):
    """The canonical 100 TB event-table pipeline end-to-end: a change
    stream MERGEs per microbatch (foreach_batch_upsert, latest-wins +
    tombstones) into a days(ts) HIDDEN-partitioned target — the two r8
    flagship features that were mutually exclusive until r9.  The final
    table must match a latest-wins replay, keep every file inside a day
    dir, and keep transform pruning alive."""
    import datetime as dt
    import pyarrow as pa

    from olive_spark import streaming
    from olive_spark.format.writer import write_chunk

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    base_us = 1700000000000000
    # target seeded with 50 keys over 2 day dirs
    spark.range(50).selectExpr(
        "id AS k",
        f"timestamp_micros(cast({base_us} + (id % 2) * 86400000000 "
        "as long)) AS ts",
        "cast(0 as long) AS seq",
        "cast(id as long) AS v",
    ).coalesce(1).write.format("olive") \
        .option("partitionBy", "days(ts)").mode("append").save(tgt)

    # change stream: updates for k<20 (seq 2, day shifted +3), stale
    # updates for k in [20,30) (seq 0 ties -> source wins at equal seq?
    # no: latest-wins tie prefers source; use seq -1 so they LOSE),
    # tombstones for k in [40,50) (seq 3), inserts k in [100,110)
    rows = []
    for k in range(20):
        rows.append((k, base_us + 3 * 86400000000, 2, k + 1000, False))
    for k in range(20, 30):
        rows.append((k, base_us, -1, 9999, False))
    for k in range(40, 50):
        rows.append((k, base_us, 3, 0, True))
    for k in range(100, 110):
        rows.append((k, base_us + 10 * 86400000000, 1, k, False))
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "v": pa.array([r[3] for r in rows], pa.int64()),
        "_del": pa.array([r[4] for r in rows], pa.bool_()),
    })
    with open(os.path.join(src, "part-00000.olive"), "wb") as f:
        f.write(write_chunk({"data": t}))

    sdf = streaming.read_stream(spark, src)
    from olive_spark.streaming.ops import foreach_batch_upsert

    q = (
        sdf.writeStream.foreachBatch(
            foreach_batch_upsert(
                tgt, ["k"], latest_by="seq", delete_col="_del",
                retain_history=True,
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.format("olive").load(tgt)
    rows_by_k = {r["k"]: r for r in got.collect()}
    # 50 seed - 10 tombstoned + 10 inserted, updates applied, stale lost
    assert len(rows_by_k) == 50, sorted(rows_by_k)[:5]
    assert all(rows_by_k[k]["v"] == k + 1000 for k in range(20))
    assert all(rows_by_k[k]["v"] == k for k in range(20, 30))  # stale lost
    assert all(k not in rows_by_k for k in range(40, 50))
    assert all(rows_by_k[k]["v"] == k for k in range(100, 110))
    _assert_days_layout(tgt)
    # updated rows MOVED to their new day dir; inserts created theirs
    days = {d for d in os.listdir(tgt) if d.startswith("ts_day=")}
    assert "ts_day=2023-11-17" in days  # base+3d
    assert "ts_day=2023-11-24" in days  # base+10d
    # transform pruning still prunes post-CDC files
    lo = dt.datetime(2023, 11, 24)
    all_files = _scan_files(spark, tgt)
    one = _scan_files(spark, tgt, ("ts", ">=", lo))
    assert 0 < len(one) < len(all_files)


def test_compact_where_scopes_to_matching_dirs(spark, tmp_path):
    """compact(where=...) — Delta's OPTIMIZE ... WHERE: only files with
    a matching row are rewritten; other dirs keep their exact file
    names (proof no bytes moved), and the whole op is one snapshot
    version.  Works on a hidden days(ts) layout via the same predicate
    the user would query with."""
    import datetime as dt

    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.maintenance import compact

    path = str(tmp_path / "cw")
    # 3 day dirs, MANY small files in each (one per append)
    base = dt.datetime(2023, 11, 14, 22, 13, 20)
    for i in range(4):
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id AS k",
            "timestamp_micros(cast(1700000000000000 + (id % 3) "
            "* 86400000000 as long)) AS ts",
        ).coalesce(1).write.format("olive") \
            .option("partitionBy", "days(ts)").mode("append").save(path)

    def files_by_day():
        out = {}
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith("_")]
            for f in files:
                if f.endswith(".olive"):
                    out.setdefault(os.path.basename(root), set()).add(f)
        return out

    pre = files_by_day()
    assert all(len(v) == 4 for v in pre.values()), pre
    v_before = current_version(path)

    # compact ONLY day 2's files
    lo = base + dt.timedelta(days=2)
    out = compact(
        spark, path, target_rows=1 << 20,
        where=f"ts >= timestamp'{lo.isoformat(sep=' ')}'",
    )
    assert out["rows"] == 133  # ids with id % 3 == 2 over 0..399
    post = files_by_day()
    day_dirs = sorted(pre)
    untouched = day_dirs[:2]
    target = day_dirs[2]
    for d in untouched:  # exact same file names: nothing rewritten
        assert post[d] == pre[d], d
    assert len(post[target]) == 1  # 4 small files folded into one
    assert current_version(path) == v_before + 1  # one snapshot version
    got = spark.read.format("olive").load(path)
    assert got.count() == 400

    # no-match predicate: clean no-op, no new version
    out = compact(spark, path, where="ts >= timestamp'2030-01-01'")
    assert out.get("files_matched") == 0
    assert current_version(path) == v_before + 1
