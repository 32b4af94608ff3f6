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


def test_hidden_partition_guards(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import (
        compact,
        delete_where,
        drop_column,
        merge_upsert,
        restore,
        update_where,
    )

    path = str(tmp_path / "g")
    _mk_events(spark, path, ndays=2)

    src = spark.range(3).selectExpr(
        "id AS k",
        "timestamp_micros(1700000000000000) AS ts",
        "cast(0 as long) AS uid",
    )
    for op in (
        lambda: merge_upsert(spark, path, src, ["k"]),
        lambda: delete_where(spark, path, "k < 5"),
        lambda: update_where(spark, path, {"uid": "uid + 1"}, "k < 5"),
        lambda: compact(spark, path),
    ):
        with pytest.raises(ValidationError, match="hidden-partitioned"):
            op()
    with pytest.raises(ValidationError, match="hidden partition transform"):
        drop_column(path, "ts")

    # restore works: appends are commits like any other
    spark.range(5).selectExpr(
        "id + 10000 AS k",
        "timestamp_micros(1700000000000000) AS ts",
        "cast(1 as long) AS uid",
    ).coalesce(1).write.format("olive") \
        .option("partitionBy", "days(ts)").mode("append").save(path)
    assert spark.read.format("olive").load(path).count() == 205
    out = restore(path, 1)
    assert out["restored_to"] == 1
    assert spark.read.format("olive").load(path).count() == 200

    # conflicting spec on later appends fails loud
    with pytest.raises(Exception, match="partition spec conflict"):
        spark.range(3).selectExpr(
            "id AS k",
            "timestamp_micros(1700000000000000) AS ts",
            "cast(0 as long) AS uid",
        ).write.format("olive").option("partitionBy", "months(ts)") \
            .mode("append").save(path)


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
    transform pruning works and rewrite ops refuse — same as batch."""
    import pyarrow as pa

    from olive_spark import streaming
    from olive_spark.format.errors import ValidationError
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
    with pytest.raises(ValidationError, match="hidden-partitioned"):
        delete_where(spark, sink, "k < 5")


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
