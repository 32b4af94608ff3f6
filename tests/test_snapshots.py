"""Snapshot log / time travel over olive directories: versions per
commit, snapshot reads, overwrite resets, compaction history retention,
vacuum expiration, and advisory-tolerant degradation."""

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


def _write(spark, path, lo, hi, mode="append"):
    spark.range(lo, hi).withColumnRenamed("id", "k") \
        .coalesce(1).write.format("olive").mode(mode).save(path)


def _read_snapshot(spark, path, version):
    return (
        spark.read.format("olive").option("snapshot", str(version)).load(path)
    )


def test_each_commit_is_a_version_and_snapshots_replay(spark, tmp_path_factory):
    from olive_spark.format import snapshots

    path = str(tmp_path_factory.mktemp("snap") / "t")
    _write(spark, path, 0, 10)
    _write(spark, path, 10, 30)
    _write(spark, path, 30, 35)
    assert snapshots.current_version(path) == 3

    assert spark.read.format("olive").load(path).count() == 35
    assert _read_snapshot(spark, path, 1).count() == 10
    assert _read_snapshot(spark, path, 2).count() == 30
    assert sorted(r["k"] for r in _read_snapshot(spark, path, 2).collect()) \
        == list(range(30))
    assert _read_snapshot(spark, path, 3).count() == 35


def test_overwrite_resets_the_snapshot_line(spark, tmp_path_factory):
    from olive_spark.format import snapshots

    path = str(tmp_path_factory.mktemp("snapov") / "t")
    _write(spark, path, 0, 10)
    _write(spark, path, 0, 5, mode="overwrite")
    assert snapshots.current_version(path) == 2
    assert spark.read.format("olive").load(path).count() == 5
    assert _read_snapshot(spark, path, 2).count() == 5
    # version 1's files were deleted by the overwrite (by design):
    # reading it fails loud, never returns a partial table
    with pytest.raises(Exception, match="snapshot"):
        _read_snapshot(spark, path, 1).count()


def test_compact_with_history_keeps_old_snapshots_readable(
    spark, tmp_path_factory
):
    from olive_spark.format import snapshots
    from olive_spark.ops.maintenance import compact

    path = str(tmp_path_factory.mktemp("snapc") / "t")
    _write(spark, path, 0, 50)
    _write(spark, path, 50, 80)
    res = compact(spark, path, target_rows=100, retain_history=True)
    assert res["rows"] == 80
    # live dir: only compacted files; history holds the originals
    assert os.path.isdir(os.path.join(path, snapshots.HISTORY_DIR))
    assert spark.read.format("olive").load(path).count() == 80

    # pre-compaction snapshots resolve from history, exactly
    assert _read_snapshot(spark, path, 1).count() == 50
    assert sorted(r["k"] for r in _read_snapshot(spark, path, 2).collect()) \
        == list(range(80))
    # post-compaction version reads the compacted files
    v = snapshots.current_version(path)
    assert _read_snapshot(spark, path, v).count() == 80


def test_compact_without_history_fails_old_snapshots_loud(
    spark, tmp_path_factory
):
    from olive_spark.ops.maintenance import compact

    path = str(tmp_path_factory.mktemp("snapnoh") / "t")
    _write(spark, path, 0, 20)
    compact(spark, path, target_rows=100)  # originals deleted
    assert spark.read.format("olive").load(path).count() == 20
    with pytest.raises(Exception, match="not reconstructable"):
        _read_snapshot(spark, path, 1).count()


def test_vacuum_expires_versions_and_prunes_history(spark, tmp_path_factory):
    from olive_spark.format import snapshots
    from olive_spark.ops.maintenance import compact, vacuum

    path = str(tmp_path_factory.mktemp("snapvac") / "t")
    _write(spark, path, 0, 10)     # v1
    _write(spark, path, 10, 20)    # v2
    compact(spark, path, target_rows=100, retain_history=True)  # v3
    _write(spark, path, 20, 25)    # v4
    hist = os.path.join(path, snapshots.HISTORY_DIR)
    n_hist_before = sum(len(fs) for _, _, fs in os.walk(hist))
    assert n_hist_before > 0

    out = vacuum(path, retain_snapshots=2)  # keep v3, v4
    assert out["snapshots"]["retained"] == 2
    assert out["snapshots"]["expired"] == 2
    # retained versions still replay (v3/v4 reference no history files)
    assert _read_snapshot(spark, path, 3).count() == 20
    assert _read_snapshot(spark, path, 4).count() == 25
    # expired versions are gone from the log
    with pytest.raises(Exception, match="unknown snapshot"):
        _read_snapshot(spark, path, 1).count()
    # history files referenced only by expired versions were deleted
    n_hist_after = sum(len(fs) for _, _, fs in os.walk(hist)) \
        if os.path.isdir(hist) else 0
    assert n_hist_after == 0
    # the live table is untouched
    assert spark.read.format("olive").load(path).count() == 25


def test_corrupt_log_degrades_to_advisory(spark, tmp_path_factory):
    """Current-version scans never depend on the log; snapshot reads of
    a corrupt log fail with a clear error, not a crash."""
    from olive_spark.format import snapshots

    path = str(tmp_path_factory.mktemp("snapbad") / "t")
    _write(spark, path, 0, 10)
    with open(snapshots.log_path(path), "w") as f:
        f.write("[this, is, not, an, object]")
    assert spark.read.format("olive").load(path).count() == 10
    with pytest.raises(Exception, match="no snapshot log"):
        _read_snapshot(spark, path, 1).count()
    # next commit restarts the line WITHOUT losing coverage: the fresh
    # log seeds a base entry (v1) from the files that predate it, so
    # the commit's snapshot (v2) is the full table — never a silently
    # partial file list (r7 ADVICE)
    _write(spark, path, 10, 12)
    assert snapshots.current_version(path) == 2
    assert _read_snapshot(spark, path, 1).count() == 10
    assert _read_snapshot(spark, path, 2).count() == 12
    assert spark.read.format("olive").load(path).count() == 12


def test_stream_sink_epochs_are_versions(spark, tmp_path_factory):
    from olive_spark import streaming
    from olive_spark.format import snapshots

    import pyarrow as pa

    from olive_spark.format import write_chunk

    src = str(tmp_path_factory.mktemp("snapssrc"))
    sink = str(tmp_path_factory.mktemp("snapssink") / "t")
    ckpt = str(tmp_path_factory.mktemp("snapsckpt"))

    def part(idx, lo, hi):
        t = pa.table({"k": pa.array(list(range(lo, hi)), pa.int64())})
        with open(os.path.join(src, f"part-{idx:05d}.olive"), "wb") as f:
            f.write(write_chunk({"data": t}))

    part(0, 0, 40)
    streaming.write_stream_olive(streaming.read_stream(spark, src), sink, ckpt)
    v1 = snapshots.current_version(sink)
    assert v1 >= 1
    part(1, 40, 60)
    streaming.write_stream_olive(streaming.read_stream(spark, src), sink, ckpt)
    assert snapshots.current_version(sink) > v1
    assert _read_snapshot(spark, sink, v1).count() == 40
    assert spark.read.format("olive").load(sink).count() == 60


def test_snapshot_history_listing(spark, tmp_path_factory):
    from olive_spark.ops.maintenance import compact, snapshot_history

    path = str(tmp_path_factory.mktemp("snaph") / "t")
    _write(spark, path, 0, 10)
    _write(spark, path, 10, 20)
    compact(spark, path, target_rows=100, retain_history=True)
    _write(spark, path, 0, 3, mode="overwrite")
    hist = snapshot_history(path)
    assert [h["kind"] for h in hist] == \
        ["append", "append", "compact", "overwrite"]
    assert [h["version"] for h in hist] == [1, 2, 3, 4]
    assert hist[2]["removed"] == 2 and hist[2]["live_files"] == 1
    assert hist[3]["live_files"] == 1


def test_stream_starting_snapshot_skips_backfill(spark, tmp_path_factory):
    """startingSnapshot=N streams only files added AFTER snapshot N —
    the backfill-then-stream handoff: process version N as a batch,
    tail the rest.  After compaction reshuffles the listing the option
    fails loud instead of re-reading or skipping the wrong files."""
    from olive_spark.ops.maintenance import compact

    path = str(tmp_path_factory.mktemp("snapstream") / "t")
    _write(spark, path, 0, 40)      # v1 — the backfilled batch
    _write(spark, path, 40, 55)     # v2
    _write(spark, path, 55, 60)     # v3

    def run(ckpt):
        return (
            spark.readStream.format("olive")
            .option("startingSnapshot", "1")
            .load(path)
            .writeStream.format("memory")
            .queryName("snap_tail")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = run(str(tmp_path_factory.mktemp("snapstreamck")))
    q.awaitTermination()
    rows = sorted(r["k"] for r in spark.table("snap_tail").collect())
    assert rows == list(range(40, 60)), "only post-snapshot files stream"

    compact(spark, path, target_rows=1000)
    with pytest.raises(Exception, match="not a prefix"):
        q2 = run(str(tmp_path_factory.mktemp("snapstreamck2")))
        q2.awaitTermination()


def test_starting_snapshot_with_admission_caps(spark, tmp_path_factory):
    """Review repro: startingSnapshot + maxFilesPerTrigger must not
    plan a first batch below the snapshot boundary (the frontier seeds
    at the boundary, so capped batches advance FROM it)."""
    path = str(tmp_path_factory.mktemp("snapcap") / "t")
    _write(spark, path, 0, 10)   # v1: 1 file
    _write(spark, path, 10, 20)  # +1 file
    _write(spark, path, 20, 30)  # +1 file

    rows = []

    def sink(df, bid):
        rows.extend(r["k"] for r in df.collect())

    q = (
        spark.readStream.format("olive")
        .option("startingSnapshot", "1")
        .option("maxFilesPerTrigger", "1")
        .option("admissionStateDir", str(tmp_path_factory.mktemp("snapcapst")))
        .load(path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("snapcapck")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(rows) == list(range(10, 20)), "one capped batch past v1"


def test_underscore_hive_partitions_stay_visible(spark, tmp_path_factory):
    """Metadata-dir skipping must not hide hive partitions for
    underscore-named columns: `_year=2024` is data, `_olive_history`
    is not."""
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("upart") / "t")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("_year")
    )
    df.write.format("olive").option("partitionBy", "_year") \
        .mode("append").save(path)
    got = spark.read.format("olive").load(path)
    assert got.count() == 20
    assert sorted(r["_year"] for r in got.select("_year").distinct().collect()) \
        == [0, 1]


def test_replay_relogs_missing_snapshot_entry(spark, tmp_path_factory):
    """Crash window: the batch log landed but the snapshot append never
    ran.  The replay must restore the entry from the batch log — and a
    replay whose entry DID land must not duplicate it."""
    import json as _json

    import pyarrow as pa

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from olive_spark.datasource.olive_datasource import OliveStreamWriter
    from olive_spark.format import snapshots

    sink = str(tmp_path_factory.mktemp("relog") / "t")
    os.makedirs(sink, exist_ok=True)
    schema = StructType([
        StructField("k", LongType()), StructField("v", DoubleType()),
    ])
    w = OliveStreamWriter({"path": sink}, schema, overwrite=False)
    batch = pa.table({
        "k": pa.array([1], pa.int64()), "v": pa.array([1.0], pa.float64()),
    })
    msg = w.write(iter(batch.to_batches()))
    w.commit([msg], batchId=0)
    assert snapshots.has_tag(sink, "b0")
    v_before = snapshots.current_version(sink)

    # replay with the entry present: no duplicate version
    msg_dup = w.write(iter(batch.to_batches()))
    w.commit([msg_dup], batchId=0)
    assert snapshots.current_version(sink) == v_before

    # simulate the crash window: drop the snapshot entry, replay again
    log = snapshots.load_log(sink)
    log["entries"] = [e for e in log["entries"] if e.get("tag") != "b0"]
    with open(snapshots.log_path(sink), "w") as f:
        _json.dump(log, f)
    msg_dup2 = w.write(iter(batch.to_batches()))
    w.commit([msg_dup2], batchId=0)
    assert snapshots.has_tag(sink, "b0"), "replay must restore the entry"
    cur = snapshots.current_version(sink)
    live = snapshots.files_at(sink, cur)
    assert len(live) == 1, "exactly the committed file, once"


def test_bounded_log_collapses_into_base(tmp_path):
    from olive_spark.format import snapshots
    from olive_spark.ops.maintenance import snapshot_history

    d = str(tmp_path / "bounded")
    for i in range(10):
        snapshots.append_entry(d, add=[f"f{i}.olive"], max_entries=4)
    entries = snapshots.load_log(d)["entries"]
    assert len(entries) == 4
    assert entries[0].get("base") is True
    # versions keep counting; retained versions replay correctly
    assert snapshots.current_version(d) == 10
    assert set(snapshots.files_at(d, 10)) == {f"f{i}.olive" for i in range(10)}
    assert set(snapshots.files_at(d, 7)) == {f"f{i}.olive" for i in range(7)}
    # the collapsed base is not a phantom overwrite in history
    kinds = [h["kind"] for h in snapshot_history(d)]
    assert kinds[0] == "vacuum-base" and "overwrite" not in kinds


def test_first_append_seeds_preexisting_files(spark, tmp_path):
    """A new log over a directory that already holds .olive files (raw
    write_chunk table, or a log invalidated by an earlier append
    failure) must cover them: the first append seeds a base entry from
    the live listing, so no later snapshot silently omits them."""
    import pyarrow as pa

    from olive_spark.format import snapshots
    from olive_spark.format.writer import write_chunk

    d = tmp_path / "pre"
    d.mkdir()
    t = pa.table({"k": pa.array(range(40), pa.int64())})
    (d / "legacy-0.olive").write_bytes(write_chunk({"data": t}))
    _write(spark, str(d), 100, 110)  # first logged commit
    log = snapshots.load_log(str(d))["entries"]
    assert log[0].get("seeded") is True and log[0].get("base") is True
    assert "legacy-0.olive" in log[0]["add"]
    # snapshot 2 (the commit) sees legacy + new; history labels the seed
    got = _read_snapshot(spark, str(d), 2)
    assert got.count() == 50
    from olive_spark.ops.maintenance import snapshot_history

    assert snapshot_history(str(d))[0]["kind"] == "seed-base"


def test_batch_append_log_is_bounded_by_default(spark, tmp_path):
    """The batch writer bounds the snapshot log (ADVICE r7: unbounded
    O(n) rewrite per commit).  With the option set low, old versions
    collapse into a base and the log stays at the cap."""
    from olive_spark.format import snapshots

    d = str(tmp_path / "cap")
    for i in range(8):
        spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "k") \
            .coalesce(1).write.format("olive") \
            .option("snapshotMaxEntries", "3").mode("append").save(d)
    entries = snapshots.load_log(d)["entries"]
    assert len(entries) == 3
    assert snapshots.current_version(d) == 8
    assert spark.read.format("olive").option("snapshot", "8").load(d).count() == 80


def test_failed_append_invalidates_log_not_partial(tmp_path, monkeypatch):
    """If the snapshot append fails, the log must be REMOVED: a stale
    log would make every later snapshot silently partial, while an
    absent log fails loud ('no snapshot log')."""
    from olive_spark.datasource import olive_datasource as ds
    from olive_spark.format import snapshots

    d = str(tmp_path / "inval")
    snapshots.append_entry(d, add=["a.olive"])
    assert os.path.exists(snapshots.log_path(d))

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(snapshots, "append_entry", boom)
    ds._append_snapshot_entry(d, [os.path.join(d, "b.olive")])
    assert not os.path.exists(snapshots.log_path(d)), "stale log removed"


def test_snapshot_tags_resolve_and_expire(spark, tmp_path_factory):
    """Tags: symbolic time travel (.option snapshotTag / OliveTable),
    latest-call-wins re-tagging, loud unknown-tag errors, and expiry
    dropping tags whose version collapsed."""
    import pytest as _pytest

    from olive_spark import OliveTable
    from olive_spark.format import snapshots
    from olive_spark.format.errors import ValidationError

    path = str(tmp_path_factory.mktemp("tags") / "t")
    _write(spark, path, 0, 10)
    _write(spark, path, 10, 30)
    _write(spark, path, 30, 35)

    t = OliveTable(spark, path)
    assert t.tag("baseline", 1) == 1
    assert t.tag("latest") == 3  # default: current version
    assert t.tags() == {"baseline": 1, "latest": 3}

    assert t.time_travel_tag("baseline").count() == 10
    assert spark.read.format("olive").option(
        "snapshotTag", "latest"
    ).load(path).count() == 35

    # re-tag moves (latest call wins)
    snapshots.tag_version(path, "baseline", 2)
    assert t.time_travel_tag("baseline").count() == 30

    # through the DSv2 plan path Spark wraps the ValidationError; the
    # tag name + known list must survive into the surfaced message
    with _pytest.raises(Exception, match="unknown snapshot tag 'nope'"):
        t.time_travel_tag("nope").collect()
    with _pytest.raises(ValidationError):
        snapshots.tag_version(path, "bad", 99)  # unknown version
    with _pytest.raises(Exception, match="exclusive"):
        spark.read.format("olive").option("snapshot", "1") \
            .option("snapshotTag", "latest").load(path).collect()

    # expire past v2: 'baseline'(v2) survives via the collapsed base,
    # a tag on a dropped version would vanish — tag v1 first to prove
    snapshots.tag_version(path, "gone", 1)
    out = snapshots.expire(path, retain=2)
    assert out["tags_dropped"] == 1
    assert snapshots.list_version_tags(path) == {"baseline": 2, "latest": 3}
    assert t.time_travel_tag("baseline").count() == 30

    assert snapshots.delete_version_tag(path, "latest")
    assert not snapshots.delete_version_tag(path, "latest")
    assert snapshots.list_version_tags(path) == {"baseline": 2}


def test_bounded_log_collapse_drops_stale_tags(tmp_path):
    """snapshotMaxEntries collapse must drop tags of collapsed versions
    exactly like expire does — a dead tag would list in tags() but
    resolve to the generic unknown-snapshot error."""
    from olive_spark.format import snapshots

    d = str(tmp_path / "t")
    import os

    os.makedirs(d)
    for i in range(3):
        open(os.path.join(d, f"f{i}.olive"), "wb").write(b"x")
        snapshots.append_entry(d, [f"f{i}.olive"])
    snapshots.tag_version(d, "old", 1)
    snapshots.tag_version(d, "new", 3)
    # collapse to the last 2 entries: v1 folds into the base
    open(os.path.join(d, "f3.olive"), "wb").write(b"x")
    snapshots.append_entry(d, ["f3.olive"], max_entries=2)
    assert snapshots.list_version_tags(d) == {"new": 3}


def test_time_based_retention(tmp_path):
    """expire_older_than keeps the longest suffix newer than the cutoff
    (minimum the head) and drops tags with their versions; vacuum's
    retain_hours drives the same path."""
    import json
    import os
    import time as _time

    from olive_spark.format import snapshots

    d = str(tmp_path / "t")
    os.makedirs(d)
    now = _time.time()
    for i, age_h in enumerate([100, 50, 2, 1]):  # v1..v4, hours old
        open(os.path.join(d, f"f{i}.olive"), "wb").write(b"x")
        snapshots.append_entry(d, [f"f{i}.olive"])
        log = snapshots.load_log(d)
        log["entries"][-1]["ts"] = now - age_h * 3600
        snapshots._write_log(d, log)
    snapshots.tag_version(d, "old", 1)
    snapshots.tag_version(d, "fresh", 4)

    out = snapshots.expire_older_than(d, 24 * 3600, now=now)
    assert out["retained"] == 2 and out["expired"] == 2
    assert out["tags_dropped"] == 1
    assert snapshots.list_version_tags(d) == {"fresh": 4}
    assert set(snapshots.files_at(d, 4)) == {f"f{i}.olive" for i in range(4)}

    # head is always kept even when older than the cutoff
    out = snapshots.expire_older_than(d, 1.0, now=now + 10 * 3600)
    assert out["retained"] == 1

    # vacuum plumbs retain_hours through
    from olive_spark.ops.maintenance import vacuum

    d2 = str(tmp_path / "t2")
    os.makedirs(d2)
    for i in range(3):
        open(os.path.join(d2, f"g{i}.olive"), "wb").write(b"x")
        snapshots.append_entry(d2, [f"g{i}.olive"])
    res = vacuum(d2, retain_hours=1.0)
    assert res["snapshots"]["retained"] == 3  # all fresh — nothing expires


def test_snapshot_as_of_timestamp(spark, tmp_path_factory):
    """snapshotAsOf resolves to the latest commit at-or-before the
    instant (Delta timestampAsOf): cutoffs between the real commit
    timestamps select each version exactly; an instant before the
    first commit fails loud; the option is exclusive with 'snapshot';
    ISO-8601 parses."""
    from olive_spark.format import snapshots
    from olive_spark.format.errors import ValidationError

    path = str(tmp_path_factory.mktemp("asof") / "t")
    _write(spark, path, 0, 10)
    _write(spark, path, 10, 30)
    _write(spark, path, 30, 35)
    log = snapshots.load_log(path)["entries"]
    ts = {int(e["v"]): float(e["ts"]) for e in log}
    assert len(ts) == 3

    def read_asof(raw):
        return (
            spark.read.format("olive")
            .option("snapshotAsOf", str(raw)).load(path).count()
        )

    # exactly at each commit ts → that version; just before → previous
    assert read_asof(ts[1]) == 10
    assert read_asof(ts[3] + 10.0) == 35
    mid12 = (ts[1] + ts[2]) / 2
    assert read_asof(mid12) == (10 if mid12 < ts[2] else 30)
    # unit-level determinism (file reads may share a clock tick; the
    # resolver's rule is pure max-version-at-or-before)
    assert snapshots.version_at_timestamp(path, ts[2]) in (2, 3)
    assert snapshots.version_at_timestamp(path, ts[3]) == 3
    with pytest.raises(Exception) as ei:
        read_asof(ts[1] - 100.0)
    assert "no snapshot at or before" in str(ei.value)
    with pytest.raises(ValidationError):
        snapshots.version_at_timestamp(path, ts[1] - 100.0)
    # ISO-8601 round trip of a known-good instant
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(
        ts[3] + 5, tz=timezone.utc
    ).isoformat()
    assert read_asof(iso) == 35
    with pytest.raises(Exception) as ei:
        (
            spark.read.format("olive").option("snapshot", "1")
            .option("snapshotAsOf", str(ts[1])).load(path).count()
        )
    assert "exclusive" in str(ei.value)
    with pytest.raises(Exception) as ei:
        (
            spark.read.format("olive")
            .option("snapshotAsOf", "not-a-time").load(path).count()
        )
    assert "snapshotAsOf" in str(ei.value)


def test_version_at_timestamp_missing_ts_counts_old(tmp_path):
    """An undated log entry (hand-edited / legacy collapse base) is
    arbitrarily old ONLY when it sits strictly below every dated
    version — a collapse base predating the dated history.  An undated
    entry AT OR ABOVE dated entries is never served: r12 fix (ADVICE
    r11) — the old rule picked max version among eligible entries, so a
    NEWEST undated entry answered ANY instant, silently returning
    future data instead of failing loud."""
    import json

    import pytest

    from olive_spark.format import snapshots
    from olive_spark.format.errors import ValidationError

    d = str(tmp_path / "t")
    os.makedirs(d)
    log = {"entries": [
        {"v": 1, "add": ["a.olive"]},
        {"v": 2, "add": ["b.olive"], "ts": 1000.0},
    ]}
    with open(snapshots.log_path(d), "w") as f:
        json.dump(log, f)
    assert snapshots.version_at_timestamp(d, 500.0) == 1
    assert snapshots.version_at_timestamp(d, 1000.0) == 2

    # newest entry undated: pre-v2 instants resolve v1 (the dated v2
    # at ts=1000 proves everything above it is newer than the cutoff),
    # NEVER the undated v3.  An instant AFTER the last dated commit is
    # AMBIGUOUS (r13, ADVICE r12): v3 has no dated ceiling, so it may
    # well predate the cutoff too — serving v2 would be a silent stale
    # read; fail loud like the all-undated case.
    d2 = str(tmp_path / "t2")
    os.makedirs(d2)
    log2 = {"entries": [
        {"v": 1, "add": ["a.olive"], "ts": 100.0},
        {"v": 2, "add": ["b.olive"], "ts": 1000.0},
        {"v": 3, "add": ["c.olive"]},
    ]}
    with open(snapshots.log_path(d2), "w") as f:
        json.dump(log2, f)
    assert snapshots.version_at_timestamp(d2, 100.0) == 1
    assert snapshots.version_at_timestamp(d2, 500.0) == 1
    with pytest.raises(ValidationError, match="ambiguous"):
        snapshots.version_at_timestamp(d2, 2000.0)
    with pytest.raises(ValidationError):
        snapshots.version_at_timestamp(d2, 50.0)

    # undated entry BETWEEN dated ones (r14, ADVICE r13): for a cutoff
    # BELOW the next dated commit the undated v2 may or may not predate
    # it — same 'silent stale read' hazard as the trailing case, so it
    # raises; a cutoff AT/ABOVE the next dated commit is unambiguous
    # (v2 ≤ ts(v3) ≤ cutoff regardless), and one BELOW the first dated
    # commit never reaches v2.
    d3 = str(tmp_path / "t3")
    os.makedirs(d3)
    log3 = {"entries": [
        {"v": 1, "add": ["a.olive"], "ts": 100.0},
        {"v": 2, "add": ["b.olive"]},
        {"v": 3, "add": ["c.olive"], "ts": 1000.0},
    ]}
    with open(snapshots.log_path(d3), "w") as f:
        json.dump(log3, f)
    with pytest.raises(ValidationError, match="ambiguous"):
        snapshots.version_at_timestamp(d3, 500.0)
    assert snapshots.version_at_timestamp(d3, 1000.0) == 3
    with pytest.raises(ValidationError):
        snapshots.version_at_timestamp(d3, 50.0)

    # every entry undated: ambiguous — fail loud, never guess
    d4 = str(tmp_path / "t4")
    os.makedirs(d4)
    with open(snapshots.log_path(d4), "w") as f:
        json.dump({"entries": [{"v": 1, "add": ["a.olive"]}]}, f)
    with pytest.raises(ValidationError):
        snapshots.version_at_timestamp(d4, 500.0)


def test_snapshot_history_exact_op_provenance(spark, tmp_path_factory):
    """r11: every engine verb stamps its name (and slim params) into
    its snapshot entry, so DESCRIBE-HISTORY-style listings report exact
    provenance instead of shape heuristics — a delete is 'delete', not
    'compact', and conditions/keys ride along."""
    from olive_spark.ops.maintenance import (
        delete_where,
        merge_upsert,
        restore,
        snapshot_history,
        update_where,
    )

    path = str(tmp_path_factory.mktemp("prov") / "t")
    _write(spark, path, 0, 50)
    delete_where(spark, path, "k < 5", mode="rewrite")
    update_where(spark, path, {"k": "k + 1000"}, "k >= 45")
    src = spark.range(20, 23).withColumnRenamed("id", "k")
    merge_upsert(spark, path, src, ["k"])
    restore(path, 1)
    hist = snapshot_history(path)
    kinds = [h["kind"] for h in hist]
    assert kinds == ["append", "delete", "update", "merge", "restore"]
    assert hist[1]["params"] == {"condition": "k < 5"}
    assert hist[2]["params"] == {"condition": "k >= 45"}
    assert hist[3]["params"] == {"keys": ["k"]}
    assert hist[4]["params"] == {"to_version": 1}
    # DV-strategy delete stamps its strategy
    _write(spark, path, 500, 600)
    delete_where(spark, path, "k = 501", mode="dv")
    h = snapshot_history(path)[-1]
    assert h["kind"] == "delete"
    assert h["params"] == {"condition": "k = 501", "strategy": "dv"}
