"""RESTORE TABLE ... TO VERSION on snapshot-logged olive tables
(ops.maintenance.restore): metadata+rename commit, no data rewrite;
undoable; loud when history was vacuumed; crash-recoverable through the
same intent manifest as compact/merge."""

from __future__ import annotations

import json
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


def _mk_table(spark, path, n=1000, files=4):
    df = spark.range(n).selectExpr(
        "id AS k", "id * 10 AS v", "cast(id % 7 as int) AS grp"
    )
    (
        df.repartition(files)
        .write.format("olive")
        .option("chunkRows", max(1, n // files))
        .mode("append")
        .save(path)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mutate(spark, path):
    """merge (update+insert) then delete: two commits past the base.
    Pinned to the copy-on-write strategy — these tests exercise
    file-reactivation restore; DV restore is covered in
    tests/test_deletion.py."""
    from olive_spark.ops.maintenance import delete_where, merge_upsert

    src = spark.range(995, 1005).selectExpr(
        "id AS k", "id * 100 AS v", "cast(99 as int) AS grp"
    )
    merge_upsert(spark, path, src, ["k"], strategy="rewrite")
    delete_where(spark, path, "grp = 3", mode="rewrite")


def test_restore_returns_exact_base_state(spark, tmp_path):
    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.maintenance import restore

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    base = _rows(spark.read.format("olive").load(path))
    _mutate(spark, path)
    head_before = current_version(path)
    out = restore(path, 1)
    assert out["restored_to"] == 1
    assert out["version"] == head_before + 1
    assert out["reactivated"] >= 1 and out["retired"] >= 1
    assert _rows(spark.read.format("olive").load(path)) == base


def test_restore_preserves_history_and_is_undoable(spark, tmp_path):
    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.maintenance import restore

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _mutate(spark, path)
    mutated = _rows(spark.read.format("olive").load(path))
    pre_restore = current_version(path)
    restore(path, 1)
    # time travel PAST the restore still sees the mutated state
    tt = spark.read.format("olive").option(
        "snapshot", pre_restore
    ).load(path)
    assert _rows(tt) == mutated
    # and restoring to the pre-restore head undoes the restore
    out = restore(path, pre_restore)
    assert _rows(spark.read.format("olive").load(path)) == mutated
    assert out["restored_to"] == pre_restore


def test_restore_to_current_head_is_a_noop(spark, tmp_path):
    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.maintenance import restore

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _mutate(spark, path)
    head = current_version(path)
    out = restore(path, head)
    assert out["version"] == head  # no new commit for a no-op
    assert out["reactivated"] == 0 and out["retired"] == 0


def test_restore_fails_loud_after_history_vacuumed(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.format.snapshots import expire
    from olive_spark.ops.maintenance import restore

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _mutate(spark, path)
    # expire everything but the head: v1's rewritten files are dropped
    expire(path, retain=1)
    with pytest.raises(ValidationError):
        restore(path, 1)


def test_restore_rebuilds_manifest_entries(spark, tmp_path):
    from olive_spark.format.manifest import load_manifest
    from olive_spark.format.snapshots import current_version, files_at
    from olive_spark.ops.maintenance import restore

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _mutate(spark, path)
    restore(path, 1)
    man = load_manifest(path)
    live = files_at(path, current_version(path))
    missing = [rel for rel in live if rel not in man]
    assert not missing, f"re-activated files unmanifested: {missing}"
    for rel in live:
        ent = man[rel]
        assert ent["rows"] > 0 and ent["size"] == os.path.getsize(
            os.path.join(path, rel)
        )


def test_restore_crash_before_activation_recovers(spark, tmp_path):
    """Simulate a crash right after the intent manifest landed: stage
    the links + write the manifest by hand, then let _recover_pending
    finish the job (activate stagings, retire originals, log entry)."""
    from olive_spark.format.snapshots import (
        current_version,
        files_at,
        resolve_paths,
    )
    from olive_spark.ops.maintenance import _recover_pending

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    base = _rows(spark.read.format("olive").load(path))
    _mutate(spark, path)
    target = files_at(path, 1)
    cur = set(files_at(path, current_version(path)))
    add = sorted(set(target) - cur)
    remove = sorted(cur - set(target))
    assert add and remove
    for rel, src in zip(add, resolve_paths(path, add)):
        os.link(src, os.path.join(path, rel) + ".staging")
    with open(os.path.join(path, "compact-deadbeef.manifest.json"), "w") as f:
        json.dump({"originals": remove, "finals": add, "history": True,
                   "op": "restore", "tag": "restore:1"}, f)
    out = _recover_pending(path)
    assert out["manifests_completed"] == 1
    assert _rows(spark.read.format("olive").load(path)) == base
    # the recovered commit carries the same tag the crash-free path
    # writes, so history classifies it as a restore
    from olive_spark.ops.maintenance import snapshot_history

    hist = snapshot_history(path)
    assert hist[-1]["kind"] == "restore" and hist[-1]["tag"] == "restore:1"


def test_facade_restore(spark, tmp_path):
    from olive_spark import OliveTable

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    t = OliveTable(spark, path)
    base = _rows(t.df())
    _mutate(spark, path)
    out = t.restore(1)
    assert out["restored_to"] == 1
    assert _rows(t.df()) == base
    # history lists the restore as a tagged commit
    tags = [e.get("tag") for e in t.history()]
    assert "restore:1" in tags


def test_restore_to_timestamp(spark, tmp_path_factory):
    """restore(timestamp=...) resolves through the snapshotAsOf rule
    (Delta's RESTORE TO TIMESTAMP): an instant between v1 and v2
    restores v1's content; version+timestamp together and neither are
    refused."""
    import pytest

    from olive_spark.format import snapshots
    from olive_spark.ops.maintenance import restore

    path = str(tmp_path_factory.mktemp("rts") / "t")

    def _w(lo, hi):
        spark.range(lo, hi).withColumnRenamed("id", "k").coalesce(1) \
            .write.format("olive").mode("append").save(path)

    _w(0, 10)
    _w(10, 30)
    ts = {
        int(e["v"]): float(e["ts"])
        for e in snapshots.load_log(path)["entries"]
    }
    asof = (ts[1] + ts[2]) / 2 if ts[2] > ts[1] else ts[1]
    out = restore(path, timestamp=asof)
    assert out["restored_to"] == 1 if "restored_to" in out else True
    assert spark.read.format("olive").load(path).count() == 10
    with pytest.raises(ValueError, match="not both"):
        restore(path, 1, timestamp=asof)
    with pytest.raises(ValueError, match="required"):
        restore(path)
