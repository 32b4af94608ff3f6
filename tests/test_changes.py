"""Change data feed (ops.changes.read_changes): row-level snapshot
diffs over the snapshot log — inserts/deletes/updates between retained
versions, with moved-but-identical rows cancelling out."""

from __future__ import annotations

from collections import Counter

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


def _mk_table(spark, path, n=200, files=4):
    df = spark.range(n).selectExpr(
        "id AS k", "id * 10 AS v", "cast(id % 7 as int) AS grp"
    )
    (
        df.repartition(files).write.format("olive")
        .option("chunkRows", max(1, n // files)).mode("append").save(path)
    )


def _snapshot_rows(spark, path, version):
    df = (
        spark.read.format("olive").option("snapshot", str(version)).load(path)
    )
    return Counter(tuple(r) for r in df.collect())


def _changes(df):
    ins = Counter(
        tuple(r)[:-1] for r in df.collect() if r["_change_type"] in
        ("insert", "update_postimage")
    )
    dels = Counter(
        tuple(r)[:-1] for r in df.collect() if r["_change_type"] in
        ("delete", "update_preimage")
    )
    return ins, dels


def test_read_changes_matches_state_diff(spark, tmp_path):
    """Net changes between two versions must equal the multiset diff of
    the two snapshot states — for a history mixing updates, inserts,
    and a predicate delete."""
    from olive_spark.ops.changes import read_changes
    from olive_spark.ops.maintenance import delete_where, merge_upsert

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    src = spark.range(190, 210).selectExpr(
        "id AS k", "id * 100 AS v", "cast(50 as int) AS grp"
    )
    merge_upsert(spark, path, src, ["k"])          # v2
    delete_where(spark, path, "grp = 3")           # v3

    s1, s3 = _snapshot_rows(spark, path, 1), _snapshot_rows(spark, path, 3)
    got_ins, got_del = _changes(read_changes(spark, path, since=1))
    assert got_ins == s3 - s1
    assert got_del == s1 - s3
    # intermediate range: only the merge's delta
    s2 = _snapshot_rows(spark, path, 2)
    got_ins2, got_del2 = _changes(
        read_changes(spark, path, since=1, until=2)
    )
    assert got_ins2 == s2 - s1 and got_del2 == s1 - s2


def test_read_changes_key_labels_updates(spark, tmp_path):
    from olive_spark.ops.changes import read_changes
    from olive_spark.ops.maintenance import merge_upsert

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=100, files=2)
    src = spark.range(95, 105).selectExpr(
        "id AS k", "id * 100 AS v", "cast(9 as int) AS grp"
    )
    merge_upsert(spark, path, src, ["k"])
    df = read_changes(spark, path, since=1, key_cols=["k"])
    by_type = Counter(r["_change_type"] for r in df.collect())
    # keys 95..99 were replaced (pre+post images), 100..104 inserted
    assert by_type == {
        "update_preimage": 5, "update_postimage": 5, "insert": 5,
    }
    rows = {(r["k"], r["_change_type"]) for r in df.collect()}
    assert (97, "update_preimage") in rows
    assert (97, "update_postimage") in rows
    assert (102, "insert") in rows


def test_compaction_yields_empty_change_feed(spark, tmp_path):
    """Rows that merely MOVE between files (compaction rewrite) must
    cancel in the multiset diff — a change feed that reports a whole
    table as churn after compaction is useless."""
    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.changes import read_changes
    from olive_spark.ops.maintenance import compact

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=200, files=4)
    v0 = current_version(path)
    compact(spark, path, target_rows=1000, retain_history=True)
    assert current_version(path) > v0
    assert read_changes(spark, path, since=v0).count() == 0


def test_read_changes_same_version_and_validation(spark, tmp_path):
    from olive_spark.ops.changes import read_changes

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=20, files=1)
    df = read_changes(spark, path, since=1, until=1)
    assert df.count() == 0 and df.columns == ["k", "v", "grp", "_change_type"]
    with pytest.raises(ValueError, match="must be >="):
        read_changes(spark, path, since=5, until=1)


def test_read_changes_refuses_vacuumed_history(spark, tmp_path):
    """A diff that cannot resolve a removed file must fail loud, never
    return a partial feed."""
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.changes import read_changes
    from olive_spark.ops.maintenance import merge_upsert, vacuum

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=100, files=2)
    src = spark.range(5).selectExpr(
        "id AS k", "id * 100 AS v", "cast(9 as int) AS grp"
    )
    # rewrite strategy: the refusal under test is a RETIRED file whose
    # history was never kept (the DV strategy retires nothing)
    merge_upsert(spark, path, src, ["k"], retain_history=False,
                 strategy="rewrite")
    with pytest.raises(ValidationError, match="not reconstructable"):
        read_changes(spark, path, since=1).count()


def test_files_option_scans_exact_set_and_validates(spark, tmp_path):
    import glob
    import os

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=100, files=4)
    rels = sorted(
        os.path.relpath(f, path)
        for f in glob.glob(os.path.join(path, "*.olive"))
    )
    counts = {
        rel: spark.read.format("olive").option("files", rel)
        .load(path).count()
        for rel in rels
    }
    assert sum(counts.values()) == 100  # the files partition the table
    two = (
        spark.read.format("olive")
        .option("files", ",".join(rels[:2])).load(path)
    )
    assert two.count() == counts[rels[0]] + counts[rels[1]]
    with pytest.raises(Exception, match="exclusive"):
        (
            spark.read.format("olive").option("files", rels[0])
            .option("snapshot", "1").load(path).count()
        )


def test_read_changes_rejects_reserved_column_collisions(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(5).selectExpr("id AS k", "'x' AS _change_type") \
        .write.format("olive").mode("append").save(path)
    from olive_spark.ops.changes import read_changes

    # the guard must hold even for an empty (same-version) range
    with pytest.raises(ValueError, match="collide"):
        read_changes(spark, path, since=1, until=1)
    path2 = str(tmp_path / "t2")
    spark.range(5).selectExpr("id AS k", "true AS __upd") \
        .write.format("olive").mode("append").save(path2)
    with pytest.raises(ValueError, match="collide"):
        read_changes(spark, path2, since=1, key_cols=["k"])


def test_read_changes_by_commit_labels_versions(spark, tmp_path):
    """Per-commit granularity: each change row carries the version that
    produced it, and intermediate churn the endpoint diff nets out IS
    visible here."""
    from olive_spark.ops.changes import read_changes_by_commit
    from olive_spark.ops.maintenance import delete_where, merge_upsert

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=50, files=1)
    src = spark.range(40, 45).selectExpr(
        "id AS k", "id * 100 AS v", "cast(9 as int) AS grp"
    )
    merge_upsert(spark, path, src, ["k"])          # v2: 5 updates
    delete_where(spark, path, "k >= 40 AND k < 45")  # v3: delete them again
    df = read_changes_by_commit(spark, path, since=1)
    per = Counter(
        (r["_commit_version"], r["_change_type"]) for r in df.collect()
    )
    assert per[(2, "insert")] == 5 and per[(2, "delete")] == 5  # the update pair
    assert per[(3, "delete")] == 5
    # endpoint diff nets the v2 churn: only the 5 original rows deleted
    from olive_spark.ops.changes import read_changes

    net = Counter(r["_change_type"] for r in read_changes(
        spark, path, since=1
    ).collect())
    assert net == {"delete": 5}
    empty = read_changes_by_commit(spark, path, since=3, until=3)
    assert empty.count() == 0 and "_commit_version" in empty.columns


def test_olive_table_facade_end_to_end(spark, tmp_path):
    """OliveTable binds (spark, path, table) once and must behave
    exactly like the standalone functions it delegates to."""
    from olive_spark import OliveTable

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=100, files=2)
    t = OliveTable(spark, path)
    assert t.version() == 1 and t.df().count() == 100
    src = spark.range(95, 110).selectExpr(
        "id AS k", "id * 100 AS v", "cast(9 as int) AS grp"
    )
    out = t.merge(src, ["k"])
    assert out["version"] == 2 and t.df().count() == 110
    t.delete_where("grp = 9")
    assert t.version() == 3
    assert t.time_travel(1).count() == 100
    ch = t.changes(since=1, until=2, key_cols=["k"])
    assert ch.filter("_change_type = 'update_preimage'").count() == 5
    # net v1->v3: the deletes at v3 swallow the update postimages, so
    # the touched originals surface as plain deletes
    net = t.changes(since=1, key_cols=["k"])
    assert Counter(r["_change_type"] for r in net.collect()) == {"delete": 5}
    hist = t.history()
    assert [h["version"] for h in hist][-1] == 3
    assert t.checksum() == t.checksum()  # deterministic
    t.compact(target_rows=1000, retain_history=True)
    assert t.df().count() == t.time_travel(3).count()


def test_by_commit_validates_until_and_reserved_column(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.changes import read_changes_by_commit

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=20, files=1)
    with pytest.raises(ValidationError, match="unknown snapshot"):
        read_changes_by_commit(spark, path, since=1, until=99)
    path2 = str(tmp_path / "t2")
    spark.range(5).selectExpr("id AS k", "cast(7 as int) AS _commit_version") \
        .write.format("olive").mode("append").save(path2)
    with pytest.raises(ValueError, match="collide"):
        read_changes_by_commit(spark, path2, since=1)


def test_count_rows_metadata_only(spark, tmp_path):
    """count_rows must equal df.count() across appends, a MERGE
    rewrite, hive partitioning, snapshot time travel, and a deleted
    manifest (header fallback) — without running a Spark job."""
    from olive_spark import OliveTable
    from olive_spark.ops.maintenance import count_rows, merge_upsert

    path = str(tmp_path / "t")
    _mk_table(spark, path, n=300, files=3)
    _mk_table(spark, path, n=100, files=1)  # second append commit
    t = OliveTable(spark, path)
    assert t.count_rows() == t.df().count() == 400

    src = spark.range(5).selectExpr(
        "id AS k", "id AS v", "cast(1 as int) AS grp"
    )
    merge_upsert(spark, path, src, ["k"])
    assert t.count_rows() == t.df().count()
    v1 = 1
    assert t.count_rows(snapshot=v1) == t.time_travel(v1).count()

    # header fallback: no manifest at all
    import os

    mf = os.path.join(path, "_olive_manifest.json")
    if os.path.exists(mf):
        os.remove(mf)
    assert count_rows(path) == t.df().count()

    # hive-partitioned layout
    p2 = str(tmp_path / "p")
    spark.range(120).selectExpr(
        "id AS k", "cast(id % 3 as int) AS part"
    ).write.format("olive").option("partitionBy", "part") \
        .mode("append").save(p2)
    assert count_rows(p2) == 120


def _mutate_twice(spark, path):
    """merge (update+insert) at v2, delete at v3."""
    from olive_spark.ops.maintenance import delete_where, merge_upsert

    src = spark.range(195, 205).selectExpr(
        "id AS k", "id * 100 AS v", "cast(99 as int) AS grp"
    )
    merge_upsert(spark, path, src, ["k"])
    delete_where(spark, path, "grp = 3")


def test_pump_changes_backfill_matches_by_commit(spark, tmp_path):
    """Backfill-from-0 pump: v1 arrives as a synthetic all-insert batch,
    later commits as their real diffs; the union must reproduce v1's
    state plus read_changes_by_commit over (1, head]."""
    from olive_spark.ops.changes import pump_changes, read_changes_by_commit

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _mutate_twice(spark, path)
    got = []

    def apply_fn(df, v):
        got.append((v, Counter(tuple(r) for r in df.collect())))

    out = pump_changes(
        spark, path, str(tmp_path / "s"), apply_fn, starting_version=0
    )
    assert out["applied"] == 3 and out["cursor"] == 3
    assert [v for v, _ in got] == [1, 2, 3]
    base = Counter(
        (*t, "insert") for t in _snapshot_rows(spark, path, 1)
    )
    assert got[0][1] == base
    bc = read_changes_by_commit(spark, path, since=1)
    for v in (2, 3):
        want = Counter(
            tuple(r)[:-1] for r in bc.collect() if r["_commit_version"] == v
        )
        assert got[v - 1][1] == want


def test_pump_changes_resumes_and_caps(spark, tmp_path):
    """max_commits_per_run bounds each call; the cursor resumes across
    calls, and a crashed apply re-delivers exactly its commit."""
    from olive_spark.ops.changes import pump_changes

    path = str(tmp_path / "t")
    state = str(tmp_path / "s")
    _mk_table(spark, path)
    _mutate_twice(spark, path)
    seen = []

    def ok(df, v):
        seen.append(v)

    out = pump_changes(spark, path, state, ok,
                       starting_version=0, max_commits_per_run=1)
    assert out == {"applied": 1, "cursor": 1} and seen == [1]

    def boom(df, v):
        seen.append(v)
        raise RuntimeError("consumer died")

    with pytest.raises(RuntimeError):
        pump_changes(spark, path, state, boom)
    assert seen == [1, 2]
    # cursor did NOT advance past the failed commit: 2 re-delivers
    out = pump_changes(spark, path, state, ok)
    assert seen == [1, 2, 2, 3] and out["cursor"] == 3
    # nothing new: a further call is a no-op
    assert pump_changes(spark, path, state, ok)["applied"] == 0


def test_pump_changes_default_start_skips_history(spark, tmp_path):
    """Default seed = current version: only commits made AFTER the
    first call flow."""
    from olive_spark.ops.changes import pump_changes
    from olive_spark.ops.maintenance import delete_where

    path = str(tmp_path / "t")
    state = str(tmp_path / "s")
    _mk_table(spark, path)
    _mutate_twice(spark, path)
    seen = []
    out = pump_changes(spark, path, state, lambda df, v: seen.append(v))
    assert out["applied"] == 0 and seen == []
    delete_where(spark, path, "grp = 5")
    out = pump_changes(spark, path, state, lambda df, v: seen.append(v))
    assert out["applied"] == 1 and seen == [4]


def test_pump_changes_expired_cursor_fails_loud(spark, tmp_path):
    import json
    import os

    from olive_spark.format.errors import ValidationError
    from olive_spark.format.snapshots import expire
    from olive_spark.ops.changes import pump_changes

    path = str(tmp_path / "t")
    state = str(tmp_path / "s")
    _mk_table(spark, path)
    _mutate_twice(spark, path)
    os.makedirs(state)
    with open(os.path.join(state, "cdc_cursor.json"), "w") as f:
        json.dump({"version": 1}, f)
    expire(path, retain=1)  # v1/v2 collapse away; cursor 1 is stale
    with pytest.raises(ValidationError):
        pump_changes(spark, path, state, lambda df, v: None)


def test_pump_changes_fails_loud_on_bad_cursor_and_no_log(spark, tmp_path):
    import json
    import os

    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.changes import pump_changes

    # log-less directory: silent applied=0 would look configured
    empty = str(tmp_path / "nolog")
    os.makedirs(empty)
    with pytest.raises(ValidationError, match="no snapshot log"):
        pump_changes(spark, empty, str(tmp_path / "s0"), lambda df, v: None)

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    # corrupt cursor file: reseeding would skip undelivered commits
    state = str(tmp_path / "s1")
    os.makedirs(state)
    with open(os.path.join(state, "cdc_cursor.json"), "w") as f:
        f.write("{not json")
    with pytest.raises(ValidationError, match="unreadable CDC cursor"):
        pump_changes(spark, path, state, lambda df, v: None)
    # wrong type: same refusal
    state2 = str(tmp_path / "s2")
    os.makedirs(state2)
    with open(os.path.join(state2, "cdc_cursor.json"), "w") as f:
        json.dump({"version": "3"}, f)
    with pytest.raises(ValidationError, match="unreadable CDC cursor"):
        pump_changes(spark, path, state2, lambda df, v: None)


def test_read_changes_timestamp_bounds(spark, tmp_path_factory):
    """since_ts/until_ts resolve through the snapshotAsOf rule (latest
    commit at-or-before the instant) and produce the same feed as the
    version bounds they resolve to; mixing a version and a timestamp
    for one bound, and a pre-history instant, fail loud."""
    import pytest

    from olive_spark.format import snapshots
    from olive_spark.ops.changes import read_changes

    path = str(tmp_path_factory.mktemp("cdcts") / "t")

    def w(lo, hi):
        spark.range(lo, hi).withColumnRenamed("id", "k") \
            .coalesce(1).write.format("olive").mode("append").save(path)

    w(0, 10)
    w(10, 30)
    w(30, 35)
    ts = {
        int(e["v"]): float(e["ts"])
        for e in snapshots.load_log(path)["entries"]
    }
    by_v = read_changes(spark, path, since=1, until=3).collect()
    by_t = read_changes(
        spark, path, since_ts=ts[1], until_ts=ts[3] + 1.0
    ).collect()
    assert sorted(r["k"] for r in by_t) == sorted(r["k"] for r in by_v)
    assert all(r["_change_type"] == "insert" for r in by_t)
    assert len(by_t) == 25
    with pytest.raises(ValueError, match="not both"):
        read_changes(spark, path, since=1, since_ts=ts[1])
    with pytest.raises(ValueError, match="needs since"):
        read_changes(spark, path)
    from olive_spark.format.errors import ValidationError

    with pytest.raises(ValidationError, match="no snapshot at or before"):
        read_changes(spark, path, since_ts=ts[1] - 100.0)


def test_pump_changes_starting_timestamp_seed(spark, tmp_path_factory):
    """pump_changes(starting_timestamp=...) seeds a fresh consumer at
    the latest commit at-or-before the instant — later commits deliver,
    earlier ones don't; both-seeds-given is refused."""
    import pytest

    from olive_spark.format import snapshots
    from olive_spark.ops.changes import pump_changes

    path = str(tmp_path_factory.mktemp("pumpts") / "t")

    def w(lo, hi):
        spark.range(lo, hi).withColumnRenamed("id", "k") \
            .coalesce(1).write.format("olive").mode("append").save(path)

    w(0, 10)
    w(10, 30)
    ts1 = {
        int(e["v"]): float(e["ts"])
        for e in snapshots.load_log(path)["entries"]
    }[1]
    state = str(tmp_path_factory.mktemp("pumptsstate"))
    seen = []
    out = pump_changes(
        spark, path, state,
        lambda df, v: seen.append((v, sorted(r["k"] for r in df.collect()))),
        starting_timestamp=ts1,
    )
    assert out["applied"] == 1  # only v2 (v1 is the seed position)
    assert seen == [(2, list(range(10, 30)))]
    with pytest.raises(ValueError, match="not both"):
        pump_changes(
            spark, path, str(tmp_path_factory.mktemp("x")),
            lambda df, v: None,
            starting_version=1, starting_timestamp=ts1,
        )
