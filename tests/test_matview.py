"""Incrementally-maintained materialized aggregates
(ops.matview.refresh_matview): every refresh must leave the view
bit-identical to a from-scratch re-aggregation of the source's current
state, across merges, deletes, emptied groups, crash-recovery replays,
and both maintenance modes — and delta mode must never rescan
untouched source files (proved by making them unreadable)."""

from __future__ import annotations

import json
import os
import shutil

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


AGGS_DELTA = {
    "n": "count(*)",
    "n_v": "count(v)",
    "sum_v": "sum(v)",
    "sum_d": "sum(CAST(d AS DECIMAL(18,2)))",
}
AGGS_REGROUP = {
    "n": "count(*)",
    "sum_v": "sum(v)",
    "min_v": "min(v)",
    "max_v": "max(v)",
    "avg_v": "avg(v)",
}


def _mk_src(spark, path, n=400, files=4):
    df = spark.range(n).selectExpr(
        "id AS k",
        "cast(id % 7 as int) AS grp",
        # v NULL on every 5th row: exercises count(v)/sum-null folding
        "CASE WHEN id % 5 = 0 THEN NULL ELSE id * 10 END AS v",
        "CAST(id AS DECIMAL(18,2)) AS d",
    )
    (
        df.repartition(files).write.format("olive")
        .option("chunkRows", max(1, n // files)).mode("append").save(path)
    )


def _view_rows(spark, mv):
    df = spark.read.format("olive").option("table", "matview").load(mv)
    return sorted(tuple(r) for r in df.collect())


def _recompute(spark, src, aggs):
    from pyspark.sql import functions as F

    df = spark.read.format("olive").load(src)
    return sorted(
        tuple(r)
        for r in df.groupBy("grp")
        .agg(*[F.expr(e).alias(n) for n, e in aggs.items()])
        .collect()
    )


def _refresh(spark, src, mv, aggs, **kw):
    from olive_spark.ops.matview import refresh_matview

    return refresh_matview(
        spark, src, mv, group_cols=["grp"], aggs=aggs, **kw
    )


def _mutate_update(spark, src, pred="k % 3 = 0", bump=7):
    from pyspark.sql import functions as F

    from olive_spark.ops.maintenance import merge_upsert

    base = spark.read.format("olive").load(src)
    upd = base.filter(F.expr(pred)).withColumn(
        "v", F.coalesce(F.col("v"), F.lit(0)) + F.lit(bump)
    )
    merge_upsert(spark, src, upd, key_cols=["k"])


def _mutate_insert(spark, src, n=60, base_k=10_000):
    df = spark.range(n).selectExpr(
        f"id + {base_k} AS k",
        "cast(id % 7 as int) AS grp",
        "id * 3 AS v",
        "CAST(id + 0.25 AS DECIMAL(18,2)) AS d",
    )
    from olive_spark.ops.maintenance import merge_upsert

    merge_upsert(spark, src, df, key_cols=["k"])


def test_delta_parity_through_mutation_chain(spark, tmp_path):
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    _mk_src(spark, src)
    st = _refresh(spark, src, mv, AGGS_DELTA)
    assert st["mode"] == "full"
    assert _view_rows(spark, mv) == _recompute(spark, src, AGGS_DELTA)

    from olive_spark.ops.maintenance import delete_where

    _mutate_update(spark, src)
    st = _refresh(spark, src, mv, AGGS_DELTA)
    assert st["mode"] == "delta" and st["changed_groups"] > 0
    assert _view_rows(spark, mv) == _recompute(spark, src, AGGS_DELTA)

    _mutate_insert(spark, src)
    delete_where(spark, src, "grp = 3")  # empties group 3 entirely
    st = _refresh(spark, src, mv, AGGS_DELTA)
    assert st["dropped_groups"] == 1
    rows = _view_rows(spark, mv)
    assert rows == _recompute(spark, src, AGGS_DELTA)
    assert all(r[0] != 3 for r in rows)

    # group 3 comes back via new inserts
    _mutate_insert(spark, src, n=21, base_k=50_000)
    _refresh(spark, src, mv, AGGS_DELTA)
    rows = _view_rows(spark, mv)
    assert rows == _recompute(spark, src, AGGS_DELTA)
    assert any(r[0] == 3 for r in rows)

    # no new source version -> noop
    st = _refresh(spark, src, mv, AGGS_DELTA)
    assert st["mode"] == "noop"


def test_regroup_parity_minmax_avg(spark, tmp_path):
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    _mk_src(spark, src, n=300)
    st = _refresh(spark, src, mv, AGGS_REGROUP)  # auto -> regroup
    assert st["mode"] == "full"

    from olive_spark.ops.maintenance import delete_where

    _mutate_update(spark, src, pred="k % 2 = 0", bump=-5)
    st = _refresh(spark, src, mv, AGGS_REGROUP)
    assert st["mode"] == "regroup"
    assert _view_rows(spark, mv) == _recompute(spark, src, AGGS_REGROUP)

    delete_where(spark, src, "grp = 5")
    st = _refresh(spark, src, mv, AGGS_REGROUP)
    assert st["dropped_groups"] == 1
    assert _view_rows(spark, mv) == _recompute(spark, src, AGGS_REGROUP)


def test_delta_never_rescans_untouched_source_files(spark, tmp_path):
    """The 100 TB contract, proved mechanically: after a merge touching
    a subset of files, every source file OUTSIDE the version diff is
    moved away — a delta refresh must still succeed (it plans only the
    diff), while a regroup view over the same source must fail (it
    genuinely needs the source)."""
    from olive_spark.format.snapshots import current_version, files_at

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    # range-cluster by key so a key-bounded merge touches a file subset
    df = spark.range(500).selectExpr(
        "id AS k", "cast(id % 7 as int) AS grp",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE id * 10 END AS v",
        "CAST(id AS DECIMAL(18,2)) AS d",
    ).repartitionByRange(5, "k").sortWithinPartitions("k")
    df.write.format("olive").option("chunkRows", 100).mode("append").save(src)
    _refresh(spark, src, mv, AGGS_DELTA)
    v0 = current_version(src)
    # touch ONLY keys 0..19: bounded file subset
    _mutate_update(spark, src, pred="k < 20", bump=1)
    v1 = current_version(src)
    assert v1 > v0
    diff = set(files_at(src, v0)) ^ set(files_at(src, v1))
    # r10 merge-on-read: a DV commit changes rows WITHOUT changing the
    # file list — its TARGET file is "touched" (the delta refresh reads
    # the new DV positions from it), so it must stay in place
    from olive_spark.format.snapshots import dv_state_at

    dv0, dv1 = dv_state_at(src, v0), dv_state_at(src, v1)
    diff |= {
        t for t in set(dv0) | set(dv1) if dv0.get(t) != dv1.get(t)
    }
    untouched = [
        f for f in os.listdir(src)
        if f.endswith(".olive") and f not in diff
    ]
    assert untouched, "merge should have left some files untouched"
    stash = tmp_path / "stash"
    stash.mkdir()
    for f in untouched:
        shutil.move(os.path.join(src, f), str(stash / f))
    try:
        st = _refresh(spark, src, mv, AGGS_DELTA)
        assert st["mode"] == "delta" and st["changed_groups"] > 0
    finally:
        for f in untouched:
            shutil.move(str(stash / f), os.path.join(src, f))
    assert _view_rows(spark, mv) == _recompute(spark, src, AGGS_DELTA)


def test_crash_between_merge_and_finalize_no_double_fold(spark, tmp_path):
    """Replay after the worst crash point: the merge landed but the
    state finalize did not.  Rewinding src_version + restoring the
    pending marker must NOT re-fold the delta (the view version proves
    the merge landed)."""
    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.matview import STATE_FILE

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    _mk_src(spark, src)
    _refresh(spark, src, mv, AGGS_DELTA)
    sp = os.path.join(mv, STATE_FILE)
    before = json.load(open(sp))
    mv_v_before = current_version(mv)

    _mutate_update(spark, src)
    st = _refresh(spark, src, mv, AGGS_DELTA)
    good = _view_rows(spark, mv)

    # simulate: crash AFTER merge, BEFORE finalize
    crashed = dict(before)
    crashed["pending"] = {
        "until": st["until"], "mv_version_before": mv_v_before,
    }
    json.dump(crashed, open(sp, "w"))
    st2 = _refresh(spark, src, mv, AGGS_DELTA)
    assert st2["mode"] == "noop"
    assert _view_rows(spark, mv) == good

    # simulate: crash BEFORE merge (pending written, nothing applied).
    # mv_version_before equals the CURRENT view version, so recovery
    # must re-run the fold from the rewound cursor.
    _mutate_update(spark, src, pred="k % 11 = 0", bump=3)
    state = json.load(open(sp))
    state["pending"] = {
        "until": current_version(src),
        "mv_version_before": current_version(mv),
    }
    json.dump(state, open(sp, "w"))
    _refresh(spark, src, mv, AGGS_DELTA)
    assert _view_rows(spark, mv) == _recompute(spark, src, AGGS_DELTA)


def test_unrelated_view_commit_does_not_fake_pending_finalize(
    spark, tmp_path
):
    """r8 advice: pending recovery used to treat ANY view-version
    advance past mv_version_before as 'the merge landed'.  An unrelated
    commit on the view directory (here: a compact) between the crash
    and the re-run would then skip the [since, until] window forever —
    the view silently missing those source changes.  The tagged-commit
    check must recompute instead."""
    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.maintenance import compact
    from olive_spark.ops.matview import STATE_FILE

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    _mk_src(spark, src)
    _refresh(spark, src, mv, AGGS_DELTA)
    sp = os.path.join(mv, STATE_FILE)

    # mutate the source, then simulate a crash BEFORE the merge ran:
    # pending written (with its unique tag), nothing applied
    _mutate_update(spark, src)
    state = json.load(open(sp))
    state["pending"] = {
        "until": current_version(src),
        "mv_version_before": current_version(mv),
        "tag": "matview:crashed:deadbeef",  # never committed
    }
    json.dump(state, open(sp, "w"))

    # an UNRELATED commit advances the view's version past
    # mv_version_before — the old heuristic would finalize on this
    compact(spark, mv, table="matview", target_rows=1 << 20)
    assert current_version(mv) > state["pending"]["mv_version_before"]

    _refresh(spark, src, mv, AGGS_DELTA)
    assert _view_rows(spark, mv) == _recompute(spark, src, AGGS_DELTA)


def test_spec_validation(spark, tmp_path):
    from olive_spark.ops.matview import refresh_matview

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    _mk_src(spark, src, n=50)
    with pytest.raises(ValueError, match="invertible"):
        refresh_matview(spark, src, mv, group_cols=["grp"],
                        aggs={"m": "min(v)", "n": "count(*)"}, mode="delta")
    with pytest.raises(ValueError, match="count\\(\\*\\)"):
        refresh_matview(spark, src, mv, group_cols=["grp"],
                        aggs={"s": "sum(v)"}, mode="delta")
    _refresh(spark, src, mv, AGGS_DELTA)
    with pytest.raises(ValueError, match="spec mismatch"):
        refresh_matview(spark, src, mv, group_cols=["grp"],
                        aggs={"n": "count(*)", "sum_v": "sum(v)"})


def test_refuses_foreign_olive_dir(spark, tmp_path):
    from olive_spark.ops.matview import refresh_matview

    src, alien = str(tmp_path / "src"), str(tmp_path / "alien")
    _mk_src(spark, src, n=50)
    _mk_src(spark, alien, n=10)
    with pytest.raises(ValueError, match="refusing to adopt"):
        refresh_matview(spark, src, alien, group_cols=["grp"],
                        aggs=AGGS_DELTA)
