"""Shallow clone (ops.maintenance.clone_table): hardlinked files +
fresh metadata; mutations on either side never leak into the other
because chunk files are immutable and rewrites are copy-on-write."""

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


def _rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.format("olive").load(path).collect()
    )


def test_clone_isolated_mutations(spark, tmp_path):
    from olive_spark.ops.maintenance import (
        clone_table,
        delete_where,
        merge_upsert,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(200).selectExpr("id AS k", "id * 2 AS v") \
        .repartition(4).write.format("olive").mode("append").save(src)
    base = _rows(spark, src)

    out = clone_table(src, dst)
    assert out["files"] >= 4 and out["linked"] == out["files"]
    assert _rows(spark, dst) == base

    # clone starts its own history at version 1
    from olive_spark.format.snapshots import current_version

    assert current_version(dst) == 1

    # mutate the SOURCE: the clone must not move
    delete_where(spark, src, "k < 50")
    assert len(_rows(spark, src)) == 150
    assert _rows(spark, dst) == base

    # mutate the CLONE: the source must not move
    upd = spark.createDataFrame([(60, 999)], "k long, v long")
    merge_upsert(spark, dst, upd, ["k"])
    assert dict(_rows(spark, dst))[60] == 999
    assert dict(_rows(spark, src))[60] == 120

    # vacuum on the source never deletes the clone's bytes (hardlinks)
    from olive_spark.ops.maintenance import vacuum

    vacuum(src, retain_snapshots=1)
    assert len(_rows(spark, dst)) == 200


def test_clone_time_travel_version(spark, tmp_path):
    from olive_spark.ops.maintenance import clone_table, delete_where

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(100).selectExpr("id AS k", "id AS v") \
        .coalesce(2).write.format("olive").mode("append").save(src)
    want = _rows(spark, src)
    delete_where(spark, src, "k < 40", retain_history=True)
    assert len(_rows(spark, src)) == 60

    out = clone_table(src, dst, version=1)
    assert out["version_cloned"] == 1
    assert _rows(spark, dst) == want  # the PRE-delete state


def test_clone_carries_sidecars_and_refuses_nonempty(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.format.partition import read_sidecar
    from olive_spark.ops.maintenance import clone_table, rename_column

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(60).selectExpr(
        "id AS k",
        "timestamp_micros(cast(1700000000000000 + (id % 3) "
        "* 86400000000 as long)) AS ts",
        "id AS v",
    ).coalesce(1).write.format("olive") \
        .option("partitionBy", "days(ts)").mode("append").save(src)
    rename_column(src, "v", "val")

    clone_table(src, dst)
    # hidden-partition spec + rename mapping both travel
    assert read_sidecar(dst) == read_sidecar(src)
    got = spark.read.format("olive").load(dst)
    assert sorted(got.columns) == ["k", "ts", "val"]
    assert got.count() == 60
    assert got.filter("val = 30").count() == 1

    with pytest.raises(ValidationError, match="already holds"):
        clone_table(src, dst)
    with pytest.raises(ValidationError, match="equals the source"):
        clone_table(src, src)


def test_clone_refuses_nested_destination(spark, tmp_path):
    from olive_spark.format.errors import ValidationError
    from olive_spark.ops.maintenance import clone_table

    src = str(tmp_path / "src")
    spark.range(10).selectExpr("id AS k").write.format("olive") \
        .mode("append").save(src)
    with pytest.raises(ValidationError, match="nest"):
        clone_table(src, os.path.join(src, "branch"))
