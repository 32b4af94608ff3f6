"""Metadata-only approx COUNT DISTINCT: per-file HLL sketches in the
manifest (format/ndv.py), merged driver-side by approx_distinct."""

from __future__ import annotations

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


def test_sketch_estimator_accuracy_and_merge():
    """Estimator within ~5 % at p=10 across cardinalities spanning the
    linear-counting / raw-HLL crossover, and merging split sketches
    equals sketching the union."""
    import pyarrow as pa

    from olive_spark.format import ndv

    for n in (50, 500, 5_000, 50_000, 400_000):
        arr = pa.array([f"v{i}" for i in range(n)] * 2)  # dup every value
        est = ndv.estimate(ndv.sketch_from_array(arr))
        assert abs(est - n) / n < 0.05, (n, est)

    whole = pa.array(list(range(100_000)))
    a = pa.array(list(range(60_000)))
    b = pa.array(list(range(40_000, 100_000)))  # overlaps a
    merged = ndv.merge_sketches(
        [ndv.sketch_from_array(a), ndv.sketch_from_array(b)]
    )
    assert ndv.estimate(merged) == ndv.estimate(ndv.sketch_from_array(whole))

    # nulls are not values
    est = ndv.estimate(ndv.sketch_from_array(pa.array([None, None, 1, 2])))
    assert abs(est - 2) <= 1


def test_approx_distinct_from_manifest(spark, tmp_path):
    """ndvColumns writes per-file sketches; approx_distinct answers from
    the manifest alone across multi-file, multi-append tables, scoped to
    snapshots, within tolerance of the exact count."""
    import os

    from olive_spark import OliveTable
    from olive_spark.ops.maintenance import approx_distinct

    path = str(tmp_path / "t")
    spark.range(80_000).selectExpr(
        "id AS k", "cast(id % 12345 as long) AS v",
        "concat('u', cast(id % 777 as string)) AS u",
    ).repartition(4).write.format("olive") \
        .option("ndvColumns", "v,u").option("chunkRows", "10000") \
        .mode("append").save(path)

    est_v = approx_distinct(path, "v")
    est_u = approx_distinct(path, "u")
    assert abs(est_v - 12345) / 12345 < 0.05, est_v
    assert abs(est_u - 777) / 777 < 0.05, est_u

    # append widens the value range; the estimate follows, and the
    # pre-append snapshot still answers the OLD cardinality
    spark.range(80_000).selectExpr(
        "id AS k", "cast(id % 20000 + 100000 as long) AS v",
        "'fixed' AS u",
    ).coalesce(1).write.format("olive").option("ndvColumns", "v,u") \
        .mode("append").save(path)
    est_v2 = approx_distinct(path, "v")
    assert abs(est_v2 - 32345) / 32345 < 0.05, est_v2
    assert abs(approx_distinct(path, "v", snapshot=1) - 12345) / 12345 < 0.05

    # facade
    t = OliveTable(spark, path)
    assert t.approx_distinct("u") == approx_distinct(path, "u")

    # fallback: no manifest at all -> per-file column read, same answer
    est_before = approx_distinct(path, "v")
    os.remove(os.path.join(path, "_olive_manifest.json"))
    assert approx_distinct(path, "v") == est_before

    from olive_spark.format.errors import ValidationError

    with pytest.raises(ValidationError, match="not a column"):
        approx_distinct(path, "nope")


def test_sketch_dtype_stable_across_null_presence():
    """The same logical values must sketch identically whether or not
    their chunk contains nulls (nullable int64 -> pandas float64 would
    otherwise hash differently and double-count on merge), and whether
    or not the array is dictionary-encoded."""
    import pyarrow as pa

    from olive_spark.format import ndv

    plain = ndv.sketch_from_array(pa.array([1, 2, 3], type=pa.int64()))
    withnull = ndv.sketch_from_array(
        pa.array([1, 2, 3, None], type=pa.int64())
    )
    assert plain == withnull
    merged = ndv.merge_sketches([plain, withnull])
    assert ndv.estimate(merged) == 3

    big = 1 << 60  # would collapse under a float64 conversion
    a = ndv.sketch_from_array(pa.array([big, big + 1], type=pa.int64()))
    b = ndv.sketch_from_array(
        pa.array([big, big + 1, None], type=pa.int64())
    )
    assert ndv.estimate(ndv.merge_sketches([a, b])) == 2

    d = pa.array(["x", "y", "x"]).dictionary_encode()
    assert ndv.sketch_from_array(d) == ndv.sketch_from_array(
        pa.array(["x", "y", "x"])
    )


def test_ndv_columns_validated_at_plan_time(spark, tmp_path):
    df = spark.range(10).selectExpr("id AS k")
    with pytest.raises(Exception, match="ndvColumns"):
        df.write.format("olive").option("ndvColumns", "nope") \
            .mode("append").save(str(tmp_path / "x"))


def test_approx_distinct_dv_aware(spark, tmp_path):
    """r11 verdict task #3: on a table where ~15 % of rows are
    DV-deleted (taking whole value groups with them), the default
    estimate over-counts (documented upper bound), exact_dv=True
    restores the HLL error bound by re-sketching ONLY the DV-carrying
    files, and the DV-GC compaction repairs the DEFAULT estimate by
    re-sketching the materialized files."""
    from olive_spark.ops.maintenance import (
        approx_distinct,
        compact_if_needed,
        delete_where,
    )

    path = str(tmp_path / "t")
    # v has 10_000 distinct values; v % 100 < 15 deletes ~15 % of rows
    # AND removes exactly 1_500 distinct values entirely
    spark.range(100_000).selectExpr(
        "id AS k", "cast(id % 10000 as long) AS v"
    ).repartition(4).write.format("olive") \
        .option("ndvColumns", "v").mode("append").save(path)
    delete_where(spark, path, "v % 100 < 15", mode="dv")
    true_ndv = 8_500

    est_upper = approx_distinct(path, "v")
    assert est_upper > true_ndv * 1.05  # today's documented over-count

    est_exact = approx_distinct(path, "v", exact_dv=True)
    assert abs(est_exact - true_ndv) / true_ndv < 0.05, est_exact

    # snapshot-scoped exact_dv folds THAT version's DV state: v1 had
    # no DVs yet, so exact_dv there sees the full cardinality
    est_v1 = approx_distinct(path, "v", snapshot=1, exact_dv=True)
    assert abs(est_v1 - 10_000) / 10_000 < 0.05, est_v1

    # DV GC: materializing the masks re-sketches the rewritten files,
    # so the DEFAULT estimate is repaired without exact_dv
    g = compact_if_needed(spark, path, max_dv_fraction=0.10)
    assert g["compacted"], g
    est_after_gc = approx_distinct(path, "v")
    assert abs(est_after_gc - true_ndv) / true_ndv < 0.05, est_after_gc
