"""Write-time expectations gate (ops.expectations): warn/drop/
quarantine dispositions, NULL-fails semantics, single-pass observe
stats, quarantine round-trip through a snapshot-logged sidecar."""

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


RULES = {
    "price_positive": ("price > 0", "quarantine"),
    "qty_bound": ("qty <= 100", "drop"),
    "name_short": ("length(name) <= 8", "warn"),
}


def _batch(spark):
    rows = [
        (1, 10.0, 5, "ok"),            # clean
        (2, -3.0, 5, "negprice"),      # quarantine (price)
        (3, 10.0, 200, "bigqty"),      # drop (qty)
        (4, None, 5, "nullprice"),     # quarantine (NULL fails)
        (5, 10.0, 5, "averylongname"), # warn only -> passes
        (6, -1.0, 999, "both"),        # quarantine wins over drop
    ]
    return spark.createDataFrame(
        rows, "id long, price double, qty long, name string"
    )


def test_dispositions_and_counts(spark, tmp_path):
    from olive_spark.ops.expectations import write_with_expectations

    path = str(tmp_path / "t")
    st = write_with_expectations(spark, _batch(spark), path, RULES)
    assert st["rows_in"] == 6
    assert st["rows_written"] == 2      # ids 1, 5
    assert st["rows_dropped"] == 1      # id 3
    assert st["rows_quarantined"] == 3  # ids 2, 4, 6
    assert st["failed_counts"] == {
        "price_positive": 3, "qty_bound": 2, "name_short": 2,
    }  # name_short fails for "nullprice" (9 chars) + "averylongname"
    main = spark.read.format("olive").load(path)
    assert sorted(r["id"] for r in main.collect()) == [1, 5]
    q = spark.read.format("olive").option("table", "quarantine") \
        .load(st["quarantine_path"])
    got = {r["id"]: list(r["_failed_rules"]) for r in q.collect()}
    assert got == {
        2: ["price_positive"],
        4: ["price_positive", "name_short"],
        6: ["price_positive", "qty_bound"],
    }


def test_clean_batch_empty_quarantine_sentinel(spark, tmp_path):
    """A clean batch commits a zero-row quarantine sentinel (the
    quarantine-first crash ordering makes the sidecar the first write),
    so .quarantine() is always readable once the gate has run."""
    from olive_spark.ops.expectations import write_with_expectations

    path = str(tmp_path / "t")
    clean = spark.createDataFrame(
        [(1, 5.0, 1, "a"), (2, 6.0, 2, "b")],
        "id long, price double, qty long, name string",
    )
    st = write_with_expectations(spark, clean, path, RULES)
    assert st["rows_written"] == 2 and st["rows_quarantined"] == 0
    q = spark.read.format("olive").option("table", "quarantine") \
        .load(st["quarantine_path"])
    assert q.count() == 0 and "_failed_rules" in q.columns


def test_quarantine_repair_reingest(spark, tmp_path):
    """The triage loop: repair quarantined rows and send them back
    through the SAME gate — repaired rows land, still-bad rows
    re-quarantine."""
    from pyspark.sql import functions as F

    from olive_spark.ops.expectations import write_with_expectations

    path = str(tmp_path / "t")
    st = write_with_expectations(spark, _batch(spark), path, RULES)
    q = spark.read.format("olive").option("table", "quarantine") \
        .load(st["quarantine_path"])
    repaired = q.drop("_failed_rules").withColumn(
        "price", F.coalesce(F.abs(F.col("price")), F.lit(1.0))
    )
    st2 = write_with_expectations(spark, repaired, path, RULES)
    # id 6 still violates the drop rule (qty 999); 2 and 4 now land
    assert st2["rows_written"] == 2 and st2["rows_dropped"] == 1
    main = spark.read.format("olive").load(path)
    assert sorted(r["id"] for r in main.collect()) == [1, 2, 4, 5]


def test_validation_errors(spark, tmp_path):
    from olive_spark.ops.expectations import apply_expectations

    df = _batch(spark)
    with pytest.raises(ValueError, match="non-empty"):
        apply_expectations(df, {})
    with pytest.raises(ValueError, match="unknown action"):
        apply_expectations(df, {"r": ("price > 0", "explode")})
    with pytest.raises(ValueError, match="reserved"):
        apply_expectations(df, {"_r": ("price > 0", "warn")})
    with pytest.raises(ValueError, match="collide"):
        apply_expectations(
            df.withColumn("_failed_rules", df.id),
            {"r": ("price > 0", "warn")},
        )


def test_apply_only_no_write(spark):
    from olive_spark.ops.expectations import apply_expectations

    passed, quarantined, obs = apply_expectations(_batch(spark), RULES)
    p = sorted(r["id"] for r in passed.collect())
    assert p == [1, 5]
    m = obs.get
    assert m["_rows_in"] == 6 and m["price_positive"] == 3


def test_olive_table_facade_gate(spark, tmp_path):
    """OliveTable.append_gated / .quarantine delegate to the gate and
    sidecar with the handle's binding."""
    from olive_spark import OliveTable

    t = OliveTable(spark, str(tmp_path / "t"))
    st = t.append_gated(_batch(spark), RULES)
    assert st["rows_written"] == 2 and st["rows_quarantined"] == 3
    assert sorted(r["id"] for r in t.df().collect()) == [1, 5]
    q = t.quarantine()
    assert q.count() == 3 and "_failed_rules" in q.columns
