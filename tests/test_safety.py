"""Durability / correctness-edge tests for the round-4 defect sweep:

- null partitionBy values must survive a partitioned write (previously
  silently dropped by the all-null equality mask);
- partitioned writes flush per-key at chunk_rows (multiple files per
  key, no task-wide buffering);
- compact() is crash-safe: a failure in any swap phase leaves the table
  readable (old files, or old+new superset — never an empty directory);
- deterministic file listing regardless of os.walk dir order;
- sliced Arrow ListArrays feed reduceat correctly (offsets rebased);
- stream_dedup with a watermark dedups on the KEY, not (key, ts);
- decimal256 and interval_month_day_nano round-trip / policy
  (reference src/write.zig:151-157,193-197).
"""

from __future__ import annotations

import os
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

from olive_spark.format import read_chunk, write_chunk


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


# ------------------------------------------------------- partitioned write


def test_partitioned_write_keeps_null_keys(spark, tmp_path):
    out = str(tmp_path / "pnull")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id long, k string"
    )
    df.coalesce(1).write.format("olive").mode("append").option(
        "partitionBy", "k"
    ).save(out)
    assert os.path.isdir(os.path.join(out, "k=__HIVE_DEFAULT_PARTITION__"))
    got = spark.read.format("olive").load(out)
    assert got.count() == 4, "null-key rows must survive a partitioned write"
    assert sorted(
        r["id"] for r in got.filter("k IS NULL").collect()
    ) == [2, 4]


def test_partitioned_write_flushes_at_chunk_rows(spark, tmp_path):
    out = str(tmp_path / "pflush")
    # skewed: one hot key with 900 rows, chunkRows=100 → ≥9 files for it
    df = spark.range(0, 1000).selectExpr(
        "id", "CASE WHEN id < 900 THEN 'hot' ELSE concat('cold', id % 7) END AS k"
    )
    df.coalesce(1).write.format("olive").mode("append").option(
        "partitionBy", "k"
    ).option("chunkRows", 100).save(out)
    hot_files = [
        f for f in os.listdir(os.path.join(out, "k=hot")) if f.endswith(".olive")
    ]
    assert len(hot_files) >= 9, "hot key must flush incrementally at chunk_rows"
    assert spark.read.format("olive").load(out).count() == 1000


# ------------------------------------------------------------ compact swap


def _make_table(spark, path: str, rows: int = 500) -> None:
    spark.range(0, rows).repartition(5).write.format("olive").mode(
        "append"
    ).save(path)


def test_compact_failure_before_activation_keeps_old_files(
    spark, tmp_path, monkeypatch
):
    """Crash during staging/activation (phase 1-2): originals untouched."""
    from olive_spark.ops import maintenance

    path = str(tmp_path / "c1")
    _make_table(spark, path)

    def boom(*a, **k):
        raise OSError("simulated crash during activation")

    monkeypatch.setattr(maintenance.os, "replace", boom)
    with pytest.raises(OSError):
        maintenance.compact(spark, path, target_rows=1000)
    got = spark.read.format("olive").load(path)
    assert got.count() == 500, "old files must be intact after early crash"


def test_compact_failure_during_delete_leaves_readable_superset(
    spark, tmp_path, monkeypatch
):
    """Crash in phase 3 (deleting originals): table stays readable —
    worst case a transient superset, never an empty directory."""
    from olive_spark.ops import maintenance

    path = str(tmp_path / "c2")
    _make_table(spark, path)

    real_remove = os.remove
    calls = {"n": 0}

    def flaky_remove(p):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash mid-delete")
        real_remove(p)

    monkeypatch.setattr(maintenance.os, "remove", flaky_remove)
    with pytest.raises(OSError):
        maintenance.compact(spark, path, target_rows=1000)
    got = spark.read.format("olive").load(path)
    n = got.count()
    assert n >= 500, f"table must stay readable (got {n} rows)"
    assert got.select("id").distinct().count() == 500


def test_compact_crash_after_activation_recovery_no_duplicates(
    spark, tmp_path, monkeypatch
):
    """Crash after activation but before originals-delete: the table is
    a readable old+new superset AND the intent manifest survives, so
    vacuum() converges to exactly the compacted rows — and a re-run of
    compact() recovers first instead of rewriting the duplicates in."""
    from olive_spark.ops import maintenance

    path = str(tmp_path / "c4")
    _make_table(spark, path)

    real_remove = os.remove
    calls = {"n": 0}

    def crash_on_first_delete(p):
        # crash on the first CHUNK-FILE delete specifically: since r10
        # the commit micro-lock's release also calls os.remove (on its
        # own lock file, OSError-tolerant), so a blanket first-call
        # crash would be absorbed before the originals-delete
        if str(p).endswith(".olive"):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError(
                    "simulated crash at start of originals-delete"
                )
        real_remove(p)

    monkeypatch.setattr(maintenance.os, "remove", crash_on_first_delete)
    with pytest.raises(OSError):
        maintenance.compact(spark, path, target_rows=1000)
    # superset state: new files active, all originals still present
    assert spark.read.format("olive").load(path).count() == 1000
    manifests = [f for f in os.listdir(path) if f.endswith(".manifest.json")]
    assert manifests, "intent manifest must survive the crash"

    stats = maintenance.vacuum(path)
    assert stats["manifests_completed"] == 1
    assert stats["originals_deleted"] >= 1
    got = spark.read.format("olive").load(path)
    assert got.count() == 500, "recovery must remove duplicated originals"
    assert got.select("id").distinct().count() == 500


def test_compact_rerun_after_crash_recovers_first(spark, tmp_path, monkeypatch):
    """Re-running compact() on a post-crash old+new superset must not
    bake the duplicates into the rewritten table."""
    from olive_spark.ops import maintenance

    path = str(tmp_path / "c5")
    _make_table(spark, path)

    real_remove = os.remove
    calls = {"n": 0}

    def crash_on_first_delete(p):
        # crash on the first CHUNK-FILE delete specifically: since r10
        # the commit micro-lock's release also calls os.remove (on its
        # own lock file, OSError-tolerant), so a blanket first-call
        # crash would be absorbed before the originals-delete
        if str(p).endswith(".olive"):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError(
                    "simulated crash at start of originals-delete"
                )
        real_remove(p)

    monkeypatch.setattr(maintenance.os, "remove", crash_on_first_delete)
    with pytest.raises(OSError):
        maintenance.compact(spark, path, target_rows=1000)
    monkeypatch.undo()

    stats = maintenance.compact(spark, path, target_rows=1000)
    assert stats["rows"] == 500, "recovery-first compact must see 500 rows"
    got = spark.read.format("olive").load(path)
    assert got.count() == 500
    assert got.select("id").distinct().count() == 500


def test_vacuum_skips_manifest_with_empty_finals(spark, tmp_path):
    """A manifest listing originals but NO replacements (hand-edited,
    truncated, or from a divergent writer) must be left in place — not
    'completed' by deleting every original with nothing activated."""
    import json

    from olive_spark.ops import maintenance

    path = str(tmp_path / "c6")
    _make_table(spark, path)
    originals = sorted(
        os.path.relpath(os.path.join(path, f), path) for f in os.listdir(path)
    )
    with open(os.path.join(path, "compact-deadbeef.manifest.json"), "w") as f:
        json.dump({"run": "deadbeef", "originals": originals, "finals": []}, f)

    stats = maintenance.vacuum(path)
    assert stats["manifests_completed"] == 0
    assert stats["manifests_skipped"] == 1
    assert stats["originals_deleted"] == 0
    assert spark.read.format("olive").load(path).count() == 500


def test_compact_success_roundtrip(spark, tmp_path):
    from olive_spark.ops import maintenance

    path = str(tmp_path / "c3")
    _make_table(spark, path)
    stats = maintenance.compact(spark, path, target_rows=1000)
    assert stats["rows"] == 500
    assert stats["files_after"] <= stats["files_before"]
    got = spark.read.format("olive").load(path)
    assert got.count() == 500
    assert got.select("id").distinct().count() == 500


# -------------------------------------------------------- listing/slicing


def test_list_chunk_files_sorted(tmp_path):
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    t = pa.table({"x": [1]})
    payload = write_chunk({"data": t})
    for d in ("zz", "aa", "mm"):
        os.makedirs(tmp_path / d)
        (tmp_path / d / "part-0.olive").write_bytes(payload)
    files = _list_chunk_files(str(tmp_path))
    rel = [os.path.relpath(f, tmp_path) for f in files]
    assert rel == sorted(rel), "file order must be deterministic and sorted"


def test_sliced_list_offsets_values():
    """A sliced ListArray's offsets are absolute into the full child
    array; the rebased view must expose exactly the slice's elements."""
    from olive_spark.ops.dedup import _list_offsets_values

    la = pa.array([[1, 2], [3, 4, 5], [6], [7, 8]], pa.list_(pa.int64()))
    s = la.slice(1, 2)  # [[3,4,5],[6]]
    off, vals = _list_offsets_values(s)
    assert off.tolist() == [0, 3, 4]
    assert vals.tolist() == [3, 4, 5, 6]
    # reduceat over the rebased pair reproduces per-list minima exactly
    mins = np.minimum.reduceat(vals, off[:-1])
    assert mins.tolist() == [3, 6]


def test_simhash_signature_batch_invariance(spark):
    """The vectorized bit vote must give one stable signature per text
    regardless of batching/partitioning (catches offset-rebasing bugs)."""
    from olive_spark.ops.dedup import simhash_signatures

    rows = [(i, f"the quick brown fox {i % 5} jumps over dog {i % 3}") for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    df8 = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    s1 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df1).collect()}
    s8 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df8).collect()}
    assert s1 == s8
    # identical texts → identical signatures
    assert s1[0] == s1[15]  # both i%5==0, i%3==0


# ----------------------------------------------------- streaming dedup


def test_stream_dedup_with_watermark_is_key_level(spark, tmp_path):
    """With a watermark, duplicates of the same KEY at different event
    times must still collapse to one row (dropDuplicatesWithinWatermark,
    not dropDuplicates on (key, ts))."""
    import pyarrow.parquet  # noqa: F401  (ensure arrow loaded)

    from olive_spark import streaming

    src = str(tmp_path / "sdsrc")
    os.makedirs(src)
    t = pa.table(
        {
            "k": ["a", "a", "b", "a", "b"],
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 60_000_000 for i in range(5)],
                pa.timestamp("us"),
            ),
        }
    )
    with open(os.path.join(src, "part-0.olive"), "wb") as f:
        f.write(write_chunk({"data": t}))
    sdf = streaming.read_stream(spark, src)
    deduped = streaming.stream_dedup(sdf, ["k"], watermark_col="ts")
    out = streaming.run_available_now(
        deduped, output_mode="append", state_partitions=2
    )
    rows = out.collect()
    assert sorted(r["k"] for r in rows) == ["a", "b"], (
        "same key at different event times must dedup to one row"
    )


# ------------------------------------------- decimal256 / interval types


def test_decimal256_pyarrow_roundtrip():
    t = pa.table(
        {
            "d": pa.array(
                [Decimal("12345678901234567890123456789012345678901234567890.123"), None],
                pa.decimal256(60, 3),
            )
        }
    )
    got = read_chunk(write_chunk({"data": t}))
    assert got.schema.field("d").type == pa.decimal256(60, 3)
    assert got.column("d").to_pylist() == t.column("d").to_pylist()


def test_decimal256_small_precision_reads_in_spark(spark, tmp_path):
    """decimal256 with p≤38 re-types to Spark decimal(p,s) on scan."""
    t = pa.table({"d": pa.array([Decimal("1.25"), Decimal("3.50"), None], pa.decimal256(10, 2))})
    out = tmp_path / "d256"
    os.makedirs(out)
    (out / "part-0.olive").write_bytes(write_chunk({"data": t}))
    got = spark.read.format("olive").load(str(out))
    assert got.schema["d"].dataType.simpleString() == "decimal(10,2)"
    vals = sorted(
        (str(r["d"]) for r in got.collect() if r["d"] is not None)
    )
    assert vals == ["1.25", "3.50"]


def test_decimal256_high_precision_rejected_in_spark(spark, tmp_path):
    """p>38 exceeds Spark's DecimalType → reject with a clear error
    (SURVEY.md §1.2 policy)."""
    t = pa.table({"d": pa.array([Decimal("1.5")], pa.decimal256(60, 3))})
    out = tmp_path / "d256big"
    os.makedirs(out)
    (out / "part-0.olive").write_bytes(write_chunk({"data": t}))
    with pytest.raises(Exception, match="decimal256"):
        spark.read.format("olive").load(str(out)).collect()


def test_decimal256_binary_fallback_option(spark, tmp_path):
    """.option("decimal256", "binary"): p>38 columns surface as the
    32-byte big-endian two's-complement unscaled integer instead of
    being rejected (the reference writes decimal256 natively,
    src/write.zig:151-157; this is the opt-in read mapping for values
    Spark's DecimalType cannot hold)."""
    big = Decimal("12345678901234567890123456789012345678901234567890.123")
    t = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "d": pa.array([big, Decimal("-1.500"), None], pa.decimal256(60, 3)),
    })
    out = tmp_path / "d256bin"
    os.makedirs(out)
    (out / "part-0.olive").write_bytes(write_chunk({"data": t}))
    got = spark.read.format("olive").option("decimal256", "binary").load(str(out))
    assert got.schema["d"].dataType.simpleString() == "binary"
    rows = {r["k"]: r["d"] for r in got.collect()}
    assert rows[3] is None
    # expected unscaled int written digit-exact: Decimal.scaleb would
    # round through the 28-digit default context and hide corruption
    big_unscaled = int(
        "12345678901234567890123456789012345678901234567890123"
    )
    assert bytes(rows[1]) == big_unscaled.to_bytes(32, "big", signed=True)
    assert bytes(rows[2]) == (-1500).to_bytes(32, "big", signed=True)
    # default policy still rejects
    with pytest.raises(Exception, match="decimal256"):
        spark.read.format("olive").load(str(out)).collect()


def test_decimal256_binary_fallback_rejects_nested(spark, tmp_path):
    """list<decimal256(p>38)> under the binary option must fail at PLAN
    time with a clear error — _cast_to only converts top-level columns,
    so letting the schema through would crash executors mid-job on an
    unimplemented Arrow cast."""
    t = pa.table({
        "xs": pa.array([[Decimal("1.500")]], pa.list_(pa.decimal256(60, 3))),
    })
    out = tmp_path / "d256nested"
    os.makedirs(out)
    (out / "part-0.olive").write_bytes(write_chunk({"data": t}))
    with pytest.raises(Exception, match="nested"):
        spark.read.format("olive").option("decimal256", "binary").load(
            str(out)
        ).collect()


def test_interval_mdn_pyarrow_roundtrip():
    mdn = pa.MonthDayNano([1, 15, 3_600_000_000_000])
    t = pa.table({"iv": pa.array([mdn, None], pa.month_day_nano_interval())})
    got = read_chunk(write_chunk({"data": t}))
    assert got.schema.field("iv").type == pa.month_day_nano_interval()
    assert got.column("iv").to_pylist() == t.column("iv").to_pylist()


def test_interval_mdn_lowers_to_struct_in_spark(spark, tmp_path):
    """interval_month_day_nano → {months,days,nanos} struct on scan
    (SURVEY.md §1.2; no storable Spark interval equivalent)."""
    mdn = pa.MonthDayNano([2, 10, 5_000])
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "iv": pa.array([mdn, None], pa.month_day_nano_interval()),
        }
    )
    out = tmp_path / "mdn"
    os.makedirs(out)
    (out / "part-0.olive").write_bytes(write_chunk({"data": t}))
    got = spark.read.format("olive").load(str(out)).orderBy("id").collect()
    assert got[0]["iv"].asDict() == {"months": 2, "days": 10, "nanos": 5000}
    assert got[1]["iv"] is None


# ------------------------------------------------- registry window guard


def test_driver_window_rotation_leaves_no_query_unchecked():
    """The driver's correctness gate checks only the FIRST 50 registry
    entries, so the window ROTATES across rounds.  Invariant: every
    registered query is either already value-checked in a recorded
    CORRECTNESS_r*.json or sits in the current window — the only
    allowed exceptions are rows-only queries (no SQL oracle), which
    must occupy the positions right after the window so they are next
    in the rotation line."""
    import glob
    import json

    from olive_spark.queries import ALL_QUERIES

    names = list(ALL_QUERIES)
    window = set(names[:50])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            checked.update(json.load(fh).keys())
    uncovered = [n for n in names if n not in window and n not in checked]
    # Unchecked queries may exist in exactly two states, and BOTH must
    # sit immediately after the window so they are first in line for
    # the next rotation: (a) rows-only queries (no SQL oracle), and
    # (b) queries added since the last driver run (hash-checkable, but
    # no CORRECTNESS record can exist yet — they are value-verified via
    # tests/driver_check.py when added).  What this forbids is a
    # checkable query parked deep in the tail where the rotation would
    # never reach it.
    tail = names[50 : 50 + len(uncovered)]
    assert set(uncovered) <= set(tail), (
        f"unchecked queries must sit right after the window, next in "
        f"rotation line: {sorted(set(uncovered) - set(tail))}"
    )


def test_vacuum_cleans_crash_debris_only(spark, tmp_path):
    """vacuum removes orphaned .staging files and compact temp dirs but
    never live chunk files."""
    from olive_spark.ops import maintenance

    path = str(tmp_path / "vac")
    _make_table(spark, path)

    def boom(*a, **k):
        raise OSError("simulated crash during activation")

    import pytest as _pytest
    from unittest import mock

    with mock.patch.object(maintenance.os, "replace", side_effect=boom):
        with _pytest.raises(OSError):
            maintenance.compact(spark, path, target_rows=1000)
    assert any(f.endswith(".staging") for f in os.listdir(path))
    stats = maintenance.vacuum(path)
    assert stats["staging_files"] >= 1
    assert not any(f.endswith(".staging") for f in os.listdir(path))
    got = spark.read.format("olive").load(path)
    assert got.count() == 500, "live files untouched by vacuum"


def test_describe_answers_from_manifest_and_header_fallback(spark, tmp_path):
    from olive_spark.format.manifest import manifest_path
    from olive_spark.ops.maintenance import describe

    out = str(tmp_path / "desc")
    spark.range(0, 2000).selectExpr("id", "id * 2 AS v").coalesce(
        1
    ).write.format("olive").mode("append").option("chunkRows", 500).save(out)

    d = describe(out)
    assert d["files"] == 4 and d["rows"] == 2000 and d["bytes"] > 0
    assert d["columns"]["id"]["min"] == 0 and d["columns"]["id"]["max"] == 1999
    assert d["columns"]["v"]["max"] == 3998

    os.remove(manifest_path(out))  # header fallback must agree
    d2 = describe(out)
    assert (d2["rows"], d2["columns"]["id"]["max"]) == (2000, 1999)
