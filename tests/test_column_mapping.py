"""Column-mapping IDs (format/table_schema.py + header fids): stable
per-column integers that make rename/drop/re-add lifecycles exact —
the Delta ColumnMapping / Iceberg field-id move (r11 verdict task #1).

Invariants pinned here:
- rename keeps the id → pre-rename files resolve the column by id;
- drop retires the id WITH its data; re-adding the same name is a
  FRESH id → old values never resurface (read as NULL);
- appends/merges/rewrites stamp ids into chunk headers; rewrite
  staging dirs get them via the writer's fieldIds option;
- plan-time pruning never uses a re-added name's stale per-file stats
  (the IS NULL hazard);
- unmapped tables keep the pre-r11 tombstone refusals.

Reference n/a: the format is file-scoped with no schema-evolution
layer (/root/reference/src/root.zig:9-16)."""

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


def _scan(spark, path, **opts):
    r = spark.read.format("olive")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load(str(path))


def _mk(spark, path, n=10, files=2):
    from pyspark.sql import functions as F

    (
        spark.range(n).withColumn("v", F.col("id") * 2)
        .coalesce(files).write.format("olive")
        .option("table", "data").mode("append").save(str(path))
    )


def test_sidecar_mapping_assignment_rules(tmp_path):
    """Pure-sidecar mechanics: activation, reservation convergence,
    name-carryover, rename-keeps-id, re-add-gets-fresh-id with the
    legacy binding frozen on the FIRST holder."""
    from olive_spark.format.table_schema import (
        activate_column_mapping,
        read_column_mapping,
        reserve_field_ids,
        write_table_schema,
    )

    d = str(tmp_path)
    assert activate_column_mapping(d, "data", ["a", "b"], ["int64", "utf8"]) \
        == {"a": 1, "b": 2}
    # idempotent — a second activation does not reassign
    assert activate_column_mapping(d, "data", ["x"], ["int64"]) \
        == {"a": 1, "b": 2}
    # reservations converge: two writers adding the same column agree
    assert reserve_field_ids(d, "data", ["b", "c"]) == {"b": 2, "c": 3}
    assert reserve_field_ids(d, "data", ["c", "d"]) == {"c": 3, "d": 4}
    # commit-time promotion by name (no explicit fids)
    write_table_schema(d, "data", ["a", "b", "c"], ["int64", "utf8", "f64"])
    assert read_column_mapping(d, "data")["fids"] == [1, 2, 3]
    # rename keeps the id (explicit fids)
    write_table_schema(d, "data", ["a", "bb", "c"], ["int64", "utf8", "f64"],
                       fids=[1, 2, 3])
    cm = read_column_mapping(d, "data")
    assert cm["legacy"]["b"] == 2 and cm["legacy"]["bb"] == 2
    # drop c, re-add c: fresh id; legacy keeps the retired binding
    write_table_schema(d, "data", ["a", "bb"], ["int64", "utf8"], fids=[1, 2])
    write_table_schema(d, "data", ["a", "bb", "c"], ["int64", "utf8", "i32"])
    cm = read_column_mapping(d, "data")
    assert cm["fids"][2] == 5  # 4 went to d's (aborted) reservation
    assert cm["legacy"]["c"] == 3


def test_header_fid_stamp_and_validation(tmp_path):
    import pyarrow as pa

    from olive_spark.format.errors import ValidationError
    from olive_spark.format.header import read_frame
    from olive_spark.format.writer import write_chunk

    t = pa.table({"a": [1], "b": ["x"]})
    blob = write_chunk({"data": t}, field_ids={"a": 3, "b": 9})
    hdr, _ = read_frame(blob)
    assert hdr.tables[0].field_ids == [3, 9]
    # unstamped stays unstamped
    hdr2, _ = read_frame(write_chunk({"data": t}))
    assert hdr2.tables[0].field_ids is None
    # partial coverage refused (all-or-nothing per table)
    with pytest.raises(ValidationError, match="all-or-nothing"):
        write_chunk({"data": t}, field_ids={"a": 3})
    # malformed header fids refused at parse
    import json as _json

    doc = _json.loads(hdr.to_json_bytes())
    doc["tables"][0]["fids"] = [3, 3]
    from olive_spark.format.header import ChunkHeader

    with pytest.raises(ValidationError, match="field-id"):
        ChunkHeader.from_json_bytes(_json.dumps(doc).encode())


def test_full_lifecycle_rename_drop_readd(spark, tmp_path):
    """The verdict's done-criteria lifecycle: two renames + a re-add,
    old files correct through the ids, time travel across the remap."""
    from olive_spark.ops.maintenance import (
        add_column,
        compact,
        count_rows,
        drop_column,
        rename_column,
    )

    d = str(tmp_path / "t")
    _mk(spark, d, n=10, files=2)
    rename_column(d, "v", "w")
    drop_column(d, "w")
    add_column(d, "w", "bigint")  # re-add the SAME name
    got = _scan(spark, d).collect()
    assert all(r["w"] is None for r in got), "dropped values resurfaced"
    spark.createDataFrame([(100, 7)], "id long, w long") \
        .write.format("olive").mode("append").save(d)
    rename_column(d, "w", "w2")  # second rename
    add_column(d, "v", "string")  # re-add the ORIGINAL name
    df = _scan(spark, d)
    vals = {r["id"]: (r["w2"], r["v"]) for r in df.collect()}
    assert vals[100] == (7, None)
    assert vals[0] == (None, None)
    # time travel reads the pre-DDL snapshot through the CURRENT schema
    tt = _scan(spark, d, snapshot=1)
    assert sorted(tt.columns) == ["id", "v", "w2"]
    assert all(r["v"] is None and r["w2"] is None for r in tt.collect())
    # a rewrite (compact) preserves everything; staging stamps ids via
    # the fieldIds option since the tmp dir has no sidecar
    compact(spark, d, target_rows=1000)
    vals = {r["id"]: (r["w2"], r["v"]) for r in _scan(spark, d).collect()}
    assert vals[100] == (7, None) and vals[0] == (None, None)
    assert count_rows(d) == 11
    # the compacted file is stamped
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _read_header_bytes,
    )

    for f in _list_chunk_files(d):
        hdr, _ = _read_header_bytes(f)
        assert hdr.tables[0].field_ids is not None, f


def test_pruning_safe_on_readded_column(spark, tmp_path):
    """IS NULL pushdown on a re-added column: the old files' per-file
    stats describe the RETIRED column (zero nulls there), so using them
    would prune files whose re-added column is all-NULL.  The stable-
    column guard must keep those files in the scan."""
    from olive_spark.ops.maintenance import add_column, drop_column

    d = str(tmp_path / "t")
    _mk(spark, d, n=100, files=2)  # v = id*2, no nulls anywhere
    drop_column(d, "v")
    add_column(d, "v", "bigint")
    n = (
        _scan(spark, d, pushdown="true")
        .filter("v is null").count()
    )
    assert n == 100
    # equality predicate on the re-added column: old stats say v=2
    # exists, but the CURRENT v is null there — zero rows, not a wrong
    # row, and no file-level misprune either way
    assert _scan(spark, d, pushdown="true").filter("v = 2").count() == 0
    # appends under the re-added name are found by pushdown scans
    spark.createDataFrame([(500, 2)], "id long, v long") \
        .write.format("olive").mode("append").save(d)
    assert _scan(spark, d, pushdown="true").filter("v = 2").count() == 1


def test_mergeschema_does_not_resurrect(spark, tmp_path):
    from olive_spark.ops.maintenance import add_column, drop_column

    d = str(tmp_path / "t")
    _mk(spark, d, n=10, files=1)
    drop_column(d, "v")
    add_column(d, "v", "string")
    ms = _scan(spark, d, mergeSchema="true")
    assert sorted(ms.columns) == ["id", "v"]
    assert ms.filter("v IS NOT NULL").count() == 0


def test_unmapped_tables_keep_tombstone_refusals(spark, tmp_path):
    """No DDL ever ran → no mapping → the pre-r11 per-name guards must
    still hold (a hand-edited sidecar could carry dropped names)."""
    from olive_spark.format.table_schema import (
        read_column_mapping,
        read_table_schema,
        write_table_schema,
    )

    d = str(tmp_path / "t")
    _mk(spark, d, n=10, files=1)
    # simulate a pre-r11 sidecar: dropped tombstone, no fids
    write_table_schema(d, "data", ["id"], ["int64"], dropped=["v"])
    assert read_column_mapping(d, "data") is None
    assert read_table_schema(d, "data") == (["id"], ["int64"])
    with pytest.raises(Exception, match="DROPped"):
        spark.createDataFrame([(1, 2)], "id long, v long") \
            .write.format("olive").mode("append").save(d)


def test_merge_after_remap_preserves_ids(spark, tmp_path):
    """merge_upsert on a remapped table: rewritten files stamp ids, and
    survivors of untouched old files still resolve renamed data."""
    from olive_spark.ops.maintenance import merge_upsert, rename_column

    d = str(tmp_path / "t")
    _mk(spark, d, n=100, files=4)
    rename_column(d, "v", "val")
    src = spark.createDataFrame([(1, 999), (200, 5)], "id long, val long")
    merge_upsert(spark, d, src, ["id"])
    got = {r["id"]: r["val"] for r in _scan(spark, d).collect()}
    assert got[1] == 999 and got[200] == 5 and got[2] == 4
    assert len(got) == 101
