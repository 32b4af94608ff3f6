"""GiB-scale stress tests for the invariants 100 TB depends on:

- a near-cap (~1 GiB incompressible) data section round-trips through
  one chunk (the reference's u32-offset format cap is 4 GiB,
  src/header.zig:35-39; our guard writer.py _DataSection);
- data past the cap raises the typed DataSectionOverflow instead of
  writing a corrupt chunk (reference src/write.zig:982-993);
- the Spark writer splits oversized partitions into multiple chunk
  files at chunkRows, and a partitioned write flushes per key, so no
  single file ever needs to hold an unsplittable >4 GiB section.

All marked ``slow`` (see conftest.py); run with ``pytest --runslow``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from olive_spark.format import write_chunk
from olive_spark.format.errors import DataSectionOverflow
from olive_spark.format.reader import ChunkReader

VAL = 1 << 16  # 64 KiB per value


def _incompressible_table(n_rows: int, seed: int = 7) -> pa.Table:
    """n_rows × 64 KiB of PRNG bytes — zstd/lz4 can't shrink these, so
    raw size ≈ data-section size and the cap math is exercised for real."""
    rng = np.random.default_rng(seed)
    blob = rng.integers(0, 256, size=n_rows * VAL, dtype=np.uint8).tobytes()
    offs = np.arange(0, (n_rows + 1) * VAL, VAL, dtype=np.int64)
    vals = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n_rows,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)],
    )
    return pa.table({"id": pa.array(range(n_rows), pa.int64()), "payload": vals})


@pytest.mark.slow
def test_near_cap_data_section_roundtrip(tmp_path):
    """~1 GiB incompressible section through write → mmap read."""
    n = 16 * 1024  # 16k rows × 64 KiB = 1 GiB
    t = _incompressible_table(n)
    blob = write_chunk({"data": t}, page_rows=2048)
    assert len(blob) > (1 << 30), "section must actually be GiB-scale"
    fp = tmp_path / "big.olive"
    fp.write_bytes(blob)
    r = ChunkReader.from_path(str(fp))
    got = r.read_table("data")
    assert got.num_rows == n
    # spot-check first/last/interior payloads against the source
    for i in (0, 1, n // 2, n - 1):
        assert got.column("payload")[i].as_py() == t.column("payload")[i].as_py()
    # narrow projection must not need the payload column's gigabyte
    ids = ChunkReader.from_path(str(fp)).read_table("data", columns=["id"])
    assert ids.num_rows == n


@pytest.mark.slow
def test_overflow_guard_trips_past_4gib():
    """>4 GiB of incompressible data in ONE chunk must raise the typed
    overflow error (never a silently corrupt u32 offset)."""
    n = 66 * 1024  # 66k rows × 64 KiB ≈ 4.125 GiB raw
    t = _incompressible_table(n, seed=11)
    with pytest.raises(DataSectionOverflow):
        write_chunk({"data": t}, page_rows=4096)


@pytest.mark.slow
def test_spark_writer_splits_oversized_partition(tmp_path):
    """A partition holding far more data than any one chunk should ever
    carry succeeds through the Spark writer because chunkRows splits one
    task's stream into multiple files — the 100 TB path: no file ever
    needs an unsplittable >4 GiB section.  Payload is generated JVM-side
    (sha2-derived, ~8 KiB/row, ~768 MiB in one task) with bounded Arrow
    batches so the default test JVM heap survives; the cap arithmetic on
    truly incompressible bytes is the format-level tests above."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from olive_spark import register_olive

    register_olive(spark)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    try:
        out = str(tmp_path / "split")
        n = 96 * 1024  # × 8 KiB ≈ 768 MiB through one writer task
        row_bytes = 64 * 128  # sha2-hex (64 chars) repeated 128×
        (
            spark.range(n)
            .selectExpr(
                "id",
                "cast(repeat(sha2(cast(id AS string), 256), 128) AS binary)"
                " AS payload",
            )
            .coalesce(1)
            .write.format("olive")
            .option("chunkRows", 8192)
            .mode("append")
            .save(out)
        )
        files = [f for f in os.listdir(out) if f.endswith(".olive")]
        assert len(files) == n // 8192, "one task must emit multiple files"
        assert all(
            os.path.getsize(os.path.join(out, f)) < (1 << 32) for f in files
        )
        got = spark.read.format("olive").load(out)
        assert got.count() == n
        total = got.selectExpr("sum(length(payload)) AS s").collect()[0]["s"]
        assert total == n * row_bytes
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


@pytest.mark.slow
def test_merge_at_gib_scale_rewrites_only_affected(tmp_path):
    """MERGE on a ~1 GiB multi-file table: copy-on-write must rewrite
    ONLY the files holding matched keys — wall-time and bytes written
    bound by touched data, not table size — and the snapshot-diff
    change feed over the merge must stay bounded by the same files."""
    import time

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from olive_spark import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files
    from olive_spark.ops.changes import read_changes
    from olive_spark.ops.maintenance import merge_upsert

    register_olive(spark)
    path = str(tmp_path / "big")
    # >1 GiB ON DISK: 3M rows x 384 B of INCOMPRESSIBLE binary (unhex'd
    # sha512 blocks — hex text compresses ~2x and undershoots), 16
    # files; keys range-sorted per file so the merge's affected set is
    # genuinely narrow
    n = 3_000_000
    payload = F.concat(*[
        F.unhex(F.sha2((F.col("id") * m).cast("string"), 512))
        for m in (1, 31, 131, 1009, 7919, 104729)
    ])
    df = spark.range(n).select(
        F.col("id").alias("k"),
        payload.alias("payload"),
        (F.col("id") % 1000).alias("grp"),
    )
    t0 = time.monotonic()
    (
        df.repartitionByRange(16, "k").write.format("olive")
        .option("chunkRows", n // 16).mode("append").save(path)
    )
    t_write = time.monotonic() - t0
    files0 = _list_chunk_files(path)
    total_bytes = sum(os.path.getsize(f) for f in files0)
    assert total_bytes > (1 << 30), f"table must be GiB-scale: {total_bytes}"

    # touch a 2k-key contiguous slice: lands in 1-2 of the 16 files
    src = spark.range(1_000_000, 1_002_000).select(
        F.col("id").alias("k"),
        F.unhex(F.sha2(F.lit("upd"), 512)).alias("payload"),
        F.lit(-1).cast("long").alias("grp"),
    )
    t0 = time.monotonic()
    out = merge_upsert(spark, path, src, ["k"])
    t_merge = time.monotonic() - t0
    # r10: the 2k-key slice is ~1% of its file, so auto strategy takes
    # MERGE-ON-READ — a tiny deletion vector + the updates appended as
    # one new file; ZERO of the 16 GiB-scale files move (strictly less
    # write than the pre-r10 1-2 file rewrite this test used to pin)
    assert out["files_dv"] >= 1 and out["files_rewritten"] == 0, out
    import glob as _g

    dv_bytes = sum(
        os.path.getsize(f) for f in _g.glob(
            os.path.join(path, "_olive_dv", "**", "*.dv"), recursive=True
        )
    )
    per_file = total_bytes // 16
    assert 0 < dv_bytes < per_file // 100, (dv_bytes, per_file)
    print(f"\n  gib-merge: base write {t_write:.1f}s, "
          f"merge {t_merge:.1f}s, DV {dv_bytes}B vs "
          f"{per_file/1e6:.0f}MB/file (0/16 rewritten)")
    # bounded work: DV + insert must beat a full-table rewrite by a
    # wide margin
    assert t_merge < t_write, (t_merge, t_write)
    got = spark.read.format("olive").load(path)
    assert got.count() == n
    assert got.filter("grp = -1").count() == 2000
    feed = read_changes(spark, path, since=out["pre_version"],
                        key_cols=["k"])
    from collections import Counter

    by = Counter(r["_change_type"] for r in feed.select("_change_type").collect())
    assert by == {"update_preimage": 2000, "update_postimage": 2000}
