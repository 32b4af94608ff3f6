"""Structured Streaming over olive: source offsets, sink appends,
checkpointed incremental reads (engine extension — the reference format
is batch-only, SURVEY.md §2.6)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from olive_spark.format import write_chunk


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


def _write_part(path: str, idx: int, lo: int, hi: int) -> None:
    os.makedirs(path, exist_ok=True)
    t = pa.table({
        "k": pa.array(list(range(lo, hi)), pa.int64()),
        "v": pa.array([float(x) * 1.5 for x in range(lo, hi)], pa.float64()),
    })
    with open(os.path.join(path, f"part-{idx:05d}.olive"), "wb") as f:
        f.write(write_chunk({"data": t}))


def test_stream_source_reads_all_files(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("src"))
    for i in range(3):
        _write_part(src, i, i * 100, (i + 1) * 100)
    from olive_spark import streaming

    sdf = streaming.read_stream(spark, src)
    out = streaming.run_available_now(
        sdf.groupBy().count(), output_mode="complete"
    )
    assert out.collect()[0]["count"] == 300


def test_stream_sink_and_incremental_checkpoint(spark, tmp_path_factory):
    """Second availableNow run with the same checkpoint must process ONLY
    files appended after the first run — rows appear exactly once."""
    src = str(tmp_path_factory.mktemp("src2"))
    sink = str(tmp_path_factory.mktemp("sink"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    from olive_spark import streaming

    _write_part(src, 0, 0, 50)
    sdf = streaming.read_stream(spark, src)
    streaming.write_stream_olive(sdf, sink, ckpt)

    _write_part(src, 1, 50, 80)
    sdf2 = streaming.read_stream(spark, src)
    streaming.write_stream_olive(sdf2, sink, ckpt)

    got = spark.read.format("olive").load(sink)
    rows = sorted(r["k"] for r in got.collect())
    assert rows == list(range(80)), "each source row exactly once"
