"""Table-maintenance operators: compaction and sort-for-skipping.

At 100 TB the two dominant chunk-layout pathologies are (a) many small
files — each microbatch/task emits one, scan parallelism collapses into
per-file overhead — and (b) rows unordered on the filter column, so
per-page min/max stats (reference keeps none; ours from
olive_spark/format/writer.py) cover the full value range and nothing
skips.  ``compact`` fixes both: it rewrites a chunk directory into
ceil(rows/target) files, optionally range-sorted so page stats become
disjoint and range predicates prune.

The rewrite is a plain Spark job (scan → repartition/sort → write), so
it distributes like any other query; the swap is directory-atomic per
file (write to a sibling temp dir, then rename into place).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid


def _morton_expr(a, b, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative int columns into a
    Morton (Z-order) key — pure JVM shift/and/or expression tree, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def compact(
    spark,
    path: str,
    target_rows: int = 1 << 20,
    sort_by: str | None = None,
    zorder_by: "list[str] | None" = None,
    table: str = "data",
) -> dict:
    """Rewrite the olive directory at ``path`` into files of
    ``target_rows``; with ``sort_by``, range-partition + sort so page
    min/max stats are disjoint across files; with ``zorder_by`` (two
    columns), cluster on a Morton-interleaved key so range predicates on
    EITHER column prune files (the multi-dimensional skipping a single
    sort can't give).  Returns {files_before, files_after, rows}."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    register_olive(spark)
    before = _list_chunk_files(path)
    df = spark.read.format("olive").load(path)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows))
    if zorder_by:
        if len(zorder_by) != 2:
            raise ValueError("zorder_by takes exactly two columns")
        ca, cb = zorder_by
        # min-max normalize each column to 16-bit rank space (exact
        # integer arithmetic; one tiny agg broadcast back)
        bounds = df.agg(
            F.min(ca).alias("_a_lo"), F.max(ca).alias("_a_hi"),
            F.min(cb).alias("_b_lo"), F.max(cb).alias("_b_hi"),
        )
        df = df.crossJoin(F.broadcast(bounds))
        span = lambda lo, hi: F.greatest(F.col(hi) - F.col(lo), F.lit(1))  # noqa: E731
        na = ((F.col(ca) - F.col("_a_lo")) * 65535 / span("_a_lo", "_a_hi")).cast("long")
        nb = ((F.col(cb) - F.col("_b_lo")) * 65535 / span("_b_lo", "_b_hi")).cast("long")
        df = (
            df.withColumn("_z", _morton_expr(na, nb))
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z", "_a_lo", "_a_hi", "_b_lo", "_b_hi")
        )
    elif sort_by:
        # repartitionByRange + sortWithinPartitions = globally range-
        # sorted layout: each file owns a disjoint value interval
        df = df.repartitionByRange(n_files, sort_by).sortWithinPartitions(sort_by)
    else:
        df = df.repartition(n_files)

    run = uuid.uuid4().hex[:8]
    tmp = f"{path}.compact-{run}"
    (
        df.write.format("olive")
        .option("table", table)
        .option("chunkRows", target_rows)
        .mode("append")
        .save(tmp)
    )
    # Crash-safe swap, three phases — at no point is the directory empty:
    # 1. stage replacements into the live dir under non-.olive names
    #    (invisible to _list_chunk_files);
    # 2. activate them with atomic renames (readers may briefly see old
    #    AND new — a transient duplicate beats a lost table);
    # 3. only then delete the originals.  A crash in 1-2 leaves the old
    #    files untouched; a crash in 3 leaves a readable superset.
    staged = []
    for i, f in enumerate(_list_chunk_files(tmp)):
        dest = os.path.join(path, f"compact-{run}-{i:05d}.olive.staging")
        shutil.move(f, dest)
        staged.append(dest)
    for dest in staged:
        os.replace(dest, dest[: -len(".staging")])
    for f in before:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass
    shutil.rmtree(tmp, ignore_errors=True)
    after = _list_chunk_files(path)
    return {"files_before": len(before), "files_after": len(after), "rows": rows}

def vacuum(path: str) -> dict:
    """Remove debris a crashed ``compact`` can leave behind: orphaned
    ``*.olive.staging`` files inside the table directory (never visible
    to readers) and sibling ``<path>.compact-*`` temp write directories.
    Live ``*.olive`` files are never touched — vacuum after a crash is
    always safe, whichever phase the compaction died in (if it died
    mid-delete the table is a readable superset; re-run compact to
    converge, then vacuum)."""
    import glob

    removed_staging = 0
    for f in glob.glob(os.path.join(path, "**", "*.olive.staging"), recursive=True):
        try:
            os.remove(f)
            removed_staging += 1
        except OSError:
            pass
    removed_tmpdirs = 0
    for d in glob.glob(f"{path}.compact-*"):
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
            removed_tmpdirs += 1
    return {"staging_files": removed_staging, "tmp_dirs": removed_tmpdirs}
