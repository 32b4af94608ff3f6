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


def compact(
    spark,
    path: str,
    target_rows: int = 1 << 20,
    sort_by: str | None = None,
    table: str = "data",
) -> dict:
    """Rewrite the olive directory at ``path`` into files of
    ``target_rows``; with ``sort_by``, range-partition + sort so page
    min/max stats are disjoint across files.  Returns {files_before,
    files_after, rows}."""
    from olive_spark.datasource import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    register_olive(spark)
    before = _list_chunk_files(path)
    df = spark.read.format("olive").load(path)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows))
    if sort_by:
        # repartitionByRange + sortWithinPartitions = globally range-
        # sorted layout: each file owns a disjoint value interval
        df = df.repartitionByRange(n_files, sort_by).sortWithinPartitions(sort_by)
    else:
        df = df.repartition(n_files)

    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    (
        df.write.format("olive")
        .option("table", table)
        .option("chunkRows", target_rows)
        .mode("append")
        .save(tmp)
    )
    for f in before:
        os.remove(f)
    for f in _list_chunk_files(tmp):
        shutil.move(f, os.path.join(path, os.path.basename(f)))
    shutil.rmtree(tmp, ignore_errors=True)
    after = _list_chunk_files(path)
    return {"files_before": len(before), "files_after": len(after), "rows": rows}
