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

import functools
import glob
import json
import math
import operator
import os
import shutil
import time
import uuid

from olive_spark.format.errors import ValidationError


def _locked(path_arg: int, heal_txns: bool = False):
    """Wrap a mutation op in the table's advisory write lock
    (format/lock.py): two concurrent mutators fail loud naming the
    holder instead of interleaving snapshot-log rewrites.  Reentrant,
    so composed ops (restore → recovery, compact_if_needed → compact,
    facade → op) acquire once.

    ``heal_txns`` (ADVICE r13): file-REWRITING ops (compact /
    delete_where / merge_upsert) publish any committed-but-unpublished
    multi-table-txn slice before reading the table — a crashed
    coordinator's staged DVs reference the current files, and rewriting
    first would strand the committed delete leg.  Vacuum keeps its own
    interlock (it counts what IT publishes)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            path = kwargs.get("path")
            if path is None and len(args) > path_arg:
                path = args[path_arg]
            # every @_locked verb accepts lock_wait=seconds (r14): block
            # that long for a live holder instead of failing fast —
            # pipelines queue two maintenance jobs against one table
            lock_wait = float(kwargs.pop("lock_wait", 0.0) or 0.0)
            from olive_spark.format.lock import table_write_lock

            with table_write_lock(path, wait=lock_wait):
                if heal_txns:
                    try:
                        from olive_spark.ops.txn import heal_committed_slices

                        heal_committed_slices(path)
                    except OSError:
                        pass  # unreadable txn dir: the op's IO will say so
                return fn(*args, **kwargs)

        return wrapper

    return deco


def _partition_layout(
    path: str, rels: "list[str] | None" = None
) -> "dict | None":
    """The table's partition layout, for rewrite ops to PRESERVE:

    - hidden/transform layouts (``days(ts)``, ``bucket(N,col)``,
      ``truncate(W,col)``): the ``_olive_partition.json`` sidecar is
      authoritative — the rewrite hands its spec string back to the
      writer, which re-derives every rewritten/inserted row's dir value
      from the data (the dirs store DERIVED values the rows don't
      carry, so layout can never be reconstructed from ``col=value``
      chains alone);
    - classic hive identity layouts: detected from the ``col=value``
      directory chain as before.

    Returns ``{"spec", "dirs", "shape", "hidden"}`` — ``spec`` is the
    writer's ``partitionBy`` option, ``dirs`` the directory key names
    (zero-row sentinel placement), ``shape`` the repartition keys
    (Column expressions grouping by derived dir value) — or None for
    flat tables.  A hidden table whose sidecar was lost degrades to the
    detected chain, whose dir keys are not data columns; the writer
    then fails LOUD at plan time instead of silently flattening."""
    from olive_spark.format.partition import (
        has_transforms,
        read_sidecar,
        shaping_columns,
        spec_to_string,
    )

    side = read_sidecar(path) if os.path.isdir(path) else None
    if side and has_transforms(side):
        return {
            "spec": spec_to_string(side),
            "dirs": [t["dir"] for t in side],
            "shape": shaping_columns(side),
            "hidden": True,
        }
    cols = (
        _detect_partition_cols_from_rels(rels)
        if rels is not None
        else _detect_partition_cols(path)
    )
    if not cols:
        return None
    return {
        "spec": ",".join(cols),
        "dirs": list(cols),
        "shape": list(cols),
        "hidden": False,
    }


def _morton_expr(cols, bits: int | None = None):
    """Interleave the low bits of N non-negative int columns into a
    Morton (Z-order) key — pure JVM shift/and/or expression tree, no
    UDF.  Bit budget: 63 // N per column (16 at N=2,3; 15 at N=4), so
    the key always fits a signed long."""
    from pyspark.sql import functions as F

    n = len(cols)
    if bits is None:
        bits = min(16, 63 // n)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), n * i + j)
            )
    return z


def _hilbert_expr(cols, bits: int):
    """2-D Hilbert-curve distance of two non-negative int columns —
    the public xy2d algorithm (per-bit reflect+rotate walk from the
    top bit down) folded over bit levels as a pure JVM expression via
    ``aggregate``; no UDF.  Hilbert keeps axis-neighbors curve-adjacent
    strictly better than Morton (no Z-jumps across quadrant seams), so
    box queries open the same or fewer pages."""
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("hilbert clustering takes exactly 2 columns")
    x, y = cols
    acc0 = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    svals = F.expr(
        f"transform(sequence({int(bits) - 1}, 0, -1), i -> shiftleft(1L, i))"
    )

    def step(acc, s):
        one = F.lit(1).cast("long")
        zero = F.lit(0).cast("long")
        rx = F.when(acc["x"].bitwiseAND(s) > 0, one).otherwise(zero)
        ry = F.when(acc["y"].bitwiseAND(s) > 0, one).otherwise(zero)
        d2 = acc["d"] + s * s * ((F.lit(3).cast("long") * rx).bitwiseXOR(ry))
        # rotate the frame: if ry==0 { if rx==1 reflect; swap(x,y) }
        nx = F.when(
            ry == 0,
            F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"]),
        ).otherwise(acc["x"])
        ny = F.when(
            ry == 0,
            F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"]),
        ).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(svals, acc0, step)["d"]


def _retire_original(path: str, rel: str, history: bool) -> bool:
    """Remove a compaction-replaced file from the LIVE listing: deleted
    outright, or moved into _olive_history/ (invisible to directory
    scans, still resolvable by snapshot reads) when history retention
    is on.  The file's deletion vectors retire WITH it — AFTER the file
    itself: a crash between the two then leaves orphan DVs for a dead
    file (harmless — scans consult DVs only for live files; vacuum
    sweeps the orphans), whereas DV-first would leave a LIVE file whose
    mask vanished, silently resurrecting its deleted rows
    (format/deletion.py)."""
    src = os.path.join(path, rel)

    def _retire_dvs() -> None:
        try:
            from olive_spark.format.deletion import retire_target_dvs

            retire_target_dvs(path, rel, history)
        except OSError:
            pass  # advisory cleanup; the data-file retire is the op

    try:
        if history:
            from olive_spark.format.snapshots import HISTORY_DIR

            dest = os.path.join(path, HISTORY_DIR, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            # restore() re-activates history files by HARDLINK, so src
            # and dest may already be the same inode — POSIX rename()
            # over itself is a silent no-op that would leave the live
            # name in place; drop the live link instead
            if os.path.exists(dest) and os.path.samestat(
                os.stat(src), os.stat(dest)
            ):
                os.remove(src)
            else:
                os.replace(src, dest)
        else:
            os.remove(src)
        _retire_dvs()
        return True
    except FileNotFoundError:
        _retire_dvs()  # re-run after a crash: file gone, DVs may remain
        return False


@_locked(1, heal_txns=True)
def compact(
    spark,
    path: str,
    target_rows: int = 1 << 20,
    sort_by: str | None = None,
    zorder_by: "list[str] | None" = None,
    table: str = "data",
    retain_history: bool = False,
    where: "str | None" = None,
    files: "list[str] | None" = None,
    page_rows: "int | None" = None,
    curve: str = "morton",
) -> dict:
    """Rewrite the olive directory at ``path`` into files of
    ``target_rows``; with ``sort_by``, range-partition + sort so page
    min/max stats are disjoint across files; with ``zorder_by`` (2-4
    columns), cluster on a Morton-interleaved key so range predicates on
    EITHER column prune files (the multi-dimensional skipping a single
    sort can't give).  On a PARTITIONED table (hive or hidden
    transforms) both sort and z-order cluster WITHIN each partition dir
    — the layout and its directory pruning are preserved, and the
    clustered key tightens page stats inside every dir's files (the
    Delta OPTIMIZE ZORDER shape).

    ``where`` (r9) scopes the rewrite to the files containing a
    matching row — Delta's ``OPTIMIZE ... WHERE``: at 100 TB you
    compact yesterday's partition, never the table.  Discovery is one
    file-name aggregate; non-matching files keep their bytes, stats,
    and names, and the scoped rewrite still lands as ONE snapshot
    version.  Returns {files_before, files_after, rows} (plus
    ``files_matched: 0`` on a no-match no-op).

    ``files`` (r10) scopes the rewrite to an EXPLICIT live-file list
    instead — the deletion-vector GC verb: ``compact_if_needed``
    passes the DV-heavy files so their masked rows are materialized
    away without a predicate (or a whole-table pass).  Exclusive with
    ``where``; unknown names fail loud.  Like every compact, the
    folding scan means DVs are materialized and the originals' DVs
    retire with them.

    Isolation contract: ``compact`` assumes a SINGLE writer — no
    concurrent ``compact``/``vacuum``/write on the same directory.
    Concurrent *readers* are safe at every point (worst case they
    briefly see old AND new files during activation — a transient
    duplicate, never a lost table).  Mutation-vs-mutation is enforced
    by the table's advisory write lock (format/lock.py, held for the
    op's duration via @_locked); coordinating plain APPENDERS remains
    the caller's job, same as any directory-swap scheme.

    ``retain_history=True`` moves the replaced originals into
    ``_olive_history/`` instead of deleting them, so snapshot reads of
    pre-compaction versions (``.option("snapshot", N)``) stay
    reconstructable until ``vacuum(retain_snapshots=K)`` expires them.

    Crash safety: before activation an intent manifest
    (``compact-<run>.manifest.json``) is written inside the table
    directory recording originals and replacement names.  If compaction
    dies after activation but before the originals are deleted,
    ``vacuum`` (or the next ``compact``, which recovers first) uses the
    manifest to finish deleting the originals — never re-reading the
    old+new superset into a rewrite, which would bake the duplicates in
    permanently."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    register_olive(spark)
    # Finish any interrupted prior compaction FIRST: if a manifest is
    # pending, the directory may hold old+new duplicates which a naive
    # re-read would rewrite into the table for good.
    _recover_pending(path)
    _seed_snapshot_log(path)
    before = _list_chunk_files(path)
    n_before_total = len(before)  # whole-table count, even when scoped
    # argument validation BEFORE any scan: a bad zorder request on a
    # 100 TB table must not pay a full count first
    layout = _partition_layout(
        path, rels=[os.path.relpath(f, path) for f in before]
    )
    if zorder_by and not 2 <= len(zorder_by) <= 4:
        raise ValueError("zorder_by takes two to four columns")
    if zorder_by:
        # curve checks hoisted here too (VERDICT r14 "what's wrong" #1):
        # an unknown curve or a hilbert arity mismatch must fail before
        # the full-table count below, not inside the expression builders
        if curve not in ("morton", "hilbert"):
            raise ValueError(f"unknown clustering curve {curve!r}: "
                             "use 'morton' or 'hilbert'")
        if curve == "hilbert" and len(zorder_by) != 2:
            raise ValueError("hilbert clustering takes exactly 2 columns")
    if files is not None and where is not None:
        raise ValueError("'files' and 'where' are exclusive")
    if files is not None:
        live = {os.path.relpath(f, path) for f in before}
        unknown = sorted(set(files) - live)
        if unknown:
            raise ValidationError(
                f"compact(files=...): not live files: {unknown[:5]}"
            )
        affected = sorted(set(files))
        if not affected:
            return {"files_before": len(before), "files_after": len(before),
                    "rows": 0, "files_matched": 0}
        n_matched = len(affected)
        before = [os.path.join(path, rel) for rel in affected]
        df = (
            spark.read.format("olive")
            .option("table", table)
            .option("files", ",".join(affected))
            .load(path)
        )
    elif where is not None:
        # scoped OPTIMIZE (Delta's `OPTIMIZE ... WHERE`): restrict the
        # rewrite to the FILES that contain a matching row — discovery
        # is one file-name aggregate (same shape as delete_where's);
        # at 100 TB you compact yesterday's partition, never the
        # table.  Untouched files keep their bytes, stats, and names.
        fc = "_olive_file"
        tagged = _discovery_scan(spark, path, table, fc)
        affected = sorted(
            r[0]
            for r in tagged.filter(F.expr(where))
            .select(fc).distinct().collect()
        )
        if not affected:
            return {"files_before": len(before), "files_after": len(before),
                    "rows": 0, "files_matched": 0}
        n_matched = len(affected)
        before = [os.path.join(path, rel) for rel in affected]
        df = (
            spark.read.format("olive")
            .option("table", table)
            .option("files", ",".join(affected))
            .load(path)
        )
    else:
        n_matched = None
        df = spark.read.format("olive").load(path)
    # compact keeps every live row of the files it rewrites, so the
    # output sizing comes from METADATA when possible (r15, guide §5:
    # manifest/header totals minus DV-masked positions) — the count
    # action, a full extra pass over the compaction set, is the
    # fallback for unknowable files only
    live = _live_rows_local(
        path, [os.path.relpath(f, path) for f in before], table
    )
    rows = live if live is not None else df.count()
    n_files = max(1, math.ceil(rows / target_rows))
    if zorder_by:
        # min-max normalize each column into the per-column bit budget
        # (exact integer arithmetic; one tiny agg broadcast back)
        nbits = min(16, 63 // len(zorder_by))
        top = (1 << nbits) - 1
        bounds = df.agg(*[
            x
            for i, c in enumerate(zorder_by)
            for x in (F.min(c).alias(f"_lo{i}"), F.max(c).alias(f"_hi{i}"))
        ])
        df = df.crossJoin(F.broadcast(bounds))
        span = lambda lo, hi: F.greatest(F.col(hi) - F.col(lo), F.lit(1))  # noqa: E731
        norm = [
            ((F.col(c) - F.col(f"_lo{i}")) * top / span(f"_lo{i}", f"_hi{i}")).cast("long")
            for i, c in enumerate(zorder_by)
        ]
        drop = [x for i in range(len(zorder_by)) for x in (f"_lo{i}", f"_hi{i}")]
        if curve == "hilbert":
            z = df.withColumn("_z", _hilbert_expr(norm, nbits))
        elif curve == "morton":
            z = df.withColumn("_z", _morton_expr(norm, nbits))
        else:
            raise ValueError(f"unknown clustering curve {curve!r}: "
                             "use 'morton' or 'hilbert'")
        if layout:
            # Delta's OPTIMIZE ZORDER on a partitioned table: cluster
            # WITHIN each partition dir (global z-ranging would scatter
            # every dir's rows over every task and flatten nothing —
            # the layout is preserved by the partitioned write; the
            # z-sort tightens page stats inside each dir's files).
            # Global min/max bounds are fine: normalization is
            # monotone, so within-dir z-order is unaffected.
            df = (
                z.repartition(n_files, *layout["shape"])
                .sortWithinPartitions(*layout["shape"], "_z")
                .drop("_z", *drop)
            )
        else:
            df = (
                z.repartitionByRange(n_files, "_z")
                .sortWithinPartitions("_z")
                .drop("_z", *drop)
            )
    elif sort_by:
        if layout:
            # per-partition-dir sorted files: range-sorting across the
            # whole table would scatter every dir's keys over every task
            df = df.repartition(n_files, *layout["shape"]) \
                .sortWithinPartitions(*layout["shape"], sort_by)
        else:
            # repartitionByRange + sortWithinPartitions = globally
            # range-sorted layout: each file owns a disjoint interval
            df = df.repartitionByRange(n_files, sort_by) \
                .sortWithinPartitions(sort_by)
    elif layout:
        df = df.repartition(n_files, *layout["shape"])
    else:
        df = df.repartition(n_files)

    run = uuid.uuid4().hex[:8]
    original_rels = [os.path.relpath(f, path) for f in before]
    _rewrite_and_swap(
        df, path, original_rels, run,
        table=table, target_rows=target_rows,
        retain_history=retain_history, prefix="compact",
        layout=layout, page_rows=page_rows,
    )
    after = _list_chunk_files(path)
    out = {"files_before": n_before_total, "files_after": len(after),
           "rows": rows}
    if n_matched is not None:
        out["files_matched"] = n_matched
    return out


def compact_if_needed(
    spark,
    path: str,
    small_bytes: int = 32 << 20,
    min_small_files: int = 16,
    max_dv_fraction: "float | None" = 0.5,
    table: str = "data",
    **compact_kwargs,
) -> dict:
    """OPTIMIZE-style auto trigger, two independent policies:

    - **small-file GC**: run :func:`compact` when at least
      ``min_small_files`` files sit under ``small_bytes`` — the
      buildup every per-epoch streaming sink and frequent-small-append
      pipeline produces, which at 100 TB turns into task-per-tiny-file
      scan overhead and manifest bloat;
    - **deletion-vector GC** (r10): files whose DV-masked fraction
      exceeds ``max_dv_fraction`` get a SCOPED ``compact(files=...)``
      that materializes the masks away — a trickle-delete workload
      otherwise accretes dead bytes every scan still pages through
      (None disables the policy).

    Both checks are one directory listing + per-file stats / DV header
    counts (no Spark job); a no-op returns {"compacted": False, ...}
    so a scheduler can call this after every epoch/batch for free.
    ``compact_kwargs`` pass through (sort_by, zorder_by, target_rows,
    retain_history...)."""
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    try:
        files = _list_chunk_files(path) if os.path.isdir(path) else []
    except ValidationError:
        # empty sink dir (metadata only, no epoch committed yet): the
        # scheduler's first call must be a no-op, not a crash — but
        # only THAT case; real listing faults surface
        files = []
    small = 0
    for fp in files:
        try:
            if os.path.getsize(fp) < int(small_bytes):
                small += 1
        except OSError:
            continue
    dv_heavy: list[str] = []
    if max_dv_fraction is not None and os.path.isdir(path):
        try:
            from olive_spark.format.deletion import list_dvs, read_count
            from olive_spark.format.manifest import load_manifest

            man = load_manifest(path)
            for rel, names in list_dvs(path).items():
                total = _file_rows(path, rel, table, man)
                if not total:
                    continue
                masked = sum(
                    read_count(os.path.join(path, n)) for n in names
                )
                if masked > float(max_dv_fraction) * total:
                    dv_heavy.append(rel)
        except OSError:
            dv_heavy = []
    if small >= int(min_small_files):
        out = compact(spark, path, table=table, **compact_kwargs)
        out["compacted"] = True
        out["small_files"] = small
        return out
    if dv_heavy:
        out = compact(
            spark, path, table=table, files=sorted(dv_heavy),
            **compact_kwargs,
        )
        out["compacted"] = True
        out["small_files"] = small
        out["dv_heavy_files"] = len(dv_heavy)
        return out
    return {"compacted": False, "small_files": small,
            "files": len(files)}


@_locked(1)
def respec_partitions(
    spark,
    path: str,
    new_spec: str,
    table: str = "data",
    target_rows: int = 1 << 20,
    retain_history: bool = True,
    sort_by: "str | None" = None,
) -> dict:
    """Migrate the table to a NEW partition spec (Iceberg's
    partition-spec evolution, eagerly materialized): the whole table is
    rewritten into the new layout as ONE copy-on-write snapshot
    version, then the partition sidecar is repointed.  ``new_spec``
    takes the same grammar as the writer's ``partitionBy`` option —
    ``days(ts)``, ``bucket(N,col)``, ``truncate(W,col)``, identity
    column names, or any comma-separated mix; an identity-only (or
    single-dir classic hive) spec REMOVES the transform sidecar.

    Eager (rewrite now) rather than Iceberg's lazy (spec per file,
    scan-time union): this engine's scan plans transform pruning off
    ONE sidecar spec, and at 100 TB a one-time rewrite that restores
    uniform pruning beats forever carrying per-file spec dispatch.
    ``retain_history=True`` (default) keeps every pre-respec snapshot
    readable — time travel ACROSS the spec change works because
    snapshot reads resolve file names, not directory semantics.

    ``sort_by`` clusters rows within each new partition dir during the
    SAME rewrite (the migration already pays the full scan, so the
    clustering is free relative to a follow-up compact).

    Crash ordering: the sidecar is repointed only AFTER the rewrite's
    snapshot entry lands.  A crash in between leaves new-layout dirs
    under the old spec — transform pruning just no-ops on them (dir
    keys don't match; conservative, never wrong), and re-running
    respec_partitions converges.

    Returns {files_before, files_after, rows, version}."""
    from olive_spark.datasource import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files
    from olive_spark.format.partition import (
        has_transforms,
        parse_spec,
        replace_sidecar,
        shaping_columns,
        spec_to_string,
    )
    from olive_spark.format.snapshots import current_version

    register_olive(spark)
    transforms = parse_spec(new_spec)  # validates the grammar up front
    _recover_pending(path)
    _seed_snapshot_log(path)
    before = _list_chunk_files(path)
    original_rels = [os.path.relpath(f, path) for f in before]
    df = spark.read.format("olive").option("table", table).load(path)
    bad = [
        t["col"] for t in transforms if t["col"] not in df.columns
    ]
    if bad:
        raise ValueError(
            f"respec source columns {bad} not in table columns "
            f"{df.columns}"
        )
    layout = {
        "spec": spec_to_string(transforms),
        "dirs": [t["dir"] for t in transforms],
        "shape": shaping_columns(transforms),
        "hidden": has_transforms(transforms),
    }
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows))
    run = uuid.uuid4().hex[:8]
    shaped = df.repartition(n_files, *layout["shape"])
    if sort_by:
        # one rewrite buys both the new layout AND within-dir
        # clustering — the migration is already paying the full scan
        shaped = shaped.sortWithinPartitions(*layout["shape"], sort_by)
    _rewrite_and_swap(
        shaped, path, original_rels,
        run, table=table, target_rows=target_rows,
        retain_history=retain_history, prefix="respec",
        layout=layout,
    )
    replace_sidecar(path, transforms)
    after = _list_chunk_files(path)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "rows": rows,
        "version": current_version(path),
    }


def _discovery_scan(
    spark, path: str, table: str, fc: str,
    columns: "list[str] | None" = None,
):
    """The affected-file discovery relation shared by predicate
    mutations (compact(where)/delete_where/update_where): a fresh
    fileColumn-tagged scan that opts into plan-time pushdown pruning
    when the session allows it (``spark.sql.python.filterPushdown
    .enabled``) — on a partitioned 100 TB table the discovery then
    prunes whole dirs/files instead of reading everything to learn
    nothing matched.  Safe: a file the planner prunes contains no
    matching row by construction, and each mutation builds its own
    single-scan relation, so the DSv2 readInfo-reuse hazard (documented
    in olive_datasource) cannot bite."""
    r = (
        spark.read.format("olive")
        .option("table", table)
        .option("fileColumn", fc)
    )
    if columns:
        r = r.option("columns", ",".join(columns))
    try:
        if str(spark.conf.get(
            "spark.sql.python.filterPushdown.enabled", "false"
        )).lower() == "true":
            r = r.option("pushdown", "true")
    except Exception:  # noqa: BLE001 — conf shape differs on Connect
        pass
    return r.load(path)


def _seed_snapshot_log(path: str) -> None:
    """Seed the snapshot log from the live listing BEFORE a rewrite op
    touches any file: `_rewrite_and_swap` appends its entry only after
    the originals are retired, so relying on append_entry's first-entry
    auto-seed there would record a post-rewrite base that silently
    omits the replaced files (r8 review finding).  Best-effort like the
    rest of the advisory log — an unwritable log loses time travel,
    never correctness."""
    from olive_spark.format.snapshots import ensure_seeded

    try:
        ensure_seeded(path)
    except OSError:
        pass


def _detect_partition_cols(path: str) -> "list[str] | None":
    """Infer a table's hive partition column sequence from its live
    chunk-file layout: every file must sit under the same
    ``col=value/...`` chain.  Returns None for flat or mixed layouts —
    rewrite ops then fall back to root placement rather than guess."""
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    from olive_spark.format.errors import ValidationError

    try:
        rels = [os.path.relpath(f, path) for f in _list_chunk_files(path)]
    except (OSError, ValidationError):
        # no live files (seeded-empty table, e.g. a branch staging onto
        # an empty base): flat layout, never an error
        return None
    return _detect_partition_cols_from_rels(rels)


def _detect_partition_cols_from_rels(rels: "list[str]") -> "list[str] | None":
    if not rels:
        return None
    seqs = set()
    for r in rels:
        parts = r.split(os.sep)[:-1]
        if not parts or not all("=" in p for p in parts):
            return None
        seqs.add(tuple(p.split("=", 1)[0] for p in parts))
    if len(seqs) != 1:
        return None
    return list(seqs.pop())


def _shape_for_write(df, n_files: int, layout: "dict | None"):
    """Output-file shaping shared by merge/delete/update rewrites: hash
    on the layout's shaping keys when one is being preserved (derived
    dir values co-located → bounded files per partition dir; for
    identity layouts these are the columns themselves), plain
    repartition otherwise.  compact() shapes its own df (sort/z-order
    layouts)."""
    if layout:
        return df.repartition(n_files, *layout["shape"])
    return df.repartition(n_files)


def _rewrite_and_swap(
    df, path: str, original_rels: "list[str]", run: str,
    table: str, target_rows: int, retain_history: bool,
    prefix: str, layout: "dict | None" = None,
    empty: bool = False, commit_tag: "str | None" = None,
    dv_add: "list[tuple[str, str]] | None" = None,
    precommit=None, op: "str | None" = None,
    op_params: "dict | None" = None,
    page_rows: "int | None" = None,
) -> "list[str]":
    """Write ``df`` as the replacement for ``original_rels`` inside the
    live table at ``path`` — the crash-safe copy-on-write core shared by
    ``compact``, ``merge_upsert``, and ``delete_where``.

    Four phases; at no point is the replaced data unreadable:
    1. write ``df`` to a sibling temp dir, then stage the new files into
       the live dir under non-.olive names (invisible to scans);
    2. write the intent manifest (atomic rename) listing originals +
       replacement names — the recovery point (named compact-*.manifest
       regardless of caller so _recover_pending/vacuum handle all three
       operations identically);
    3. activate replacements with atomic renames (readers may briefly
       see old AND new — a transient duplicate beats a lost table);
    4. retire the originals (delete, or move to _olive_history/ under
       ``retain_history`` so pre-rewrite snapshots stay reconstructable),
       then drop the manifest.  A crash in 1-2 leaves the old files
       untouched (staged files are inert debris); a crash in 3-4 leaves
       a readable superset PLUS the manifest, so vacuum()/the next
       compact()/merge/delete finishes the originals-retire.

    Afterwards the stats manifest is refreshed (new files keep their
    commit-time stats under the activated names) and one snapshot-log
    entry records the whole rewrite as a single version.  Returns the
    activated relative file names.

    ``layout`` (from :func:`_partition_layout`) preserves a partitioned
    layout across the rewrite: the replacement is written with the
    layout's ``partitionBy`` spec — identity hive chains verbatim,
    hidden transforms re-derived per row by the writer — and each new
    file is staged and activated INSIDE its ``key=value/…`` directory,
    so directory pruning (=/IN for hive, interval/bucket/prefix for
    transforms) keeps working on rewritten data.  Recovery and vacuum
    already handle sub-directory rels (``**/*.olive.staging`` glob,
    makedirs on history moves).

    ``commit_tag`` rides the intent manifest AND the snapshot-log
    entry, so callers (matview refresh) can tell whether THIS rewrite's
    commit landed — including when _recover_pending finished it after a
    crash.

    ``dv_add`` [(target_rel, dv_rel), ...] folds a MERGE-ON-READ leg
    into the SAME commit: each listed deletion vector must already be
    staged at ``<path>/<dv_rel>.staging`` (written executor-side); it
    is activated with the file swap, recorded in the intent manifest
    (so recovery finishes it), and lands in the one snapshot entry —
    a mixed rewrite-some-files / DV-others mutation is still exactly
    one version."""
    from olive_spark.datasource.olive_datasource import _list_chunk_files
    from olive_spark.format.manifest import load_manifest, merge_manifest

    tmp = f"{path}.compact-{prefix}-{run}"  # vacuum's <path>.compact-* glob
    stats_entries: dict = {}
    staged = []
    finals = []
    if not empty:
        w = (
            df.write.format("olive")
            .option("table", table)
            .option("chunkRows", target_rows)
        )
        if page_rows is not None:
            # page granularity = skipping granularity: z-order callers
            # shrink it so 2-predicate point lookups open ~1 page
            w = w.option("pageRows", int(page_rows))
        # column-mapping ids: the staging dir has no schema sidecar, so
        # the writer can't derive the table's ids from it — pass them
        # explicitly or the rewritten files would land UNSTAMPED and a
        # re-added column's data would resolve through the legacy map
        # to its retired id (i.e. vanish)
        from olive_spark.format.table_schema import read_column_mapping

        cm = read_column_mapping(path, table)
        if cm is not None:
            ids = dict(zip(cm["names"], cm["fids"]))
            missing = [c for c in df.columns if c not in ids]
            if missing:
                # rewrite carries brand-new columns (merge evolution):
                # reserve ids for them under the commit lock first
                from olive_spark.format.table_schema import (
                    reserve_field_ids,
                )

                ids.update(reserve_field_ids(path, table, missing))
            w = w.option("fieldIds", json.dumps(ids))
        # NDV sketch continuity: if the replaced files carried HLL
        # sketches, re-sketch the SAME columns on the rewritten output
        # (this is also how compact_if_needed's DV GC repairs the
        # sketch upper-bound — the materializing rewrite re-sketches
        # the surviving rows, r11 verdict task #3)
        pre_man = load_manifest(path)
        sketch_cols = sorted({
            c
            for rel in original_rels
            for c in (
                (pre_man.get(rel) or {}).get("ndv") or {}
            )
            if c in df.columns
        })
        if sketch_cols:
            w = w.option("ndvColumns", ",".join(sketch_cols))
        if layout:
            w = w.option("partitionBy", layout["spec"])
        w.mode("append").save(tmp)
        tmp_stats = load_manifest(tmp)  # per-file stats from the commit
        for i, f in enumerate(_list_chunk_files(tmp)):
            rel = os.path.relpath(f, tmp)
            sub = os.path.dirname(rel)
            if not sub and layout:
                # a root file from a partitioned write is the writer's
                # zero-row schema sentinel (it carries no partition
                # tuple).  Park it under the hive null-partition chain:
                # a ROOT file would poison _detect_partition_cols into
                # "mixed layout" and silently flatten every later
                # rewrite (r8 third-review repro)
                sub = os.sep.join(
                    f"{c}=__HIVE_DEFAULT_PARTITION__"
                    for c in layout["dirs"]
                )
            final = os.path.join(sub, f"{prefix}-{run}-{i:05d}.olive") if sub \
                else f"{prefix}-{run}-{i:05d}.olive"
            ent = tmp_stats.get(rel)
            if ent is not None:
                stats_entries[final] = ent  # same bytes, new name — carry over
            dest = os.path.join(path, final + ".staging")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(f, dest)
            staged.append(dest)
            finals.append(final)
    # ``empty`` (every row of the replaced files was deleted): no
    # replacement is written at all — the writer's zero-row path would
    # emit a schema sentinel file at the table ROOT, planting a stray
    # flat file into hive layouts; a remove-only manifest + snapshot
    # entry expresses "these files are gone" crash-safely instead.
    manifest = os.path.join(path, f"compact-{run}.manifest.json")
    payload = json.dumps(
        {
            "run": run,
            "originals": original_rels,
            "finals": finals,
            "history": bool(retain_history),
            "empty": bool(empty),
            "tag": commit_tag,
            "dv_add": [list(p) for p in (dv_add or [])],
            "op": op or prefix,
            "op_params": op_params or {},
        }
    )

    def _commit_visible() -> None:
        with open(manifest + ".tmp", "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(manifest + ".tmp", manifest)
        for dest in staged:
            os.replace(dest, dest[: -len(".staging")])
        for _t, dv_rel in (dv_add or []):
            stag = os.path.join(path, dv_rel) + ".staging"
            if os.path.exists(stag):
                os.replace(stag, os.path.join(path, dv_rel))
        for rel in original_rels:
            _retire_original(path, rel, retain_history)
        os.remove(manifest)
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            # refresh the stats manifest: retired originals drop out
            # (their files are gone from the live listing),
            # replacements keep their commit-time stats under the
            # activated names — sorted/z-ordered layout plus the
            # manifest is what lets a 100 TB plan prune files without
            # opening them
            merge_manifest(path, stats_entries)
        except OSError:
            pass

    if precommit is None:
        _commit_visible()
        try:
            # snapshot log: this rewrite is one version — new files in,
            # old files out (resolvable from _olive_history if retained)
            from olive_spark.format.snapshots import append_entry

            append_entry(path, add=finals, remove=original_rels,
                         tag=commit_tag, dv_add=tuple(dv_add or ()),
                         op=op or prefix, params=op_params)
        except OSError:
            pass
        return finals
    # SERIALIZABLE commit (r11 verdict task #6): the conflict check,
    # the file swap, and the snapshot-log entry all run under ONE hold
    # of the metadata commit lock — no concurrent append's log entry
    # can interleave between the final validation and this mutation's
    # version.  Everything inside is driver-local file IO (renames +
    # JSON), never a Spark job, honoring the micro-lock contract.  A
    # precommit abort leaves nothing visible: staged files and DVs are
    # inert non-.olive names, removed here.
    from olive_spark.format.lock import metadata_commit_lock
    from olive_spark.format.snapshots import _append_entry_locked

    with metadata_commit_lock(path):
        try:
            precommit()
        except Exception:
            # abort: un-stage everything this op wrote; the table is
            # byte-for-byte what a never-started mutation would see
            for dest in staged:
                try:
                    os.remove(dest)
                except OSError:
                    pass
            for _t, dv_rel in (dv_add or []):
                try:
                    os.remove(os.path.join(path, dv_rel) + ".staging")
                except OSError:
                    pass
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        _commit_visible()
        try:
            _append_entry_locked(
                path, add=finals, remove=original_rels, reset=False,
                tag=commit_tag, max_entries=None,
                dv_add=tuple(dv_add or ()), dv_remove=(),
                op=op or prefix, params=op_params,
            )
        except OSError:
            pass  # same best-effort contract as the unlocked path
    return finals


def _recover_pending(path: str) -> dict:
    """Complete any compaction that died between manifest write and
    cleanup: activate still-staged replacements, delete the listed
    originals, drop the manifest.  Idempotent; converges to exactly the
    compacted rows.  A manifest whose replacements are missing (neither
    staged nor active — manual tampering) is left in place and reported
    rather than risking an originals-delete that would lose rows."""
    out = {"manifests_completed": 0, "activated": 0, "originals_deleted": 0,
           "manifests_skipped": 0}
    for mf in sorted(glob.glob(os.path.join(path, "compact-*.manifest.json"))):
        try:
            with open(mf) as fh:
                man = json.load(fh)
        except (OSError, ValueError):
            out["manifests_skipped"] += 1
            continue
        pairs = [
            (os.path.join(path, final) + ".staging", os.path.join(path, final))
            for final in man.get("finals", [])
        ]
        # an empty/missing finals list must NOT pass the guard (all([])
        # is vacuously true): completing it would delete every original
        # with zero replacements activated — exactly the loss this
        # guard exists to prevent.  EXCEPTION: a manifest explicitly
        # marked "empty" is an intentional remove-only rewrite (a
        # delete that wiped every row of its affected files) — zero
        # replacements IS its correct completion.
        if not man.get("empty") and (
            not pairs
            or not all(
                os.path.exists(s) or os.path.exists(f) for s, f in pairs
            )
        ):
            out["manifests_skipped"] += 1
            continue
        # log-less table (raw write_chunk files) whose rewrite crashed:
        # seed the base from the reconstructed PRE-rewrite listing
        # (live minus activated finals, plus the manifest's originals)
        # before retirement — seeding later would record a partial base
        try:
            from olive_spark.format.snapshots import (
                ensure_seeded, list_live_files,
            )

            ensure_seeded(path, files=sorted(
                (set(list_live_files(path))
                 - set(man.get("finals", [])))
                | set(man.get("originals", []))
            ))
        except OSError:
            pass
        for spath, fpath in pairs:
            if os.path.exists(spath):
                os.replace(spath, fpath)
                out["activated"] += 1
        for _t, dv_rel in man.get("dv_add", []):
            stag = os.path.join(path, dv_rel) + ".staging"
            if os.path.exists(stag):
                os.replace(stag, os.path.join(path, dv_rel))
                out["activated"] += 1
        for _t, dv_rel in man.get("dv_remove", []):
            # RESTORE undoing post-version DVs: retire them to history
            # (idempotent — retire_dv_file no-ops on an absent live file)
            try:
                from olive_spark.format.deletion import retire_dv_file

                retire_dv_file(path, dv_rel, history=True)
            except OSError:
                pass
        for orig in man.get("originals", []):
            if _retire_original(path, orig, bool(man.get("history"))):
                out["originals_deleted"] += 1
        os.remove(mf)
        try:
            from olive_spark.format.snapshots import append_entry

            # a recovered restore must land with the same tag the
            # crash-free path writes — history consumers key restore
            # commits off it (snapshot_history kind, facade tests)
            append_entry(
                path, add=man.get("finals", []),
                remove=man.get("originals", []),
                tag=man.get("tag"),
                dv_add=[tuple(p) for p in man.get("dv_add", [])],
                dv_remove=[tuple(p) for p in man.get("dv_remove", [])],
                op=man.get("op"), params=man.get("op_params") or None,
            )
        except OSError:
            pass
        out["manifests_completed"] += 1
    return out


TOMBSTONES_DIR = "_olive_tombstones"
_TOMBSTONE_COMPACT_THRESHOLD = 64  # sidecar fragments before rewrite


def _read_tombstones(spark, path: str, key_cols: "list[str]"):
    """Load the retained-tombstone table (key cols + ``__seq``) if one
    exists; None when the sidecar is absent or holds no chunk files.
    A sidecar that EXISTS but cannot be read, or whose schema doesn't
    match this table's keys, raises: silently proceeding with no floor
    would quietly re-enable the stale-update resurrection the sidecar
    guards against.  Lives in an underscore directory, so it is
    invisible to table scans."""
    tdir = os.path.join(path, TOMBSTONES_DIR)
    if not os.path.isdir(tdir):
        return None
    if not _tombstone_files(tdir):
        return None
    df = spark.read.format("olive").load(tdir)
    expected = set(key_cols) | {"__seq"}
    if set(df.columns) != expected:
        raise ValueError(
            f"tombstone sidecar at {tdir} has columns {df.columns}, "
            f"expected {sorted(expected)} — was the table's key set "
            "changed between merges?"
        )
    return df


def _tombstone_files(tdir: str) -> "list[str]":
    """Committed tombstone chunk files — `.`-prefixed staging subdirs
    (uncommitted executor writes) are invisible until activation."""
    out = []
    for r, dirs, fs in os.walk(tdir):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        out.extend(os.path.join(r, f) for f in fs if f.endswith(".olive"))
    return sorted(out)


def _stage_tombstones(tombs_df, path: str, run: str) -> "str | None":
    """Materialize winning tombstones ((key…, __seq) rows) EXECUTOR-SIDE
    into a dot-staging subdir of the sidecar — the lineage reads the
    merge's original files, so it must run BEFORE the swap retires
    them, and the positions/keys never funnel through the driver (the
    pre-r10 path collected them — a full-table CDC purge batch then
    bottlenecked on one process).  The staging dir is invisible to
    every tombstone read (dot-prefixed); a crash before activation
    leaves inert debris that vacuum sweeps.  Returns the staging dir,
    or None when the frame wrote no rows."""
    stage = os.path.join(path, TOMBSTONES_DIR, f".staging-{run}")
    (
        tombs_df.write.format("olive")
        .option("table", "tombstones")
        .mode("append")
        .save(stage)
    )
    # the writer's zero-row schema sentinel means "no tombstones" —
    # drop the stage rather than activate an empty file
    from olive_spark.datasource.olive_datasource import (
        _pick_table,
        _read_header_bytes,
    )

    any_rows = False
    for r, _dirs, fs in os.walk(stage):
        for f in fs:
            if not f.endswith(".olive"):
                continue
            header, _ = _read_header_bytes(os.path.join(r, f))
            if _pick_table(header, "tombstones").num_rows > 0:
                any_rows = True
    if not any_rows:
        shutil.rmtree(stage, ignore_errors=True)
        return None
    return stage


def _activate_tombstones(
    spark, path: str, stage: "str | None", key_cols: "list[str]",
) -> None:
    """Commit staged tombstones AFTER the rewrite lands (recording
    first would floor updates for a delete that never landed; a crash
    in between only loses this batch's floor, and a replay re-applies
    the delete and re-stages it — self-healing, same contract as the
    pre-r10 collected path).  Activation is rename-only; afterwards the
    sidecar compacts once it fragments."""
    if stage is None:
        return
    tdir = os.path.join(path, TOMBSTONES_DIR)
    run = os.path.basename(stage)[len(".staging-"):]
    i = 0
    for r, _dirs, fs in os.walk(stage):
        for f in sorted(fs):
            if not f.endswith(".olive"):
                continue
            src = os.path.join(r, f)
            try:
                from olive_spark.datasource.olive_datasource import (
                    _pick_table,
                    _read_header_bytes,
                )

                header, _off = _read_header_bytes(src)
                if _pick_table(header, "tombstones").num_rows == 0:
                    continue  # schema sentinel, not data
            except Exception:  # noqa: BLE001 — keep the file, be safe
                pass
            os.replace(src, os.path.join(tdir, f"tomb-{run}-{i:04d}.olive"))
            i += 1
    shutil.rmtree(stage, ignore_errors=True)
    _compact_tombstones_if_needed(spark, tdir, key_cols)


def _compact_tombstones_if_needed(spark, tdir: str, key_cols) -> None:
    """Keep the sidecar bounded for long-lived streams: past the
    threshold, rewrite it as one file of per-key maxima.  The new file
    is appended FIRST (maxima semantics make old files a harmless
    superset during the overlap), then the old files drop — crash-safe
    without a manifest."""
    files = _tombstone_files(tdir)
    if len(files) <= _TOMBSTONE_COMPACT_THRESHOLD:
        return
    from pyspark.sql import functions as F

    maxima = (
        spark.read.format("olive").load(tdir)
        .groupBy(*key_cols).agg(F.max("__seq").alias("__seq"))
    )
    (
        maxima.coalesce(1).write.format("olive")
        .option("table", "tombstones")
        .option("snapshotMaxEntries", "64")
        .mode("append")
        .save(tdir)
    )
    for f in files:  # the pre-compaction fragments only
        try:
            os.remove(f)
        except FileNotFoundError:
            pass


def clear_tombstones(path: str) -> int:
    """Drop ALL retained tombstones — call once the upstream feed
    guarantees no change older than every retained tombstone can still
    arrive (e.g. the CDC source's low-watermark passed them).  After
    clearing, a replayed stale update for a deleted key would
    resurrect it, which is why this is explicit and caller-driven.
    Returns the number of tombstone files removed."""
    tdir = os.path.join(path, TOMBSTONES_DIR)
    if not os.path.isdir(tdir):
        return 0
    n = sum(1 for _, _, fs in os.walk(tdir) for f in fs if f.endswith(".olive"))
    shutil.rmtree(tdir, ignore_errors=True)
    return n


def _seed_evolved_sidecar(path, table, src_schema, new_cols) -> None:
    """Record the evolved column set in the sidecar BEFORE any evolved
    data lands.  Crash ordering: sidecar-first means a crash between
    sidecar and data leaves a declared column that no file carries yet —
    every read null-fills it, visibly and harmlessly.  Data-first would
    leave committed evolved files whose new column silently VANISHES
    from any scan that plans off an older file's header — the exact
    hole the sidecar exists to close (and _recover_pending, which only
    finishes file swaps, could not repair it).  Types for the new
    columns come from the Arrow mapping of the source schema; the
    post-write :func:`_update_schema_sidecar` reconciles them against
    the actually-written header (authoritative, idempotent)."""
    from pyspark.sql.pandas.types import to_arrow_type

    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.table_schema import (
        read_dropped_columns,
        read_table_schema,
        write_table_schema,
    )
    from olive_spark.format.types import type_to_json

    side = read_table_schema(path, table)
    if side is not None:
        names, types = side
    else:
        header, _ = _read_header_bytes(_list_chunk_files(path)[0])
        th = _pick_table(header, table)
        names, types = list(th.field_names), list(th.field_types)
    from olive_spark.format.table_schema import read_column_mapping

    if read_column_mapping(path, table) is None:
        # unmapped table: per-name tombstones are the only resurrection
        # guard, so a dropped name stays refused.  Mapped tables re-add
        # freely — the fresh column id keeps old values invisible.
        tomb = set(read_dropped_columns(path, table))
        resurrect = [c for c in new_cols if c in tomb]
        if resurrect:
            raise ValidationError(
                f"columns {resurrect} were DROPped from {table!r}: old "
                "files still hold their values, so re-adding the name "
                "would resurface stale data — use a new name, or rewrite "
                "the table"
            )
    for c in new_cols:
        if c not in names:
            names.append(c)
            types.append(type_to_json(to_arrow_type(src_schema[c].dataType)))
    write_table_schema(path, table, names, types)


def _update_schema_sidecar(path: str, table: str, sample_file: str) -> None:
    """Point the directory's schema authority at the evolved column set,
    read back from a just-written file's header — authoritative by
    construction (the writer already validated and ordered it), no
    second Spark→olive type mapping to drift."""
    from olive_spark.datasource.olive_datasource import (
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.table_schema import write_table_schema

    header, _ = _read_header_bytes(sample_file)
    th = _pick_table(header, table)
    write_table_schema(path, th.name, th.field_names, th.field_types)


@_locked(1, heal_txns=True)
def merge_upsert(
    spark,
    path: str,
    source,
    key_cols: "list[str]",
    table: str = "data",
    retain_history: bool = True,
    target_rows: int = 1 << 20,
    latest_by: "str | None" = None,
    delete_col: "str | None" = None,
    update_condition: "str | None" = None,
    delete_condition: "str | None" = None,
    evolve_schema: bool = False,
    commit_tag: "str | None" = None,
    strategy: str = "auto",
    dv_threshold: float = 0.2,
    not_matched_by_source_delete: bool = False,
    not_matched_by_source_condition: "str | None" = None,
    isolation: str = "write_serializable",
) -> dict:
    """``MERGE INTO`` (upsert) on a snapshot-logged olive table: rows of
    ``source`` whose ``key_cols`` match an existing row REPLACE it; the
    rest are inserted.  Copy-on-write: only files that actually contain
    a matched key are rewritten; untouched files keep their bytes, their
    stats-manifest entries, and their page/Bloom indexes.  The whole
    merge lands as ONE snapshot version (adds + removes), so
    ``.option("snapshot", pre_merge_version)`` still reads the exact
    pre-merge table while ``retain_history=True`` (the default here,
    unlike compact, because merge destroys row content — compaction only
    rearranges it).

    ``latest_by`` switches matched-row semantics from "source replaces
    unconditionally" to LATEST-WINS conflict resolution: per key, the
    row with the greatest ``latest_by`` value among existing + source
    survives (a tie prefers the source row — update semantics).  This
    is the CDC/stream-upsert mode: the outcome is a pure function of
    the key's maximum-sequence row, so applying a change stream in ANY
    batch partitioning — one merge or fifty microbatches — converges to
    the identical table (see streaming.foreach_batch_upsert).  With
    ``latest_by``, duplicate source keys are allowed (resolved by the
    sequence); (key, latest_by) must still be unique or the winner
    would be nondeterministic — enforced, as are non-null keys and
    sequences.  Rows that cannot win (their sequence is below the
    key's stored maximum) are pruned before file discovery, so an
    all-stale replayed batch is a clean no-op — no rewrite, no new
    version; and only SOURCE-TOUCHED keys are collapsed to one winner —
    duplicate-key rows the source never mentioned pass through a
    rewrite untouched.

    ``delete_col`` names a BOOLEAN source column marking TOMBSTONES —
    the ``WHEN MATCHED … THEN DELETE`` leg a real change stream needs
    (row deletions travel in the same feed as upserts).  A tombstone
    whose key matches removes the row instead of replacing it; an
    unmatched tombstone is a no-op (nothing to delete), never an
    insert.  The flag is CDC metadata, NOT a table column (enforced).
    Composes with ``latest_by``: the tombstone carries a sequence like
    any change — if it wins the per-key resolution the key is gone, if
    a later upsert outranks it the row survives.  Winning tombstones
    are RETAINED (key + sequence, in the scan-invisible
    ``_olive_tombstones/`` sidecar) and floor later batches' stale
    prune: a deleted row leaves no sequence in the table, so without
    the retained floor an out-of-order update replayed in a LATER
    batch would look brand-new and resurrect the key (caught by the
    batch-boundary property test) — with it, delete-bearing streams
    keep the full batch-partitioning-independence guarantee.
    Tombstones accumulate one slim row per winning delete;
    :func:`clear_tombstones` drops them once the upstream feed's
    low-watermark guarantees no older change can still arrive.

    ``update_condition`` is the ``WHEN MATCHED AND <cond> THEN UPDATE``
    leg: a SQL boolean expression over the aliases ``t`` (the existing
    row) and ``s`` (the source row), e.g. ``"s.price > t.price"``.
    Matched target rows where it holds are replaced; where it is false
    or NULL the target row is KEPT and that source row is dropped (it
    was matched, so it must not insert).  Unmatched source rows still
    insert unconditionally.  Per-ROW semantics: with (legal) duplicate
    target keys each duplicate is judged against the source row
    independently — replaced duplicates collapse into the one source
    row, kept duplicates survive beside it.  Mutually exclusive with
    ``latest_by``/``delete_col`` (sequence resolution IS the condition
    there).  File discovery stays key-based, so a file whose matched
    rows all fail the condition is rewritten byte-identical — correct,
    just unpruned; evaluating ``t``-referencing conditions at discovery
    time would need the full rows the slim scan exists to avoid.

    ``not_matched_by_source_delete=True`` is the third Delta clause
    family — ``WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE``:
    target rows whose key the source never mentions are REMOVED (where
    the optional ``not_matched_by_source_condition``, a SQL boolean
    over plain target columns, holds — NULL keeps the row, SQL DELETE
    semantics).  This is the full-snapshot-sync verb: merge the new
    complete snapshot with all three clauses and the table converges
    to it exactly — matched rows update, new rows insert, vanished
    rows delete.  Composes with ``update_condition``/
    ``delete_condition``; mutually exclusive with ``latest_by``/
    ``delete_col`` (a sequenced CDC batch is incremental by
    definition — rows absent from it are simply unchanged).  Note the
    discovery cost is inherent to the semantics: every file holding
    any unmatched row is affected (Delta pays the same); the per-file
    strategy still leaves zero-dying files untouched and masks small
    dying sets with deletion vectors.

    ``delete_condition`` is the ``WHEN MATCHED AND <cond> THEN DELETE``
    leg (same ``t``/``s`` aliases), judged BEFORE the update leg —
    fixed clause order, like writing Delta's whenMatchedDelete first:
    a matched target row where it holds is removed; the remaining
    matched rows fall through to the update leg (``update_condition``
    if given, else the standard unconditional replace).  A source row
    whose every matched target row was deleted is consumed — matched
    rows never insert.  Composes with ``update_condition``; mutually
    exclusive with ``latest_by``/``delete_col`` (predicate deletes vs
    sequenced tombstones are different protocols).

    ``evolve_schema=True`` is add-column schema evolution: source
    columns beyond the table's schema become NEW table columns
    (appended in source order) instead of raising.  O(1) in table size —
    untouched files are NOT rewritten; they null-fill the new columns at
    read time (datasource._cast_to), and the directory's schema
    authority moves to the ``_olive_schema.json`` sidecar
    (format/table_schema.py) so a default scan sees the evolved column
    set no matter which file it planned from.  Latest-schema-wins, like
    Delta/Iceberg add-column: time travel to pre-evolution snapshots
    reads old data THROUGH the current schema (new columns all-NULL)
    rather than replaying per-version schemas.

    100 TB shape: phase 1 discovers affected files with a key-column-
    pruned scan (``columns`` option: only the keys and the provenance
    column leave the reader) semi-joined against the source — a slim
    shuffle of keys, never of documents; the collected result is FILE
    NAMES (bounded by file count, the same driver-side footprint as
    Delta/Iceberg's MERGE file pruning).  Phase 2 resolves the merge
    over only the affected files — work proportional to data actually
    touched, not table size.

    ``strategy`` picks the physical mutation per affected file, from
    that file's DYING rows (target rows the resolution does not keep):

    - "auto" (default): a file whose dying fraction is ≤
      ``dv_threshold`` gets a merge-on-read DELETION VECTOR (the dying
      positions land in a tiny ``_olive_dv/`` sidecar, the file's bytes
      are untouched, replacement rows append as new files —
      write cost ∝ changed rows, the Delta-DV shape a trickle-CDC
      workload needs); heavier files take the classic copy-on-write
      rewrite; a file with NO dying rows (every matched row failed its
      condition / bystander-only) is left completely untouched.
    - "dv": force DVs for every affected file with dying rows.
    - "rewrite": the pre-r10 behavior — every affected file is
      rewritten (including byte-identical ones), no dying-set job runs.

    Whatever the mix, the whole merge lands as ONE snapshot version
    (file adds + removes + DV adds share the commit and the crash-
    recovery manifest), and a merge that changes nothing anywhere is a
    clean no-op (no new version).

    Constraints: single writer (same contract as :func:`compact`);
    ``source`` must be unique on ``key_cols`` (enforced — a duplicate
    key would make the replacement row nondeterministic, the same error
    Delta raises).  Partitioned layouts are PRESERVED — classic hive
    chains (auto-detected from the live layout) and HIDDEN transform
    layouts (``days(ts)``/``bucket(N,col)``/``truncate(W,col)``, read
    from the partition sidecar): rewritten and inserted files land
    inside their derived ``key=value/…`` directories because the writer
    re-derives each row's dir value from the spec, so directory pruning
    keeps working after a merge.  ``days(ts)`` + CDC MERGE — the
    canonical 100 TB event-table combination — composes.

    ``commit_tag`` rides the merge's snapshot-log entry (rewrite or
    pure-insert commit alike) so a caller can later tell whether THIS
    merge landed — matview refresh keys its crash recovery off it.

    The reference format is batch-only with no directory/update layer
    (/root/reference/src/root.zig:9-16); MERGE is this engine's
    lakehouse extension, built on the snapshot log
    (olive_spark/format/snapshots.py).

    ``isolation="serializable"`` (default WriteSerializable) aborts
    with ``SerializableConflict`` when a concurrent append commits rows
    whose keys the source touches (or ANY rows, under NOT MATCHED BY
    SOURCE) between this merge's snapshot read and its commit — see
    :func:`_serializable_precommit`.

    Returns {files_rewritten, files_added, rows_after_in_rewritten,
    inserted_only (bool), version}."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from olive_spark.datasource import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files
    from olive_spark.format.snapshots import current_version

    if strategy not in ("auto", "dv", "rewrite"):
        raise ValueError("strategy must be 'auto', 'dv', or 'rewrite'")
    if isolation not in ("write_serializable", "serializable"):
        raise ValueError(
            "isolation must be 'write_serializable' or 'serializable'"
        )
    register_olive(spark)
    _recover_pending(path)
    _seed_snapshot_log(path)
    v0 = current_version(path)
    fc = "_olive_file"
    if fc in source.columns:
        raise ValueError(f"source must not carry the provenance column {fc!r}")
    full = spark.read.format("olive").option("table", table).load(path)
    cols = full.columns
    missing = [k for k in key_cols if k not in cols]
    if missing:
        raise ValueError(f"key columns not in table: {missing}")
    lacking = [c for c in cols if c not in source.columns]
    if lacking:
        raise ValueError(f"source is missing table columns: {lacking}")
    if delete_col is not None:
        from pyspark.sql.types import BooleanType

        if delete_col not in source.columns:
            raise ValueError(f"delete_col {delete_col!r} not in source")
        if delete_col in cols:
            raise ValueError(
                f"delete_col {delete_col!r} is a table column — the "
                "tombstone flag is CDC metadata and must not collide"
            )
        if not isinstance(source.schema[delete_col].dataType, BooleanType):
            raise ValueError(f"delete_col {delete_col!r} must be boolean")
    for cname, cval in (
        ("update_condition", update_condition),
        ("delete_condition", delete_condition),
    ):
        if cval is None:
            continue
        if latest_by is not None or delete_col is not None:
            raise ValueError(
                f"{cname} is mutually exclusive with latest_by/"
                "delete_col — sequenced CDC resolves matches by "
                "sequence, not by predicate"
            )
        if not isinstance(cval, str) or not cval.strip():
            raise ValueError(f"{cname} must be a non-empty SQL string")
    if not_matched_by_source_condition is not None \
            and not not_matched_by_source_delete:
        raise ValueError(
            "not_matched_by_source_condition requires "
            "not_matched_by_source_delete=True"
        )
    if not_matched_by_source_delete and (
        latest_by is not None or delete_col is not None
    ):
        raise ValueError(
            "not_matched_by_source_delete is mutually exclusive with "
            "latest_by/delete_col — a sequenced CDC batch is "
            "incremental, rows absent from it are unchanged; "
            "full-snapshot sync uses plain or conditional merge"
        )
    surplus = [
        c for c in source.columns if c not in cols and c != delete_col
    ]
    new_cols: list = []
    if surplus and not evolve_schema:
        raise ValueError(
            f"source carries columns not in the table: {surplus} — "
            "drop them, or pass evolve_schema=True to add them"
        )
    if evolve_schema and surplus:
        # "__"-prefixed names are the merge machinery's own working
        # namespace (__del/__src/__rn/__seq…): evolving one in would
        # collide with a LATER merge's internal aliases and die with an
        # ambiguous-column AnalysisException mid-operation
        bad = [
            c for c in surplus
            if c.startswith("_olive") or c.startswith("__")
        ]
        if bad:
            raise ValueError(f"reserved column names: {bad}")
        new_cols = list(surplus)  # already in source-column order
    # types must match EXACTLY: a silent cast under non-ANSI defaults
    # turns an incompatible value into NULL, replacing matched rows
    # with corrupt data — the caller casts deliberately or not at all
    mismatched = [
        (c, str(source.schema[c].dataType), str(full.schema[c].dataType))
        for c in cols
        if source.schema[c].dataType != full.schema[c].dataType
    ]
    if mismatched:
        raise ValueError(
            "source column types differ from the table "
            f"(col, source, table): {mismatched} — cast explicitly"
        )
    if latest_by is not None and latest_by not in cols:
        raise ValueError(f"latest_by column {latest_by!r} not in table")
    all_cols = [*cols, *new_cols]  # evolved table column order
    sel = [F.col(c) for c in all_cols]
    if delete_col is not None:
        sel.append(
            F.coalesce(F.col(delete_col), F.lit(False)).alias("__del")
        )
    src = source.select(*sel)
    uniq = key_cols if latest_by is None else [*key_cols, latest_by]
    # source KEY BOUNDS ride the same validation aggregate (no extra
    # job): Delta-style merge file pruning — discovery later filters
    # the key-pruned scan to [min, max] per key column, so with
    # pushdown the planner drops files whose stats exclude the batch
    # entirely (a CDC batch touching recent days never opens January)
    from pyspark.sql.types import AtomicType, TimestampNTZType, TimestampType

    # timestamps are EXCLUDED: the collected min/max round-trips
    # Spark-internal -> naive local datetime (fromInternal, fold-aware)
    # -> F.lit (mktime, fold-unaware), which can shift by the DST
    # transition width on non-UTC hosts and row-level-exclude stored
    # rows that genuinely match (r9 review finding).  Dates and other
    # atomic types round-trip exactly.
    boundable = [
        k for k in key_cols
        if isinstance(full.schema[k].dataType, AtomicType)
        and not isinstance(
            full.schema[k].dataType, (TimestampType, TimestampNTZType)
        )
    ]
    stats = src.agg(
        F.count("*").alias("__n"),
        F.count_distinct(*[F.col(k) for k in uniq]).alias("__nk"),
        *[F.count(F.col(c)).alias(f"__nn_{c}") for c in uniq],
        *[
            x for k in boundable
            for x in (F.min(k).alias(f"__lo_{k}"),
                      F.max(k).alias(f"__hi_{k}"))
        ],
    ).first()
    n_src, n_keys = stats["__n"], stats["__nk"]
    nulled = [c for c in uniq if stats[f"__nn_{c}"] != n_src]
    if n_src and nulled:
        # count_distinct silently drops tuples containing NULL, which
        # would surface as a bogus "duplicate keys" error; and a NULL
        # key/sequence has no meaningful match/ordering anyway
        raise ValueError(
            f"source has NULLs in {nulled} — keys and the latest_by "
            "sequence must be non-null"
        )
    if n_src == 0 and not not_matched_by_source_delete:
        # an EMPTY source with the NOT MATCHED BY SOURCE clause is a
        # legitimate full wipe (sync to an empty snapshot) and falls
        # through; without it there is nothing to do
        v = current_version(path)
        return {
            "files_rewritten": 0,
            "files_added": 0,
            "rows_after_in_rewritten": 0,
            "inserted_only": True,
            "version": v,
            "pre_version": v,
        }
    if n_keys != n_src:
        if latest_by is None:
            raise ValueError(
                f"source has duplicate keys on {key_cols} ({n_src} rows, "
                f"{n_keys} distinct) — each target row must match at most "
                "one source row, or pass latest_by= for latest-wins "
                "resolution"
            )
        raise ValueError(
            f"source has duplicate ({key_cols}, {latest_by}) tuples "
            f"({n_src} rows, {n_keys} distinct) — the latest-wins winner "
            "would be nondeterministic"
        )
    if latest_by is not None:
        # intra-source resolution first: only each key's newest row
        # participates (the rest could never win)
        ws = Window.partitionBy(*key_cols).orderBy(F.col(latest_by).desc())
        src = (
            src.withColumn("__rn", F.row_number().over(ws))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    # phase 1: affected-file discovery on a key-pruned relation — at
    # 100 TB this scan moves only the key (+ sequence) columns and a
    # file name.  With latest_by, the batch is first pruned to rows
    # that can actually WIN (src seq >= the key's stored max — ties go
    # to the source): a losing row must not mark files affected (an
    # all-stale replayed CDC batch then rewrites nothing) and must not
    # reach phase 2 at all — unioned in naively, a loser whose stored
    # winner sits in an UNAFFECTED file would insert as a duplicate.
    slim_cols = key_cols if latest_by is None else [*key_cols, latest_by]
    slim = _discovery_scan(spark, path, table, fc, columns=slim_cols)
    # merge file pruning: rows outside the source's per-key-column
    # [min, max] box can't match any source key — with pushdown the
    # planner drops whole files on their stats, and the filter is a
    # plain re-applied predicate otherwise (never wrong, only unpruned).
    # Both discovery actions (stored_max, hits) share the SAME filters,
    # so the DSv2 readInfo reuse stays consistent.
    for k in boundable:
        lo, hi = stats[f"__lo_{k}"], stats[f"__hi_{k}"]
        if lo is not None and hi is not None:
            slim = slim.filter(
                (F.col(k) >= F.lit(lo)) & (F.col(k) <= F.lit(hi))
            )
    if latest_by is not None:
        stored_max = slim.groupBy(*key_cols).agg(
            F.max(latest_by).alias("__max_seq")
        )
        src = (
            src.join(stored_max, key_cols, "left")
            .filter(
                F.col("__max_seq").isNull()
                | (F.col(latest_by) >= F.col("__max_seq"))
            )
            .drop("__max_seq")
        )
        # TOMBSTONE RETENTION: a winning delete removes the row, so its
        # sequence vanishes from the table — without a retained floor,
        # an out-of-order update REPLAYED IN A LATER BATCH would look
        # brand-new and resurrect the key (found by the batch-boundary
        # property test).  Retained tombstone maxima prune such updates
        # exactly like stored rows do; a genuine later update (seq
        # above the tombstone) still resurrects.  The floor applies to
        # EVERY sequenced merge once the sidecar exists — not only to
        # batches that carry delete_col themselves, or a delete-free
        # replay batch would slip past it (fourth-review finding).
        tomb = _read_tombstones(spark, path, key_cols)
        if tomb is not None:
            tmax = tomb.groupBy(*key_cols).agg(
                F.max("__seq").alias("__tomb_seq")
            )
            src = (
                src.join(tmax, key_cols, "left")
                .filter(
                    F.col("__tomb_seq").isNull()
                    | (F.col(latest_by) > F.col("__tomb_seq"))
                )
                .drop("__tomb_seq")
            )
    hits = slim.join(src.select(*key_cols), key_cols, "left_semi")
    affected = sorted(
        r[0] for r in hits.select(fc).distinct().collect()
    )
    if not_matched_by_source_delete:
        # the NMBS leg affects every file holding an UNMATCHED row that
        # passes the clause condition — discovered on its own
        # full-column relation (the condition may reference any target
        # column; the source-bounds filter above must NOT apply: keys
        # outside the source's range are precisely the unmatched ones)
        anti = _discovery_scan(spark, path, table, fc).join(
            src.select(*key_cols), key_cols, "left_anti"
        )
        if not_matched_by_source_condition is not None:
            anti = anti.filter(F.expr(not_matched_by_source_condition))
        nmbs_files = [r[0] for r in anti.select(fc).distinct().collect()]
        affected = sorted(set(affected) | set(nmbs_files))
    pre_version = current_version(path)
    _test_hook("serializable_window")
    precommit = None
    if isolation == "serializable":
        # the merge's read set: rows whose keys the source touches —
        # or, under NOT MATCHED BY SOURCE, EVERY target row (absent
        # keys get deleted), where any concurrent append conflicts
        if not_matched_by_source_delete:
            def _conflicts(files):  # noqa: ARG001 — any append conflicts
                return bool(files)
        else:
            _keys_df = src.select(*key_cols).distinct()

            def _conflicts(files):
                df = (
                    spark.read.format("olive").option("table", table)
                    .option("files", ",".join(files)).load(path)
                )
                return bool(
                    df.join(_keys_df, key_cols, "left_semi")
                    .limit(1).count() > 0
                )
        precommit = _serializable_precommit(spark, path, v0, _conflicts)
    if not affected:
        # pure insert: a plain append commit (its own snapshot entry).
        # The batch may have shrunk (intra-source dedup, all-stale rows
        # dropped, unmatched tombstones — deleting a row that does not
        # exist is a no-op, never an insert) — count what actually
        # lands; an entirely-shrunk batch is a clean no-op, not an
        # empty commit.
        ins = src
        tomb_stage = None
        persisted = None
        if delete_col is not None:
            # one materialization of the pruned batch (persist — the
            # lineage re-runs the stored-max + floor joins otherwise),
            # splitting inserts from tombstones-to-retain (staged
            # EXECUTOR-SIDE — sequences never funnel through the driver)
            persisted = src.persist()
            if latest_by is not None:
                # even with nothing to delete, the tombstone's
                # sequence must floor future out-of-order updates
                tomb_stage = _stage_tombstones(
                    persisted.filter(F.col("__del"))
                    .select(*key_cols, F.col(latest_by).alias("__seq")),
                    path, uuid.uuid4().hex[:8],
                )
            ins = persisted.filter(~F.col("__del")).drop("__del")
            n_insert = ins.count()
        else:
            n_insert = src.count() if latest_by is not None else n_src
        try:
            if n_insert == 0:
                _activate_tombstones(spark, path, tomb_stage, key_cols)
                return {
                    "files_rewritten": 0,
                    "files_added": 0,
                    "rows_after_in_rewritten": 0,
                    "inserted_only": True,
                    "version": pre_version,
                    "pre_version": pre_version,
                }
            before_files = set(_list_chunk_files(path))
            layout = _partition_layout(path)
            if layout:
                # co-locate derived dir values so the partitioned
                # append emits bounded files per directory, not one
                # per (task, value)
                ins = ins.repartition(*layout["shape"])
            iw = ins.write.format("olive").option("table", table)
            if layout:  # inserts land inside their key=value dirs
                iw = iw.option("partitionBy", layout["spec"])
            if commit_tag is not None:
                iw = iw.option("commitTag", commit_tag)
            if new_cols:  # sidecar BEFORE data: see _seed_evolved_sidecar
                _seed_evolved_sidecar(path, table, src.schema, new_cols)
            if precommit is not None:
                # pure-insert commits ride the plain append protocol
                # (no staged swap to gate), so the serializable check
                # runs immediately before the write — the residual
                # window is the append commit itself, documented
                precommit()
            iw.mode("append").save(path)
            added = [
                f for f in _list_chunk_files(path) if f not in before_files
            ]
            if new_cols and added:
                _update_schema_sidecar(path, table, added[0])
            _activate_tombstones(spark, path, tomb_stage, key_cols)
            return {
                "files_rewritten": 0,
                "files_added": len(added),
                "rows_after_in_rewritten": n_insert,
                "inserted_only": True,
                "version": current_version(path),
                "pre_version": pre_version,
            }
        finally:
            if persisted is not None:
                persisted.unpersist()
    # phase 2: resolve the merge over the affected files.  Every
    # surviving TARGET row carries its provenance (__file, __pos raw
    # grid position) through the resolution; a target row that does NOT
    # survive is "dying" — the per-file dying set is what either
    # becomes a deletion vector (merge-on-read, small fractions) or
    # drives the copy-on-write rewrite, decided per file below.
    pc = "_olive_pos"
    tagged = (
        spark.read.format("olive")
        .option("table", table)
        .option("fileColumn", fc)
        .option("posColumn", pc)
        .load(path)
    )
    existing = (
        tagged.filter(F.col(fc).isin(affected))
        .withColumnRenamed(fc, "__file")
        .withColumnRenamed(pc, "__pos")
    )
    for c in new_cols:
        # evolution: pre-evolution rows in rewritten files get NULL for
        # the new columns (untouched files null-fill at read instead)
        existing = existing.withColumn(
            c, F.lit(None).cast(src.schema[c].dataType)
        )
    new_tombs = None
    # WHEN NOT MATCHED BY SOURCE THEN DELETE: unmatched target rows
    # where the clause condition holds (unconditional when absent) do
    # not survive; NULL condition keeps the row (SQL DELETE semantics)
    if not_matched_by_source_delete:
        nmbs_keep = ~F.coalesce(
            F.expr(not_matched_by_source_condition)
            if not_matched_by_source_condition is not None
            else F.lit(True),
            F.lit(False),
        )
    else:
        nmbs_keep = None
    if update_condition is not None or delete_condition is not None:
        # WHEN MATCHED AND <cond> THEN DELETE / THEN UPDATE, judged per
        # target row, delete leg first (fixed clause order, like
        # writing Delta's whenMatchedDelete before whenMatchedUpdate).
        # Split first so the pair join touches only matched rows; the
        # conditions see the full (t, s) pair.
        skeys = src.select(*key_cols)
        unmatched_t = existing.join(skeys, key_cols, "left_anti")
        if nmbs_keep is not None:
            unmatched_t = unmatched_t.filter(nmbs_keep)
        matched_t = existing.join(skeys, key_cols, "left_semi")
        on = functools.reduce(
            operator.and_,
            [F.col(f"t.{k}") == F.col(f"s.{k}") for k in key_cols],
        )
        pairs = matched_t.alias("t").join(src.alias("s"), on, "inner")
        del_holds = (
            F.coalesce(F.expr(delete_condition), F.lit(False))
            if delete_condition is not None else F.lit(False)
        )
        # no update_condition = the standard unconditional UPDATE leg
        # for whatever the delete leg did not consume
        upd_holds = ~del_holds & (
            F.coalesce(F.expr(update_condition), F.lit(False))
            if update_condition is not None else F.lit(True)
        )
        kept_t = pairs.filter(~del_holds & ~upd_holds).select(
            *[F.col(f"t.{c}").alias(c) for c in all_cols],
            F.col("t.__file").alias("__file"),
            F.col("t.__pos").alias("__pos"),
        )
        replaced_keys = (
            pairs.filter(upd_holds)
            .select(*[F.col(f"t.{k}").alias(k) for k in key_cols])
            .distinct()
        )
        # a matched source row lands iff it replaced >= 1 target row;
        # unmatched source rows are the WHEN NOT MATCHED inserts
        # (affected files contain every matched key, so anti-joining
        # `existing`'s keys is exact)
        inserts = src.join(existing.select(*key_cols), key_cols, "left_anti")
        src_landing = src.join(
            replaced_keys, key_cols, "left_semi"
        ).unionByName(inserts)
        # source-landed rows have no provenance (allowMissingColumns
        # null-fills __file/__pos) — they are the rows to WRITE
        merged = unmatched_t.unionByName(kept_t).unionByName(
            src_landing, allowMissingColumns=True
        )
    elif latest_by is None:
        # matched keys vanish via the anti-join; only non-tombstone
        # source rows come back (a matched tombstone = WHEN MATCHED
        # THEN DELETE)
        live_src = (
            src.filter(~F.col("__del")).drop("__del")
            if delete_col is not None else src
        )
        unmatched_t = existing.join(
            src.select(*key_cols), key_cols, "left_anti"
        )
        if nmbs_keep is not None:
            unmatched_t = unmatched_t.filter(nmbs_keep)
        merged = unmatched_t.unionByName(
            live_src, allowMissingColumns=True
        )
    else:
        # latest-wins: per SOURCE-TOUCHED key, the greatest latest_by
        # among existing + incoming survives (equal sequence prefers
        # the incoming row).  Bystander rows — keys in an affected file
        # the source never mentioned — pass through untouched: ranking
        # them too would silently collapse legal duplicate-key rows the
        # MERGE was never asked about (r8 second-review finding).
        skeys = src.select(*key_cols)
        bystanders = existing.join(skeys, key_cols, "left_anti")
        contested = existing.join(skeys, key_cols, "left_semi")
        if delete_col is not None:
            contested = contested.withColumn("__del", F.lit(False))
        wm = Window.partitionBy(*key_cols).orderBy(
            F.col(latest_by).desc(), F.col("__src").desc()
        )
        ranked = (
            contested.withColumn("__src", F.lit(0))
            .unionByName(
                src.withColumn("__src", F.lit(1)),
                allowMissingColumns=True,  # src rows: null provenance
            )
            .withColumn("__rn", F.row_number().over(wm))
            .filter(F.col("__rn") == 1)
        )
        if delete_col is not None:
            # a tombstone that WON the resolution deletes the key; its
            # sequence is retained (recorded after the rewrite lands)
            new_tombs = ranked.filter(
                (F.col("__src") == 1) & F.col("__del")
            ).select(*key_cols, F.col(latest_by).alias("__seq"))
            ranked = ranked.filter(~F.col("__del")).drop("__del")
        merged = ranked.drop("__rn", "__src").unionByName(bystanders)
    # persist: the resolved dataset is needed several times (count,
    # dying-set anti-join, the write) — at 100 TB recomputing the
    # scan+anti-join+union each time would multiply the most expensive
    # phase; the persisted set is bounded by touched data
    merged = merged.persist()
    layout = _partition_layout(path)
    try:
        rows = merged.count()
        run = uuid.uuid4().hex[:8]
        tomb_stage = None
        if new_tombs is not None:
            # MATERIALIZE before the swap: the lineage scans the
            # affected originals, which the swap is about to retire — a
            # lazy plan executed afterwards would re-read a different
            # table (fourth-review finding).  Staged EXECUTOR-SIDE into
            # a dot-subdir of the sidecar (pre-r10 this collected every
            # winning delete to the driver — a full-table CDC purge
            # batch funneled through one process); activated only
            # after the rewrite lands.
            tomb_stage = _stage_tombstones(new_tombs, path, run)
        dv_files: list[str] = []
        dv_add: list[tuple[str, str]] = []
        if strategy == "rewrite":
            # exact pre-r10 copy-on-write behavior, no dying-set job
            rw_files = list(affected)
        else:
            # DYING set: target rows of affected files that did NOT
            # survive the resolution — exactly what a deletion vector
            # can mask.  One slim scan (a single key column rides along
            # for validity; fc/pos are synthesized) anti-joined against
            # the survivors' provenance; both sides bounded by touched
            # data.
            aff_pos = (
                spark.read.format("olive")
                .option("table", table)
                .option("fileColumn", fc)
                .option("posColumn", pc)
                .option("columns", key_cols[0])
                .option("files", ",".join(affected))
                .load(path)
                .select(F.col(fc), F.col(pc))
            )
            survivors_pos = (
                merged.filter(F.col("__file").isNotNull())
                .select(
                    F.col("__file").alias(fc), F.col("__pos").alias(pc)
                )
            )
            dying = aff_pos.join(survivors_pos, [fc, pc], "left_anti")
            dying_counts = {
                r[0]: int(r[1])
                for r in dying.groupBy(fc).count().collect()
            }
            # per-file strategy: a file none of whose rows die is left
            # untouched entirely (bytes, stats, and indexes survive);
            # small dying fractions get a DV; the rest rewrite
            if strategy == "dv":
                dv_files = [f for f in affected if dying_counts.get(f)]
                rw_files = []
            else:
                from olive_spark.format.manifest import load_manifest

                man = load_manifest(path) if os.path.isdir(path) else {}
                rw_files = []
                for rel in affected:
                    d = dying_counts.get(rel, 0)
                    if d == 0:
                        continue
                    total = _file_rows(path, rel, table, man)
                    if total and d <= dv_threshold * total:
                        dv_files.append(rel)
                    else:
                        rw_files.append(rel)
            if dv_files:
                staged = _stage_dv_positions(
                    dying.filter(F.col(fc).isin(dv_files)), fc, pc,
                    path, run, table=table,
                )
                dv_add = [(f, dv) for f, dv, _n in staged]
        # the write set: every source-landed row (null provenance) plus
        # survivors of rewrite-classed files; DV-classed and untouched
        # files keep their survivors in place
        rewrite_df = merged.filter(
            F.col("__file").isNull()
            | (F.col("__file").isin(rw_files) if rw_files else F.lit(False))
        ).drop("__file", "__pos")
        rw_rows = rewrite_df.count()
        if rw_rows == 0 and not rw_files and not dv_add:
            # nothing changed anywhere (every matched row failed its
            # condition): clean no-op, no commit
            _activate_tombstones(spark, path, tomb_stage, key_cols)
            return {
                "files_rewritten": 0,
                "files_added": 0,
                "files_dv": 0,
                "rows_after_in_rewritten": 0,
                "inserted_only": False,
                "version": pre_version,
                "pre_version": pre_version,
            }
        if new_cols:  # sidecar BEFORE data: see _seed_evolved_sidecar
            _seed_evolved_sidecar(path, table, src.schema, new_cols)
        from olive_spark.datasource.olive_datasource import _list_chunk_files

        wipe_all = (
            rw_rows == 0 and not dv_files
            and len(rw_files) >= len(_list_chunk_files(path))
        )
        n_files = max(1, math.ceil(rw_rows / target_rows))
        finals = _rewrite_and_swap(
            _shape_for_write(rewrite_df, n_files, layout)
            if (rw_rows or wipe_all) else None,
            path, rw_files, run,
            table=table, target_rows=target_rows,
            retain_history=retain_history, prefix="merge",
            layout=layout, commit_tag=commit_tag, precommit=precommit,
            empty=(rw_rows == 0 and not wipe_all),
            dv_add=dv_add,
            op_params={"keys": list(key_cols)},
        )
        if new_cols and finals:
            _update_schema_sidecar(
                path, table, os.path.join(path, finals[0])
            )
        _activate_tombstones(spark, path, tomb_stage, key_cols)
    finally:
        merged.unpersist()
    return {
        "files_rewritten": len(rw_files),
        "files_added": len(finals),
        "files_dv": len(dv_files),
        "rows_after_in_rewritten": rows,
        "inserted_only": False,
        "version": current_version(path),
        "pre_version": pre_version,
    }


def _file_rows(path: str, rel: str, table: str, man: dict) -> "int | None":
    """Raw row count of one chunk file: manifest entry first (no file
    open), header fallback.  None when neither is readable."""
    from olive_spark.format.manifest import lookup

    ent = lookup(man, path, os.path.join(path, rel))
    rows = ent.get("rows") if isinstance(ent, dict) else None
    if isinstance(rows, int):
        return rows
    try:
        from olive_spark.datasource.olive_datasource import (
            _pick_table,
            _read_header_bytes,
        )

        header, _ = _read_header_bytes(os.path.join(path, rel))
        return _pick_table(header, table).num_rows
    except Exception:  # noqa: BLE001 — unknown size: caller rewrites
        return None


def _stage_dv_positions(
    positions_df, fc: str, pc: str, path: str, run: str,
    table: "str | None" = None,
) -> "list[tuple[str, str, int]]":
    """Stage one deletion vector per distinct file of ``positions_df``
    (a (file rel, raw position) relation) — written straight from
    executors (the position list never funnels through the driver;
    only (file, dv_name, count) triples come back).  Positions are raw
    row-grid indices from a ``posColumn`` scan that folds existing DVs
    first, so a new DV never re-marks an already-deleted row and DV
    files compose by plain union (format/deletion.py)."""

    def write_group(pdf):
        import os as _os

        import numpy as _np
        import pandas as _pd

        from olive_spark.format import deletion as _D

        rel = pdf[fc].iloc[0]
        dv_rel = _os.path.join(_D.DV_DIR, rel, f"{run}.dv")
        dest = _os.path.join(path, dv_rel) + ".staging"
        _os.makedirs(_os.path.dirname(dest), exist_ok=True)
        blob = _D.encode_dv(rel, pdf[pc].to_numpy(_np.uint64), table=table)
        with open(dest, "wb") as f:
            f.write(blob)
        return _pd.DataFrame(
            {"file": [rel], "dv": [dv_rel], "n": [len(pdf)]}
        )

    out = (
        positions_df.groupBy(fc)
        .applyInPandas(write_group, "file string, dv string, n long")
        .collect()  # one slim row per affected file, never positions
    )
    return [(r["file"], r["dv"], int(r["n"])) for r in out]


# ---- opt-in Serializable isolation (r11 verdict task #6) ---------------

#: test-only hooks: {"serializable_window": callable} runs between a
#: mutation's snapshot read and its conflict check, so tests can land a
#: real concurrent append inside the race window.  Production never
#: sets these.
_TEST_HOOKS: dict = {}


def _test_hook(name: str) -> None:
    hook = _TEST_HOOKS.get(name)
    if hook is not None:
        hook()


def _appended_since(path: str, v0: int) -> "list[str]":
    """Relative names of files ADDED by snapshot versions > v0 that are
    still live — the mutation's unread write set."""
    from olive_spark.format.snapshots import load_log

    out: list[str] = []
    for e in load_log(path).get("entries", []):
        if int(e.get("v", 0)) > v0:
            out.extend(e.get("add") or [])
    return [r for r in out if os.path.exists(os.path.join(path, r))]


def _serializable_precommit(spark, path: str, v0: int, conflicts):
    """Serializable isolation for mutations (Delta's Serializable
    level; the engine default stays WriteSerializable — SURVEY §2):
    the mutation read snapshot version ``v0``; any append committed
    after it whose rows intersect the mutation's read predicate makes
    the actual schedule non-equivalent to every serial order (the
    append precedes the mutation in the log, yet the mutation ignored
    its rows) — abort loudly, visible-state untouched.

    Two phases so the commit micro-lock never spans a Spark job:

    1. EXACT, outside the lock: scan ONLY the files appended in
       (v0, now] and evaluate the real predicate (``conflicts``, one
       slim limit-1 job).  A match raises ``SerializableConflict``.
    2. CONSERVATIVE, returned as the precommit callable that
       _rewrite_and_swap runs UNDER the commit lock: any append that
       landed after phase 1's re-read conflicts outright (no stats
       guessing under the lock — the window is milliseconds, so a hit
       means a genuinely racing writer; re-run the mutation).
    """
    from olive_spark.format.errors import SerializableConflict
    from olive_spark.format.snapshots import current_version

    new = _appended_since(path, v0)
    if new and conflicts(new):
        raise SerializableConflict(
            f"serializable conflict on {path}: a concurrent append "
            f"committed rows matching this mutation's predicate after "
            f"its snapshot read (v{v0}; files {new[:4]}"
            + ("..." if len(new) > 4 else "")
            + ") — nothing was changed; re-run the mutation"
        )
    v1 = current_version(path)

    def precommit_locked() -> None:
        late = _appended_since(path, v1)
        if late:
            raise SerializableConflict(
                f"serializable conflict on {path}: appends {late[:4]} "
                f"landed inside the commit window (after v{v1}) — "
                "nothing was changed; re-run the mutation"
            )

    return precommit_locked


def _condition_conflicts(spark, path: str, table: str, condition: str):
    """conflicts(files) for WHERE-predicate mutations: do the appended
    files hold ANY row matching ``condition``?  Exact — scans only
    those files, stops at the first hit."""
    from pyspark.sql import functions as F

    def conflicts(files: "list[str]") -> bool:
        df = (
            spark.read.format("olive").option("table", table)
            .option("files", ",".join(files)).load(path)
        )
        return bool(
            df.filter(F.expr(condition)).limit(1).count() > 0
        )

    return conflicts


def _cond_columns(condition: str, cols: "list[str]") -> "list[str] | None":
    """Columns of ``cols`` a WHERE-string can possibly reference, by
    word-boundary token match — the slim projection for discovery scans
    (the Python DS API has no required-columns pushdown, so without an
    explicit ``columns`` option a discovery scan decompresses EVERY
    column of every affected file just to evaluate a one-column
    predicate).  Over-inclusion is only a wider read, so matching is
    conservative; any column name that is not a plain identifier (or a
    condition that could hide a reference from the regex, e.g. via
    backquotes) disables slimming entirely (returns None → full
    width)."""
    import re

    if any(not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c) for c in cols):
        return None
    if "`" in condition:
        return None
    toks = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", condition))
    hit = [c for c in cols if c in toks]
    return hit or None


def _discover_and_stage_dvs(
    spark, path: str, table: str, condition: str, run: str,
    mode: str, dv_threshold: float,
) -> "list[tuple[str, str | None, int]]":
    """Fused discovery + DV staging for predicate mutations (modes
    auto/dv): ONE slim scan finds the affected files AND stages each
    file's candidate deletion vector executor-side, instead of the old
    discovery-count pass followed by a second posColumn scan of the
    affected files (two full reads of every affected file → one; at
    100 TB the affected files' bytes cross the NIC once).  Projects
    only the predicate's columns (see _cond_columns).

    Returns [(file_rel, dv_rel | None, n_matched)] sorted by file; a
    None dv means the file classified copy-on-write (mode "auto",
    matched fraction > ``dv_threshold`` or unknown total) and nothing
    was staged for it.  The classification runs executor-side against
    the same manifest totals (+ size validation, like manifest.lookup)
    and header fallback the driver-side _file_rows used, so the
    dv/rewrite split matches the unfused path.

    No shuffle at all (guide §2.4): scan partitions bin-pack WHOLE
    files (_pack_files), so every file's matching positions are already
    co-located in one partition — a mapInArrow groups them in place and
    writes each DV where the rows sit, where the old _write_dvs_for
    path shuffled (file, pos) pairs into a grouped-map.  Staged blobs
    are invisible until _rewrite_and_swap publishes them; abandoned
    ``.dv.staging`` files are vacuum-swept debris."""
    from pyspark.sql import functions as F

    fc, pc = "_olive_file", "_olive_pos"
    r = (
        spark.read.format("olive")
        .option("table", table)
        .option("fileColumn", fc)
        .option("posColumn", pc)
    )
    try:
        if str(spark.conf.get(
            "spark.sql.python.filterPushdown.enabled", "false"
        )).lower() == "true":
            r = r.option("pushdown", "true")
    except Exception:  # noqa: BLE001 — conf shape differs on Connect
        pass
    probe_cols = _table_columns_local(path, table)
    slim = _cond_columns(condition, probe_cols) if probe_cols else None
    if slim:
        r = r.option("columns", ",".join(slim))
    scan = r.load(path)
    want_dv = mode == "dv"
    thr = float(dv_threshold)
    # totals ride a broadcast (one manifest parse on the driver, shipped
    # once per executor) so the grouped-map UDF stays import-light — an
    # executor-side `ops.maintenance` import would drag this whole
    # module into every pandas worker
    totals: dict = {}
    if not want_dv:
        try:
            from olive_spark.format.manifest import load_manifest

            for rel, ent in (load_manifest(path) or {}).items():
                rows = ent.get("rows") if isinstance(ent, dict) else None
                if isinstance(rows, int):
                    # (rows, recorded size): the UDF validates size on
                    # disk like manifest.lookup, so stale entries fall
                    # back to the header exactly as _file_rows does
                    totals[rel] = (rows, ent.get("size"))
        except Exception:  # noqa: BLE001 — header fallback executor-side
            pass
    bc_totals = spark.sparkContext.broadcast(totals)

    def stage_partition(batches):
        import os as _os

        import numpy as _np
        import pyarrow as _pa

        from olive_spark.format import deletion as _D

        by_file: dict = {}
        for b in batches:
            files = b.column(0).to_pylist()
            pos = b.column(1).to_numpy(zero_copy_only=False)
            if files and files.count(files[0]) == len(files):
                by_file.setdefault(files[0], []).append(pos)
                continue
            order = _np.argsort(files, kind="stable")
            farr = _np.asarray(files, dtype=object)[order]
            parr = pos[order]
            bounds = _np.flatnonzero(farr[1:] != farr[:-1]) + 1
            for chunk_f, chunk_p in zip(
                _np.split(farr, bounds), _np.split(parr, bounds)
            ):
                by_file.setdefault(chunk_f[0], []).append(chunk_p)
        out_f, out_dv, out_n = [], [], []
        for rel, plist in by_file.items():
            positions = _np.concatenate(plist) if len(plist) > 1 else plist[0]
            n = int(positions.size)
            dv_rel = None
            write = True
            if not want_dv:
                hit = bc_totals.value.get(rel)
                total = None
                if hit is not None:
                    rows_, size_ = hit
                    try:
                        if _os.path.getsize(
                            _os.path.join(path, rel)
                        ) == size_:
                            total = rows_
                    except OSError:
                        total = None
                if total is None:
                    try:  # no manifest row count: the file's own header
                        from olive_spark.datasource.olive_datasource import (
                            _pick_table,
                            _read_header_bytes,
                        )

                        header, _ = _read_header_bytes(
                            _os.path.join(path, rel)
                        )
                        total = _pick_table(header, table).num_rows
                    except Exception:  # noqa: BLE001 — unknown: rewrite
                        total = None
                write = bool(total) and n <= thr * total
            if write:
                dv_rel = _os.path.join(_D.DV_DIR, rel, f"{run}.dv")
                dest = _os.path.join(path, dv_rel) + ".staging"
                _os.makedirs(_os.path.dirname(dest), exist_ok=True)
                blob = _D.encode_dv(
                    rel, positions.astype(_np.uint64), table=table
                )
                with open(dest, "wb") as f:
                    f.write(blob)
            out_f.append(rel)
            out_dv.append(dv_rel)
            out_n.append(n)
        if out_f:
            yield _pa.record_batch(
                [
                    _pa.array(out_f, _pa.string()),
                    _pa.array(out_dv, _pa.string()),
                    _pa.array(out_n, _pa.int64()),
                ],
                names=["file", "dv", "n"],
            )

    out = (
        scan.filter(F.expr(condition)).select(fc, pc)
        .mapInArrow(stage_partition, "file string, dv string, n long")
        .collect()  # one slim row per affected file, never positions
    )
    return sorted(
        ((r["file"], r["dv"], int(r["n"])) for r in out),
        key=lambda t: t[0],
    )


def _live_rows_local(
    path: str, rels: "list[str]", table: str
) -> "int | None":
    """Total LIVE rows (raw minus deletion-vector-masked) of ``rels``
    from metadata alone — manifest/header row counts + the live DV
    state's position unions; no Spark job.  None when any count is
    unknowable (caller falls back to a counting action).  Lets the
    rewrite legs size their output files without a persist+count pass
    over the survivors (guide §5: at 100 TB that pass CACHES the whole
    rewrite set just to learn a number the metadata already knows)."""
    from olive_spark.format import deletion as D
    from olive_spark.format.manifest import load_manifest

    try:
        man = load_manifest(path) if os.path.isdir(path) else {}
        dvs = D.list_dvs(path)
    except Exception:  # noqa: BLE001 — unreadable metadata: count
        return None
    total = 0
    for rel in rels:
        raw = _file_rows(path, rel, table, man)
        if raw is None:
            return None
        dead = 0
        names = dvs.get(rel)
        if names:
            try:
                dead = int(
                    D.union_positions(
                        D.resolve_dv_paths(path, names), table
                    ).size
                )
            except Exception:  # noqa: BLE001 — undecodable DV: count
                return None
        if dead > raw:
            return None
        total += raw - dead
    return total


def _discard_staged_dvs(path: str, dv_add: "list[tuple[str, str]]") -> None:
    """Best-effort unlink of staged-but-unpublished DV blobs (abort
    paths); leftovers are inert ``.dv.staging`` debris vacuum sweeps."""
    for _f, dv_rel in dv_add:
        try:
            os.remove(os.path.join(path, dv_rel) + ".staging")
        except OSError:
            pass


def _table_columns_local(path: str, table: str) -> "list[str] | None":
    """Column names of ``table`` from the first live chunk file's
    header — pure local I/O, no Spark relation (used to slim discovery
    projections).  None when anything is unreadable (callers then scan
    full width, never fail here)."""
    try:
        from olive_spark.datasource.olive_datasource import (
            _list_chunk_files,
            _pick_table,
            _read_header_bytes,
        )

        files = _list_chunk_files(path)
        if not files:
            return None
        header, _ = _read_header_bytes(files[0])
        th = _pick_table(header, table)
        return list(th.field_names)
    except Exception:  # noqa: BLE001 — any doubt: full-width scan
        return None


def _write_dvs_for(
    spark, path: str, table: str, condition: str,
    dv_files: "list[str]", run: str,
) -> "list[tuple[str, str, int]]":
    """delete_where's DV leg: positions of rows matching ``condition``
    in ``dv_files``, staged executor-side via _stage_dv_positions."""
    from pyspark.sql import functions as F

    fc, pc = "_olive_file", "_olive_pos"
    scan = (
        spark.read.format("olive")
        .option("table", table)
        .option("fileColumn", fc)
        .option("posColumn", pc)
        .option("files", ",".join(dv_files))
        .load(path)
    )
    return _stage_dv_positions(
        scan.filter(F.expr(condition)).select(fc, pc), fc, pc, path, run,
        table=table,
    )


@_locked(1, heal_txns=True)
def delete_where(
    spark,
    path: str,
    condition: str,
    table: str = "data",
    retain_history: bool = True,
    target_rows: int = 1 << 20,
    mode: str = "auto",
    dv_threshold: float = 0.2,
    isolation: str = "write_serializable",
) -> dict:
    """``DELETE FROM ... WHERE condition`` on a snapshot-logged olive
    table (SQL expression string; NULL condition keeps the row, per SQL
    DELETE semantics).  Two physical strategies per affected file:

    - **merge-on-read (deletion vector)**: a tiny ``_olive_dv/`` sidecar
      records the deleted row POSITIONS; the file's bytes are untouched
      and scans fold the positions out (format/deletion.py).  Write
      cost ∝ deleted rows, not file size — the Delta-DV / Iceberg-
      positional-delete shape a trickle-delete workload needs at 100 TB
      (a 1-row delete no longer rewrites a 1 GiB file).
    - **copy-on-write (rewrite)**: the file is rewritten without the
      matching rows, as before.  Right when most of a file dies — a DV
      masking 90% of a file leaves 90% dead bytes every scan still
      pages through until ``compact`` materializes them.

    ``mode``: "auto" (default) picks PER FILE by deleted fraction —
    files where matched/total ≤ ``dv_threshold`` get a DV, the rest
    rewrite; "dv" forces DVs; "rewrite" forces the classic rewrite.
    Either way the whole delete lands as ONE snapshot version (DV adds
    and file swaps share the commit), ``retain_history=True`` keeps the
    pre-delete version readable via ``.option("snapshot", N)``, and
    ``compact`` later materializes DVs (its folding scan never sees the
    deleted rows, and retiring the originals retires their DVs).

    100 TB shape: discovery is a scan + filter + count over file names
    (stats/Bloom-pruned where the condition allows), collecting only
    FILE NAMES + counts; DV positions are written straight from
    executors; rewrites touch only rewrite-classed files.  Same
    single-writer contract as :func:`compact`; partitioned layouts are
    preserved.

    ``isolation="serializable"`` (default WriteSerializable, SURVEY §2)
    re-validates the predicate against files appended between this
    delete's snapshot read and its commit and aborts with
    ``SerializableConflict`` when they intersect — see
    :func:`_serializable_precommit`.

    Returns {files_rewritten, files_added, files_dv, rows_deleted,
    version, pre_version}."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import current_version

    if mode not in ("auto", "dv", "rewrite"):
        raise ValueError("mode must be 'auto', 'dv', or 'rewrite'")
    if isolation not in ("write_serializable", "serializable"):
        raise ValueError(
            "isolation must be 'write_serializable' or 'serializable'"
        )
    register_olive(spark)
    _recover_pending(path)
    _seed_snapshot_log(path)
    v0 = current_version(path)
    fc = "_olive_file"
    cond = F.expr(condition)
    run = uuid.uuid4().hex[:8]
    if mode == "rewrite":
        # discovery on its own (possibly pushdown-pruned) relation; the
        # rewrite below uses a FRESH plain relation — re-filtering one
        # pushdown relation with a different predicate risks the DSv2
        # readInfo-reuse hazard (see _discovery_scan).  Projection is
        # slimmed to the predicate's columns (r15, guide §2.3): the
        # count needs nothing else.
        disc = _discovery_scan(
            spark, path, table, fc,
            columns=_cond_columns(
                condition, _table_columns_local(path, table) or []
            ),
        )
        hits = disc.filter(cond).groupBy(fc).count().collect()
        staged = sorted((r[0], None, int(r[1])) for r in hits)
    else:
        # fused discovery + DV staging (r15, guide §1.2/§2.4): one slim
        # scan instead of discovery-count + a second posColumn scan of
        # the affected files; the dv/rewrite split is decided executor-
        # side with the same manifest totals (see _discover_and_stage_dvs)
        staged = _discover_and_stage_dvs(
            spark, path, table, condition, run, mode, dv_threshold
        )
    affected = [f for f, _dv, _n in staged]
    n_deleted = int(sum(n for _f, _dv, n in staged))
    pre_version = current_version(path)
    if not affected:
        return {
            "files_rewritten": 0,
            "files_added": 0,
            "files_dv": 0,
            "rows_deleted": 0,
            "version": pre_version,
            "pre_version": pre_version,
        }
    dv_files = [f for f, dv, _n in staged if dv is not None]
    rw_files = [f for f, dv, _n in staged if dv is None]
    dv_add = [(f, dv) for f, dv, _n in staged if dv is not None]
    _test_hook("serializable_window")
    if isolation == "serializable":
        try:
            precommit = _serializable_precommit(
                spark, path, v0,
                _condition_conflicts(spark, path, table, condition),
            )
        except Exception:
            _discard_staged_dvs(path, dv_add)
            raise
    else:
        precommit = None
    if not rw_files:
        # pure merge-on-read commit: no file moves at all — the swap
        # core still provides the intent manifest + one-version entry
        _rewrite_and_swap(
            None, path, [], run,
            table=table, target_rows=target_rows,
            retain_history=retain_history, prefix="delete",
            layout=None, empty=True, dv_add=dv_add,
            precommit=precommit,
            op_params={"condition": condition, "strategy": "dv"},
        )
        return {
            "files_rewritten": 0,
            "files_added": 0,
            "files_dv": len(dv_files),
            "rows_deleted": n_deleted,
            "version": current_version(path),
            "pre_version": pre_version,
        }
    tagged = (
        spark.read.format("olive")
        .option("table", table)
        .option("fileColumn", fc)
        .load(path)
    )
    survivors = (
        tagged.filter(F.col(fc).isin(rw_files))
        .filter(~F.coalesce(cond, F.lit(False)))
        .drop(fc)
    )
    layout = _partition_layout(path)
    # output sizing from METADATA when possible (r15, guide §5): the
    # survivor count is live rows of the rewrite-classed files minus
    # their matched counts (both already known), so the old
    # persist+count pass — which cached the whole rewrite set to learn
    # one number — is skipped; the write below is then the ONLY scan
    live = _live_rows_local(path, rw_files, table)
    matched_rw = sum(n for f, dv, n in staged if dv is None)
    cached = None
    if live is not None and live - matched_rw >= 0:
        rows = live - matched_rw
    else:
        cached = survivors.persist()
        rows = cached.count()
    try:
        # every row of every affected file deleted: write no
        # replacement (remove-only rewrite) — UNLESS that would empty
        # the whole table, where the zero-row write's schema sentinel
        # is exactly what keeps the directory scannable
        from olive_spark.datasource.olive_datasource import _list_chunk_files

        wipe_all = (
            rows == 0 and not dv_files
            and len(rw_files) >= len(_list_chunk_files(path))
        )
        n_files = max(1, math.ceil(rows / target_rows))
        finals = _rewrite_and_swap(
            _shape_for_write(cached if cached is not None else survivors,
                             n_files, layout),
            path, rw_files,
            run,
            table=table, target_rows=target_rows,
            retain_history=retain_history, prefix="delete",
            layout=layout,
            empty=(rows == 0 and not wipe_all),
            dv_add=dv_add,
            precommit=precommit,
            op_params={"condition": condition},
        )
    finally:
        if cached is not None:
            cached.unpersist()
    return {
        "files_rewritten": len(rw_files),
        "files_added": len(finals),
        "files_dv": len(dv_files),
        "rows_deleted": n_deleted,
        "version": current_version(path),
        "pre_version": pre_version,
    }


@_locked(1)
def replace_where(
    spark,
    path: str,
    source,
    condition: str,
    table: str = "data",
    retain_history: bool = True,
    target_rows: int = 1 << 20,
) -> dict:
    """``INSERT OVERWRITE ... WHERE condition`` (Delta's
    ``replaceWhere``): atomically replace every stored row matching
    ``condition`` with the rows of ``source`` — the
    re-materialize-one-partition verb batch pipelines need (recompute
    yesterday's slice, swap it in).  Pre-r10 this took delete_where +
    append as TWO commits with a torn state between them; here the
    whole replacement is ONE staged-swap snapshot version (the same
    crash-safe core as compact/merge: new files stage invisibly, an
    intent manifest makes recovery finish the swap, old files retire
    after activation).

    Two loud-error guards, both Delta-parity:

    - every ``source`` row must itself satisfy ``condition`` (a row
      outside the replaced region would silently survive the NEXT
      replace of its real region);
    - ``condition`` must be FILE-ALIGNED: every file containing a
      matching row must contain ONLY matching rows (after folding its
      deletion vectors).  On a hive/hidden-partitioned table a
      partition predicate (``ds = '2024-01-01'``, ``grp IN (1,2)``)
      always is; a row-level predicate that straddles files raises
      with the offending files — use delete_where + append (or MERGE)
      for row-level surgery.

    100 TB shape: discovery is one file-name aggregate (directory/
    stats-pruned); validation rides the same counts; the rewrite
    touches only replaced files and the partitioned layout is
    preserved.  Returns {files_replaced, files_added, rows_replaced,
    rows_written, version, pre_version}."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import current_version

    register_olive(spark)
    _recover_pending(path)
    _seed_snapshot_log(path)
    fc = "_olive_file"
    cond = F.expr(condition)
    # guard 1: every source row must satisfy the predicate
    stats = source.agg(
        F.count("*").alias("__n"),
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias("__bad"),
    ).first()
    n_written = int(stats["__n"])
    if int(stats["__bad"]):
        raise ValidationError(
            f"replace_where: {stats['__bad']} of {n_written} source rows "
            f"do not satisfy {condition!r} — rows written outside the "
            "replaced region would silently survive the next replace; "
            "filter the source or widen the predicate"
        )
    # discovery + guard 2 (file alignment): matched rows per file vs the
    # file's LIVE rows (raw rows minus its deletion-vector count)
    hits = (
        _discovery_scan(spark, path, table, fc)
        .filter(cond).groupBy(fc).count().collect()
    )
    matched = {r[0]: int(r[1]) for r in hits}
    affected = sorted(matched)
    pre_version = current_version(path)
    if affected:
        from olive_spark.format.deletion import list_dvs, read_count
        from olive_spark.format.manifest import load_manifest

        man = load_manifest(path) if os.path.isdir(path) else {}
        dv_state = list_dvs(path)
        misaligned = []
        for rel in affected:
            total = _file_rows(path, rel, table, man)
            if total is None:
                misaligned.append((rel, matched[rel], None))
                continue
            live = total - sum(
                read_count(os.path.join(path, n))
                for n in dv_state.get(rel, [])
            )
            if matched[rel] != live:
                misaligned.append((rel, matched[rel], live))
        if misaligned:
            raise ValidationError(
                "replace_where: predicate is not file-aligned — these "
                "files hold BOTH matching and non-matching rows "
                "(file, matched, live): "
                f"{misaligned[:5]}{'...' if len(misaligned) > 5 else ''}; "
                "replaceWhere swaps whole files — use a partition-"
                "aligned predicate, or delete_where + append for "
                "row-level surgery"
            )
    rows_replaced = int(sum(matched.values()))
    layout = _partition_layout(path)
    run = uuid.uuid4().hex[:8]
    n_files = max(1, math.ceil(max(n_written, 1) / target_rows))
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    # replacing every file with nothing: keep the zero-row schema
    # sentinel write so the directory stays scannable (same rule as
    # delete_where's wipe-all)
    wipe_all = (
        n_written == 0 and len(affected) >= len(_list_chunk_files(path))
    )
    finals = _rewrite_and_swap(
        _shape_for_write(source, n_files, layout)
        if (n_written or wipe_all) else None,
        path, affected, run,
        table=table, target_rows=target_rows,
        retain_history=retain_history, prefix="replace",
        layout=layout,
        empty=(n_written == 0 and not wipe_all),
        op_params={"predicate": condition},
    )
    return {
        "files_replaced": len(affected),
        "files_added": len(finals),
        "rows_replaced": rows_replaced,
        "rows_written": n_written,
        "version": current_version(path),
        "pre_version": pre_version,
    }


@_locked(1)
def update_where(
    spark,
    path: str,
    set_exprs: "dict[str, str]",
    condition: str,
    table: str = "data",
    retain_history: bool = True,
    target_rows: int = 1 << 20,
    mode: str = "auto",
    dv_threshold: float = 0.2,
    isolation: str = "write_serializable",
) -> dict:
    """``UPDATE … SET col = expr, … WHERE condition`` on a
    snapshot-logged olive table — the predicate-UPDATE sibling of
    :func:`delete_where` (keyed updates go through
    :func:`merge_upsert`).  Per affected file, either a copy-on-write
    rewrite (non-matching rows pass through byte-equal) or — ``mode``
    "auto"/"dv", matched fraction ≤ ``dv_threshold`` — MERGE-ON-READ:
    the matched rows' positions land in a deletion-vector sidecar and
    their UPDATED copies append as new rows, so a 1-row update of a
    1 GiB file writes bytes ∝ the update, not the file
    (format/deletion.py; the Delta-DV update shape).  Untouched files
    keep their bytes, stats, and indexes either way; the whole update
    is ONE snapshot version (DV adds + file swaps + appended copies
    share the commit); ``retain_history=True`` keeps the pre-update
    version readable.

    SQL UPDATE semantics, deliberately: every SET expression sees the
    ORIGINAL row (simultaneous assignment — ``{"a": "b", "b": "a"}``
    swaps), and a NULL condition leaves the row unchanged.  A SET
    expression whose type differs from the column's is rejected (cast
    explicitly) — the same no-silent-casts rule as MERGE.

    100 TB shape: discovery is one file-name aggregate over a scan the
    condition prunes via stats/Bloom where possible; the rewrite
    touches only affected files and preserves hive layouts.  Same
    single-writer contract as :func:`compact`.

    ``isolation="serializable"``: as in :func:`delete_where`.

    Returns {files_rewritten, files_added, rows_updated, version,
    pre_version}."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import current_version

    if not set_exprs:
        raise ValueError("set_exprs must be non-empty")
    if mode not in ("auto", "dv", "rewrite"):
        raise ValueError("mode must be 'auto', 'dv', or 'rewrite'")
    if isolation not in ("write_serializable", "serializable"):
        raise ValueError(
            "isolation must be 'write_serializable' or 'serializable'"
        )
    register_olive(spark)
    _recover_pending(path)
    _seed_snapshot_log(path)
    v0 = current_version(path)
    fc = "_olive_file"
    tagged = (
        spark.read.format("olive")
        .option("table", table)
        .option("fileColumn", fc)
        .load(path)
    )
    cols = [c for c in tagged.columns if c != fc]
    missing = [c for c in set_exprs if c not in cols]
    if missing:
        raise ValueError(f"SET columns not in table: {missing}")
    # type check on a zero-row probe: the rewrite must not change the
    # table schema (a silently-cast corrupt value is worse than an
    # error — same rule as merge_upsert)
    probe = tagged.limit(0).select(
        *[F.expr(e).alias(c) for c, e in set_exprs.items()]
    )
    want = {f.name: f.dataType for f in tagged.schema.fields}
    bad = [
        (f.name, str(f.dataType), str(want[f.name]))
        for f in probe.schema.fields
        if f.dataType != want[f.name]
    ]
    if bad:
        raise ValueError(
            "SET expression types differ from the column "
            f"(col, expr, table): {bad} — cast explicitly"
        )
    cond = F.expr(condition)
    run = uuid.uuid4().hex[:8]
    if mode == "rewrite":
        # discovery on its own (possibly pushdown-pruned, predicate-
        # column-slimmed) relation — the rewrite keeps using the plain
        # `tagged` relation (see _discovery_scan for the readInfo-reuse
        # rationale)
        disc = _discovery_scan(
            spark, path, table, fc,
            columns=_cond_columns(
                condition, _table_columns_local(path, table) or []
            ),
        )
        hits = disc.filter(cond).groupBy(fc).count().collect()
        staged = sorted((r[0], None, int(r[1])) for r in hits)
    else:
        # fused discovery + DV staging — one slim scan, not two (r15;
        # see delete_where / _discover_and_stage_dvs)
        staged = _discover_and_stage_dvs(
            spark, path, table, condition, run, mode, dv_threshold
        )
    affected = [f for f, _dv, _n in staged]
    n_updated = int(sum(n for _f, _dv, n in staged))
    pre_version = current_version(path)
    if not affected:
        return {
            "files_rewritten": 0,
            "files_added": 0,
            "files_dv": 0,
            "rows_updated": 0,
            "version": pre_version,
            "pre_version": pre_version,
        }
    dv_files = [f for f, dv, _n in staged if dv is not None]
    rw_files = [f for f, dv, _n in staged if dv is None]
    dv_add = [(f, dv) for f, dv, _n in staged if dv is not None]
    _test_hook("serializable_window")
    if isolation == "serializable":
        try:
            precommit = _serializable_precommit(
                spark, path, v0,
                _condition_conflicts(spark, path, table, condition),
            )
        except Exception:
            _discard_staged_dvs(path, dv_add)
            raise
    else:
        precommit = None
    # DV leg: the fused pass already staged the matched positions that
    # mask out the PRE-update rows (dv_add above)
    upd = F.coalesce(cond, F.lit(False))
    set_cols = [
        (
            F.when(upd, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
            if c in set_exprs else F.col(c)
        )
        for c in cols
    ]
    # write set: rewrite-classed files in full (ONE select — every SET
    # expression reads the ORIGINAL columns, simultaneous assignment;
    # matched rows take the expression, others pass through) ...
    parts = []
    if rw_files:
        parts.append(
            tagged.filter(F.col(fc).isin(rw_files)).select(*set_cols)
        )
    if dv_files:
        # ...plus the UPDATED COPIES of DV-masked rows, appended as new
        # data (their originals vanish behind the deletion vector)
        parts.append(
            tagged.filter(F.col(fc).isin(dv_files))
            .filter(upd).select(*set_cols)
        )
    rewritten = functools.reduce(lambda a, b: a.unionByName(b), parts)
    layout = _partition_layout(path)
    # output sizing from METADATA when possible (r15, see delete_where):
    # the rewrite carries every live row of the rewrite-classed files
    # plus the updated copies of the DV-masked matches — both known
    live = _live_rows_local(path, rw_files, table) if rw_files else 0
    matched_dv = sum(n for f, dv, n in staged if dv is not None)
    cached = None
    if live is not None:
        rows = live + matched_dv
    else:
        cached = rewritten.persist()
        rows = cached.count()
    try:
        n_files = max(1, math.ceil(rows / target_rows))
        finals = _rewrite_and_swap(
            _shape_for_write(cached if cached is not None else rewritten,
                             n_files, layout),
            path, rw_files,
            run, precommit=precommit,
            table=table, target_rows=target_rows,
            retain_history=retain_history, prefix="update",
            layout=layout,
            dv_add=dv_add,
            op_params={"condition": condition},
        )
    finally:
        if cached is not None:
            cached.unpersist()
    return {
        "files_rewritten": len(rw_files),
        "files_added": len(finals),
        "files_dv": len(dv_files),
        "rows_updated": n_updated,
        "version": current_version(path),
        "pre_version": pre_version,
    }


@_locked(0)
def drop_column(path: str, column: str, table: str = "data") -> dict:
    """DROP COLUMN as metadata-only evolution: the column leaves the
    schema-sidecar authority (one small JSON write — no file is
    rewritten), so every scan stops projecting it; old files keep the
    bytes but the per-file projection (_cast_to) ignores columns the
    scan schema doesn't name.  The inverse of add-column evolution,
    under the same latest-schema-wins model.

    The name IS freed (r11): this DDL activates column-mapping ids
    (format/table_schema.py — Delta ColumnMapping / Iceberg
    field-ids), under which the dropped column's ID retires with its
    data.  Old files' values stay bound to the retired id, so a later
    ``add_column`` of the same name (a fresh id) reads as NULL over
    them — never a resurrection.  Dropping a hive PARTITION column is
    still refused: the value lives in the directory layout that
    pruning and rewrites depend on.

    Reference n/a (no directory/schema layer, src/root.zig:9-16)."""
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.table_schema import (
        read_dropped_columns,
        read_table_schema,
        write_table_schema,
    )

    side = read_table_schema(path, table)
    if side is None:
        files = _list_chunk_files(path)
        if not files:
            raise ValidationError(f"no olive files at {path}")
        header, _ = _read_header_bytes(files[0])
        th = _pick_table(header, table)
        names, types = list(th.field_names), list(th.field_types)
        table = th.name  # resolve table=None-style defaults to the real name
    else:
        names, types = side
    if column not in names:
        raise ValidationError(
            f"cannot drop {column!r}: not a column of {table!r} "
            f"(columns: {names})"
        )
    if len(names) == 1:
        raise ValidationError("cannot drop the only column of a table")
    part_cols = _detect_partition_cols(path) or []
    if column in part_cols:
        raise ValidationError(
            f"cannot drop hive partition column {column!r}: its values "
            "live in the directory layout (col=value/) that pruning and "
            "rewrites depend on"
        )
    from olive_spark.format.partition import read_sidecar

    tspec = read_sidecar(path) or []
    if column in {t["col"] for t in tspec if t["kind"] != "identity"}:
        raise ValidationError(
            f"cannot drop {column!r}: it is the source of a hidden "
            "partition transform — the directory layout derives from it"
        )
    # identity-stable drop: activate column-mapping ids first, so the
    # dropped column's id retires with its data (old files' values stay
    # bound to it) and the NAME becomes reusable — a later add_column
    # of the same name is a fresh id, not a resurrection
    from olive_spark.format.table_schema import activate_column_mapping

    idmap = activate_column_mapping(path, table, names, types)
    fids = [idmap[n] for n in names]
    idx = names.index(column)
    names.pop(idx)
    types.pop(idx)
    fids.pop(idx)
    dropped = read_dropped_columns(path, table)
    if column not in dropped:
        dropped.append(column)  # historical record; ids make it advisory
    write_table_schema(path, table, names, types, dropped=dropped, fids=fids)
    return {"dropped": column, "columns": names}


#: value-preserving widenings between olive primitive type names —
#: every cast here is exact for all values of the source type, so the
#: read-time cast (datasource._cast_to) can never corrupt or NULL a
#: stored value (the same legality table as Iceberg type promotion)
_WIDEN_OK: dict = {
    "int8": {"int16", "int32", "int64"},
    "int16": {"int32", "int64"},
    "int32": {"int64"},
    "uint8": {"int16", "int32", "int64"},
    "uint16": {"int32", "int64"},
    "uint32": {"int64"},
    "float16": {"float32", "float64"},
    "float32": {"float64"},
}

_TYPE_ALIASES = {
    "smallint": "int16", "short": "int16",
    "int": "int32", "integer": "int32",
    "bigint": "int64", "long": "int64",
    "float": "float32", "real": "float32",
    "double": "float64",
}


def _parse_widen_target(new_type: str):
    """User type string → olive type JSON: primitive names (olive or
    Spark DDL aliases) and ``decimal(p,s)``."""
    import re

    t = str(new_type).strip().lower()
    t = _TYPE_ALIASES.get(t, t)
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
    if m:
        return {"t": "decimal", "precision": int(m.group(1)),
                "scale": int(m.group(2)), "bits": 128}
    return t


@_locked(0)
def add_column(
    path: str, column: str, col_type: str, table: str = "data",
) -> dict:
    """Metadata-only ADD COLUMN — the explicit-DDL form of the
    evolution ``merge_upsert(evolve_schema=True)`` performs implicitly:
    the schema sidecar gains the column (one small JSON write, no file
    rewritten); every existing file null-fills it at read
    (datasource._cast_to); appends may carry it or not.  Completes the
    no-rewrite DDL family with drop_column / rename_column /
    widen_column.

    ``col_type`` accepts the same primitive grammar as widen_column
    (olive names or Spark DDL aliases, ``decimal(p,s)``) plus
    ``string``/``binary``/``boolean``/``date``/``timestamp``.
    Re-adding a DROPped or renamed-away name is ALLOWED: this DDL
    activates column-mapping ids (table_schema.py — Delta
    ColumnMapping / Iceberg field-ids), so the re-added name is a NEW
    column id; old files' same-named values stay bound to the retired
    id and never resurface (they read as NULL, like any pre-add file).
    Reserved prefixes are still refused.  Returns {column, type}."""
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.table_schema import (
        activate_column_mapping,
        read_dropped_columns,
        read_table_schema,
        write_table_schema,
    )

    if column.startswith("_olive") or column.startswith("__"):
        raise ValidationError(f"reserved column name: {column!r}")
    extra = {
        "string": "utf8", "varchar": "utf8", "text": "utf8",
        "binary": "binary", "bytes": "binary",
        "boolean": "bool", "bool": "bool",
        "date": "date32",
    }
    t = str(col_type).strip().lower()
    if t in extra:
        tj: object = extra[t]
    elif t == "timestamp":
        tj = {"t": "timestamp", "unit": "us", "tz": "UTC"}
    else:
        tj = _parse_widen_target(col_type)
        if isinstance(tj, str) and tj not in (
            "int8", "int16", "int32", "int64", "float32", "float64",
        ):
            raise ValidationError(
                f"unsupported ADD COLUMN type {col_type!r} — primitives, "
                "decimal(p,s), string, binary, boolean, date, timestamp"
            )
    side = read_table_schema(path, table)
    if side is not None:
        names, types = side
    else:
        header, _ = _read_header_bytes(_list_chunk_files(path)[0])
        th = _pick_table(header, table)
        names, types = list(th.field_names), list(th.field_types)
        table = th.name  # resolve the default to the real name
    if column in names:
        raise ValidationError(f"column {column!r} already exists")
    # identity-stable columns from here on: with ids, a re-added name
    # is a fresh id — the old id's data stays invisible by construction
    activate_column_mapping(path, table, names, types)
    dropped = read_dropped_columns(path, table)
    if column in dropped:
        dropped = [d for d in dropped if d != column]  # name re-enters
    names.append(column)
    types.append(tj)
    write_table_schema(path, table, names, types, dropped=dropped)
    return {"column": column, "type": tj}


@_locked(0)
def widen_column(
    path: str, column: str, new_type: str, table: str = "data",
) -> dict:
    """Metadata-only TYPE WIDENING (Iceberg type promotion): change a
    column's type to a strictly wider one — int8/16/32 up to int64,
    float32→float64, decimal precision growth at the same scale —
    without rewriting a byte of data.  The schema sidecar
    (format/table_schema.py) becomes the type authority; every scan
    casts each file's STORED type to it at read time
    (datasource._cast_to), which is exact for every legal widening.
    New appends write the widened type natively; old and new files
    coexist, both casting to the sidecar type.

    Refused LOUDLY (the caller rewrites instead):

    - narrowing or cross-kind casts (int64→int32, string→int,
      int→decimal, decimal scale changes) — read-time cast could
      corrupt or NULL stored values;
    - decimal precision beyond 38 (Spark's cap);
    - a column that is a hidden-partition TRANSFORM source
      (``bucket(N,col)``/``truncate``): the derived directory value
      hashes the stored representation, so widening would route the
      same value to different directories before/after.

    Time travel reads pre-widening snapshots THROUGH the current
    (widened) schema — the same latest-schema-wins rule as add-column
    evolution.  One sidecar write, O(1) in table size.

    The reference format has no directory or evolution layer
    (/root/reference/src/root.zig:9-16); parity target is Iceberg's
    ``ALTER TABLE ... ALTER COLUMN ... TYPE``.

    Returns {column, from, to}."""
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.partition import read_sidecar
    from olive_spark.format.table_schema import (
        read_table_schema,
        write_table_schema,
    )

    target = _parse_widen_target(new_type)
    side = read_table_schema(path, table)
    if side is not None:
        names, types = side
    else:
        header, _ = _read_header_bytes(_list_chunk_files(path)[0])
        th = _pick_table(header, table)
        names, types = list(th.field_names), list(th.field_types)
    if column not in names:
        raise ValidationError(
            f"no column {column!r} in table {table!r} (have {names})"
        )
    pside = read_sidecar(path) if os.path.isdir(path) else None
    for t in pside or []:
        if t.get("col") == column and t.get("kind") != "identity":
            raise ValidationError(
                f"column {column!r} is the source of partition "
                f"transform {t.get('kind')!r} — widening would change "
                "how its values route to directories; respec_partitions "
                "first, or rewrite the table"
            )
    i = names.index(column)
    cur = types[i]
    if isinstance(cur, dict) and cur.get("t") == "decimal":
        if not (isinstance(target, dict) and target.get("t") == "decimal"):
            raise ValidationError(
                f"cannot widen decimal column {column!r} to "
                f"{new_type!r} — only decimal precision growth at the "
                "same scale is metadata-safe"
            )
        p0, s0 = int(cur["precision"]), int(cur["scale"])
        p1, s1 = int(target["precision"]), int(target["scale"])
        if s1 != s0 or p1 <= p0:
            raise ValidationError(
                f"decimal({p0},{s0}) can only widen to decimal(p,{s0}) "
                f"with p > {p0} (got decimal({p1},{s1})) — a scale "
                "change is a value rewrite, not metadata"
            )
        if p1 > 38:
            raise ValidationError(
                f"decimal({p1},{s1}) exceeds Spark's max precision (38)"
            )
        new_json: object = {
            "t": "decimal", "precision": p1, "scale": s1, "bits": 128,
        }
    else:
        if not isinstance(cur, str) or not isinstance(target, str):
            raise ValidationError(
                f"cannot widen {column!r} from {cur!r} to {new_type!r} "
                "— only primitive int/float widenings and decimal "
                "precision growth are metadata-safe"
            )
        if target not in _WIDEN_OK.get(cur, ()):  # narrowing/cross-kind
            raise ValidationError(
                f"cannot widen {column!r} from {cur!r} to {target!r} — "
                f"legal targets: {sorted(_WIDEN_OK.get(cur, ()))} or a "
                "full rewrite"
            )
        new_json = target
    types[i] = new_json
    write_table_schema(path, table, names, types)
    return {"column": column, "from": cur, "to": new_json}


@_locked(0)
def rename_column(
    path: str, old: str, new: str, table: str = "data"
) -> dict:
    """RENAME COLUMN as metadata-only evolution (one small JSON write,
    no file rewritten): the sidecar's schema authority swaps the name
    in place while the column KEEPS its column-mapping id (activated
    here if it wasn't yet — format/table_schema.py), so old files
    resolve the column by id/legacy-binding rather than by name.  The
    freed old name can later be re-added as a fresh id.  Rename chains
    flatten; latest-schema-wins, so time travel reads old snapshots
    through the CURRENT names, like add/drop evolution.

    Renaming a hive partition column or a hidden-transform source is
    refused — the directory layout spells the old name.

    Reference n/a (no directory/schema layer, src/root.zig:9-16)."""
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.table_schema import (
        read_dropped_columns,
        read_renames,
        read_table_schema,
        write_table_schema,
    )

    if not new or new.startswith("__") or new.startswith("_olive"):
        raise ValidationError(
            f"invalid new column name {new!r}: empty and '__'/'_olive'-"
            "prefixed names are reserved"
        )
    side = read_table_schema(path, table)
    if side is None:
        files = _list_chunk_files(path)
        if not files:
            raise ValidationError(f"no olive files at {path}")
        header, _ = _read_header_bytes(files[0])
        th = _pick_table(header, table)
        names, types = list(th.field_names), list(th.field_types)
        table = th.name
    else:
        names, types = side
    if old not in names:
        raise ValidationError(
            f"cannot rename {old!r}: not a column of {table!r} "
            f"(columns: {names})"
        )
    if new in names:
        raise ValidationError(
            f"cannot rename {old!r} to {new!r}: the name is taken"
        )
    dropped = read_dropped_columns(path, table)
    part_cols = _detect_partition_cols(path) or []
    from olive_spark.format.partition import read_sidecar

    tspec = read_sidecar(path) or []
    transform_srcs = {t["col"] for t in tspec if t["kind"] != "identity"}
    if old in part_cols or old in transform_srcs:
        raise ValidationError(
            f"cannot rename {old!r}: the directory layout spells it "
            "(hive partition column or hidden-transform source) — "
            "respec_partitions first"
        )
    dir_keys = {t["dir"] for t in tspec if t["kind"] != "identity"}
    if new in dir_keys:
        # a data column named like a derived dir key would collide with
        # _dir_prunable's string-equality pruning: a predicate on the
        # renamed DATA column would match the dir's DERIVED values and
        # silently prune wrong (r9 review finding)
        raise ValidationError(
            f"cannot rename to {new!r}: it is a hidden-partition dir "
            f"key of this table (dir keys: {sorted(dir_keys)})"
        )
    # identity-stable rename: activate column-mapping ids (no-op when
    # already active) and keep the column's id across the name change —
    # old files resolve through the id, not the name, so no per-name
    # tombstone is needed and the freed name can later be re-added
    from olive_spark.format.table_schema import activate_column_mapping

    idmap = activate_column_mapping(path, table, names, types)
    fids = [idmap[n] for n in names]
    names[names.index(old)] = new
    renames = read_renames(path, table)
    # chain flatten: aliases of the old name become aliases of the new
    # (kept as history + unmapped-reader fallback)
    aliases = [old] + renames.pop(old, [])
    renames[new] = aliases
    if old not in dropped:
        dropped.append(old)  # historical record; ids make it advisory
    write_table_schema(
        path, table, names, types, dropped=dropped, renames=renames,
        fids=fids,
    )
    return {"renamed": {old: new}, "columns": names}


@_locked(0)
def clone_table(
    path: str, dst: str, version: "int | None" = None,
) -> dict:
    """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE``): a
    new table directory whose files are HARDLINKS to the source's —
    zero data copied, metadata fresh.  The cheap dev-branch / backup
    verb a 100 TB lakehouse needs (on an object store the link step
    becomes a server-side copy; locally it is one inode link per file).

    Safe because chunk files are IMMUTABLE: source mutations rewrite
    via copy-on-write (new names) and retire originals by rename/unlink
    — neither touches the clone's links — and vice versa.  The clone
    starts its own snapshot history at version 1 (a seeded base of the
    cloned file list); source history does NOT travel (shallow).

    ``version`` clones a retained SNAPSHOT instead of the live state —
    a time-travel clone (files resolve through ``_olive_history``).
    Copies the schema/partition sidecars, the retained-tombstone
    sidecar, and the matching stats-manifest entries, so scans,
    pruning, and future sequenced merges behave identically on the
    clone.  Held under the SOURCE's write lock for a consistent file
    list; refuses a destination that already holds olive files."""
    import shutil as _shutil

    from olive_spark.datasource.olive_datasource import _list_chunk_files
    from olive_spark.format.manifest import load_manifest, merge_manifest
    from olive_spark.format.partition import PARTITION_SIDECAR
    from olive_spark.format.snapshots import (
        ensure_seeded,
        files_at,
        resolve_paths,
    )
    from olive_spark.format.table_schema import SCHEMA_SIDECAR

    dst = os.path.abspath(dst)
    src_abs = os.path.abspath(path)
    if src_abs == dst:
        raise ValidationError("clone destination equals the source")
    # a nested clone would leak: dst inside src puts the clone's .olive
    # files into every SOURCE directory scan (and vice versa)
    if (
        dst.startswith(src_abs + os.sep)
        or src_abs.startswith(dst + os.sep)
    ):
        raise ValidationError(
            "clone destination must not nest inside the source (or "
            f"vice versa): {src_abs} vs {dst}"
        )
    if os.path.isdir(dst) and any(
        f.endswith(".olive")
        for _, _, fs in os.walk(dst) for f in fs
    ):
        raise ValidationError(
            f"clone destination {dst} already holds olive files — "
            "refusing to mix tables"
        )
    _recover_pending(path)
    if version is not None:
        from olive_spark.format.snapshots import dv_state_at

        rels = files_at(path, int(version))
        srcs = resolve_paths(path, rels)
        dv_state = dv_state_at(path, int(version))
    else:
        from olive_spark.format.deletion import list_dvs

        srcs = _list_chunk_files(path)
        rels = [os.path.relpath(f, path) for f in srcs]
        dv_state = list_dvs(path)
    os.makedirs(dst, exist_ok=True)
    linked = copied = 0
    for rel, src_fp in zip(rels, srcs):
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        try:
            os.link(src_fp, out)
            linked += 1
        except OSError:
            _shutil.copy2(src_fp, out)  # cross-device fallback
            copied += 1
    # deletion vectors travel with their files (a clone without them
    # would resurrect every DV-deleted row); resolved live-then-history
    # like the chunk files themselves
    if dv_state:
        from olive_spark.format.deletion import resolve_dv_paths

        dv_names = [n for names in dv_state.values() for n in names]
        for n, src_fp in zip(dv_names, resolve_dv_paths(path, dv_names)):
            out = os.path.join(dst, n)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            try:
                os.link(src_fp, out)
            except OSError:
                _shutil.copy2(src_fp, out)
    # metadata: schema + partition sidecars verbatim; manifest entries
    # only for the cloned files (stats stay advisory); tombstone
    # sidecar so sequenced merges keep their stale-update floor
    for name in (SCHEMA_SIDECAR, PARTITION_SIDECAR):
        sp = os.path.join(path, name)
        if os.path.exists(sp):
            _shutil.copy2(sp, os.path.join(dst, name))
    tdir = os.path.join(path, TOMBSTONES_DIR)
    if os.path.isdir(tdir):
        _shutil.copytree(
            tdir, os.path.join(dst, TOMBSTONES_DIR), dirs_exist_ok=True
        )
    try:
        man = load_manifest(path)
        keep = {r: man[r] for r in rels if r in man}
        if keep:
            merge_manifest(dst, keep)
    except OSError:
        pass  # advisory, same as everywhere
    ensure_seeded(dst, files=sorted(rels))
    return {
        "files": len(rels), "linked": linked, "copied": copied,
        "version_cloned": version, "dst": dst,
    }


@_locked(0)
def vacuum(
    path: str, retain_snapshots: int = 0,
    retain_hours: "float | None" = None,
    txn_grace_seconds: float = 3600.0,
) -> dict:
    """Recover from a crashed ``compact`` and remove its debris.

    First completes any pending compaction recorded by an intent
    manifest (crash after activation: activates still-staged files,
    deletes the listed originals — so the table converges to exactly
    the compacted rows, no duplicates).  Then removes orphaned
    ``*.olive.staging`` files (crash before the manifest existed —
    never visible to readers) and sibling ``<path>.compact-*`` temp
    write directories.  Live ``*.olive`` files not named by a manifest
    are never touched.  Safe whichever phase the compaction died in;
    single-writer contract as for :func:`compact`.

    Multi-table transaction interlock (r12, ADVICE r11): a
    ``txn-*.olive.staging`` file on a PARTICIPANT table is resolved
    through the staging-time coordinator pointer before any sweep — a
    COMMITTED transaction's slice is published here and now, a pending
    (prepared / in-flight) one is left untouched, and only provably
    ownerless debris older than ``txn_grace_seconds`` is removed.
    Likewise, sibling ``<path>.txn-*`` / ``<path>.branch-*`` temp write
    dirs get the same age gate so a write job mid-flight on another
    process isn't yanked out from under its move."""
    recovery = _recover_pending(path)
    # heal multi-table transactions and branch publishes BEFORE the
    # .staging sweep: a PREPARED txn rolls back (its staged files are
    # then legitimately gone) and a COMMITTED one publishes (its staged
    # files rename live) — sweeping first would destroy a committed
    # transaction's only copy of its staged files
    try:
        from olive_spark.ops.txn import recover_txns

        txn_healed = recover_txns(None, path)
    except OSError:
        txn_healed = {}
    try:
        from olive_spark.ops.branch import recover_branch_publishes

        branch_healed = recover_branch_publishes(path)
    except OSError:
        branch_healed = {}
    removed_staging = 0
    for f in glob.glob(os.path.join(path, "compact-*.manifest.json.tmp")):
        try:
            os.remove(f)
        except OSError:
            pass
    # crashed stats-manifest replacements (format/manifest.merge_manifest)
    for f in glob.glob(os.path.join(path, ".manifest-*.tmp")):
        try:
            os.remove(f)
        except OSError:
            pass
    txn_published = 0
    txn_skipped = 0
    now = time.time()
    for pat in ("*.olive.staging", "*.dv.staging"):
        for f in glob.glob(os.path.join(path, "**", pat), recursive=True):
            base = os.path.basename(f)
            if base.startswith("txn-"):
                # participant of a multi-table txn whose marker lives in
                # the COORDINATOR's _olive_txn/ — resolve, never guess
                from olive_spark.ops.txn import participant_txn_state

                bits = base.split("-")
                txn_id = bits[1] if len(bits) >= 3 else ""
                state = participant_txn_state(path, txn_id)
                if state == "published":
                    txn_published += 1
                    continue  # staging renamed live by the heal
                if state == "pending":
                    txn_skipped += 1
                    continue
                try:
                    if now - os.path.getmtime(f) < float(txn_grace_seconds):
                        txn_skipped += 1
                        continue
                except OSError:
                    continue  # raced away (renamed/removed) — fine
                try:
                    from olive_spark.ops.txn import _txn_dir as _tdir_of

                    os.remove(
                        os.path.join(_tdir_of(path), f"{txn_id}.coord.json")
                    )
                except OSError:
                    pass
            try:
                os.remove(f)
                removed_staging += 1
            except OSError:
                pass
    removed_tmpdirs = 0
    # sibling temp write dirs of compact/merge/delete (.compact-*),
    # crashed multi-table stagings (.txn-*) and branch appends
    # (.branch-*) — all invisible to readers; compact dirs are safe
    # after the heals above, txn/branch dirs may belong to an IN-FLIGHT
    # writer on another process (no lock relation to this table), so
    # they get the same age gate as txn staging
    for pat in (f"{path}.compact-*", f"{path}.txn-*", f"{path}.branch-*"):
        aged = pat != f"{path}.compact-*"
        for d in glob.glob(pat):
            if os.path.isdir(d):
                if aged:
                    try:
                        if now - os.path.getmtime(d) < float(
                            txn_grace_seconds
                        ):
                            continue
                    except OSError:
                        continue
                shutil.rmtree(d, ignore_errors=True)
                removed_tmpdirs += 1
    # crashed executor-side tombstone stages (merge died between the
    # stage write and activation): dot-prefixed, invisible to reads,
    # safe to drop — the replay re-applies the delete and re-stages
    for d in glob.glob(os.path.join(path, TOMBSTONES_DIR, ".staging-*")):
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
            removed_tmpdirs += 1
    # orphan deletion vectors: a crash between a file's retire and its
    # DVs' retire (the file-first ordering that can never resurrect
    # rows) leaves live DVs for a dead file — invisible to scans (DVs
    # are consulted per live file) but dead weight; move them to
    # history so pre-rewrite snapshots keep folding, and let expire
    # prune them with their versions
    orphan_dvs = 0
    try:
        from olive_spark.format.deletion import list_dvs, retire_target_dvs
        from olive_spark.format.snapshots import list_live_files

        live = set(list_live_files(path))
        for t in list(list_dvs(path)):
            if t not in live:
                orphan_dvs += retire_target_dvs(path, t, history=True)
    except OSError:
        pass
    out = {
        "staging_files": removed_staging,
        "tmp_dirs": removed_tmpdirs,
        "orphan_dvs": orphan_dvs,
        "txn_staging_published": txn_published,
        "txn_staging_skipped": txn_skipped,
        **recovery,
    }
    if txn_healed.get("rolled_back") or txn_healed.get("completed"):
        out["txns"] = txn_healed
    if branch_healed.get("completed"):
        out["branch_publishes"] = branch_healed
    if retain_hours is not None:
        # time-based retention (VACUUM ... RETAIN n HOURS): expire
        # versions older than the cutoff, minimum the current one;
        # composes with retain_snapshots as the STRICTER of the two
        from olive_spark.format.snapshots import expire_older_than

        out["snapshots"] = expire_older_than(
            path, float(retain_hours) * 3600.0
        )
    if retain_snapshots > 0:
        # expire snapshot versions beyond the retention window and drop
        # _olive_history files only those versions referenced
        from olive_spark.format.snapshots import expire

        stats = expire(path, retain_snapshots)
        if "snapshots" in out:
            for k, v in stats.items():
                out["snapshots"][k] = (
                    out["snapshots"].get(k, 0) + v if k != "retained"
                    else v
                )
        else:
            out["snapshots"] = stats
    return out


def _header_file_stats(th) -> dict:
    """File-level min/max per column as the fold of a table header's
    per-page stats; columns with incomplete stats are omitted.  The ONE
    place the page-stats→file-stats rule lives (manifest rebuild and
    describe's header fallback both use it)."""
    return {
        n: {"min": min(f.stats["min"]), "max": max(f.stats["max"])}
        for n, f in zip(th.field_names, th.fields)
        if f.stats is not None
        and all(v is not None for v in f.stats["min"] + f.stats["max"])
    }


def _manifest_entry_from_header(path: str, rel: str, table: str) -> "dict | None":
    """Rebuild a stats-manifest entry for an EXISTING chunk file from
    its framed header (no data pages): rows from the table header,
    file-level min/max as the fold of the per-page stats.  Null counts
    are not recoverable from the header, so the entry omits ``nulls``
    (IS NULL file pruning simply doesn't apply to it).  None when the
    header carries no usable stats."""
    from olive_spark.datasource.olive_datasource import (
        _pick_table,
        _read_header_bytes,
    )

    fp = os.path.join(path, rel)
    try:
        header, _ = _read_header_bytes(fp)
        th = _pick_table(header, table)
        return {
            "rows": th.num_rows,
            "columns": _header_file_stats(th),
            "size": os.path.getsize(fp),
        }
    except Exception:  # noqa: BLE001 — stats rebuild must never fail a restore
        return None


@_locked(0)
def restore(
    path: str, version: "int | None" = None, table: str = "data",
    timestamp: "float | str | None" = None,
) -> dict:
    """RESTORE the table to snapshot ``version`` — or to the latest
    commit at-or-before ``timestamp`` (epoch seconds or ISO-8601, the
    snapshotAsOf resolution rule; Delta's RESTORE TO TIMESTAMP).  The
    restore to snapshot ``version``: the target version's
    file set becomes the live set through ONE new commit — history is
    preserved (the restore is itself a snapshot entry, tagged
    ``restore:<version>``, so it can be time-traveled past or undone by
    a further restore), and no data is rewritten.

    Mechanics: files the target names that a later rewrite retired into
    ``_olive_history/`` are re-activated by HARDLINK into the live tree
    (copy fallback across filesystems) — the history name stays valid,
    so older snapshots that also reference the file keep resolving;
    files added after ``version`` retire INTO history (always retained:
    a restore must be restorable).  Crash safety reuses the compaction
    intent manifest: links are staged as ``.staging``, the manifest
    lists finals+originals, and activation/retirement/log-append run
    after it lands — a crash at any point either leaves invisible
    stagings (vacuum sweeps them) or a manifest `_recover_pending`
    completes.  Fails loud (ValidationError) when the target version's
    files were vacuumed away.

    The stats manifest gets entries for re-activated files rebuilt from
    their headers, keeping plan-time file pruning manifest-only (one
    read) instead of one header GET per restored file per query.
    Reference n/a: the format is batch-only (src/root.zig:9-16);
    parity target is Delta's RESTORE TABLE ... TO VERSION AS OF."""
    from olive_spark.format.manifest import merge_manifest
    from olive_spark.format.snapshots import (
        append_entry,
        current_version,
        files_at,
        resolve_paths,
    )

    from olive_spark.format.deletion import list_dvs
    from olive_spark.format.snapshots import dv_state_at

    if timestamp is not None:
        if version is not None:
            raise ValueError("restore: pass version OR timestamp, not both")
        from olive_spark.datasource.olive_datasource import (
            _parse_asof_timestamp,
        )
        from olive_spark.format.snapshots import version_at_timestamp

        version = version_at_timestamp(
            path, _parse_asof_timestamp(timestamp)
        )
    if version is None:
        raise ValueError("restore: a version or timestamp is required")
    _recover_pending(path)
    target = files_at(path, int(version))
    head = current_version(path)
    cur = set(files_at(path, head))
    add = sorted(set(target) - cur)
    remove = sorted(cur - set(target))
    # deletion-vector delta: the restored version's DV state must come
    # back with its files — DVs it folded re-activate (from history),
    # DVs added since (on files that stay live) retire.  For files in
    # `remove`, replay drops their DV state automatically and
    # _retire_original retires the physical DV files.
    dv_target = dv_state_at(path, int(version))
    dv_live = list_dvs(path)
    removed_set = set(remove)
    dv_add: list[tuple[str, str]] = []
    dv_remove: list[tuple[str, str]] = []
    for t, names in dv_target.items():
        live_names = set(dv_live.get(t, []))
        dv_add.extend((t, n) for n in names if n not in live_names)
    for t, names in dv_live.items():
        if t in removed_set:
            continue  # dies with the file removal
        want = set(dv_target.get(t, []))
        dv_remove.extend((t, n) for n in names if n not in want)
    if not add and not remove and not dv_add and not dv_remove:
        return {"version": head, "restored_to": int(version),
                "reactivated": 0, "retired": 0}
    # validate BEFORE touching anything: every re-activated file must
    # still exist (live elsewhere is impossible — it's not in `cur` —
    # so this resolves from _olive_history and fails loud if vacuumed)
    srcs = resolve_paths(path, add)
    from olive_spark.format.deletion import resolve_dv_paths

    dv_srcs = resolve_dv_paths(path, [n for _t, n in dv_add])
    for rel, src in zip(
        add + [n for _t, n in dv_add], srcs + dv_srcs
    ):
        stag = os.path.join(path, rel) + ".staging"
        os.makedirs(os.path.dirname(stag), exist_ok=True)
        try:
            if os.path.exists(stag):
                os.remove(stag)  # debris from a crashed earlier restore
            os.link(src, stag)
        except OSError:
            shutil.copy2(src, stag)
    run = uuid.uuid4().hex[:8]
    manifest = os.path.join(path, f"compact-{run}.manifest.json")
    doc = {
        "originals": remove,
        "finals": add,
        "history": True,
        "op": "restore",
        "op_params": {"to_version": int(version)},
        "tag": f"restore:{int(version)}",
        "empty": not add,
        "dv_add": [list(p) for p in dv_add],
        "dv_remove": [list(p) for p in dv_remove],
    }
    with open(manifest + ".tmp", "w") as fh:
        json.dump(doc, fh)
    os.replace(manifest + ".tmp", manifest)
    for rel in add + [n for _t, n in dv_add]:
        final = os.path.join(path, rel)
        os.replace(final + ".staging", final)
    from olive_spark.format.deletion import retire_dv_file

    for _t, dv_rel in dv_remove:
        retire_dv_file(path, dv_rel, history=True)
    for rel in remove:
        _retire_original(path, rel, history=True)
    os.remove(manifest)
    new_v = append_entry(
        path, add=add, remove=remove, tag=f"restore:{int(version)}",
        dv_add=dv_add, dv_remove=dv_remove,
        op="restore", params={"to_version": int(version)},
    )
    entries = {}
    for rel in add:
        ent = _manifest_entry_from_header(path, rel, table)
        if ent is not None:
            entries[rel] = ent
    if entries:
        merge_manifest(path, entries)
    return {"version": new_v, "restored_to": int(version),
            "reactivated": len(add), "retired": len(remove)}


def vacuum_stream_sink(path: str) -> dict:
    """Remove crash debris from an olive STREAMING SINK directory.

    A microbatch epoch that dies after its tasks wrote chunk files but
    before the driver committed the batch leaves those files on disk
    (on a driver crash no ``abort`` runs), and directory-listing scans
    see them — phantom rows from an epoch the checkpoint never
    acknowledged.  The sink's per-batch commit log
    (``_olive_stream_log/<batchId>.json``, written by
    ``OliveStreamWriter.commit`` under the default ``exactlyOnce``
    mode) records the exact committed file set, so any ``*.olive``
    file no batch log references is uncommitted debris and is removed.

    Contract: only valid on a directory written exclusively by the
    olive streaming sink with ``exactlyOnce`` enabled, while no query
    is actively writing (an in-flight epoch's files are not logged yet
    and would be swept — same stopped-writer requirement as
    :func:`vacuum`).  A directory with no commit log is left untouched
    (nothing can be proven to be debris).  Returns
    ``{"removed", "kept", "batches"}``.
    """
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _load_compacted_log,
    )

    log_dir = os.path.join(path, "_olive_stream_log")
    logs = sorted(glob.glob(os.path.join(log_dir, "*.json")))
    singles = [f for f in logs if os.path.basename(f) != "compacted.json"]
    has_compacted = len(singles) != len(logs)
    if not logs:
        return {"removed": 0, "kept": 0, "batches": 0}
    committed: set = set()
    batch_ids: set = set()
    if has_compacted:
        comp = _load_compacted_log(log_dir)
        if comp is None:
            return {"removed": 0, "kept": 0, "batches": 0,
                    "error": "unreadable compacted batch log"}
        for bid, files in comp["batches"].items():
            committed.update(files)
            batch_ids.add(str(bid))
    for lf in singles:
        try:
            with open(lf) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            # an unreadable log entry means the committed set is NOT
            # fully known — deleting anything could drop committed rows
            return {"removed": 0, "kept": 0, "batches": 0,
                    "error": f"unreadable batch log {os.path.basename(lf)}"}
        committed.update(doc.get("files", []))
        # a single may duplicate a folded batch (crash between the
        # compacted replace and the single's delete) — count it once
        batch_ids.add(str(doc.get("batch_id", os.path.basename(lf))))
    batches = len(batch_ids)
    removed = kept = 0
    try:
        files = _list_chunk_files(path)
    except Exception:  # noqa: BLE001 — empty dir
        files = []
    for fp in files:
        if os.path.relpath(fp, path) in committed:
            kept += 1
            continue
        try:
            os.remove(fp)
            removed += 1
        except OSError:
            pass
    # crashed tmp log entries (commit/compaction died mid-write) are
    # safe to drop
    for pat in (".batch-*.tmp", ".compacted-*.tmp"):
        for f in glob.glob(os.path.join(log_dir, pat)):
            try:
                os.remove(f)
            except OSError:
                pass
    return {"removed": removed, "kept": kept, "batches": batches}


def describe(path: str, table: str = "data") -> dict:
    """Operational summary of an olive table directory: file count,
    total rows/bytes, and per-column value bounds — answered from the
    directory manifest when present (one read), with per-file header
    fallback for unmanifested files.  The 100 TB 'how big is this
    table' question without a Spark job or a full scan."""
    from olive_spark.datasource.olive_datasource import (
        _list_chunk_files,
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.manifest import load_manifest, lookup

    files = _list_chunk_files(path)
    manifest = load_manifest(path) if os.path.isdir(path) else {}
    rows = 0
    size = 0
    cols: dict = {}

    def fold(colstats: dict) -> None:
        for name, st in (colstats or {}).items():
            mn, mx = st.get("min"), st.get("max")
            if name not in cols:
                cols[name] = {"min": mn, "max": mx}
            else:
                try:
                    if mn is not None and (cols[name]["min"] is None or mn < cols[name]["min"]):
                        cols[name]["min"] = mn
                    if mx is not None and (cols[name]["max"] is None or mx > cols[name]["max"]):
                        cols[name]["max"] = mx
                except TypeError:
                    cols[name] = {"min": None, "max": None}

    for fp in files:
        try:
            size += os.path.getsize(fp)
        except OSError:
            continue
        ent = lookup(manifest, path, fp) if manifest else None
        if ent is not None:
            rows += ent.get("rows", 0)
            fold(ent.get("columns"))
            continue
        header, _ = _read_header_bytes(fp)
        th = _pick_table(header, table)
        rows += th.num_rows
        fold(_header_file_stats(th))
    # deletion vectors mask rows without touching file bytes: subtract
    # their header counts (min/max bounds stay conservative-valid).
    # Only DVs whose TARGET file is still live count — an orphan DV
    # (crash between a rewrite's data-file retire and its DV retire)
    # masks nothing at scan time, so counting it here would undercount
    # rows relative to scan results until vacuum sweeps it.
    dv_deleted = 0
    try:
        from olive_spark.format.deletion import deleted_count, list_dvs

        live_rel = {os.path.relpath(fp, path) for fp in files}
        for target, dv_names in list_dvs(path).items():
            if target in live_rel:
                dv_deleted += deleted_count(path, dv_names, table=table)
    except Exception:  # noqa: BLE001 — describe stays best-effort
        dv_deleted = 0
    rows -= dv_deleted
    out = {"files": len(files), "rows": rows, "bytes": size,
           "columns": cols}
    if dv_deleted:
        out["dv_deleted_rows"] = dv_deleted
    # partition layout, so "what is this table" answers include the
    # spec users must preserve (or respec) when reorganizing
    from olive_spark.format.partition import read_sidecar, spec_to_string

    side = read_sidecar(path) if os.path.isdir(path) else None
    if side:
        out["partition_spec"] = spec_to_string(side)
    else:
        cols_detected = _detect_partition_cols(path)
        if cols_detected:
            out["partition_spec"] = ",".join(cols_detected)
    # staged-but-unpublished state an operator should know about:
    # active WAP branches (ops/branch.py) and multi-table transaction
    # markers awaiting recovery (ops/txn.py)
    try:
        bdir = os.path.join(path, "_olive_branch")
        if os.path.isdir(bdir):
            branches = sorted(
                n for n in os.listdir(bdir)
                if os.path.isdir(os.path.join(bdir, n))
            )
            if branches:
                out["branches"] = branches
            pending_pub = [
                n for n in os.listdir(bdir) if n.endswith(".publish.json")
            ]
            if pending_pub:
                out["pending_branch_publishes"] = len(pending_pub)
        tdir = os.path.join(path, "_olive_txn")
        if os.path.isdir(tdir):
            # only decision markers are "pending" — participant-side
            # coordinator pointers (.coord.json) and the group root
            # (_root.json) are durable bookkeeping, not unfinished work
            pend = [
                n for n in os.listdir(tdir)
                if n.endswith((".prepared.json", ".commit.json"))
            ]
            if pend:
                out["pending_txns"] = len(pend)
    except OSError:
        pass
    return out


def count_rows(
    path: str, table: str = "data", snapshot: "int | None" = None,
) -> int:
    """Metadata-only row count — the answer to the one structural
    Python-DSv2 perf gap (a `df.count()` pays the per-relation
    framework round-trip that native parquet's metadata count skips).
    No Spark job, no data pages: resolve the live (or ``snapshot``)
    file list, take per-file rows from the directory stats manifest
    (ONE read per directory — the same object-store plan-time path as
    file pruning), and open headers only for files the manifest can't
    vouch for (hand-written chunks, history-resolved retired files).

    Trust model matches file pruning's: a manifest entry describes the
    single table its writer committed, so it is authoritative for that
    directory's scan table; directories holding hand-written
    multi-table chunks have no manifest and take the header path,
    where the named table is picked explicitly."""
    from olive_spark.datasource.olive_datasource import (
        _pick_table,
        _read_header_bytes,
    )
    from olive_spark.format.manifest import load_manifest, lookup
    from olive_spark.format.snapshots import (
        files_at,
        list_live_files,
        resolve_paths,
    )

    names = (
        files_at(path, int(snapshot)) if snapshot is not None
        else sorted(list_live_files(path))
    )
    paths = resolve_paths(path, names)
    man = load_manifest(path)
    total = 0
    # deletion vectors: header counts (per-file caps in the DV header,
    # payload never read) subtract from the raw per-file rows — same
    # DV-state source as the scan (snapshot replay / live directory)
    from olive_spark.format.deletion import deleted_count, list_dvs
    from olive_spark.format.snapshots import dv_state_at

    dv_state = (
        dv_state_at(path, int(snapshot)) if snapshot is not None
        else list_dvs(path)
    )
    # orphan DVs (target file already retired by a crashed rewrite, DV
    # retire lost) mask nothing at scan time — skip them, like the scan
    # does, or the count undercounts until vacuum sweeps the orphan
    counted = set(names)
    for target, dv_names in dv_state.items():
        if target in counted:
            total -= deleted_count(path, dv_names, table=table)
    for fp in paths:
        # the same size-validated lookup the pruning path uses: an
        # entry is trusted only while the on-disk bytes still match its
        # recorded size (a hand-replaced or half-synced chunk falls
        # back to its header instead of returning stale rows);
        # history-resolved paths never match a manifest relpath and
        # take the header path too
        ent = lookup(man, path, fp)
        rows = ent.get("rows") if isinstance(ent, dict) else None
        if isinstance(rows, int):
            total += rows
            continue
        header, _ = _read_header_bytes(fp)
        total += _pick_table(header, table).num_rows
    return total


def approx_distinct(
    path: str, column: str, table: str = "data",
    snapshot: "int | None" = None, exact_dv: bool = False,
) -> int:
    """Metadata-only approx COUNT(DISTINCT column): merge the per-file
    HLL sketches the writer recorded under ``.option("ndvColumns",...)``
    (format/ndv.py) and estimate — no Spark job, ±~3 % at p=10.  Files
    the manifest can't vouch for (hand-written chunks, history-resolved
    snapshot reads, pre-sketch writes) fall back to reading JUST that
    column from the file and sketching it here — still no Spark job,
    and the fallback sketch merges identically.  The
    ``count_rows``/``describe`` sibling for the planner's other
    favorite statistic.

    Deletion vectors: a per-file sketch describes the file's RAW rows,
    and an HLL can't subtract, so by default a DV'd table's estimate is
    an UPPER bound until the masks are materialized — the safe
    direction for the planner use (NDV guides join strategy), and
    ``compact_if_needed`` re-sketches DV-heavy files away in the same
    pass that materializes them.  ``exact_dv=True`` restores the error
    bound immediately: ONLY the DV-carrying files are re-read (one
    column, mask folded, re-sketched here); clean files keep their
    manifest sketches, so the cost is proportional to the masked
    fraction, not the table (r11 verdict task #3)."""
    from olive_spark.datasource.olive_datasource import _pick_table
    from olive_spark.format import ndv
    from olive_spark.format.deletion import list_dvs
    from olive_spark.format.manifest import load_manifest, lookup
    from olive_spark.format.reader import ChunkReader
    from olive_spark.format.snapshots import (
        dv_state_at,
        files_at,
        list_live_files,
        resolve_paths,
    )
    from olive_spark.format.table_schema import read_column_mapping

    names = (
        files_at(path, int(snapshot)) if snapshot is not None
        else sorted(list_live_files(path))
    )
    paths = resolve_paths(path, names)
    man = load_manifest(path)
    dv_state: dict = {}
    if exact_dv:
        dv_state = (
            dv_state_at(path, int(snapshot)) if snapshot is not None
            else list_dvs(path)
        )
    colmap = read_column_mapping(path, table if os.path.isdir(path) else None)
    blobs = []
    for rel, fp in zip(names, paths):
        dv_names = dv_state.get(rel)
        ent = lookup(man, path, fp)
        enc = (ent or {}).get("ndv", {}).get(column)
        if isinstance(enc, str) and not dv_names:
            blobs.append(ndv.decode(enc))
            continue
        r = ChunkReader.from_path(fp)
        th = _pick_table(r.header, table)
        stored = column
        if column not in th.field_names and colmap is not None:
            # remapped table: the column's bytes may sit under an older
            # stored name — resolve through the id, same as the scan
            from olive_spark.datasource.olive_datasource import (
                _stored_to_current,
            )

            cur_of = _stored_to_current(th, colmap, None) or {}
            back = {c: s for s, c in cur_of.items()}
            stored = back.get(column)
            if stored is None:
                continue  # file predates the column: contributes nothing
        elif column not in th.field_names:
            raise ValidationError(
                f"approx_distinct: {column!r} is not a column of "
                f"{th.name!r} (columns: {list(th.field_names)})"
            )
        tbl = r.read_table(th.name, columns=[stored])
        if dv_names:
            import numpy as _np
            import pyarrow as _pa

            from olive_spark.format.deletion import (
                resolve_dv_paths,
                union_positions,
            )

            deleted = union_positions(
                resolve_dv_paths(path, dv_names), th.name
            ).astype("int64")
            mask = ~_np.isin(
                _np.arange(tbl.num_rows, dtype=_np.int64), deleted
            )
            tbl = tbl.filter(_pa.array(mask))
        blobs.append(ndv.sketch_from_array(tbl.column(stored)))
    if not blobs:
        return 0
    return ndv.estimate(ndv.merge_sketches(blobs))


def table_checksum(df, cols: "list[str]"):
    """Order-independent content checksum for migration/replication
    validation: ``SUM(int64(md5(concat_ws('|', cols))[0:13]))`` plus a
    row count.  Because the per-row digest is summed, the result is
    invariant under row order, partitioning, and file layout — the
    property that lets two engines (or the same table before/after a
    compact/Z-order rewrite, or an olive copy of a parquet source)
    be compared with ONE number each, no sorted export, no driver-side
    row transfer.  13 hex digits (52 bits) keep every per-row term
    exactly representable, so the oracle can rebuild the identical
    value digit-by-digit where no hex→int cast exists.

    100 TB shape: a pure map-side-combined aggregate — each task folds
    its partition into one (sum, count) pair and a single reduce
    combines them; no shuffle of rows, no ordering anywhere.  Columns
    must stringify identically across engines: integers, strings,
    dates are safe; raw doubles are not (formatting differs) — cast
    them to decimals first.

    Returns a 1-row DataFrame (n_rows, checksum)."""
    from pyspark.sql import functions as F

    digest = F.md5(F.concat_ws("|", *[F.col(c) for c in cols]))
    term = F.conv(F.substring(digest, 1, 13), 16, 10).cast("long")
    # accumulate in decimal(38,0) (rows x 2^52 overflows int64), then
    # reduce mod the Mersenne prime 2^61-1 back to an exact int64 —
    # modular arithmetic keeps full sensitivity, no float rounding
    mersenne = 2305843009213693951
    total = F.sum(term.cast("decimal(38,0)"))
    return df.agg(
        F.count("*").alias("n_rows"),
        (total % F.lit(mersenne)).cast("long").alias("checksum"),
    )


def snapshot_history(path: str) -> "list[dict]":
    """Version listing for a snapshot-logged table (the DESCRIBE
    HISTORY counterpart): one dict per retained version with its
    timestamp, add/remove counts, kind, and cumulative live-file
    count — reconstructed from the log only, no directory I/O."""
    from olive_spark.format.snapshots import load_log

    out = []
    live: set[str] = set()
    for e in load_log(path)["entries"]:
        if e.get("base"):
            # synthesized reset base — not a user overwrite, and history
            # audits must not see a phantom; "seed" = first log entry
            # covering files that predate snapshot tracking,
            # "vacuum-base" = collapse of expired versions
            live.clear()
            kind = "seed-base" if e.get("seeded") else "vacuum-base"
        elif e.get("reset"):
            live.clear()
            kind = "overwrite"
        elif e.get("op"):
            # exact provenance (r11): every engine verb stamps its name
            # (and slim params) into the entry, so history stops
            # guessing from entry shape
            kind = str(e["op"])
        elif str(e.get("tag", "")).startswith("restore:"):
            kind = "restore"
        elif e.get("remove"):
            kind = "compact"
        elif e.get("dv_add") and not e.get("add"):
            kind = "dv-delete"  # pure merge-on-read commit
        else:
            kind = "append"
        live.update(e.get("add", ()))
        live.difference_update(e.get("remove", ()))
        rec = {
            "version": int(e["v"]),
            "ts": e.get("ts"),
            "kind": kind,
            "added": len(e.get("add", ())),
            "removed": len(e.get("remove", ())),
            "live_files": len(live),
        }
        if e.get("dv_add"):
            rec["dv_added"] = len(e["dv_add"])
        if e.get("dv_remove"):
            rec["dv_removed"] = len(e["dv_remove"])
        if e.get("tag") is not None:
            rec["tag"] = e["tag"]
        if e.get("params"):
            rec["params"] = e["params"]
        out.append(rec)
    return out
