"""Write-audit-publish branches over snapshot-logged olive tables —
the Iceberg WAP pattern (branch → audit → fast-forward publish).

The reference format has no versioning layer (/root/reference/src/
root.zig:9-16); this extends the engine's snapshot log (format/
snapshots.py) with ISOLATED STAGING: rows written to a branch are
invisible to every live scan, time travel, change feed, and index
build until the branch is published — and publishing is one tagged
snapshot commit.

Storage model (no fork of the linear log — deliberately simpler than
Iceberg's ref tree, with the same user-visible contract for the
append-only WAP workflow):

- a branch is ``_olive_branch/<name>/`` inside the table directory:
  a ``_ref.json`` (base snapshot version + ordered file list) plus the
  branch's chunk files.  ``_``-prefixed directories are invisible to
  the live listing (datasource._list_chunk_files), so un-published
  rows can never leak into a scan — isolation by construction, not by
  readers checking markers;
- ``scan_branch`` reads base-version files + branch files through the
  reader's explicit ``files`` option with the base version's DV state
  — exactly what a committed publish would serve;
- ``publish_branch`` fast-forwards: a decision marker
  (``<name>.publish.json``) lists branch→final renames; activation is
  per-file renames + ONE tagged snapshot entry under the metadata
  commit lock (idempotent redo — recovery completes a crashed publish,
  tests/test_branch.py injects deaths at each phase);
- optional AUDIT gate: ``publish_branch(expect={...})`` aggregates the
  branch rows once; any violated expectation refuses the publish with
  per-rule counts and the branch intact (the "A" of WAP).

Branches stage APPENDS (the WAP use case).  Mutations (delete/merge)
operate on live state only — a branch holding mutations would need
Iceberg's full metadata forest; refused loudly instead of half-built.

Scale shape: branch writes are normal executor-parallel writer jobs;
scan cost equals the eventual published scan (same files, same DV
folds); publish is O(files) driver renames + one JSON append — no
Spark job, independent of table size.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from olive_spark.format.errors import ValidationError

_BRANCH_DIR = "_olive_branch"

# test seam: phase -> callable (same pattern as ops/txn._CRASH_HOOKS)
_CRASH_HOOKS: dict = {}


def _crash_point(phase: str) -> None:
    hook = _CRASH_HOOKS.get(phase)
    if hook is not None:
        hook()


class BranchAuditError(ValidationError):
    """An expectation failed on the branch rows; publish refused."""


def _bdir(path: str, name: str) -> str:
    if not name or "/" in name or name.startswith((".", "_")):
        raise ValidationError(f"invalid branch name {name!r}")
    return os.path.join(path, _BRANCH_DIR, name)


def _ref_path(path: str, name: str) -> str:
    return os.path.join(_bdir(path, name), "_ref.json")


def _load_ref(path: str, name: str) -> dict:
    try:
        with open(_ref_path(path, name)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValidationError(
            f"no branch {name!r} at {path} — create_branch first"
        )


def _write_ref(path: str, name: str, ref: dict) -> None:
    p = _ref_path(path, name)
    with open(p + ".tmp", "w") as f:
        json.dump(ref, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(p + ".tmp", p)


def create_branch(path: str, name: str, table: str = "data") -> dict:
    """Create an empty branch pinned at the table's CURRENT snapshot
    version.  Later live commits do not move the branch's base — the
    publish-time fast-forward handles them (appends never conflict)."""
    from olive_spark.format.snapshots import current_version, ensure_seeded

    ensure_seeded(path)
    bdir = _bdir(path, name)
    if os.path.exists(_ref_path(path, name)):
        raise ValidationError(f"branch {name!r} already exists at {path}")
    os.makedirs(bdir, exist_ok=True)
    ref = {
        "name": name,
        "table": table,
        "base_version": current_version(path),
        "files": [],
        "created": time.time(),
    }
    _write_ref(path, name, ref)
    return ref


def append_to_branch(spark, df, path: str, name: str) -> dict:
    """Stage ``df``'s rows on the branch: a normal executor-parallel
    writer job into a sibling temp dir, files moved under the branch
    directory (never visible to live scans), ref updated under the
    metadata commit lock so concurrent branch appends both land."""
    from olive_spark.datasource import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files
    from olive_spark.format.lock import metadata_commit_lock
    from olive_spark.format.table_schema import read_column_mapping

    from olive_spark.ops.maintenance import _partition_layout

    register_olive(spark)
    ref = _load_ref(path, name)
    table = ref["table"]
    run = uuid.uuid4().hex[:12]
    tmp = f"{path}.branch-{name}-{run}"
    layout = _partition_layout(path)
    w = df.write.format("olive").option("table", table)
    cm = read_column_mapping(path, table)
    if cm is not None:
        # mapped table: stamp ids exactly like txn/rewrite staging
        ids = dict(zip(cm["names"], cm["fids"]))
        missing = [c for c in df.columns if c not in ids]
        if missing:
            from olive_spark.format.table_schema import reserve_field_ids

            ids.update(reserve_field_ids(path, table, missing))
        w = w.option("fieldIds", json.dumps(ids))
    if layout:
        # partitioned table: branch files keep their key=value subpath
        # INSIDE the branch dir, so the publish renames land in the
        # live partition dirs — a flat root file would poison layout
        # detection (same rule as _rewrite_and_swap / txn staging)
        w = w.option("partitionBy", layout["spec"])
    w.mode("append").save(tmp)
    from olive_spark.format.manifest import load_manifest

    tmp_stats = load_manifest(tmp)
    moved, stats = [], {}
    bdir = _bdir(path, name)
    for i, f in enumerate(sorted(_list_chunk_files(tmp))):
        src_rel = os.path.relpath(f, tmp)
        sub = os.path.dirname(src_rel)
        if not sub and layout:
            # zero-row schema sentinel: park under the null partition
            sub = os.sep.join(
                f"{c}=__HIVE_DEFAULT_PARTITION__" for c in layout["dirs"]
            )
        rel = (
            os.path.join(sub, f"b-{run}-{i:05d}.olive")
            if sub else f"b-{run}-{i:05d}.olive"
        )
        ent = tmp_stats.get(src_rel)
        if ent is not None:
            stats[rel] = ent  # same bytes, new name — publish re-keys
        dest = os.path.join(bdir, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(f, dest)
        moved.append(rel)
    shutil.rmtree(tmp, ignore_errors=True)
    _record_branch_files(path, name, moved, stats)
    return {"branch": name, "files_added": len(moved)}


def _record_branch_files(
    path: str, name: str, moved: "list[str]", stats: dict
) -> None:
    """Fold newly staged files into the branch ref under the metadata
    commit lock — the RMW that makes concurrent branch appends from
    separate processes all land (same micro-lock as the snapshot log;
    real-subprocess race pinned in tests/test_concurrent_append.py).

    Publish race (r12, ADVICE r11): _finish_publish serializes against
    this lock and only ever removes files its marker lists, so a record
    that lands BEFORE the publish's cleanup survives into the re-created
    ref, and one that lands AFTER sees the recreated ref and lands
    normally.  The one losing interleave — the branch was fully
    published and removed while our writer job ran — fails LOUD here
    (never a silent drop of files the caller thinks are staged): the
    staged copies are deleted and the append raises, so the caller
    retries against live state or a fresh branch."""
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(path):
        try:
            ref = _load_ref(path, name)  # re-read: concurrent appends
        except ValidationError:
            bdir = os.path.join(path, _BRANCH_DIR, name)
            for rel in moved:
                try:
                    os.remove(os.path.join(bdir, rel))
                except OSError:
                    pass
            raise ValidationError(
                f"branch {name!r} at {path} was published (or dropped) "
                "while this append was staging — staged copies removed; "
                "append to live state or re-create the branch"
            )
        ref["files"] = list(ref["files"]) + moved
        ref["stats"] = {**ref.get("stats", {}), **stats}
        _write_ref(path, name, ref)


def scan_branch(spark, path: str, name: str):
    """The DataFrame a publish would make live: base-version files plus
    branch files, with the BASE version's deletion-vector state (live
    DVs written after the base must not fold into the preview)."""
    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import dv_state_at, files_at

    register_olive(spark)
    ref = _load_ref(path, name)
    base = (
        files_at(path, ref["base_version"])
        if ref["base_version"] else []  # branch on an empty table
    )
    branch_rels = [
        os.path.join(_BRANCH_DIR, name, rel) for rel in ref["files"]
    ]
    names = sorted(base) + branch_rels
    if not names:
        return (
            spark.read.format("olive").option("table", ref["table"])
            .load(path).limit(0)
        )
    return (
        spark.read.format("olive")
        .option("table", ref["table"])
        .option("files", ",".join(names))
        .option("dvs", json.dumps(
            dv_state_at(path, ref["base_version"])
            if ref["base_version"] else {}
        ))
        .load(path)
    )


def drop_branch(path: str, name: str) -> dict:
    """Discard the branch and every staged file — nothing was ever
    visible, so this is plain directory removal."""
    ref = _load_ref(path, name)
    shutil.rmtree(_bdir(path, name))
    return {"branch": name, "files_dropped": len(ref["files"])}


def recover_branch_publishes(path: str) -> dict:
    """Complete publishes that crashed after their decision marker:
    re-run the idempotent rename+commit step for every
    ``_olive_branch/<name>.publish.json``.  Runs automatically at the
    start of every publish on the same table."""
    broot = os.path.join(path, _BRANCH_DIR)
    out = {"completed": 0}
    if not os.path.isdir(broot):
        return out
    for n in sorted(os.listdir(broot)):
        if n.endswith(".publish.json"):
            with open(os.path.join(broot, n)) as f:
                txn = json.load(f)
            _finish_publish(path, txn)
            out["completed"] += 1
    return out


def _finish_publish(path: str, txn: dict) -> None:
    """Idempotent activation: branch→final renames (skipping pairs a
    prior attempt finished) + ONE tagged snapshot entry + TARGETED
    branch cleanup, all under ONE hold of the metadata commit lock.

    Cleanup is targeted, not rmtree (r12, ADVICE r11): a concurrent
    append_to_branch can legally stage files between the publish's ref
    read and this activation (appends take no table write lock — by
    design, they're cheap and isolated).  Only the marker-listed
    sources, the ref and the marker are removed; any OTHER recorded
    file survives and the branch ref is RE-CREATED around it, re-based
    on the just-published version — the late append stays staged
    instead of being silently deleted after its caller saw success."""
    from olive_spark.format.lock import metadata_commit_lock
    from olive_spark.format.snapshots import (
        _append_entry_locked, current_version, has_tag,
    )

    name = txn["name"]
    bdir = os.path.join(path, _BRANCH_DIR, name)
    with metadata_commit_lock(path):
        if not has_tag(path, txn["tag"]):
            for src_rel, final in txn["renames"]:
                src = os.path.join(bdir, src_rel)
                dst = os.path.join(path, final)
                if os.path.exists(src):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.replace(src, dst)
                elif not os.path.exists(dst):
                    raise OSError(
                        f"branch publish {txn['tag']}: {src_rel} missing — "
                        "cannot complete the committed publish"
                    )
            _crash_point("mid_activate")
            try:
                from olive_spark.format.manifest import merge_manifest

                merge_manifest(path, txn.get("stats") or {})
            except OSError:
                pass  # stats are advisory; scans fall back to headers
            _append_entry_locked(
                path, add=[f for _s, f in txn["renames"]], remove=(),
                reset=False, tag=txn["tag"], max_entries=None,
                dv_add=(), dv_remove=(),
                op="branch-publish", params={"branch": txn["name"]},
            )
        # targeted cleanup — serialized against _record_branch_files by
        # the same lock, so every recorded-but-unpublished file is
        # either visible in the on-disk ref here (→ preserved) or its
        # recorder will observe the ref we leave behind
        published = {src for src, _f in txn["renames"]}
        leftover: list = []
        disk: dict = {}
        try:
            with open(_ref_path(path, name)) as f:
                disk = json.load(f)
            leftover = [
                r for r in disk.get("files", [])
                if r not in published
                and os.path.exists(os.path.join(bdir, r))
            ]
        except (OSError, ValueError):
            pass
        if leftover:
            keep = set(leftover)
            _write_ref(path, name, {
                "name": name,
                "table": disk.get("table", "data"),
                "base_version": current_version(path),
                "files": leftover,
                "stats": {
                    r: e for r, e in (disk.get("stats") or {}).items()
                    if r in keep
                },
                "created": disk.get("created", time.time()),
            })
        else:
            shutil.rmtree(bdir, ignore_errors=True)
        try:
            os.remove(os.path.join(path, _BRANCH_DIR, f"{name}.publish.json"))
        except FileNotFoundError:
            pass  # idempotent redo after a crash mid-cleanup


def publish_branch(
    spark, path: str, name: str,
    expect: "dict[str, str] | None" = None,
) -> dict:
    """Fast-forward the branch into the live table as ONE tagged
    snapshot commit (the "P" of WAP).  Appends staged on the branch
    never conflict with live commits made since the base (same
    WriteSerializable argument as plain appends), so no rebase step is
    needed — the branch rows simply land on top of the current state.

    ``expect`` ({rule_name: sql_bool_expr}) is the AUDIT gate: every
    expression must hold on EVERY branch row; violations refuse the
    publish with per-rule counts and leave the branch intact for
    inspection (:class:`BranchAuditError`)."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.format.lock import table_write_lock

    register_olive(spark)
    with table_write_lock(path):
        recover_branch_publishes(path)
        ref = _load_ref(path, name)
        if not ref["files"]:
            # nothing staged: dropping the empty branch IS the publish —
            # an empty tagged commit would only noise up the history.
            # Re-check under the metadata lock: a concurrent append may
            # have recorded files since our ref read (appends take no
            # table lock), and rmtree-ing those would be silent loss
            from olive_spark.format.lock import metadata_commit_lock

            with metadata_commit_lock(path):
                ref = _load_ref(path, name)
                if not ref["files"]:
                    shutil.rmtree(_bdir(path, name))
                    return {
                        "branch": name, "tag": None, "files_published": 0,
                    }
            # files landed meanwhile — fall through (ref refreshed, so
            # the audit below covers them) and publish them
        if expect:
            branch_only = (
                spark.read.format("olive")
                .option("table", ref["table"])
                .option("files", ",".join(
                    os.path.join(_BRANCH_DIR, name, r)
                    for r in ref["files"]
                ))
                .option("dvs", "{}")
                .load(path)
            )
            row = branch_only.agg(*[
                F.sum(
                    (~F.coalesce(F.expr(e), F.lit(False))).cast("long")
                ).alias(n)
                for n, e in expect.items()
            ]).first()
            counts = {n: int(row[n] or 0) for n in expect}
            bad = {n: c for n, c in counts.items() if c > 0}
            if bad:
                raise BranchAuditError(
                    f"branch {name!r} failed audit — publish refused, "
                    f"branch intact: {bad}"
                )
        tag = f"branch-{name}-{uuid.uuid4().hex[:12]}"
        renames = [
            # keep the partition subpath: branch files publish into the
            # SAME key=value dir they were staged under
            [rel, os.path.join(
                os.path.dirname(rel), f"{tag}-{i:05d}.olive"
            ) if os.path.dirname(rel) else f"{tag}-{i:05d}.olive"]
            for i, rel in enumerate(ref["files"])
        ]
        final_of = dict(renames)
        txn = {
            "name": name, "tag": tag, "renames": renames,
            "stats": {
                final_of[r]: ent
                for r, ent in (ref.get("stats") or {}).items()
                if r in final_of
            },
        }
        marker = os.path.join(path, _BRANCH_DIR, f"{name}.publish.json")
        with open(marker + ".tmp", "w") as f:
            json.dump(txn, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(marker + ".tmp", marker)  # THE decision point
        _crash_point("after_decide")
        _finish_publish(path, txn)
    return {
        "branch": name, "tag": tag, "files_published": len(renames),
    }
