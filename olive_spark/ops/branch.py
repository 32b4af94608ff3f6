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

Branches stage APPENDS and, since r12 (verdict task #3), MUTATIONS:
``delete_on_branch`` / ``merge_on_branch`` record deletion vectors in
a branch-scoped DV set (``_olive_branch/<name>/_dv/`` + a ``dvs`` map
in the ref) that folds into every branch preview but never into live
scans; publish re-keys branch-file DVs to the published names and
lands base-file DVs as live DV commits — the audit-fix-publish loop
without Iceberg's full metadata forest.  One honest conflict rule: a
base-file DV whose target was rewritten (compact/merge) between
staging and publish refuses the publish loudly (the Iceberg
validation rule) — rebasing positions across a rewrite is the one
thing this layer does not do.

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


def append_to_branch(
    spark, df, path: str, name: str,
    epoch: "tuple[str, int] | None" = None,
) -> dict:
    """Stage ``df``'s rows on the branch: a normal executor-parallel
    writer job into a sibling temp dir, files moved under the branch
    directory (never visible to live scans), ref updated under the
    metadata commit lock so concurrent branch appends both land.

    ``epoch`` = (stream_key, batch_id) makes the append IDEMPOTENT for
    streaming delivery (r12): a microbatch replayed after a crash finds
    its (key, id) already recorded in the ref and skips — both the
    cheap pre-check here and the authoritative re-check inside the
    locked record.  A crash between the file moves and the record
    leaves unreferenced ``b-*`` strays in the branch dir (the replayed
    batch re-stages under a fresh run id); they die with the branch's
    rmtree at publish/drop."""
    from olive_spark.datasource import register_olive
    from olive_spark.datasource.olive_datasource import _list_chunk_files
    from olive_spark.format.lock import metadata_commit_lock
    from olive_spark.format.table_schema import read_column_mapping

    from olive_spark.ops.maintenance import _partition_layout

    register_olive(spark)
    ref = _load_ref(path, name)
    if epoch is not None and str(epoch[1]) in (
        ref.get("epochs") or {}
    ).get(str(epoch[0]), []):
        return {"branch": name, "files_added": 0, "replayed": True}
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
    landed = _record_branch_files(path, name, moved, stats, epoch=epoch)
    if not landed:
        return {"branch": name, "files_added": 0, "replayed": True}
    return {"branch": name, "files_added": len(moved)}


def _record_branch_files(
    path: str, name: str, moved: "list[str]", stats: dict,
    epoch: "tuple[str, int] | None" = None,
) -> bool:
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
        if epoch is not None:
            key, bid = str(epoch[0]), str(epoch[1])
            eps = {k: list(v) for k, v in (ref.get("epochs") or {}).items()}
            if bid in eps.get(key, []):
                # replayed microbatch raced the pre-check: drop the
                # re-staged copies, the first delivery already landed
                bdir = os.path.join(path, _BRANCH_DIR, name)
                for rel in moved:
                    try:
                        os.remove(os.path.join(bdir, rel))
                    except OSError:
                        pass
                return False
            eps.setdefault(key, []).append(bid)
            ref["epochs"] = eps
        ref["files"] = list(ref["files"]) + moved
        ref["stats"] = {**ref.get("stats", {}), **stats}
        _write_ref(path, name, ref)
        return True


def scan_branch(spark, path: str, name: str):
    """The DataFrame a publish would make live: base-version files plus
    branch files, with the BASE version's deletion-vector state (live
    DVs written after the base must not fold into the preview) PLUS the
    branch-scoped DVs staged by delete_on_branch/merge_on_branch."""
    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import files_at

    register_olive(spark)
    ref = _load_ref(path, name)
    base = (
        files_at(path, ref["base_version"])
        if ref["base_version"] else []  # branch on an empty table
    )
    names = _branch_scan_names(name, ref, base)
    if not names:
        return (
            spark.read.format("olive").option("table", ref["table"])
            .load(path).limit(0)
        )
    return (
        spark.read.format("olive")
        .option("table", ref["table"])
        .option("files", ",".join(names))
        .option("dvs", json.dumps(_branch_dv_state(path, name, ref)))
        .load(path)
    )


def _branch_dv_state(path: str, name: str, ref: dict) -> dict:
    """Merged DV map for the branch view: the BASE version's state plus
    the branch-scoped DVs recorded in the ref (targets are keyed
    exactly as the branch scan lists them — base rels for base files,
    ``_olive_branch/<name>/…`` rels for staged files)."""
    from olive_spark.format.snapshots import dv_state_at

    state = {
        t: list(n)
        for t, n in (
            dv_state_at(path, ref["base_version"])
            if ref["base_version"] else {}
        ).items()
    }
    for tgt, names in (ref.get("dvs") or {}).items():
        state[tgt] = sorted(state.get(tgt, []) + list(names))
    return state


def _branch_scan_names(name: str, ref: dict, base: "list[str]") -> list:
    return sorted(base) + [
        os.path.join(_BRANCH_DIR, name, rel) for rel in ref["files"]
    ]


def _stage_branch_dvs(positions_df, fc: str, pc: str, path: str,
                      name: str, run: str, table: str) -> list:
    """Write one branch-scoped DV per affected file, straight from
    executors (same shape as maintenance._stage_dv_positions, but the
    blobs land FINAL under ``_olive_branch/<name>/_dv/`` — invisible to
    everything until the ref records them, so no staging suffix is
    needed; unrecorded debris dies with the branch dir)."""
    import pandas as _pd

    def write_group(pdf):
        import hashlib as _hl
        import os as _os

        import numpy as _np

        from olive_spark.format import deletion as _D

        rel = pdf[fc].iloc[0]
        key = _hl.sha1(rel.encode()).hexdigest()[:12]
        dv_rel = _os.path.join(_BRANCH_DIR, name, "_dv", f"{run}-{key}.dv")
        dest = _os.path.join(path, dv_rel)
        _os.makedirs(_os.path.dirname(dest), exist_ok=True)
        blob = _D.encode_dv(rel, pdf[pc].to_numpy(_np.uint64), table=table)
        tmp = dest + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        _os.replace(tmp, dest)
        return _pd.DataFrame({"file": [rel], "dv": [dv_rel], "n": [len(pdf)]})

    out = (
        positions_df.groupBy(fc)
        .applyInPandas(write_group, "file string, dv string, n long")
        .collect()  # one slim row per affected file, never positions
    )
    return [(r["file"], r["dv"], int(r["n"])) for r in out]


def _record_branch_dvs(path: str, name: str, staged: list) -> None:
    """Fold staged branch DVs into the ref under the metadata commit
    lock (same RMW + loud-failure contract as _record_branch_files)."""
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(path):
        try:
            ref = _load_ref(path, name)
        except ValidationError:
            for _t, dv_rel, _n in staged:
                try:
                    os.remove(os.path.join(path, dv_rel))
                except OSError:
                    pass
            raise ValidationError(
                f"branch {name!r} at {path} was published (or dropped) "
                "while this mutation was staging — staged DVs removed"
            )
        dvs = {t: list(n) for t, n in (ref.get("dvs") or {}).items()}
        for target, dv_rel, _n in staged:
            dvs.setdefault(target, []).append(dv_rel)
        ref["dvs"] = {t: sorted(n) for t, n in dvs.items()}
        _write_ref(path, name, ref)


def delete_on_branch(spark, path: str, name: str, condition: str) -> dict:
    """``DELETE FROM <branch view> WHERE condition`` staged ON the
    branch (WAP phase 2, r12 verdict task #3): positions of matching
    rows — across base files AND branch-staged files, with existing
    branch DVs folded so re-deletes compose — are written as
    branch-scoped deletion vectors.  Live scans never see them; every
    branch preview folds them; publish lands them (base-file DVs as
    live DV commits, branch-file DVs re-keyed to the published names).

    Scale shape: one provenance scan filtered by the condition, DV
    blobs written from executors, one slim (file, dv, count) row per
    affected file to the driver — write cost ∝ deleted rows, exactly
    like live ``delete_where(mode='dv')``."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.format.lock import table_write_lock

    register_olive(spark)
    with table_write_lock(path):
        from olive_spark.format.snapshots import files_at

        ref = _load_ref(path, name)
        base = (
            files_at(path, ref["base_version"])
            if ref["base_version"] else []
        )
        names = _branch_scan_names(name, ref, base)
        if not names:
            return {"branch": name, "files_dv": 0, "rows_deleted": 0}
        fc, pc = "_olive_file", "_olive_pos"
        scan = (
            spark.read.format("olive")
            .option("table", ref["table"])
            .option("files", ",".join(names))
            .option("dvs", json.dumps(_branch_dv_state(path, name, ref)))
            .option("fileColumn", fc)
            .option("posColumn", pc)
            .load(path)
        )
        run = uuid.uuid4().hex[:8]
        staged = _stage_branch_dvs(
            scan.filter(F.expr(condition)).select(fc, pc),
            fc, pc, path, name, run, ref["table"],
        )
        if not staged:
            return {"branch": name, "files_dv": 0, "rows_deleted": 0}
        _record_branch_dvs(path, name, staged)
    return {
        "branch": name,
        "files_dv": len(staged),
        "rows_deleted": int(sum(n for _t, _d, n in staged)),
    }


def merge_on_branch(spark, src_df, path: str, name: str,
                    keys: "list[str]") -> dict:
    """Upsert ``src_df`` into the branch view (delete-and-insert MERGE
    staged on the branch): rows of the branch view whose key tuple
    appears in the source are deleted via branch-scoped DVs, then the
    whole source appends to the branch.  Publish makes it one live
    commit.  Matching is a broadcast-or-shuffle semi join on the keys —
    never a collected key list, so a 10⁹-row source works.

    A source with DUPLICATE key tuples is refused (standard MERGE
    semantics — Delta/Iceberg raise on multiple source rows per target
    match); silently appending both copies would turn the upsert into a
    fan-out insert."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.format.lock import table_write_lock

    register_olive(spark)
    if (
        src_df.groupBy(*keys).count()
        .filter(F.col("count") > 1).limit(1).count()
    ):
        raise ValueError(
            f"merge_on_branch: source has duplicate key tuples on "
            f"{keys} — MERGE requires at most one source row per key"
        )
    with table_write_lock(path):
        from olive_spark.format.snapshots import files_at

        ref = _load_ref(path, name)
        base = (
            files_at(path, ref["base_version"])
            if ref["base_version"] else []
        )
        names = _branch_scan_names(name, ref, base)
        staged: list = []
        if names:
            fc, pc = "_olive_file", "_olive_pos"
            scan = (
                spark.read.format("olive")
                .option("table", ref["table"])
                .option("files", ",".join(names))
                .option("dvs", json.dumps(_branch_dv_state(path, name, ref)))
                .option("fileColumn", fc)
                .option("posColumn", pc)
                .load(path)
            )
            matched = scan.join(
                src_df.select(*keys).dropDuplicates(list(keys)),
                on=list(keys), how="left_semi",
            ).select(fc, pc)
            run = uuid.uuid4().hex[:8]
            staged = _stage_branch_dvs(
                matched, fc, pc, path, name, run, ref["table"],
            )
            if staged:
                _record_branch_dvs(path, name, staged)
        # the insert leg stays INSIDE the table-lock hold: a publish
        # slipping between the DV record and the append would land the
        # deletes live while the inserts re-stage on a recreated branch
        # — a torn upsert; under the lock both legs publish together
        out = append_to_branch(spark, src_df, path, name)
    return {
        "branch": name,
        "rows_matched_deleted": int(sum(n for _t, _d, n in staged)),
        "files_dv": len(staged),
        "files_added": out["files_added"],
    }


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
            # branch DVs FIRST (r12): a DV under _olive_dv/<final>/ for
            # a not-yet-renamed chunk is an invisible orphan, while a
            # renamed chunk briefly missing its DV would expose deleted
            # rows to directory-authority scans.  Branch-file DVs are
            # re-encoded against their published target name; base-file
            # DVs move as-is.  Idempotent: dst-exists skips.
            for src_dv, final_target, final_dv in txn.get("dv_moves", ()):
                src = os.path.join(bdir, src_dv)
                dst = os.path.join(path, final_dv)
                if os.path.exists(dst):
                    try:
                        os.remove(src)
                    except OSError:
                        pass
                    continue
                if not os.path.exists(src):
                    raise OSError(
                        f"branch publish {txn['tag']}: DV {src_dv} "
                        "missing — cannot complete the committed publish"
                    )
                from olive_spark.format import deletion as _D

                blob = _D.encode_dv(
                    final_target, _D.read_positions(src),
                    table=txn.get("table"),
                )
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                with open(dst + ".tmp2", "wb") as f:
                    f.write(blob)
                os.replace(dst + ".tmp2", dst)
                try:
                    os.remove(src)
                except OSError:
                    pass
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
                dv_add=[
                    (t, dv) for _s, t, dv in txn.get("dv_moves", ())
                ],
                dv_remove=(),
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
                # delivered-epoch ids survive the publish: a streaming
                # microbatch whose first delivery just PUBLISHED must
                # still skip on crash-replay — dropping the ledger here
                # would re-stage it onto the re-created branch (rows
                # once live + once staged)
                "epochs": disk.get("epochs") or {},
                "created": disk.get("created", time.time()),
            })
        else:
            shutil.rmtree(bdir, ignore_errors=True)
        try:
            os.remove(os.path.join(path, _BRANCH_DIR, f"{name}.publish.json"))
        except FileNotFoundError:
            pass  # idempotent redo after a crash mid-cleanup


def _replacement_files(path: str, rel: str, base_version: int) -> list:
    """Transitive replacement set of base file ``rel``: walk the
    snapshot log AFTER the branch's base version; whenever a commit
    removes a file of the current set, its rows can only have moved
    into that commit's added files (compaction/merge/delete rewrite
    semantics) — union them in and keep walking.  Returns the
    still-LIVE members (a superset of where ``rel``'s rows now sit;
    the content join narrows it)."""
    from olive_spark.format.snapshots import list_live_files, load_log

    current = {rel}
    entries = sorted(
        load_log(path).get("entries", []), key=lambda e: int(e["v"])
    )
    for e in entries:
        if int(e["v"]) <= int(base_version):
            continue
        removed = set(e.get("remove") or ())
        if removed & current:
            current = (current - removed) | set(e.get("add") or ())
    return sorted(current & set(list_live_files(path)))


def rebase_branch(spark, path: str, name: str) -> dict:
    """Re-key the branch's base-file deletion vectors after a
    concurrent rewrite (r13, VERDICT r12 task #4 — the Iceberg
    rebase/cherry-pick move): for every branch DV whose target base
    file was compacted/merged away since staging, recover the DELETED
    ROWS from the original file (history read at the branch's base DV
    state), locate the same rows in the rewrite's replacement files by
    CONTENT (the engine's CDF is a content diff — there is no
    positional row map, so the bridge is the full-row JSON key with a
    per-key occurrence rank: deterministic pairing even under
    duplicate rows), and stage fresh branch DVs at the new positions.
    One ref read-modify-write then drops the stale records and adds
    the re-keyed ones — crash before it leaves only unrecorded blob
    debris that dies with the branch dir.

    Rows whose content no longer exists live (a concurrent
    delete_where already removed them) are DROPPED from the branch
    delete — the branch wanted them gone and they are gone; the count
    returns as ``rows_already_gone``.  Requires the rewritten file in
    ``_olive_history/`` (``retain_history=True`` rewrites); a vacuumed
    history fails loud — re-stage on a fresh branch.

    Scale shape: per conflicted file, two single-file provenance scans
    (original at base DV state, with/without the branch DV) and one
    scan of the bounded replacement set; the pairing join shuffles on
    the content key — cost ∝ rewritten data, never table size.  The
    default publish still REFUSES on conflicts; rebase is the explicit
    opt-in (``publish_branch(..., rebase=True)``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from olive_spark.datasource import register_olive
    from olive_spark.format.lock import table_write_lock
    from olive_spark.format.snapshots import (
        current_version, dv_state_at, list_live_files,
    )

    register_olive(spark)
    fc, pc = "_olive_file", "_olive_pos"
    with table_write_lock(path):
        ref = _load_ref(path, name)
        prefix = os.path.join(_BRANCH_DIR, name) + os.sep
        live_now = set(list_live_files(path))
        conflicts = sorted(
            t for t in (ref.get("dvs") or {})
            if not t.startswith(prefix) and t not in live_now
        )
        if not conflicts:
            return {"branch": name, "targets_rebased": 0,
                    "rows_rebased": 0, "rows_already_gone": 0}
        base_dv = dv_state_at(path, ref["base_version"]) \
            if ref["base_version"] else {}
        live_dv = dv_state_at(path, current_version(path))
        run = f"rebase-{uuid.uuid4().hex[:8]}"

        def _scan(files, dvs):
            return (
                spark.read.format("olive")
                .option("table", ref["table"])
                .option("files", ",".join(files))
                .option("dvs", json.dumps(
                    {t: v for t, v in dvs.items() if t in set(files)}
                ))
                .option("fileColumn", fc)
                .option("posColumn", pc)
                .load(path)
            )

        # ONE global pairing pass across every conflicted target (a
        # compact can merge several old files into one replacement;
        # per-target pairing would collide on duplicate content and
        # per-target staging would overwrite blobs): deleted rows =
        # the conflicted files at base DV state MINUS the same scan
        # with the branch DVs folded on top
        both = dict(base_dv)
        for t in conflicts:
            both[t] = sorted(
                list(both.get(t, [])) + list(ref["dvs"][t])
            )
        all_rows = _scan(conflicts, base_dv)
        kept = _scan(conflicts, both)
        cols = [c for c in all_rows.columns if c not in (fc, pc)]
        key = F.to_json(F.struct(*[F.col(c) for c in cols]))
        deleted = (
            all_rows.join(kept.select(fc, pc), [fc, pc], "left_anti")
            .select(
                key.alias("__key"),
                F.col(fc).alias("__tgt"),
                F.col(pc).alias("__opos"),
            )
        )
        wd = Window.partitionBy("__key").orderBy("__tgt", "__opos")
        dr = deleted.withColumn("__rk", F.row_number().over(wd))
        n_deleted = dr.count()
        repl = sorted(set().union(*[
            set(_replacement_files(path, t, ref["base_version"]))
            for t in conflicts
        ]))
        if not repl or n_deleted == 0:
            staged = []
        else:
            new_rows = _scan(repl, live_dv).select(
                key.alias("__key"), F.col(fc), F.col(pc)
            )
            wn = Window.partitionBy("__key").orderBy(fc, pc)
            nr = new_rows.withColumn("__rk", F.row_number().over(wn))
            matched = nr.join(
                dr.select("__key", "__rk"), ["__key", "__rk"]
            ).select(fc, pc)
            staged = _stage_branch_dvs(
                matched, fc, pc, path, name, run, ref["table"],
            )
        rows_rebased = int(sum(n for _t, _d, n in staged))
        rows_gone = int(n_deleted - rows_rebased)
        _crash_point("rebase_staged")
        # ONE ref RMW: drop every stale record + its blobs, add the
        # re-keyed ones
        from olive_spark.format.lock import metadata_commit_lock

        with metadata_commit_lock(path):
            ref = _load_ref(path, name)
            dvs = {t: list(n) for t, n in (ref.get("dvs") or {}).items()}
            stale_blobs: list = []
            for target in conflicts:
                stale_blobs.extend(dvs.pop(target, []))
            for t_new, dv_rel, _n in staged:
                if dv_rel not in dvs.setdefault(t_new, []):
                    dvs[t_new].append(dv_rel)
            ref["dvs"] = {t: sorted(n) for t, n in dvs.items()}
            _write_ref(path, name, ref)
        for b in stale_blobs:
            try:
                os.remove(os.path.join(path, b))
            except OSError:
                pass
    return {
        "branch": name,
        "targets_rebased": len(conflicts),
        "rows_rebased": int(rows_rebased),
        "rows_already_gone": int(rows_gone),
    }


def publish_branch(
    spark, path: str, name: str,
    expect: "dict[str, str] | None" = None,
    rebase: bool = False,
) -> dict:
    """Fast-forward the branch into the live table as ONE tagged
    snapshot commit (the "P" of WAP).  Appends staged on the branch
    never conflict with live commits made since the base (same
    WriteSerializable argument as plain appends), so no rebase step is
    needed — the branch rows simply land on top of the current state.

    ``expect`` ({rule_name: sql_bool_expr}) is the AUDIT gate: every
    expression must hold on EVERY branch row; violations refuse the
    publish with per-rule counts and leave the branch intact for
    inspection (:class:`BranchAuditError`).

    ``rebase=True`` (r13): when branch DVs target base files rewritten
    since staging, re-key them through :func:`rebase_branch` first
    instead of refusing — the refusal stays the default."""
    from pyspark.sql import functions as F

    from olive_spark.datasource import register_olive
    from olive_spark.format.lock import table_write_lock

    register_olive(spark)
    with table_write_lock(path):
        recover_branch_publishes(path)
        if rebase:
            # opt-in (r13): re-key DVs whose base files were rewritten
            # since staging; the refusal below stays the default path
            rebase_branch(spark, path, name)
        ref = _load_ref(path, name)
        if not ref["files"] and not ref.get("dvs"):
            # nothing staged (no files, no branch DVs): dropping the
            # empty branch IS the publish — an empty tagged commit
            # would only noise up the history.  Re-check under the
            # metadata lock: a concurrent append may have recorded
            # files since our ref read (appends take no table lock),
            # and rmtree-ing those would be silent loss
            from olive_spark.format.lock import metadata_commit_lock

            with metadata_commit_lock(path):
                ref = _load_ref(path, name)
                if not ref["files"] and not ref.get("dvs"):
                    shutil.rmtree(_bdir(path, name))
                    return {
                        "branch": name, "tag": None, "files_published": 0,
                    }
            # files landed meanwhile — fall through (ref refreshed, so
            # the audit below covers them) and publish them
        if expect and not ref["files"]:
            # delete-only branch (legal since delete_on_branch): there
            # are ZERO branch rows to audit — the gate vacuously holds.
            # Building the scan anyway would pass option('files','')
            # and the reader refuses an empty file list.
            pass
        elif expect:
            prefix = os.path.join(_BRANCH_DIR, name) + os.sep
            branch_only = (
                spark.read.format("olive")
                .option("table", ref["table"])
                .option("files", ",".join(
                    os.path.join(_BRANCH_DIR, name, r)
                    for r in ref["files"]
                ))
                # branch-scoped DVs on the branch's own files fold into
                # the audit: rows a branch mutation already deleted must
                # not fail (or pass) the gate — they will never publish
                .option("dvs", json.dumps({
                    t: v for t, v in (ref.get("dvs") or {}).items()
                    if t.startswith(prefix)
                }))
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
        # branch-scoped DV publication plan (r12): branch-file targets
        # re-key to their published names; base-file targets land as
        # live DVs — but ONLY if the base file is still live (a
        # compact/merge since staging rewrote the row grid; positions
        # don't rebase — refuse loudly, branch intact, the Iceberg
        # validation rule)
        prefix = os.path.join(_BRANCH_DIR, name) + os.sep
        dv_moves: list = []
        if ref.get("dvs"):
            from olive_spark.format.snapshots import list_live_files

            live_now = set(list_live_files(path))
            conflicts = []
            from olive_spark.format.deletion import DV_DIR as _DVD

            for target, dv_rels in sorted(ref["dvs"].items()):
                if target.startswith(prefix):
                    final_target = final_of.get(target[len(prefix):])
                    if final_target is None:
                        continue  # DV on a file no longer in the ref
                elif target in live_now:
                    final_target = target
                else:
                    conflicts.append(target)
                    continue
                for j, dv_rel in enumerate(sorted(dv_rels)):
                    dv_moves.append([
                        # src is bdir-relative (the marker's renames
                        # convention); recorded rels carry the branch
                        # dir prefix — strip it
                        dv_rel[len(prefix):]
                        if dv_rel.startswith(prefix) else dv_rel,
                        final_target,
                        os.path.join(
                            _DVD, final_target, f"{tag}-{j:04d}.dv"
                        ),
                    ])
            if conflicts:
                raise BranchAuditError(
                    f"branch {name!r} publish refused — its deletes "
                    f"target base files rewritten since staging "
                    f"(positions cannot rebase): {conflicts[:4]}"
                    + ("..." if len(conflicts) > 4 else "")
                    + "; re-apply the mutation on a fresh branch"
                )
        txn = {
            "name": name, "tag": tag, "renames": renames,
            "table": ref["table"],
            "dv_moves": dv_moves,
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
