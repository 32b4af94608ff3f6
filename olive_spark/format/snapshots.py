"""Snapshot log: time travel for olive table directories.

Because chunk files are immutable and writes append new uuid-named
files, a *snapshot* of a table is nothing more than the file list at a
commit point.  The log (``_olive_snapshots.json``, atomic tmp+replace
under the table's documented single-writer contract) records one entry
per commit — ``add`` names, ``remove`` names (compaction), and a
``reset`` flag (overwrite) — so any retained version's file list can be
replayed, and ``.option("snapshot", N)`` scans exactly that list.  The
same planning-metadata move as Delta/Iceberg's version log, scoped to
the advisory-sidecar safety model this engine uses everywhere:

- the log is ADVISORY for current-version scans — they keep listing the
  directory, so a lost or corrupt log never changes present-day
  results, only removes time travel;
- files replaced by ``compact(retain_history=True)`` move into
  ``_olive_history/`` (invisible to directory scans, which skip
  ``_``-prefixed directories) instead of being deleted, so older
  snapshots stay reconstructable until ``vacuum(retain_snapshots=K)``
  expires them;
- a snapshot whose files were removed without history retention fails
  LOUD with the missing names — never a silently partial table.

At 100 TB the entries are slim (names only — stats stay in the
directory manifest) and expiration collapses everything older than the
retention window into one reset base entry, so the log stays
O(retained versions + files).

The reference format has no directory layer at all (one chunk per
file, /root/reference/src/chunk.zig); snapshots are this engine's
extension, like the directory scan itself.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from olive_spark.format.errors import ValidationError
from olive_spark.format.lock import table_write_lock

SNAPSHOT_LOG = "_olive_snapshots.json"
HISTORY_DIR = "_olive_history"


def log_path(dirpath: str) -> str:
    return os.path.join(dirpath, SNAPSHOT_LOG)


def load_log(dirpath: str) -> dict:
    """Tolerant read: absent/corrupt/non-object logs yield an empty log
    (current-version scans never depend on it — advisory sidecar)."""
    try:
        with open(log_path(dirpath)) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return {"entries": []}
    if not isinstance(doc, dict) or not isinstance(doc.get("entries"), list):
        return {"entries": []}
    return doc


def _write_log(dirpath: str, log: dict) -> None:
    os.makedirs(dirpath, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dirpath, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(log, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, log_path(dirpath))


def current_version(dirpath: str) -> int:
    entries = load_log(dirpath)["entries"]
    return int(entries[-1]["v"]) if entries else 0


def list_live_files(dirpath: str) -> "list[str]":
    """Relative names of every live ``*.olive`` file under ``dirpath``,
    with the same walk semantics as directory scans: ``_``-prefixed
    directories are metadata (``_olive_history`` in particular must
    never leak into a live listing), but hive partition dirs for
    ``_``-named columns contain ``=`` and stay visible."""
    out: list[str] = []
    for root, dirs, files in os.walk(dirpath):
        dirs[:] = sorted(
            d for d in dirs
            if not (d.startswith("_") and "=" not in d)
            and not d.startswith(".")
        )
        for f in sorted(files):
            if f.endswith(".olive"):
                out.append(os.path.relpath(os.path.join(root, f), dirpath))
    return sorted(out)


def append_entry(
    dirpath: str, add, remove=(), reset: bool = False,
    tag: "str | None" = None, max_entries: "int | None" = None,
    dv_add=(), dv_remove=(), op: "str | None" = None,
    params: "dict | None" = None,
) -> int:
    """Record one commit; returns the new version number.  Single-writer
    contract (same as the stats manifest): no concurrent appenders.

    ``tag`` marks the entry with a caller id (the streaming sink uses
    its batch id, so a replay can tell whether the epoch's entry ever
    landed).  ``max_entries`` bounds the log: once exceeded, the oldest
    entries collapse into one reset base entry (versions keep counting
    — only replayability of the collapsed versions is lost), keeping
    per-append rewrite cost O(max_entries) for long-lived streams
    instead of O(stream age).

    First-entry seeding: a brand-new log over a directory that ALREADY
    holds ``.olive`` files not covered by this entry (a table written
    with raw ``write_chunk``, or a log a prior append failure
    invalidated) would make every later ``files_at`` silently omit
    those files — exactly the partial-table read this module promises
    never to produce.  So a non-reset first append seeds a ``base``
    entry from the live directory listing first; the commit itself then
    lands as version 2.

    Concurrency (r10): the read-merge-replace runs under the metadata
    COMMIT lock (format/lock.metadata_commit_lock), so two processes
    appending at once both land their entries — chunk files never
    conflict (uuid names), and this micro-critical-section is the only
    shared state.  Mutations still hold the long table lock for their
    whole op; their entries take the same commit lock here, so an
    append landing mid-mutation interleaves safely in the log."""
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(dirpath):
        return _append_entry_locked(
            dirpath, add, remove, reset, tag, max_entries,
            dv_add, dv_remove, op=op, params=params,
        )


def _append_entry_locked(
    dirpath, add, remove, reset, tag, max_entries, dv_add, dv_remove,
    op: "str | None" = None, params: "dict | None" = None,
) -> int:
    log = load_log(dirpath)
    entries = log["entries"]
    if not entries and not reset:
        preexisting = sorted(set(list_live_files(dirpath)) - set(add))
        if preexisting:
            base = {
                "v": 1,
                "ts": time.time(),
                "add": preexisting,
                "remove": [],
                "reset": True,
                "base": True,
                "seeded": True,
            }
            # pre-existing deletion vectors belong to the seeded base:
            # a time travel to the base must fold them, never
            # resurrect the deleted rows (format/deletion.py)
            dv_seed = _live_dv_state(dirpath)
            new_names = {d for _, d in dv_add}
            dv_seed = {
                t: [n for n in names if n not in new_names]
                for t, names in dv_seed.items()
            }
            dv_seed = {t: n for t, n in dv_seed.items() if n}
            if dv_seed:
                base["dv_base"] = dv_seed
            entries.append(base)
    v = int(entries[-1]["v"]) + 1 if entries else 1
    entry = {
        "v": v,
        "ts": time.time(),
        "add": sorted(add),
        "remove": sorted(remove),
    }
    if reset:
        entry["reset"] = True
    if tag is not None:
        entry["tag"] = str(tag)
    if op is not None:
        # commit provenance (the DESCRIBE HISTORY surface): a short verb
        # name plus slim JSON-able params — never data, never row sets
        entry["op"] = str(op)
    if params:
        entry["params"] = dict(params)
    if dv_add:
        entry["dv_add"] = sorted([t, d] for t, d in dv_add)
    if dv_remove:
        entry["dv_remove"] = sorted([t, d] for t, d in dv_remove)
    entries.append(entry)
    if max_entries is not None and len(entries) > max_entries:
        entries = _collapse_entries(entries, int(max_entries))
        log["entries"] = entries
        # tags of collapsed versions die with them (same rule as
        # expire): a dead tag would list in tags() but resolve to the
        # generic unknown-snapshot error
        tags = log.get("tags")
        if isinstance(tags, dict):
            kept_versions = {int(e["v"]) for e in entries}
            kept = {k: tv for k, tv in tags.items()
                    if isinstance(tv, int) and tv in kept_versions}
            if kept:
                log["tags"] = kept
            else:
                log.pop("tags", None)
    _write_log(dirpath, log)
    _fire_commit_listeners(dirpath)
    return v


#: process-local commit listeners: fired with the table's abspath after
#: every snapshot-log append (the one choke point every engine mutation
#: — append, merge, delete, compact, txn publish, stream epoch — goes
#: through).  register_table (olive_spark/table.py) uses this to keep
#: named temporary views version-fresh (r14, VERDICT r13 task #5): the
#: Python-DSv2 view pins its file list at CREATE, so the listener
#: re-issues the CREATE OR REPLACE after each commit to the viewed path.
#: Process-local by nature — a writer in ANOTHER process can't refresh
#: this session's views; register_table documents that boundary.
_COMMIT_LISTENERS: "list" = []


def add_commit_listener(fn) -> None:
    if fn not in _COMMIT_LISTENERS:
        _COMMIT_LISTENERS.append(fn)


def _fire_commit_listeners(dirpath: str) -> None:
    for fn in list(_COMMIT_LISTENERS):
        try:
            fn(os.path.abspath(dirpath))
        except Exception:  # noqa: BLE001 — a dead session must not fail commits
            pass


def _live_dv_state(dirpath: str) -> "dict[str, list[str]]":
    """Current deletion-vector state from the directory (advisory-log
    seeding only; lazy import keeps log reads cheap when no DVs exist)."""
    try:
        from olive_spark.format.deletion import list_dvs

        return list_dvs(dirpath)
    except Exception:  # noqa: BLE001 — seeding must never fail a commit
        return {}


def _apply_entry(e: dict, live: set, dv: "dict[str, list[str]]") -> None:
    """Fold one log entry into the (files, DV) replay state — the ONE
    place entry semantics live (files_at / dv_state_at / collapse /
    expire all replay through it).  A removed file's DVs die with it;
    a reset clears both; ``dv_base`` (collapsed base entries) replaces
    the DV map wholesale."""
    if e.get("reset"):
        live.clear()
        dv.clear()
    live.update(e.get("add", ()))
    for r in e.get("remove", ()):
        live.discard(r)
        dv.pop(r, None)
    base = e.get("dv_base")
    if isinstance(base, dict):
        dv.clear()
        dv.update({t: list(n) for t, n in base.items()})
    for t, d in e.get("dv_add", ()):
        cur = dv.setdefault(t, [])
        if d not in cur:
            cur.append(d)
    for t, d in e.get("dv_remove", ()):
        cur = dv.get(t)
        if cur and d in cur:
            cur.remove(d)
            if not cur:
                dv.pop(t, None)


def ensure_seeded(
    dirpath: str, files: "list[str] | None" = None,
    dv: "dict[str, list[str]] | None" = None,
) -> bool:
    """Seed a base entry from the CURRENT live listing (or an explicit
    ``files`` list) when no log exists yet; returns True if a base was
    written.

    Rewrite operations (merge/delete/compact) must call this BEFORE
    retiring any file: their ``append_entry`` runs only after the
    originals left the live directory, so first-append auto-seeding at
    that point would capture a post-rewrite listing and record a base
    that silently omits the replaced files — exactly the partial
    ``files_at`` read this module promises never to produce (r8 review
    finding).  Crash recovery passes ``files`` explicitly: there the
    pre-rewrite set must be RECONSTRUCTED (live minus activated
    replacements, plus the recovery manifest's originals) because the
    crash may already have activated some files."""
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(dirpath):
        return _ensure_seeded_locked(dirpath, files, dv)


def _ensure_seeded_locked(dirpath, files=None, dv=None) -> bool:
    log = load_log(dirpath)
    if log["entries"]:
        return False
    pre = sorted(files) if files is not None else list_live_files(dirpath)
    if not pre:
        return False
    base = {
        "v": 1,
        "ts": time.time(),
        "add": pre,
        "remove": [],
        "reset": True,
        "base": True,
        "seeded": True,
    }
    dv_seed = dv if dv is not None else _live_dv_state(dirpath)
    if dv_seed:
        base["dv_base"] = {t: sorted(n) for t, n in dv_seed.items() if n}
    log["entries"].append(base)
    _write_log(dirpath, log)
    return True


def has_tag(dirpath: str, tag: str) -> bool:
    """Whether any retained entry carries ``tag``.  Collapsed base
    entries keep no tags — callers treating absence as "re-log needed"
    must also check the files against the live set, since a collapsed
    entry's files live inside the base (see
    OliveStreamWriter._ensure_snapshot_for_replay)."""
    entries = load_log(dirpath)["entries"]
    return any(e.get("tag") == str(tag) for e in entries)


def _collapse_entries(entries: "list[dict]", retain: int) -> "list[dict]":
    """Collapse all but the last ``retain`` entries into one reset base
    entry holding the live set at the oldest retained version.  The
    base is marked ``base: True`` so history listings don't mistake it
    for a real overwrite."""
    keep = entries[-retain:]
    base_v = int(keep[0]["v"])
    live: set[str] = set()
    dv: dict[str, list[str]] = {}
    for e in entries:
        if int(e["v"]) > base_v:
            break
        _apply_entry(e, live, dv)
    base = {
        "v": base_v,
        "ts": keep[0].get("ts"),
        "add": sorted(live),
        "remove": [],
        "reset": True,
        "base": True,
    }
    if dv:
        base["dv_base"] = {t: sorted(n) for t, n in dv.items() if n}
    return [base] + keep[1:]


def _state_at(dirpath: str, version: int):
    """Replay the log up to ``version``: (sorted file names, DV map)."""
    entries = load_log(dirpath)["entries"]
    if not entries:
        raise ValidationError(
            f"no snapshot log at {dirpath} — the table was written before "
            "snapshot tracking, or the log was removed"
        )
    versions = [int(e["v"]) for e in entries]
    if int(version) not in versions:
        raise ValidationError(
            f"unknown snapshot {version}: log holds versions "
            f"{versions[0]}..{versions[-1]} "
            "(older versions may have been expired by vacuum)"
        )
    live: set[str] = set()
    dv: dict[str, list[str]] = {}
    for e in entries:
        if int(e["v"]) > int(version):
            break
        _apply_entry(e, live, dv)
    return sorted(live), {t: sorted(n) for t, n in dv.items() if n}


def files_at(dirpath: str, version: int) -> list[str]:
    """Replay the log up to ``version``; returns sorted relative names."""
    return _state_at(dirpath, version)[0]


def dv_state_at(dirpath: str, version: int) -> "dict[str, list[str]]":
    """Deletion-vector state AS OF ``version``: {target_rel: [dv names]}
    (names resolve live-then-history via deletion.resolve_dv_paths)."""
    return _state_at(dirpath, version)[1]


def resolve_paths(dirpath: str, names) -> list[str]:
    """Map snapshot-relative names to on-disk paths: the live directory
    first, then ``_olive_history/``.  Missing files fail loud."""
    out, missing = [], []
    for n in names:
        live = os.path.join(dirpath, n)
        hist = os.path.join(dirpath, HISTORY_DIR, n)
        if os.path.exists(live):
            out.append(live)
        elif os.path.exists(hist):
            out.append(hist)
        else:
            missing.append(n)
    if missing:
        raise ValidationError(
            "snapshot not reconstructable — files were removed without "
            f"history retention (compact(retain_history=True) keeps them; "
            f"vacuum(retain_snapshots=K) bounds how long): {missing[:5]}"
            + ("..." if len(missing) > 5 else "")
        )
    return out


def expire(dirpath: str, retain: int) -> dict:
    """Expire all but the last ``retain`` versions: older entries
    collapse into one reset base entry, and history files referenced
    ONLY by expired versions are deleted.  Returns
    {"retained", "expired", "history_deleted"}."""
    if retain < 1:
        raise ValueError("retain must be >= 1")
    # full log read-modify-write: must hold the table lock, or an
    # expire racing compact/merge/restore writes back a pre-op entry
    # list and silently loses that op's commit (reentrant, so facade
    # composition with ops that already hold it stays safe)
    with table_write_lock(dirpath):
        return _expire_locked(dirpath, retain)


def _expire_locked(dirpath: str, retain: int) -> dict:
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(dirpath):
        return _expire_commit(dirpath, retain)


def _expire_commit(dirpath: str, retain: int) -> dict:
    log = load_log(dirpath)
    entries = log["entries"]
    if not entries:
        return {"retained": 0, "expired": 0, "history_deleted": 0}
    keep = entries[-retain:]
    expired = len(entries) - len(keep)
    # single forward replay: accumulate the live set once, snapshotting
    # it at every retained version (replaying the whole log per
    # retained version would be O(retain x entries))
    keep_versions = {int(e["v"]) for e in keep}
    live: set[str] = set()
    dv: dict[str, list[str]] = {}
    referenced: set[str] = set()
    for e in entries:
        _apply_entry(e, live, dv)
        if int(e["v"]) in keep_versions:
            referenced.update(live)
            # DV files a retained version still folds must survive the
            # history prune alongside the chunk files they mask
            for names in dv.values():
                referenced.update(names)
    new_log = {"entries": _collapse_entries(entries, retain)}
    # tags are ALIASES, not retention pins: one naming an expired
    # version is dropped with it (kept tags keep resolving — the
    # collapsed base carries the oldest retained version's files)
    tags = log.get("tags")
    tags_dropped = 0
    if isinstance(tags, dict):
        kept_tags = {
            k: v for k, v in tags.items()
            if isinstance(v, int) and v in keep_versions
        }
        tags_dropped = len(tags) - len(kept_tags)
        if kept_tags:
            new_log["tags"] = kept_tags
    _write_log(dirpath, new_log)
    hist = os.path.join(dirpath, HISTORY_DIR)
    deleted = 0
    if os.path.isdir(hist):
        for root, _dirs, files in os.walk(hist):
            for fn in files:
                fp = os.path.join(root, fn)
                rel = os.path.relpath(fp, hist)
                if rel not in referenced:
                    try:
                        os.remove(fp)
                        deleted += 1
                    except OSError:
                        pass
    return {"retained": len(keep), "expired": expired,
            "history_deleted": deleted, "tags_dropped": tags_dropped}


def expire_older_than(
    dirpath: str, max_age_seconds: float, now: "float | None" = None
) -> dict:
    """Time-based retention (the ``VACUUM ... RETAIN n HOURS`` shape):
    expire every version whose commit timestamp is older than
    ``max_age_seconds``, always keeping at least the current one.
    Retention is the longest SUFFIX of entries newer than the cutoff —
    the log replays forward, so a mid-history entry can't be kept
    without everything after it; an entry missing a timestamp
    (hand-edited log) counts as old.  Delegates to :func:`expire`
    for the collapse + history pruning + tag drop."""
    entries = load_log(dirpath)["entries"]
    if not entries:
        return {"retained": 0, "expired": 0, "history_deleted": 0,
                "tags_dropped": 0}
    cutoff = (time.time() if now is None else float(now)) \
        - float(max_age_seconds)
    retain = 0
    for e in reversed(entries):
        ts = e.get("ts")
        if isinstance(ts, (int, float)) and float(ts) >= cutoff:
            retain += 1
        else:
            break
    return expire(dirpath, max(1, retain))


def version_at_timestamp(dirpath: str, ts: float) -> int:
    """Latest version whose commit timestamp is <= ``ts`` — Delta's
    ``timestampAsOf`` resolution rule.  An entry with no timestamp (a
    hand-edited log, or a collapse base whose source lacked one) counts
    as arbitrarily old ONLY when its version is below every known-ts
    entry (a collapse base predating all dated history); an undated
    entry sitting at or above dated entries is never served — treating
    it as old would hand back FUTURE data for instants long before it
    was committed (r12, ADVICE).  Raises when even the oldest retained
    entry is newer than ``ts``, and when the log is too ambiguous to
    place the cutoff (every entry undated): the table either didn't
    exist yet, that history has been expired, or the log can't answer
    — all must fail loud, never silently serve the closest newer
    version."""
    from olive_spark.format.errors import ValidationError

    entries = load_log(dirpath)["entries"]
    if not entries:
        raise ValidationError(f"no snapshot log at {dirpath}")
    cutoff = float(ts)
    best_known = None          # max v among known ts <= cutoff
    oldest = None              # oldest known ts (for the error message)
    min_known_v = None         # lowest version carrying ANY known ts
    max_known_v = None         # highest version carrying ANY known ts
    unknown_vs: list = []      # versions with no usable ts
    for e in entries:
        ets = e.get("ts")
        v = int(e["v"])
        if isinstance(ets, (int, float)):
            if oldest is None or float(ets) < oldest:
                oldest = float(ets)
            if min_known_v is None or v < min_known_v:
                min_known_v = v
            if max_known_v is None or v > max_known_v:
                max_known_v = v
            if float(ets) <= cutoff and (
                best_known is None or v > best_known
            ):
                best_known = v
        else:
            unknown_vs.append(v)
    if best_known is not None:
        # An undated version ABOVE best_known is ambiguous unless a
        # DATED version sits between them: that dated entry's ts is
        # > cutoff (else it would be best_known), which bounds every
        # later commit — including the undated one — past the cutoff.
        # Without such a ceiling the undated commit may well predate
        # the cutoff, and serving the older dated cut would be a
        # silent stale read (r13/r14, ADVICE r12/r13: covers both the
        # trailing-undated case and v1 ts=10 / v2 undated / v3 ts=100
        # at cutoff=50).
        ceiling = min(
            (
                int(e["v"]) for e in entries
                if isinstance(e.get("ts"), (int, float))
                and int(e["v"]) > best_known
            ),
            default=None,
        )
        ambiguous = [
            v for v in unknown_vs
            if v > best_known and (ceiling is None or v < ceiling)
        ]
        if ambiguous:
            raise ValidationError(
                f"snapshot log at {dirpath} is ambiguous at timestamp "
                f"{cutoff}: undated version(s) {sorted(ambiguous)} sit "
                f"above version {best_known} with no dated commit "
                "between them and the cutoff — cannot tell whether they "
                "predate it; read a version/tag instead"
            )
        return best_known
    # no dated entry at/before the cutoff: an undated entry is eligible
    # only when provably ancient — strictly below every dated version
    if unknown_vs and min_known_v is not None:
        anc = [v for v in unknown_vs if v < min_known_v]
        if anc:
            return max(anc)
    if unknown_vs and min_known_v is None:
        raise ValidationError(
            f"snapshot log at {dirpath} carries no commit timestamps — "
            f"cannot resolve timestamp {cutoff}; read a version/tag "
            "instead"
        )
    raise ValidationError(
        f"no snapshot at or before timestamp {cutoff} — the oldest "
        f"retained commit is at {oldest} (table created later, or "
        "earlier history expired); read a version/tag instead"
    )


def tag_version(
    dirpath: str, name: str, version: "int | None" = None
) -> int:
    """Name a retained snapshot (default: the current version) so time
    travel can address it symbolically: ``.option("snapshotTag", name)``
    reads the tagged version.  Tags live in the log's ``tags`` map —
    naming creates NO new commit, re-naming moves the tag (latest call
    wins), and a tag is an ALIAS, not a retention pin: ``expire`` drops
    tags whose version it collapses.  Taken under the table write
    lock: a tag is a full log read-modify-write, and one racing a
    compact/merge/restore commit would write back the pre-op entry
    list, losing that op (the lock is reentrant, so facade composition
    stays safe)."""
    from olive_spark.format.lock import metadata_commit_lock

    with table_write_lock(dirpath), metadata_commit_lock(dirpath):
        log = load_log(dirpath)
        v = (
            int(version) if version is not None
            else current_version(dirpath)
        )
        # validates v is a retained version (raises the canonical error)
        files_at(dirpath, v)
        tags = log.get("tags")
        if not isinstance(tags, dict):
            tags = {}
        tags[str(name)] = v
        log["tags"] = tags
        _write_log(dirpath, log)
    return v


def delete_version_tag(dirpath: str, name: str) -> bool:
    """Remove a snapshot tag; returns whether it existed.  Locked for
    the same read-modify-write reason as :func:`tag_version`."""
    from olive_spark.format.lock import metadata_commit_lock

    with table_write_lock(dirpath), metadata_commit_lock(dirpath):
        log = load_log(dirpath)
        tags = log.get("tags")
        if not isinstance(tags, dict) or str(name) not in tags:
            return False
        del tags[str(name)]
        if tags:
            log["tags"] = tags
        else:
            log.pop("tags", None)
        _write_log(dirpath, log)
    return True


def list_version_tags(dirpath: str) -> "dict[str, int]":
    tags = load_log(dirpath).get("tags")
    return dict(tags) if isinstance(tags, dict) else {}


def version_for_tag(dirpath: str, name: str) -> int:
    """Resolve a snapshot tag to its version; loud on unknown tags."""
    tags = list_version_tags(dirpath)
    if str(name) not in tags:
        known = sorted(tags) or "(none)"
        raise ValidationError(
            f"unknown snapshot tag {name!r} at {dirpath} — known: {known}"
        )
    return int(tags[str(name)])
