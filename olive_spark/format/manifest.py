"""Table-directory manifest: per-file row counts and chunk-level
column min/max, maintained at DataSource commit time.

Why this exists: at 100 TB a table is tens of thousands of chunk files,
and file-level stats pruning through per-file headers costs one I/O per
file at PLAN time on a fresh driver (the per-process header cache only
helps warm re-plans).  The manifest is one read for the whole directory
— the same planning-metadata move Delta/Iceberg make — so a selective
query prunes most files without opening any of them.

Safety model: entries are ADVISORY.  A file whose entry is missing, or
whose on-disk size differs from the recorded one, silently falls back
to the header-read pruning path — so out-of-band writers, a crashed
commit, or a stale manifest can never change results, only reduce
pruning.  The manifest itself is replaced atomically (tmp + os.replace)
under the table's documented single-writer contract; chunk filenames
are uuid-unique, so a (name, size) match cannot alias different data.

Stats are stored in the same comparison domain as the page stats
(writer._stats_value): timestamps as epoch-µs ints, dates as epoch
days, decimals as one-ulp-outward-rounded floats (numeric order —
string decimals would compare lexicographically and prune matching
rows), long strings as 64-char bounds (min: plain prefix, a valid
lower bound; max: prefix with its last code point bumped, a valid
upper bound).  Filter literals are NEVER truncated — truncating a
literal changes </> semantics.  stats_disprove below is the single
shared disproof routine for both this file-level path and the
page-level path in reader.select_pages.

The reference format has no directory layer at all (one chunk per file,
`/root/reference/src/chunk.zig`); manifests are this engine's
extension, like the directory scan itself.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional, Sequence

MANIFEST_NAME = "_olive_manifest.json"
_VERSION = 1


def _stats_domain(v: Any) -> Any:
    """Convert a filter literal into the stats comparison domain
    (counterpart of writer._stats_value; pure stdlib so the plan
    worker's manifest fast path needs no pyarrow/numpy import).
    Literals are converted, never truncated or widened — conservatism
    lives entirely on the stored-stats side.

    NAIVE datetimes are read through the PROCESS-LOCAL timezone, the
    same convention as format.partition._to_epoch_us: Spark's
    ``TimestampType.fromInternal`` materializes pushed literals as
    naive local datetimes, so the old treat-as-UTC conversion shifted
    stats pruning by the host's UTC offset on non-UTC hosts — wrongly
    pruning pages/files whose rows match (r9 review finding; the
    directory-pruning twin was the r8 advice item).  DST-ambiguous
    values return a ``(lo, hi)`` SPAN tuple; :func:`stats_disprove`
    prunes only when every reading is excluded."""
    import datetime
    import decimal

    if isinstance(v, datetime.datetime):
        from olive_spark.format.partition import _to_epoch_us

        lo, hi = _to_epoch_us(v)
        return lo if lo == hi else (lo, hi)
    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    if isinstance(v, decimal.Decimal):
        import math

        f = float(v)
        return f if math.isfinite(f) else None
    return v


def _string_upper_bound(prefix: str) -> "str | None":
    """Smallest-effort string >= every string starting with ``prefix``:
    bump the last bumpable code point and cut there.  None when nothing
    is bumpable.  Used for truncated string maxes AND prefix-predicate
    ranges (col LIKE 'abc%' matches values in [prefix, bump(prefix)))."""
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def stats_disprove(mn: Any, mx: Any, op: str, vals: list) -> bool:
    """True iff [mn, mx] PROVES no value can satisfy ``op vals`` —
    the one soundness-critical comparison, shared by file-level
    (entry_prunable) and page-level (reader.select_pages) pruning.
    Conservative on any doubt: cross-type comparisons keep the data.

    A literal may be a ``(lo, hi)`` SPAN tuple (DST-ambiguous naive
    timestamp, see :func:`_stats_domain`): pruning requires EVERY
    possible reading to be excluded."""
    if mn is None or mx is None:
        return False

    def span(v):
        return v if isinstance(v, tuple) else (v, v)

    try:
        if op == "=":
            lo, hi = span(vals[0])
            return hi < mn or lo > mx
        if op == "in":
            return all(
                s[1] < mn or s[0] > mx for s in (span(v) for v in vals)
            )
        if op == "<":
            # col < u for some stored value exists unless mn >= u for
            # EVERY reading of u
            return mn >= span(vals[0])[1]
        if op == "<=":
            return mn > span(vals[0])[1]
        if op == ">":
            return mx <= span(vals[0])[0]
        if op == ">=":
            return mx < span(vals[0])[0]
        if op == "startswith":
            # matches live in [prefix, bump(prefix))
            pre = vals[0]
            if not isinstance(pre, str):
                return False
            if mx < pre:
                return True
            up = _string_upper_bound(pre)
            return up is not None and mn >= up
    except TypeError:
        return False
    return False


def table_summary(tbl) -> dict:
    """Chunk-level summary of a pyarrow Table: row count + per-column
    min/max for stats-eligible top-level columns (writer._STATS_OK)."""
    import pyarrow.compute as pc

    from olive_spark.format.writer import _STATS_OK, _stats_value

    cols: dict[str, dict] = {}
    for name in tbl.schema.names:
        col = tbl.column(name)
        if not any(p(col.type) for p in _STATS_OK):
            continue
        try:
            mm = pc.min_max(col)
            mn = _stats_value(mm["min"], "min")
            mx = _stats_value(mm["max"], "max")
        except Exception:  # noqa: BLE001 — stats must never break a write
            continue
        if mn is None or mx is None:
            continue
        cols[name] = {"min": mn, "max": mx}
    # null counts for EVERY column (cheap; enables IS [NOT] NULL file
    # pruning regardless of the column's stats eligibility)
    nulls = {n: tbl.column(n).null_count for n in tbl.schema.names}
    return {"rows": tbl.num_rows, "columns": cols, "nulls": nulls}


def manifest_path(dirpath: str) -> str:
    return os.path.join(dirpath, MANIFEST_NAME)


def load_manifest(dirpath: str) -> dict:
    """{relpath: {"size": int, "rows": int, "columns": {...}}} — {} on
    missing or unreadable (the caller falls back to header pruning)."""
    try:
        with open(manifest_path(dirpath), "rb") as f:
            doc = json.load(f)
        if doc.get("version") != _VERSION:
            return {}
        files = doc.get("files")
        return files if isinstance(files, dict) else {}
    except Exception:  # noqa: BLE001
        return {}


def merge_manifest(dirpath: str, new_entries: dict) -> None:
    """Read-merge-replace: keep existing entries whose files still
    exist, overlay ``new_entries``, write atomically.  Driver-side only
    (DSv2 commit); the RMW runs under the metadata COMMIT lock
    (format/lock.metadata_commit_lock) so concurrent appenders don't
    last-write-wins each other's stats entries."""
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(dirpath):
        _merge_manifest_locked(dirpath, new_entries)


def _merge_manifest_locked(dirpath: str, new_entries: dict) -> None:
    merged = {
        rel: ent
        for rel, ent in load_manifest(dirpath).items()
        if os.path.exists(os.path.join(dirpath, rel))
    }
    merged.update(new_entries)
    doc = {"version": _VERSION, "files": merged}
    fd, tmp = tempfile.mkstemp(
        prefix=".manifest-", suffix=".tmp", dir=dirpath
    )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f, separators=(",", ":"))
        os.replace(tmp, manifest_path(dirpath))
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def lookup(manifest: dict, dirpath: str, fp: str) -> Optional[dict]:
    """Manifest entry for file ``fp`` iff its recorded size matches the
    file on disk; None → caller uses the header path."""
    if not manifest:
        return None
    rel = os.path.relpath(fp, dirpath)
    ent = manifest.get(rel)
    if not isinstance(ent, dict):
        return None
    try:
        if os.path.getsize(fp) != ent.get("size"):
            return None
    except OSError:
        return None
    return ent


def entry_prunable(
    entry: dict, predicates: Sequence[tuple[str, str, Any]]
) -> bool:
    """True iff the entry's chunk-level min/max PROVE no row matches
    (stats_disprove at file granularity)."""
    cols = entry.get("columns") or {}
    nulls = entry.get("nulls") or {}
    rows = entry.get("rows")
    for col, op, value in predicates:
        nc = nulls.get(col)
        if op == "isnull":
            if nc == 0:
                return True
            continue
        # every other pushed predicate is null-rejecting: a column with
        # no non-null values cannot satisfy it
        if nc is not None and rows is not None and nc == rows and rows > 0:
            return True
        if op == "notnull":
            continue
        st = cols.get(col)
        if not isinstance(st, dict):
            continue
        vals = [_stats_domain(x) for x in (value if op == "in" else [value])]
        if not vals or any(v is None for v in vals):
            continue
        if stats_disprove(st.get("min"), st.get("max"), op, vals):
            return True
    return False
