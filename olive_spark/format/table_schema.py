"""Table-schema sidecar: the directory-level schema authority for
evolved olive tables.

The olive format is self-describing per FILE (every chunk header carries
its own field names/types — reference src/header.zig:131-134), but the
reference has no DIRECTORY concept, so "the table's schema" after a
schema-evolving mutation is undefined there.  Without an authority, a
directory scan derives the schema from the FIRST listed file
(olive_datasource.OliveDataSource.schema), which silently drops columns
that only newer files carry — the exact failure mode
``merge_upsert(evolve_schema=True)`` must not have.

``_olive_schema.json`` fixes that: one plan-time GET that pins the
table's current column set and order.  It is written ONLY by
schema-evolving operations (atomic tmp+rename, single-writer contract —
same as the snapshot log); when present it wins over the first-file
header, and ``mergeSchema=true`` unions any extra header columns on top
of it.  Older files simply null-fill the columns they predate
(olive_datasource._cast_to), so no rewrite of untouched data is ever
needed — the same latest-schema-wins model Delta/Iceberg use for
add-column evolution, minus their per-version schema history (time
travel here reads old snapshots THROUGH the current schema; documented
in merge_upsert).

At 100 TB this matters twice over: evolution is O(1) in table size (no
data rewrite, one small JSON write), and plan time stays one GET instead
of a header read per file (the mergeSchema fallback) — the same
object-store argument as the stats manifest (format/manifest.py).
"""

from __future__ import annotations

import json
import os
import tempfile

from olive_spark.format.errors import ValidationError

SCHEMA_SIDECAR = "_olive_schema.json"
_SIDECAR_VERSION = 1


def sidecar_path(path: str) -> str:
    return os.path.join(path, SCHEMA_SIDECAR)


def _table_entry(path: str, table: "str | None") -> "dict | None":
    """The raw sidecar entry for ``table``: None when there is no
    sidecar or it doesn't cover the table; loud ValidationError when a
    sidecar exists but cannot be parsed — every consumer (schema
    authority AND drop tombstones) must fail rather than silently
    degrade on corruption."""
    p = sidecar_path(path)
    try:
        with open(p, "rb") as f:
            raw = f.read()
    except (FileNotFoundError, NotADirectoryError):
        # no sidecar — including the single-FILE scan mode, where
        # ``path`` is a chunk file and path/_olive_schema.json is not
        # a thing that could exist
        return None
    except OSError as e:
        raise ValidationError(f"unreadable schema sidecar {p}: {e}")
    try:
        doc = json.loads(raw)
        tables = doc["tables"]
        if table is None:
            if len(tables) != 1:
                return None
            entry = next(iter(tables.values()))
        else:
            entry = tables.get(table)
        if entry is not None and not isinstance(entry, dict):
            # a wrong-typed entry is corruption, not absence — falling
            # through would surface as a raw AttributeError downstream
            raise TypeError(f"table entry is {type(entry).__name__}")
        return entry
    except (KeyError, TypeError, ValueError) as e:
        raise ValidationError(f"corrupt schema sidecar {p}: {e}")


def _entry_schema(entry: dict, path: str):
    names = entry.get("fnames")
    types = entry.get("ftypes")
    if (
        not isinstance(names, list)
        or not isinstance(types, list)
        or len(names) != len(types)
        or not all(isinstance(n, str) and n for n in names)
    ):
        raise ValidationError(
            f"corrupt schema sidecar {sidecar_path(path)}: "
            "malformed table entry"
        )
    return list(names), list(types)


def read_table_schema(path: str, table: "str | None"):
    """Return ``(field_names, field_types_json)`` for ``table`` from the
    sidecar, or ``None`` when the directory has no sidecar or the
    sidecar does not cover ``table`` (multi-table chunks evolve
    per-table).  ``table=None`` mirrors the scan default (single-table
    directories): it resolves only when the sidecar has exactly one
    entry, else falls back to the header path (which raises the
    set-a-table error for multi-table chunks).  A sidecar that exists
    but cannot be parsed raises loudly — silently falling back to the
    first-file header would reintroduce the dropped-column hole the
    sidecar exists to close."""
    entry = _table_entry(path, table)
    if entry is None:
        return None
    return _entry_schema(entry, path)


def read_schema_and_dropped(path: str, table: "str | None"):
    """One parse for both sidecar facts: ``((names, types) | None,
    dropped_names)`` — the plan-time path reads the file once instead
    of once per consumer."""
    entry = _table_entry(path, table)
    if entry is None:
        return None, []
    return _entry_schema(entry, path), _entry_dropped(entry)


def _entry_dropped(entry: "dict | None") -> "list[str]":
    dropped = (entry or {}).get("dropped")
    if not isinstance(dropped, list):
        # a string here would silently tombstone its CHARACTERS; a
        # non-list is corruption — fail like every other sidecar fault
        if dropped is not None:
            raise ValidationError(
                f"corrupt schema sidecar: 'dropped' is "
                f"{type(dropped).__name__}, expected a list"
            )
        return []
    return [d for d in dropped if isinstance(d, str)]


def _entry_renames(entry: "dict | None") -> "dict[str, list[str]]":
    renames = (entry or {}).get("renames")
    if renames is None:
        return {}
    if not isinstance(renames, dict):
        raise ValidationError(
            f"corrupt schema sidecar: 'renames' is "
            f"{type(renames).__name__}, expected a map"
        )
    out: dict[str, list[str]] = {}
    for new, olds in renames.items():
        if not isinstance(new, str) or not isinstance(olds, list):
            raise ValidationError(
                "corrupt schema sidecar: malformed renames entry"
            )
        out[new] = [o for o in olds if isinstance(o, str)]
    return out


def read_renames(path: str, table: "str | None") -> "dict[str, list[str]]":
    """RENAME COLUMN history for ``table``: ``{current_name: [older
    names, newest first]}``.  The read path uses it to project a
    renamed column out of files written before the rename (the data
    still sits under the old name — rename is metadata-only); the old
    names are ALSO drop-tombstoned, so writers can't reintroduce them.
    Corrupt sidecars raise, same as every sidecar consumer."""
    return _entry_renames(_table_entry(path, table))


def read_dropped_columns(path: str, table: "str | None") -> "list[str]":
    """Names DROP COLUMN has tombstoned for ``table`` (empty when none,
    or no sidecar).  A dropped name is a TOMBSTONE, not a free slot:
    old files still hold its values, so re-adding the same name would
    silently resurface them where fresh NULLs are expected — writers
    refuse it.  ``table=None`` resolves like read_table_schema.
    Corrupt sidecars raise (via _table_entry): returning [] there
    would silently disarm the resurrection guard."""
    return _entry_dropped(_table_entry(path, table))


# ---- column-mapping IDs (Delta ColumnMapping / Iceberg field-IDs) ----
#
# A stable positive integer per column, assigned once and never reused.
# Activated lazily by the first DDL that needs identity-stable columns
# (rename/drop/add); appends on a mapped table reserve IDs for new
# columns at plan time.  Sidecar entry keys:
#   fids:     [int, ...] parallel to fnames — the CURRENT columns' IDs
#   next_fid: next unassigned ID (monotonic; aborted reservations leave
#             harmless gaps)
#   legacy:   {stored_name: fid} — which column's data a STORED name
#             holds in files written WITHOUT header field-ids.  Bound
#             once per name (first writer wins): after DROP x / ADD x,
#             legacy["x"] keeps pointing at the RETIRED id, so old
#             files' x-values stay invisible — exactly the resurrection
#             the per-name tombstones used to refuse.
#   reserved: {name: fid} — IDs handed to in-flight appends for columns
#             not yet in the schema; promoted to fids at commit.


def _entry_mapping(entry: "dict | None", path: str) -> "dict | None":
    """Parse the column-mapping keys of a sidecar entry: None when the
    table has no mapping (pre-activation), else {"fids", "next_fid",
    "legacy", "reserved"}.  Corruption raises loud, like every sidecar
    consumer — a silently dropped mapping would resurrect old data."""
    if entry is None:
        return None
    fids = entry.get("fids")
    if fids is None:
        return None
    names = entry.get("fnames")
    if (
        not isinstance(fids, list)
        or not isinstance(names, list)
        or len(fids) != len(names)
        or not all(isinstance(i, int) and i > 0 for i in fids)
        or len(set(fids)) != len(fids)
    ):
        raise ValidationError(
            f"corrupt schema sidecar {sidecar_path(path)}: malformed "
            "field-id list"
        )
    legacy = entry.get("legacy") or {}
    reserved = entry.get("reserved") or {}
    for m, key in ((legacy, "legacy"), (reserved, "reserved")):
        if not isinstance(m, dict) or not all(
            isinstance(k, str) and isinstance(v, int) and v > 0
            for k, v in m.items()
        ):
            raise ValidationError(
                f"corrupt schema sidecar {sidecar_path(path)}: "
                f"malformed {key!r} map"
            )
    nf = entry.get("next_fid")
    if not isinstance(nf, int) or nf <= max(
        [0, *fids, *legacy.values(), *reserved.values()]
    ):
        raise ValidationError(
            f"corrupt schema sidecar {sidecar_path(path)}: next_fid "
            "must exceed every assigned id"
        )
    return {
        "fids": list(fids),
        "next_fid": nf,
        "legacy": dict(legacy),
        "reserved": dict(reserved),
    }


def read_column_mapping(path: str, table: "str | None") -> "dict | None":
    """The table's column mapping for the READ path: ``{"names",
    "fids", "legacy"}`` (parallel names/fids = current schema), or None
    when mapping was never activated.  Missing sidecar/table → None;
    corrupt sidecar raises."""
    entry = _table_entry(path, table)
    m = _entry_mapping(entry, path)
    if m is None:
        return None
    names, _types = _entry_schema(entry, path)
    return {"names": names, "fids": m["fids"], "legacy": m["legacy"]}


def activate_column_mapping(
    path: str, table: str, field_names: list, field_types: list,
) -> dict:
    """Assign field-ids to ``table`` (idempotent).  Current columns get
    ids 1..n; every name the table has EVER stored data under — current
    names, rename aliases, dropped names — gets a ``legacy`` binding so
    files without header ids keep resolving exactly as before: aliases
    to their renamed column's id, dropped names to fresh RETIRED ids
    (assigned but absent from the schema → their old data stays
    invisible).  Returns {name: fid} for the current columns."""
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(path):
        entry = _table_entry(path, table)
        m = _entry_mapping(entry, path)
        if m is not None:
            names, _ = _entry_schema(entry, path)
            return dict(zip(names, m["fids"]))
        if entry is not None:
            field_names, field_types = _entry_schema(entry, path)
        fids = list(range(1, len(field_names) + 1))
        nxt = len(field_names) + 1
        legacy = dict(zip(field_names, fids))
        byname = dict(zip(field_names, fids))
        for cur, olds in _entry_renames(entry).items():
            if cur in byname:
                for o in olds:
                    legacy.setdefault(o, byname[cur])
        for d in _entry_dropped(entry):
            if d not in legacy:
                legacy[d] = nxt  # retired id: bound, never in schema
                nxt += 1
        _write_table_schema_locked(
            path, table, field_names, field_types,
            mapping={"fids": fids, "next_fid": nxt, "legacy": legacy,
                     "reserved": {}},
        )
        return dict(zip(field_names, fids))


def reserve_field_ids(path: str, table: "str | None", names: list) -> dict:
    """IDs for an append's columns on a MAPPED table: existing columns
    return their id, unknown names get a fresh id persisted under
    ``reserved`` (promoted to the schema at commit).  Two concurrent
    appends introducing the same new column converge on one id — the
    second sees the first's reservation.  Returns {} when the table has
    no mapping (writers then stamp nothing).  A reserved name's legacy
    binding is only added when the name was never bound — a re-added
    name keeps its old binding, protecting old files."""
    from olive_spark.format.lock import metadata_commit_lock

    entry = _table_entry(path, table)
    if _entry_mapping(entry, path) is None:
        return {}
    with metadata_commit_lock(path):
        entry = _table_entry(path, table)
        m = _entry_mapping(entry, path)
        if m is None:
            return {}
        cur_names, cur_types = _entry_schema(entry, path)
        byname = dict(zip(cur_names, m["fids"]))
        out: dict = {}
        dirty = False
        for n in names:
            if n in byname:
                out[n] = byname[n]
            elif n in m["reserved"]:
                out[n] = m["reserved"][n]
            else:
                fid = m["next_fid"]
                m["next_fid"] += 1
                m["reserved"][n] = fid
                m["legacy"].setdefault(n, fid)
                out[n] = fid
                dirty = True
        if dirty:
            _write_table_schema_locked(
                path, table if table is not None else _resolve_single(path),
                cur_names, cur_types, mapping=m,
            )
        return out


def _resolve_single(path: str) -> str:
    """table=None on a single-entry sidecar → the real table name."""
    p = sidecar_path(path)
    with open(p, "rb") as f:
        doc = json.loads(f.read())
    tables = doc.get("tables") or {}
    if len(tables) != 1:
        raise ValidationError(
            "table name required for a multi-table schema sidecar"
        )
    return next(iter(tables))


def write_table_schema(
    path: str, table: str, field_names: list, field_types: list,
    dropped: "list[str] | None" = None,
    renames: "dict[str, list[str]] | None" = None,
    fids: "list[int] | None" = None,
) -> None:
    """Record ``table``'s current schema in the sidecar (atomic
    tmp+rename; other tables' entries are preserved).  ``dropped`` /
    ``renames`` replace the table's tombstone list / rename map when
    given; otherwise existing values are PRESERVED (evolution/appends
    must not erase drop tombstones or rename history).  ``fids`` pins
    the field-ids explicitly (rename keeps ids across a name change);
    without it, a MAPPED table's ids carry over by name and new names
    take their reservation (or a fresh id).  Caller holds the
    single-writer contract."""
    if len(field_names) != len(field_types):
        raise ValidationError("field name/type count mismatch")
    # the RMW runs under the metadata commit lock: two concurrent
    # appends each extending the sidecar with different new columns
    # must both land (format/lock.metadata_commit_lock)
    from olive_spark.format.lock import metadata_commit_lock

    with metadata_commit_lock(path):
        _write_table_schema_locked(
            path, table, field_names, field_types, dropped, renames,
            fids=fids,
        )


def _write_table_schema_locked(
    path, table, field_names, field_types, dropped=None, renames=None,
    mapping=None, fids=None,
) -> None:
    p = sidecar_path(path)
    doc: dict = {"version": _SIDECAR_VERSION, "tables": {}}
    try:
        with open(p, "rb") as f:
            old = json.loads(f.read())
        if not isinstance(old.get("tables"), dict):
            raise ValueError("missing tables map")
        doc["tables"] = old["tables"]
    except FileNotFoundError:
        pass
    except (OSError, ValueError, TypeError) as e:
        # replacing a corrupt sidecar wholesale would silently DROP the
        # other tables' evolution entries in a multi-table directory —
        # their reads would then succeed via the first-file-header
        # fallback with evolved columns missing.  Fail loud; deleting
        # the sidecar is an explicit operator decision.
        raise ValidationError(
            f"corrupt schema sidecar {p}: {e} — delete it explicitly "
            "to reset (other tables' evolved schemas live in it too)"
        )
    prev = doc["tables"].get(table)
    if dropped is None:
        dropped = (prev or {}).get("dropped") or []
    if renames is None:
        renames = _entry_renames(prev if isinstance(prev, dict) else None)
    if mapping is None:
        mapping = _entry_mapping(
            prev if isinstance(prev, dict) else None, path
        )
        if mapping is not None:
            # mapped table, mapping not given: carry ids over by name;
            # new names take their reservation (append plan-time) or a
            # fresh id.  Every id assignment binds legacy once (first
            # writer wins — re-added names keep their OLD binding).
            prev_names, _ = _entry_schema(prev, path)
            byname = dict(zip(prev_names, mapping["fids"]))
            if fids is not None:
                if len(fids) != len(field_names):
                    raise ValidationError("fids/field_names length mismatch")
                new_fids = list(fids)
                for n, i in zip(field_names, new_fids):
                    mapping["reserved"].pop(n, None)
                    mapping["legacy"].setdefault(n, i)
                    mapping["next_fid"] = max(mapping["next_fid"], i + 1)
            else:
                new_fids = []
                for n in field_names:
                    if n in byname:
                        new_fids.append(byname[n])
                    elif n in mapping["reserved"]:
                        new_fids.append(mapping["reserved"].pop(n))
                    else:
                        i = mapping["next_fid"]
                        mapping["next_fid"] += 1
                        mapping["legacy"].setdefault(n, i)
                        new_fids.append(i)
            mapping["fids"] = new_fids
            if len(set(new_fids)) != len(new_fids):
                raise ValidationError(
                    f"duplicate field-ids for table {table!r}: {new_fids}"
                )
    doc["tables"][table] = {
        "fnames": list(field_names),
        "ftypes": list(field_types),
    }
    if dropped:
        doc["tables"][table]["dropped"] = list(dropped)
    if renames:
        doc["tables"][table]["renames"] = {
            k: list(v) for k, v in renames.items()
        }
    if mapping is not None:
        ent = doc["tables"][table]
        ent["fids"] = list(mapping["fids"])
        ent["next_fid"] = int(mapping["next_fid"])
        if mapping.get("legacy"):
            ent["legacy"] = dict(mapping["legacy"])
        if mapping.get("reserved"):
            ent["reserved"] = dict(mapping["reserved"])
    blob = json.dumps(doc, separators=(",", ":")).encode()
    fd, tmp = tempfile.mkstemp(dir=path, prefix=".schema-", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
