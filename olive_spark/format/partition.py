"""Hidden partitioning: Iceberg-style partition TRANSFORMS for olive
tables.

``.option("partitionBy", "days(ts)")`` lays files out as
``path/ts_day=2024-01-03/part-*.olive`` — the partition value is
DERIVED from a data column at write time and never stored as a column,
so queries filter on the real column (``ts BETWEEN …``) and the scan
planner maps those predicates onto directory INTERVALS to prune whole
partitions.  This is the event-time layout every 100 TB log/event
table needs: users never learn a synthetic ``day`` column exists, and
changing query predicates can't miss the pruning the way an explicit
derived column can.

Supported transforms (spec grammar is the ``partitionBy`` option):
- ``days(col)`` / ``months(col)`` / ``hours(col)`` over
  timestamp/date columns → dir key ``col_day|col_month|col_hour``,
  value ``%Y-%m-%d`` / ``%Y-%m`` / ``%Y-%m-%d-%H`` in UTC.  Range and
  equality predicates on ``col`` prune directories by interval
  overlap.
- ``bucket(N, col)`` over integral columns → dir key ``col_bucketN``,
  value ``pmod(col, N)`` (portable and SQL-replayable — a hash bucket
  would tie pruning to one hash implementation).  Equality/IN
  predicates on ``col`` prune to their bucket.
- a bare column name keeps the classic hive behavior (value stored in
  the data, string-equality dir pruning).

The transform spec is recorded in ``_olive_partition.json`` (written
at commit, idempotent) so the SCAN knows how to interpret directory
values; a missing/corrupt sidecar degrades to no transform pruning —
never wrong results, only fewer skipped directories (the same advisory
model as the stats manifest).  Mutations (merge/delete/update/compact)
on transform-partitioned tables are REFUSED loudly in v1: their
rewrite path reconstructs hive layouts from data columns, which hidden
values don't have.  Reference n/a (no directory layer,
/root/reference/src/root.zig:9-16).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
import tempfile

PARTITION_SIDECAR = "_olive_partition.json"

_SPEC_RE = re.compile(
    r"^\s*(?:(days|months|hours)\s*\(\s*(\w+)\s*\)"
    r"|bucket\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
    r"|(\w+))\s*$"
)

_KIND_SUFFIX = {"days": "day", "months": "month", "hours": "hour"}
_FMT = {"days": "%Y-%m-%d", "months": "%Y-%m", "hours": "%Y-%m-%d-%H"}


def parse_spec(spec: str) -> "list[dict]":
    """``"days(ts),region"`` → [{kind, col, dir}, …]; bare names get
    kind="identity"."""
    # split on commas OUTSIDE parentheses (bucket(N, col) has one inside)
    parts, depth, cur = [], 0, ""
    for ch in spec:
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        cur += ch
    parts.append(cur)
    out = []
    for part in parts:
        if not part.strip():
            continue
        if "(" not in part:
            # bare column name = classic hive identity — ANY legal
            # column name (hyphens, dots, …), exactly as before
            # transforms existed
            c = part.strip()
            out.append({"kind": "identity", "col": c, "dir": c})
            continue
        m = _SPEC_RE.match(part)
        if not m:
            raise ValueError(
                f"olive: bad partitionBy entry {part!r} — expected a "
                "column name, days(col), months(col), hours(col), or "
                "bucket(N, col)"
            )
        kind, tcol, bn, bcol, _plain = m.groups()
        if kind:
            out.append({
                "kind": kind, "col": tcol,
                "dir": f"{tcol}_{_KIND_SUFFIX[kind]}",
            })
        else:
            if int(bn) < 1:
                raise ValueError(
                    f"olive: bucket({bn}, {bcol}) — N must be >= 1"
                )
            out.append({
                "kind": "bucket", "col": bcol, "n": int(bn),
                "dir": f"{bcol}_bucket{bn}",
            })
    if not out:
        raise ValueError("olive: empty partitionBy spec")
    dirs = [t["dir"] for t in out]
    if len(set(dirs)) != len(dirs):
        raise ValueError(f"olive: duplicate partition dirs in {spec!r}")
    return out


def has_transforms(transforms: "list[dict]") -> bool:
    return any(t["kind"] != "identity" for t in transforms)


def derive_array(tbl, t: dict):
    """The dir-value array for one transform over a pyarrow table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = tbl.column(t["col"])
    if t["kind"] == "identity":
        return col
    if t["kind"] == "bucket":
        if not pa.types.is_integer(col.type):
            raise ValueError(
                f"olive: bucket({t['n']}, {t['col']}) needs an integral "
                f"column, got {col.type}"
            )
        n = pa.scalar(t["n"], col.type)
        # EXACT integer pmod (no float round-trip — snowflake IDs and
        # 64-bit hashes exceed float64's 2^53 exact range): truncating
        # integer divide, then sign fixup for negative values
        q = pc.divide(col, n)
        r = pc.subtract(col, pc.multiply(q, n))
        r = pc.if_else(
            pc.less(r, pa.scalar(0, col.type)), pc.add(r, n), r
        )
        return pc.cast(r, pa.int64())
    if pa.types.is_date(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    if not pa.types.is_timestamp(col.type):
        raise ValueError(
            f"olive: {t['kind']}({t['col']}) needs a timestamp/date "
            f"column, got {col.type}"
        )
    if col.type.tz not in (None, "UTC", "+00:00"):
        # dir values and scan-side intervals are BOTH UTC; a session-tz
        # array would format wall time in that zone and silently shift
        # rows across day boundaries relative to pruning
        col = pc.cast(col, pa.timestamp(col.type.unit, tz="UTC"))
    return pc.strftime(col, format=_FMT[t["kind"]])


def sidecar_path(dirpath: str) -> str:
    return os.path.join(dirpath, PARTITION_SIDECAR)


def write_sidecar(dirpath: str, transforms: "list[dict]") -> None:
    """Record the transform spec (atomic tmp+rename, idempotent); a
    CONFLICTING existing spec fails loud — two specs over one directory
    would make dir values uninterpretable."""
    existing = read_sidecar(dirpath)
    if existing is not None:
        if existing != transforms:
            raise ValueError(
                f"olive: partition spec conflict at {dirpath}: "
                f"recorded {existing}, writing {transforms}"
            )
        return
    doc = {"version": 1, "transforms": transforms}
    fd, tmp = tempfile.mkstemp(dir=dirpath, prefix=".part-", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, sidecar_path(dirpath))


_KINDS = {"identity", "days", "months", "hours", "bucket"}


def _valid_transform(t) -> bool:
    if not isinstance(t, dict):
        return False
    if t.get("kind") not in _KINDS:
        return False
    if not (isinstance(t.get("col"), str) and isinstance(t.get("dir"), str)):
        return False
    if t["kind"] == "bucket" and not (
        isinstance(t.get("n"), int) and t["n"] >= 1
    ):
        return False
    return True


def read_sidecar(dirpath: str) -> "list[dict] | None":
    """The recorded transform spec, or None when missing OR malformed —
    the sidecar is ADVISORY: a corrupt spec degrades to no transform
    pruning (and no rewrite refusal), never to a crashed scan."""
    try:
        with open(sidecar_path(dirpath)) as f:
            doc = json.load(f)
        ts = doc.get("transforms")
        if not isinstance(ts, list) or not all(
            _valid_transform(t) for t in ts
        ):
            return None
        return ts
    except (OSError, ValueError):
        return None


def build_transform_index(transforms: "list[dict]") -> "dict[str, list]":
    """{source_col: [transform, …]} for the non-identity entries —
    built ONCE per plan, not once per listed file."""
    by_col: dict = {}
    for t in transforms:
        if t["kind"] != "identity":
            by_col.setdefault(t["col"], []).append(t)
    return by_col


def _to_epoch_us(v) -> "int | None":
    """Pushed predicate value → epoch microseconds (UTC).  Naive
    datetimes are UTC by this engine's convention (session tz is pinned
    UTC everywhere timestamps are hash-oracled)."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, _dt.date):
        return int(_dt.datetime(
            v.year, v.month, v.day, tzinfo=_dt.timezone.utc
        ).timestamp() * 1_000_000)
    return None


def _dir_interval_us(kind: str, value: str) -> "tuple[int, int] | None":
    """[start, end) epoch-µs interval a temporal dir value covers."""
    try:
        if kind == "days":
            d = _dt.datetime.strptime(value, "%Y-%m-%d")
            start = d.replace(tzinfo=_dt.timezone.utc)
            end = start + _dt.timedelta(days=1)
        elif kind == "hours":
            d = _dt.datetime.strptime(value, "%Y-%m-%d-%H")
            start = d.replace(tzinfo=_dt.timezone.utc)
            end = start + _dt.timedelta(hours=1)
        elif kind == "months":
            d = _dt.datetime.strptime(value, "%Y-%m")
            start = d.replace(tzinfo=_dt.timezone.utc)
            end = (
                start.replace(year=start.year + 1, month=1)
                if start.month == 12
                else start.replace(month=start.month + 1)
            )
        else:
            return None
    except ValueError:
        return None
    return (int(start.timestamp() * 1e6), int(end.timestamp() * 1e6))


def transform_dir_prunable(
    dir_vals: "dict[str, str]", preds, transforms
) -> bool:
    """True iff a predicate on a SOURCE column proves this directory's
    derived value can't hold a matching row.  Conservative: unknown
    ops/values/kinds keep the directory.  ``transforms`` may be the raw
    list or a prebuilt :func:`build_transform_index` (pass the index
    from per-file loops)."""
    by_col = (
        transforms if isinstance(transforms, dict)
        else build_transform_index(transforms)
    )
    if not by_col:
        return False
    for col, op, val in preds:
        for t in by_col.get(col, ()):  # a col can have several transforms
            raw = dir_vals.get(t["dir"])
            if raw is None:
                continue
            if t["kind"] == "bucket":
                try:
                    b = int(raw)
                except ValueError:
                    continue
                n = t["n"]
                if op == "=" and isinstance(val, int) and val % n != b:
                    return True
                if op == "in" and all(
                    isinstance(v, int) and v % n != b for v in val
                ):
                    return True
                continue
            iv = _dir_interval_us(t["kind"], raw)
            if iv is None:
                continue
            s, e = iv
            if op == "in":
                us = [_to_epoch_us(v) for v in val]
                if all(u is not None and not (s <= u < e) for u in us):
                    return True
                continue
            u = _to_epoch_us(val)
            if u is None:
                continue
            if op == "=" and not (s <= u < e):
                return True
            # interval end is exclusive at µs resolution: max value in
            # the dir is e-1
            if op == ">" and e - 1 <= u:
                return True
            if op == ">=" and e - 1 < u:
                return True
            if op == "<" and s >= u:
                return True
            if op == "<=" and s > u:
                return True
    return False
