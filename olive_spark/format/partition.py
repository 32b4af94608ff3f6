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

Supported transforms also include (r9):
- ``truncate(W, col)`` — Iceberg truncate: integral columns floor to a
  multiple of W (dir value = the floor), string columns keep their
  first W codeunits (dir value = the prefix).  Equality/IN and range
  predicates prune both kinds.

The transform spec is recorded in ``_olive_partition.json`` (written
at commit, idempotent) so the SCAN knows how to interpret directory
values; a missing/corrupt sidecar degrades to no transform pruning —
never wrong results, only fewer skipped directories (the same advisory
model as the stats manifest).  Mutations (merge/delete/update/compact)
PRESERVE transform layouts (r9 — the v1 refusal is lifted): the
rewrite hands this sidecar's spec back to the writer, which re-derives
every rewritten/inserted row's dir value from the data
(ops/maintenance._partition_layout); ``respec_partitions`` migrates a
table to a new spec as one snapshot version.  Reference n/a (no
directory layer, /root/reference/src/root.zig:9-16).
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
    r"|(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
    r"|(\w+))\s*$"
)

_KIND_SUFFIX = {"days": "day", "months": "month", "hours": "hour"}
_FMT = {"days": "%Y-%m-%d", "months": "%Y-%m", "hours": "%Y-%m-%d-%H"}
_N_KIND_DIR = {"bucket": "bucket", "truncate": "trunc"}


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
                "column name, days(col), months(col), hours(col), "
                "bucket(N, col), or truncate(W, col)"
            )
        kind, tcol, nkind, bn, bcol, _plain = m.groups()
        if kind:
            out.append({
                "kind": kind, "col": tcol,
                "dir": f"{tcol}_{_KIND_SUFFIX[kind]}",
            })
        else:
            if int(bn) < 1:
                raise ValueError(
                    f"olive: {nkind}({bn}, {bcol}) — N must be >= 1"
                )
            out.append({
                "kind": nkind, "col": bcol, "n": int(bn),
                "dir": f"{bcol}_{_N_KIND_DIR[nkind]}{bn}",
            })
    if not out:
        raise ValueError("olive: empty partitionBy spec")
    dirs = [t["dir"] for t in out]
    if len(set(dirs)) != len(dirs):
        raise ValueError(f"olive: duplicate partition dirs in {spec!r}")
    return out


def has_transforms(transforms: "list[dict]") -> bool:
    return any(t["kind"] != "identity" for t in transforms)


def spec_to_string(transforms: "list[dict]") -> str:
    """Inverse of :func:`parse_spec` — the ``partitionBy`` option string
    that reproduces this spec.  Rewrite ops (merge/delete/update/
    compact) hand it to the writer so rewritten/inserted rows re-derive
    their dir values from the SAME transforms the table was laid out
    with."""
    parts = []
    for t in transforms:
        if t["kind"] == "identity":
            parts.append(t["col"])
        elif t["kind"] in ("bucket", "truncate"):
            parts.append(f"{t['kind']}({t['n']}, {t['col']})")
        else:
            parts.append(f"{t['kind']}({t['col']})")
    return ",".join(parts)


def shaping_columns(transforms: "list[dict]"):
    """PySpark Column expressions that co-locate rows by their derived
    dir value — the ``repartition`` keys rewrite ops use so a
    partitioned write emits bounded files per directory instead of one
    per (task, dir).  Shaping is advisory (a grouping mismatch vs
    :func:`derive_array` costs extra files, never wrong dirs — the
    writer re-derives per row), so plain JVM expressions suffice."""
    from pyspark.sql import functions as F

    cols = []
    for t in transforms:
        c = F.col(t["col"])
        if t["kind"] == "identity":
            cols.append(c)
        elif t["kind"] == "bucket":
            cols.append(F.pmod(c, F.lit(t["n"])))
        elif t["kind"] == "truncate":
            # string-prefix grouping covers both column types: for ints
            # it splits some dirs across groups (advisory — a few more
            # files, never a wrong dir; the writer re-derives per row)
            cols.append(F.substring(c.cast("string"), 1, t["n"]))
        else:  # days/months/hours — truncate the instant
            unit = {"days": "day", "months": "month", "hours": "hour"}[
                t["kind"]
            ]
            cols.append(F.date_trunc(unit, c))
    return cols


def derive_array(tbl, t: dict):
    """The dir-value array for one transform over a pyarrow table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = tbl.column(t["col"])
    if t["kind"] == "identity":
        return col
    if t["kind"] == "truncate":
        w = t["n"]
        if pa.types.is_integer(col.type):
            # Iceberg truncate semantics: floor to a multiple of W
            # (exact integer arithmetic, same rationale as bucket)
            n = pa.scalar(w, col.type)
            q = pc.divide(col, n)
            r = pc.subtract(col, pc.multiply(q, n))
            r = pc.if_else(
                pc.less(r, pa.scalar(0, col.type)), pc.add(r, n), r
            )
            return pc.cast(pc.subtract(col, r), pa.int64())
        if pa.types.is_string(col.type) or pa.types.is_large_string(
            col.type
        ):
            return pc.utf8_slice_codeunits(col, 0, w)
        raise ValueError(
            f"olive: truncate({w}, {t['col']}) needs an integral or "
            f"string column, got {col.type}"
        )
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


def replace_sidecar(dirpath: str, transforms: "list[dict]") -> None:
    """Point the directory at a NEW transform spec — the partition
    re-spec migration's metadata step (ops/maintenance.respec_partitions
    holds the table lock and rewrites the data; plain writes must keep
    using :func:`write_sidecar`, whose conflict check is what stops two
    specs drifting apart).  An identity-only spec REMOVES the sidecar —
    a stale transform entry would claim dir keys the layout no longer
    has."""
    if not has_transforms(transforms):
        try:
            os.remove(sidecar_path(dirpath))
        except FileNotFoundError:
            pass
        return
    doc = {"version": 1, "transforms": transforms}
    fd, tmp = tempfile.mkstemp(dir=dirpath, prefix=".part-", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, sidecar_path(dirpath))


_KINDS = {"identity", "days", "months", "hours", "bucket", "truncate"}


def _valid_transform(t) -> bool:
    if not isinstance(t, dict):
        return False
    if t.get("kind") not in _KINDS:
        return False
    if not (isinstance(t.get("col"), str) and isinstance(t.get("dir"), str)):
        return False
    if t["kind"] in ("bucket", "truncate") and not (
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


def _to_epoch_us(v) -> "tuple[int, int] | None":
    """Pushed predicate value → CLOSED epoch-µs interval ``[lo, hi]``
    of its possible absolute instants.

    Spark's ``TimestampType.fromInternal`` materializes filter literals
    as NAIVE datetimes in the PROCESS-LOCAL timezone (not UTC, not
    ``spark.sql.session.timeZone``), so a naive value must be read back
    through the local tz to recover the absolute epoch — treating it as
    UTC shifts pruning by the host's UTC offset and silently DROPS
    matching rows on non-UTC hosts.  ``datetime.timestamp()`` applies
    exactly that local interpretation.  Around a DST fold the naive
    wall-clock is ambiguous by the transition width; we evaluate both
    ``fold=0``/``fold=1`` readings and return their span, and callers
    prune only when the WHOLE span is excluded — ambiguity costs a
    little pruning, never a dropped row."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            lo = int(v.replace(fold=0).timestamp() * 1_000_000)
            hi = int(v.replace(fold=1).timestamp() * 1_000_000)
            return (min(lo, hi), max(lo, hi))
        u = int(v.timestamp() * 1_000_000)
        return (u, u)
    if isinstance(v, _dt.date):
        # DateType literals are calendar days; dir values for date
        # columns are formatted from the raw day (UTC-midnight epoch)
        u = int(_dt.datetime(
            v.year, v.month, v.day, tzinfo=_dt.timezone.utc
        ).timestamp() * 1_000_000)
        return (u, u)
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


def _truncate_prunable(raw: str, w: int, op: str, val) -> bool:
    """Pruning for ``truncate(W, col)`` dirs.  Integer dirs cover the
    discrete interval ``[d, d+W)``; string dirs cover exactly the
    strings whose first-W-codeunit prefix equals the dir value.
    Conservative on every type/op mismatch."""
    def one(v) -> bool:
        if isinstance(v, bool):
            return False
        if isinstance(v, int):
            try:
                d = int(raw)
            except ValueError:
                return False
            # max int in the dir is d + w - 1 (discrete values)
            if op == "=":
                return not (d <= v < d + w)
            if op == ">":
                return d + w - 1 <= v
            if op == ">=":
                return d + w - 1 < v
            if op == "<":
                return d >= v
            if op == "<=":
                return d > v
            return False
        if isinstance(v, str):
            p = raw  # dir value = the W-codeunit prefix
            if op == "=":
                return v[:w] != p
            # strings with prefix p: minimum is p itself; unbounded
            # above within the prefix — '<'/'<=' prune off the minimum,
            # '>'/'>=' only when p orders strictly below v's prefix
            # region (first difference inside the prefix decides)
            if op == "<":
                return p >= v
            if op == "<=":
                return p > v
            if op in (">", ">="):
                head = v[:len(p)]
                return p != head and p < head
            return False
        return False

    if op == "in":
        try:
            vals = list(val)
        except TypeError:
            return False

        def one_eq(v):
            if isinstance(v, bool):
                return False
            if isinstance(v, int):
                try:
                    d = int(raw)
                except ValueError:
                    return False
                return not (d <= v < d + w)
            if isinstance(v, str):
                return v[:w] != raw
            return False

        return bool(vals) and all(one_eq(v) for v in vals)
    return one(val)


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
            if t["kind"] == "truncate":
                if _truncate_prunable(raw, t["n"], op, val):
                    return True
                continue
            iv = _dir_interval_us(t["kind"], raw)
            if iv is None:
                continue
            s, e = iv
            # dir covers instants in [s, e); the END IS EXCLUSIVE with
            # no resolution assumption — sub-µs (timestamp[ns]) rows in
            # the last µs of a day/hour exceed e-1µs, so '>' / '>='
            # prune only when the literal reaches e itself.  Literal
            # spans (lo, hi) from _to_epoch_us prune only when EVERY
            # possible reading excludes the dir.
            if op == "in":
                spans = [_to_epoch_us(v) for v in val]
                if all(
                    sp is not None and (sp[1] < s or sp[0] >= e)
                    for sp in spans
                ):
                    return True
                continue
            sp = _to_epoch_us(val)
            if sp is None:
                continue
            lo, hi = sp
            if op == "=" and (hi < s or lo >= e):
                return True
            if op == ">" and lo >= e:
                return True
            if op == ">=" and lo >= e:
                return True
            if op == "<" and hi <= s:
                return True
            if op == "<=" and hi < s:
                return True
    return False
