"""Change data feed over snapshot-logged olive tables: row-level
inserts/deletes (and, given keys, updates) between any two retained
versions, computed as a SNAPSHOT DIFF.

The reference format is batch-only with no versioning layer
(/root/reference/src/root.zig:9-16); this is the read side of the
engine's lakehouse extension — the consumer counterpart of
``merge_upsert``/``delete_where``/the streaming CDC sink.  Delta calls
the same surface Change Data Feed; our variant needs NO per-commit
change files because every mutation is a copy-on-write file rewrite
recorded in the snapshot log (format/snapshots.py), so the change set
between two versions is derivable from the file lists alone:

    added   = files(v1) − files(v0)     rows that may be new
    removed = files(v0) − files(v1)     rows that may be gone
    inserts = rows(added)  EXCEPT ALL rows(removed)
    deletes = rows(removed) EXCEPT ALL rows(added)

Rows that merely MOVED between files — compaction rewrites, untouched
bystanders inside a merged file — appear on both sides and cancel in
the multiset difference; rows in files common to both versions never
leave the plan at all.  Cost is therefore proportional to data the
versions actually disagree on (the rewritten files), not table size —
at 100 TB a merge that touched 3 files yields a diff that scans 6, via
the reader's ``files`` option (one relation per side, resolved
live-then-history).

Semantics are NET (endpoint) changes: a row inserted after ``since``
and deleted again before ``until`` is not reported — exactly what an
incremental consumer reconciling v0→v1 state needs.  For per-commit
granularity, :func:`read_changes_by_commit` labels each change row
with the version that produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHANGE_COL = "_change_type"
COMMIT_COL = "_commit_version"


def resolve_change_window(
    path: str,
    since: "int | None" = None,
    until: "int | None" = None,
    since_ts: "float | str | None" = None,
    until_ts: "float | str | None" = None,
) -> "tuple[int, int | None]":
    """Resolve a change window given versions OR timestamps (Delta's
    startingTimestamp/endingTimestamp shape): each timestamp maps to
    the latest commit at-or-before it (snapshots.version_at_timestamp —
    pre-history instants fail loud), and mixing a version with a
    timestamp for the SAME bound is refused."""
    from olive_spark.datasource.olive_datasource import (
        _parse_asof_timestamp,
    )
    from olive_spark.format.snapshots import version_at_timestamp

    if since_ts is not None:
        if since is not None:
            raise ValueError("pass since OR since_ts, not both")
        since = version_at_timestamp(path, _parse_asof_timestamp(since_ts))
    if until_ts is not None:
        if until is not None:
            raise ValueError("pass until OR until_ts, not both")
        until = version_at_timestamp(path, _parse_asof_timestamp(until_ts))
    if since is None:
        raise ValueError("a change window needs since or since_ts")
    return int(since), (int(until) if until is not None else None)


def read_changes(
    spark,
    path: str,
    since: "int | None" = None,
    until: "int | None" = None,
    table: str = "data",
    key_cols: "list[str] | None" = None,
    since_ts: "float | str | None" = None,
    until_ts: "float | str | None" = None,
) -> DataFrame:
    """Rows that changed between snapshot ``since`` and ``until``
    (default: the current version), labeled in ``_change_type``.
    Bounds can also be given as TIMESTAMPS (``since_ts``/``until_ts``,
    epoch seconds or ISO-8601 — Delta's startingTimestamp/
    endingTimestamp): each resolves to the latest commit at-or-before
    the instant via the same rule as ``snapshotAsOf``.

    Without ``key_cols``: ``insert`` / ``delete`` (an update surfaces
    as its delete + insert pair, like Delta CDF without key knowledge).
    With ``key_cols``: deletes whose key re-appears among the inserts
    are relabeled ``update_preimage`` and the matching inserts
    ``update_postimage`` — duplicate keys are legal, so the relabel is
    by key MEMBERSHIP, not row pairing.

    Both versions must still be retained (mutations with
    ``retain_history=True`` keep retired files readable; vacuum expires
    them — then this fails loud via resolve_paths, never returning a
    partial diff).  Reads use the table's CURRENT schema (evolution is
    latest-schema-wins — pre-evolution rows null-fill evolved columns,
    and a column added between the versions shows as NULL→value
    updates only where row content actually changed)."""
    import json as _json

    from olive_spark.datasource import register_olive
    from olive_spark.format.deletion import resolve_dv_paths
    from olive_spark.format.snapshots import (
        current_version,
        dv_state_at,
        files_at,
        resolve_paths,
    )

    register_olive(spark)
    since, until = resolve_change_window(
        path, since, until, since_ts, until_ts
    )
    v1 = int(until) if until is not None else current_version(path)
    v0 = int(since)
    if v1 < v0:
        raise ValueError(f"until ({v1}) must be >= since ({v0})")
    f0 = set(files_at(path, v0))
    f1 = set(files_at(path, v1))
    dv0 = dv_state_at(path, v0)
    dv1 = dv_state_at(path, v1)

    def scan(
        names: "list[str]", dvs: "dict[str, list[str]]",
        dv_mode: str = "drop",
    ) -> "DataFrame | None":
        if not names:
            return None
        # resolve on the driver FIRST: a removed file whose history was
        # vacuumed must raise the native ValidationError here, not a
        # wrapped plan-worker error mid-scan (and never a partial feed)
        resolve_paths(path, names)
        resolve_dv_paths(path, [n for v in dvs.values() for n in v])
        return (
            spark.read.format("olive")
            .option("table", table)
            .option("files", ",".join(sorted(names)))
            # EXPLICIT per-version DV state: the default (live
            # directory) would fold TODAY's deletes into a historical
            # side and corrupt the diff
            .option("dvs", _json.dumps(dvs))
            .option("dvMode", dv_mode)
            .load(path)
        )

    added_names = sorted(f1 - f0)
    removed_names = sorted(f0 - f1)
    df_add = scan(
        added_names, {t: dv1[t] for t in dv1 if t in f1 - f0}
    )
    df_rem = scan(
        removed_names, {t: dv0[t] for t in dv0 if t in f0 - f1}
    )
    # merge-on-read deletes: a DV added to a file BOTH versions share
    # changes rows without changing the file list — the rows at the
    # new DV positions (dv1 minus dv0; disjoint by construction, a DV
    # is computed over a folding scan) are deletes in this window
    dv_diff: dict[str, list[str]] = {}
    for t in f0 & f1:
        fresh = [n for n in dv1.get(t, []) if n not in set(dv0.get(t, []))]
        if fresh:
            dv_diff[t] = fresh
    if dv_diff:
        dv_del = scan(sorted(dv_diff), dv_diff, dv_mode="select")
        df_rem = dv_del if df_rem is None else df_rem.unionByName(dv_del)
    # the reverse direction (RESTORE undoing a DV): rows a dropped DV
    # un-deletes on a shared file are inserts in this window
    dv_undo: dict[str, list[str]] = {}
    for t in f0 & f1:
        undone = [n for n in dv0.get(t, []) if n not in set(dv1.get(t, []))]
        if undone:
            dv_undo[t] = undone
    if dv_undo:
        dv_ins = scan(sorted(dv_undo), dv_undo, dv_mode="select")
        df_add = dv_ins if df_add is None else df_add.unionByName(dv_ins)
    # any side carries the same sidecar-seeded session schema as the
    # live table; plan the extra full relation ONLY when both sides are
    # empty (per-relation plan cost is the Python-DS framework tax)
    some = df_add if df_add is not None else df_rem
    if some is None:
        some = spark.read.format("olive").option("table", table).load(path)
    cols = some.columns
    reserved = [CHANGE_COL] + (["__upd"] if key_cols else [])
    clash = [c for c in reserved if c in cols]
    if clash:
        raise ValueError(
            f"table columns collide with change-feed internals: {clash}"
        )
    empty = some.limit(0)
    if df_add is None and df_rem is None:
        return empty.withColumn(CHANGE_COL, F.lit("insert")).limit(0)
    df_add = df_add if df_add is not None else empty
    df_rem = df_rem if df_rem is not None else empty
    base_ins = df_add.exceptAll(df_rem)
    base_del = df_rem.exceptAll(df_add)
    if not key_cols:
        return base_ins.withColumn(CHANGE_COL, F.lit("insert")).unionByName(
            base_del.withColumn(CHANGE_COL, F.lit("delete"))
        )
    missing = [k for k in key_cols if k not in cols]
    if missing:
        raise ValueError(f"key columns not in table: {missing}")
    # keys present on BOTH sides are updates; relabel by key membership
    # with a slim marker join (the marker is the intersection of two
    # key sets drawn from already-bounded diff data)
    marker = (
        base_ins.select(*key_cols).distinct()
        .join(base_del.select(*key_cols).distinct(), key_cols, "inner")
        .withColumn("__upd", F.lit(True))
    )

    def label(side: DataFrame, hit: str, miss: str) -> DataFrame:
        return (
            side.join(marker, key_cols, "left")
            .withColumn(
                CHANGE_COL,
                F.when(F.col("__upd"), F.lit(hit)).otherwise(F.lit(miss)),
            )
            .drop("__upd")
        )

    return label(base_ins, "update_postimage", "insert").unionByName(
        label(base_del, "update_preimage", "delete")
    )


def read_changes_by_commit(
    spark,
    path: str,
    since: "int | None" = None,
    until: "int | None" = None,
    table: str = "data",
    key_cols: "list[str] | None" = None,
    since_ts: "float | str | None" = None,
    until_ts: "float | str | None" = None,
) -> DataFrame:
    """Per-COMMIT change feed: like :func:`read_changes`, but each
    change row carries the ``_commit_version`` that produced it — the
    granularity an audit trail or downstream CDC replayer needs (the
    endpoint diff deliberately nets out intermediate churn).

    Built as one endpoint diff per consecutive retained version pair in
    ``(since, until]``, unioned.  Each pair's cost is bounded by that
    commit's rewritten files; the union plans two relations per commit,
    so for ranges spanning MANY commits prefer :func:`read_changes`
    (net) or window the range.  Versions collapsed out of the log by
    ``snapshotMaxEntries``/vacuum fail loud in ``files_at``."""
    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import current_version, load_log

    register_olive(spark)
    since, until = resolve_change_window(
        path, since, until, since_ts, until_ts
    )
    v1 = int(until) if until is not None else current_version(path)
    v0 = int(since)
    if v1 < v0:
        raise ValueError(f"until ({v1}) must be >= since ({v0})")
    versions = sorted(
        int(e["v"]) for e in load_log(path)["entries"]
        if v0 <= int(e["v"]) <= v1
    )
    if not versions or versions[0] != v0 or versions[-1] != v1:
        # an out-of-range endpoint must fail loud, not silently
        # truncate the audit feed; files_at raises the canonical
        # unknown-snapshot error for whichever bound is bad
        from olive_spark.format.snapshots import files_at

        files_at(path, v0)
        files_at(path, v1)
    cols = (
        spark.read.format("olive").option("table", table).load(path).columns
    )
    if COMMIT_COL in cols:
        raise ValueError(
            f"table columns collide with change-feed internals: "
            f"['{COMMIT_COL}']"
        )
    out = None
    for prev, cur in zip(versions, versions[1:]):
        step = read_changes(
            spark, path, since=prev, until=cur, table=table,
            key_cols=key_cols,
        ).withColumn(COMMIT_COL, F.lit(cur))
        out = step if out is None else out.unionByName(step)
    if out is None:  # since == until: empty feed with the full schema
        return (
            read_changes(spark, path, since=v0, until=v0, table=table)
            .withColumn(COMMIT_COL, F.lit(v0)).limit(0)
        )
    return out


_CDC_CURSOR = "cdc_cursor.json"


def pump_changes(
    spark,
    path: str,
    state_dir: str,
    apply_fn,
    table: str = "data",
    key_cols: "list[str] | None" = None,
    starting_version: "int | None" = None,
    max_commits_per_run: "int | None" = None,
    starting_timestamp: "float | str | None" = None,
) -> dict:
    """Incremental CDC delivery: feed each NEW commit's change feed to
    ``apply_fn(changes_df, version)`` in version order, advancing a
    cursor sidecar — the streaming counterpart of the change feed (the
    Python DSv2 stream API can't host a CDC source: computing a diff
    needs distributed joins, which a partition reader can't run, so the
    pump drives per-commit ``read_changes`` jobs from the driver the
    way ``drain_available_now`` drives bounded epochs).  A scheduler
    calls this repeatedly; each call processes only commits past the
    cursor and returns ``{"applied": k, "cursor": v}``.

    Delivery is at-least-once with a ONE-commit replay window: the
    cursor (``<state_dir>/cdc_cursor.json``) advances only after
    ``apply_fn`` returns, so a crash between the two re-delivers
    exactly that commit next run — pair with an idempotent consumer
    (``foreach_batch_upsert`` keyed on the change keys, or any sink
    that dedups on ``(version, key)``) for exactly-once end-to-end.

    A fresh cursor seeds from ``starting_version``: the cursor means
    "applied THROUGH this version", so the table's current version
    (the default) delivers only future commits; ``0`` backfills from
    the beginning — version 1's full content arrives as one synthetic
    all-insert batch (there is no version 0 to diff against), every
    later commit as its real diff.  Commits the log has collapsed away
    (vacuum / snapshotMaxEntries) fail loud via ``files_at`` — CDC
    past the retention window is unrecoverable, never silently
    partial.  Like every snapshot consumer, cost per commit is bounded
    by that commit's REWRITTEN files, not table size."""
    import json
    import os
    import tempfile

    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import current_version, load_log

    from olive_spark.format.errors import ValidationError

    register_olive(spark)
    if starting_timestamp is not None:
        # seed-by-instant (Delta's startingTimestamp): resolved once,
        # only if this consumer has no cursor yet
        if starting_version is not None:
            raise ValueError(
                "pass starting_version OR starting_timestamp, not both"
            )
        from olive_spark.datasource.olive_datasource import (
            _parse_asof_timestamp,
        )
        from olive_spark.format.snapshots import version_at_timestamp

        starting_version = version_at_timestamp(
            path, _parse_asof_timestamp(starting_timestamp)
        )
    cursor_path = os.path.join(state_dir, _CDC_CURSOR)
    cursor: "int | None" = None
    try:
        with open(cursor_path) as f:
            doc = json.load(f)
        if isinstance(doc, dict) and isinstance(doc.get("version"), int) \
                and not isinstance(doc.get("version"), bool):
            cursor = int(doc["version"])
        else:
            # an EXISTING cursor that doesn't parse must fail loud:
            # reseeding from the head would silently skip every commit
            # between the consumer's real position and now — the exact
            # 'never silently partial' hole this feed promises to close
            raise ValidationError(
                f"unreadable CDC cursor {cursor_path}: {doc!r} — refusing "
                "to reseed (that would skip undelivered commits); repair "
                "or remove the file after reconciling the consumer"
            )
    except FileNotFoundError:
        pass  # fresh consumer — seeded below
    except (OSError, ValueError) as e:
        raise ValidationError(
            f"unreadable CDC cursor {cursor_path}: {e} — refusing to "
            "reseed (that would skip undelivered commits); repair or "
            "remove the file after reconciling the consumer"
        )

    def _persist(v: int) -> None:
        os.makedirs(state_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=state_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": int(v)}, f)
        os.replace(tmp, cursor_path)

    entries = sorted(int(e["v"]) for e in load_log(path)["entries"])
    if not entries:
        # every other snapshot consumer fails loud here (files_at);
        # a silent applied=0 loop would look configured while being
        # pointed at a log-less table or a mistyped path
        raise ValidationError(
            f"no snapshot log at {path} — the table was written before "
            "snapshot tracking, or the path is wrong; CDC needs the log"
        )
    if cursor is None:
        cursor = (
            int(starting_version) if starting_version is not None
            else current_version(path)
        )
        # the seed must land IMMEDIATELY: a default-seeded call with no
        # pending commits would otherwise re-seed from the (advanced)
        # head next time and silently skip every commit in between
        _persist(cursor)

    pending = [v for v in entries if v > cursor]
    if pending and 0 < cursor < entries[0]:
        # the cursor's version was collapsed out of the log: the
        # cursor→head diff is gone, and treating the oldest retained
        # snapshot as all-inserts would re-deliver rows the consumer
        # already applied.  CDC past retention is unrecoverable.
        raise ValidationError(
            f"CDC cursor {cursor} predates the oldest retained snapshot "
            f"{entries[0]} (vacuum/snapshotMaxEntries expired it) — the "
            "feed cannot resume without loss; re-seed the consumer from "
            "a full snapshot read"
        )
    if max_commits_per_run is not None:
        pending = pending[: int(max_commits_per_run)]
    applied = 0
    prev = cursor
    for v in pending:
        if prev < entries[0]:
            # backfill origin (cursor 0, or a log whose older entries
            # collapsed into a reset base): no retained version to diff
            # against — the first retained snapshot IS the initial
            # change set
            df = (
                spark.read.format("olive").option("table", table)
                .option("snapshot", v).load(path)
                .withColumn(CHANGE_COL, F.lit("insert"))
            )
        else:
            df = read_changes(
                spark, path, since=prev, until=v, table=table,
                key_cols=key_cols,
            )
        apply_fn(df, v)
        _persist(v)
        cursor = v
        prev = v
        applied += 1
    return {"applied": applied, "cursor": cursor}
