"""Incrementally-maintained materialized aggregates over snapshot-logged
olive tables: the continuous-aggregate / `REFRESH MATERIALIZED VIEW
... INCREMENTALLY` surface a 100 TB lakehouse user expects once a table
has MERGE + a change feed.

The reference format is batch-only with no versioning layer
(/root/reference/src/root.zig:9-16); this module composes three of the
engine's own extensions — the snapshot log (format/snapshots.py), the
net change feed (ops/changes.py), and copy-on-write MERGE
(ops/maintenance.merge_upsert) — into view maintenance whose refresh
cost is proportional to what CHANGED, not to source-table size:

  full build   scan source once, aggregate, write the view (v1)
  refresh      diff = read_changes(since=last_refreshed_version):
               bounded by the files the mutations actually rewrote
    delta mode    per-group signed partials from the diff alone
                  (+insert / −delete), folded into the stored values —
                  the source table is NEVER rescanned.  Requires every
                  aggregate to be algebraically invertible (sum/count;
                  avg = store sum+count, divide at query time) and the
                  spec to carry one count(*) so emptied groups are
                  detected and dropped.
    regroup mode  any Spark aggregate (min/max/avg/collect…): the diff
                  only nominates TOUCHED group keys; those groups are
                  re-aggregated from the current source with a semi
                  join — cost ∝ data in touched groups, still not
                  table size when the source clusters by group key.
  apply        both modes land as ONE merge_upsert into the view —
               changed groups upsert, emptied groups tombstone-delete —
               so the view is itself a snapshot-logged table with time
               travel, CDF, checksum, and vacuum.

Exactness: delta-mode folding is addition in the view's own storage
types.  Over decimal/integer sums that is associative, so an
incremental refresh is bit-identical to a from-scratch rebuild (the
driver-gated query proves it against a plain-SQL oracle over the final
state).  Over float sums it differs by summation order like any
re-partitioned Spark aggregation; use decimal specs where exact parity
matters.

Crash safety: refresh records a ``pending`` marker (target source
version + a unique COMMIT TAG for the apply) in the state sidecar
before merging; the merge stamps that tag on its snapshot-log entry,
and the marker finalizes after.  Re-running after a crash between
those points checks whether the TAG appears in the view's snapshot
history: if yes the merge landed and the marker finalizes; if no the
delta is recomputed from the unchanged ``src_version`` — either way no
double-fold, and an UNRELATED commit on the view directory (compact,
vacuum log seeding) between crash and re-run cannot be mistaken for
the merge (tests/test_matview.py crash-injection tests).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, functions as F

STATE_FILE = "_olive_matview.json"

_AGG_RE = re.compile(r"^\s*(sum|count|min|max|avg)\s*\((.+)\)\s*$",
                     re.IGNORECASE | re.DOTALL)


def _parse_aggs(aggs: "dict[str, str]") -> "list[tuple[str, str, str]]":
    """(out_name, kind, inner_expr) per aggregate.  kind is the lowered
    outer function when it is one of the five we understand, else
    ``expr`` (regroup-only passthrough, e.g. nested arithmetic)."""
    out = []
    for name, spec in aggs.items():
        m = _AGG_RE.match(spec)
        if m:
            out.append((name, m.group(1).lower(), m.group(2).strip()))
        else:
            out.append((name, "expr", spec))
    return out


def _delta_blockers(parsed) -> "list[str]":
    return [
        f"{name}={kind}(...)" for name, kind, _ in parsed
        if kind not in ("sum", "count")
    ]


def _count_star_name(parsed) -> "str | None":
    for name, kind, inner in parsed:
        if kind == "count" and inner == "*":
            return name
    return None


def _state_path(mv_path: str) -> str:
    return os.path.join(mv_path, STATE_FILE)


def _load_state(mv_path: str) -> "dict | None":
    p = _state_path(mv_path)
    if not os.path.exists(p):
        return None
    with open(p, "r") as f:
        return json.load(f)


def _save_state(mv_path: str, state: dict) -> None:
    p = _state_path(mv_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def _agg_columns(parsed) -> "list":
    cols = []
    for name, kind, inner in parsed:
        spec = f"{kind}({inner})" if kind != "expr" else inner
        cols.append(F.expr(spec).alias(name))
    return cols


def _cast_to_view(df: DataFrame, view_schema, names) -> DataFrame:
    """Cast ``names`` columns to the view's stored types: delta folding
    widens decimals (d(28,2)+d(28,2) -> d(29,2)) and merge_upsert
    rightly refuses silent casts, so the fold result is re-narrowed
    here, deliberately."""
    types = {f.name: f.dataType for f in view_schema.fields}
    return df.select(
        *[
            F.col(c).cast(types[c]).alias(c) if c in names else F.col(c)
            for c in df.columns
        ]
    )


def refresh_matview(
    spark,
    src_path: str,
    mv_path: str,
    group_cols: "list[str]",
    aggs: "dict[str, str]",
    src_table: str = "data",
    mv_table: str = "matview",
    mode: str = "auto",
) -> dict:
    """Create or incrementally refresh a materialized aggregate of the
    snapshot-logged olive table at ``src_path``.

    ``aggs`` maps output column name -> SQL aggregate expression over
    source columns (e.g. ``{"n": "count(*)", "s": "sum(x)"}``).
    ``mode``: ``delta`` folds signed change-feed partials (sum/count
    only, count(*) required), ``regroup`` re-aggregates touched groups
    from the source (any aggregate), ``auto`` picks delta when legal.
    Group columns must be non-null (they key the view's MERGE; the
    underlying merge enforces it).

    Returns {"mode", "since", "until", "changed_groups",
    "dropped_groups", "view_version"}.  Refuses to adopt a directory
    whose state sidecar disagrees with the requested spec — a view is
    defined once; make a new directory for a new definition."""
    from olive_spark.datasource import register_olive
    from olive_spark.format.snapshots import current_version
    from olive_spark.ops.changes import CHANGE_COL, read_changes
    from olive_spark.ops.maintenance import merge_upsert

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    parsed = _parse_aggs(aggs)
    if not parsed:
        raise ValueError("aggs must be non-empty")
    clash = [n for n in aggs if n in group_cols]
    if clash:
        raise ValueError(f"agg output names collide with group_cols: {clash}")
    if mode not in ("auto", "delta", "regroup"):
        raise ValueError(f"unknown mode {mode!r}")
    blockers = _delta_blockers(parsed)
    if mode == "delta" and blockers:
        raise ValueError(
            "delta mode needs invertible aggregates (sum/count); "
            f"not invertible: {blockers} — use mode='regroup' "
            "(avg: store sum+count and divide at query time)"
        )
    eff_mode = mode
    if mode == "auto":
        eff_mode = "regroup" if blockers else "delta"
    cnt_name = _count_star_name(parsed)
    if eff_mode == "delta" and cnt_name is None:
        raise ValueError(
            "delta mode requires a count(*) aggregate in the spec — "
            "it is how emptied groups are detected and dropped"
        )

    register_olive(spark)
    cur = current_version(src_path)
    state = _load_state(mv_path)
    spec = {
        "group_cols": list(group_cols),
        "aggs": dict(aggs),
        "src_table": src_table,
        "mv_table": mv_table,
    }

    if state is None:
        if os.path.exists(mv_path) and any(
            n.endswith(".olive") for n in os.listdir(mv_path)
        ):
            raise ValueError(
                f"{mv_path} holds olive data but no {STATE_FILE} — "
                "refusing to adopt an unknown table as a view"
            )
        src = (
            spark.read.format("olive").option("table", src_table)
            .load(src_path)
        )
        view = src.groupBy(*group_cols).agg(*_agg_columns(parsed))
        view.write.format("olive").option("table", mv_table) \
            .mode("append").save(mv_path)
        _save_state(mv_path, {**spec, "src_version": cur})
        return {
            "mode": "full", "since": None, "until": cur,
            "changed_groups": -1, "dropped_groups": 0,
            "view_version": current_version(mv_path),
        }

    stored_spec = {k: state.get(k) for k in spec}
    if stored_spec != spec:
        raise ValueError(
            f"view spec mismatch: stored {stored_spec} vs requested "
            f"{spec} — a view's definition is fixed at creation"
        )

    pending = state.get("pending")
    if pending:
        # a prior refresh crashed between merge and finalize.  "Did the
        # merge land?" is answered by the pending apply's COMMIT TAG in
        # the view's snapshot history — a bare version-advance check
        # would mistake any unrelated commit on the view directory
        # (compact, vacuum log seeding) for the merge and permanently
        # skip the [since, until] change window (r8 advice finding).
        # Legacy pending markers (no tag recorded) keep the old
        # version-advance heuristic rather than double-folding.
        from olive_spark.format.snapshots import has_tag

        tag = pending.get("tag")
        if tag is not None:
            landed = has_tag(mv_path, tag)
        else:
            landed = current_version(mv_path) > pending["mv_version_before"]
        if landed:
            state["src_version"] = pending["until"]
        state.pop("pending")
        _save_state(mv_path, state)

    since = int(state["src_version"])
    if since == cur:
        return {
            "mode": "noop", "since": since, "until": cur,
            "changed_groups": 0, "dropped_groups": 0,
            "view_version": current_version(mv_path),
        }

    feed = read_changes(spark, src_path, since=since, until=cur,
                        table=src_table)
    view_df = (
        spark.read.format("olive").option("table", mv_table).load(mv_path)
    )
    agg_names = [n for n, _, _ in parsed]

    if eff_mode == "delta":
        sign = F.when(F.col(CHANGE_COL) == "insert", F.lit(1)) \
            .otherwise(F.lit(-1))
        partials = []
        for name, kind, inner in parsed:
            if kind == "count":
                if inner == "*":
                    partials.append(F.sum(sign).alias(name))
                else:
                    partials.append(
                        F.sum(
                            F.when(F.expr(inner).isNotNull(), sign)
                            .otherwise(F.lit(0))
                        ).alias(name)
                    )
            else:  # sum: NULL source values vanish from F.sum either way
                partials.append(F.sum(F.expr(inner) * sign).alias(name))
        deltas = feed.groupBy(*group_cols).agg(*partials)
        old = view_df.select(
            *group_cols, *[F.col(n).alias(f"__old_{n}") for n in agg_names]
        )
        joined = deltas.join(old, list(group_cols), "left")
        folded = []
        for name, kind, inner in parsed:
            o, d = F.col(f"__old_{name}"), F.col(name)
            if kind == "count":
                # count partials are never NULL; old is NULL for brand-
                # new groups
                folded.append((F.coalesce(o, F.lit(0)) + d).alias(name))
            else:
                # sum semantics: NULL means "no non-null values seen";
                # folding must preserve that, not coerce to 0
                folded.append(
                    F.when(o.isNull(), d)
                    .when(d.isNull(), o)
                    .otherwise(o + d).alias(name)
                )
        new_rows = joined.select(*group_cols, *folded)
        new_rows = _cast_to_view(new_rows, view_df.schema, set(agg_names))
        apply_src = new_rows.withColumn(
            "_mv_drop", F.col(cnt_name) <= F.lit(0)
        )
    else:  # regroup
        touched = feed.select(*group_cols).distinct()
        src = (
            spark.read.format("olive").option("table", src_table)
            .load(src_path)
        )
        recomputed = (
            src.join(touched, list(group_cols), "left_semi")
            .groupBy(*group_cols).agg(*_agg_columns(parsed))
        )
        vanished = touched.join(
            recomputed.select(*group_cols), list(group_cols), "left_anti"
        )
        for name, _, _ in parsed:
            vanished = vanished.withColumn(name, F.lit(None))
        both = recomputed.withColumn("_mv_drop", F.lit(False)).unionByName(
            vanished.withColumn("_mv_drop", F.lit(True))
        )
        apply_src = _cast_to_view(both, view_df.schema, set(agg_names))

    # one materialization of the (aggregated, group-sized) change set:
    # counts for the caller, and the merge re-reads it without
    # re-running the diff lineage
    apply_src = apply_src.persist()
    try:
        n_changed = apply_src.count()
        n_drop = apply_src.filter(F.col("_mv_drop")).count()
        if n_changed == 0:
            # mutations netted out to zero row-level change (e.g. a
            # compaction-only version range): just advance the cursor
            state["src_version"] = cur
            _save_state(mv_path, state)
            return {
                "mode": eff_mode, "since": since, "until": cur,
                "changed_groups": 0, "dropped_groups": 0,
                "view_version": current_version(mv_path),
            }
        # the tag names this specific apply (uuid-scoped, not just the
        # until-version: two crashed attempts at the same window must
        # not read each other's commits)
        import uuid as _uuid

        apply_tag = f"matview:{cur}:{_uuid.uuid4().hex[:8]}"
        state["pending"] = {
            "until": cur, "mv_version_before": current_version(mv_path),
            "tag": apply_tag,
        }
        _save_state(mv_path, state)
        merge_upsert(
            spark, mv_path, apply_src, key_cols=list(group_cols),
            table=mv_table, delete_col="_mv_drop", retain_history=True,
            commit_tag=apply_tag,
        )
        state.pop("pending")
        state["src_version"] = cur
        _save_state(mv_path, state)
    finally:
        apply_src.unpersist()
    return {
        "mode": eff_mode, "since": since, "until": cur,
        "changed_groups": n_changed, "dropped_groups": n_drop,
        "view_version": current_version(mv_path),
    }
