"""Write-time data-quality expectations: named boolean rules gate what
enters a table, with three actions per rule — ``warn`` (count and let
through), ``drop`` (count and discard), ``quarantine`` (count and
divert the row, with its failure labels, to a sidecar table for
triage).  The Delta-Live-Tables-style constraint surface
(CONSTRAINT … EXPECT … ON VIOLATION), re-expressed Spark-first.

Semantics:

- A rule is a SQL boolean expression over the batch's columns.  NULL
  counts as a FAILURE (SQL CHECK semantics would pass NULL; a data
  GATE must not — an unparseable price is exactly what you quarantine).
- Every rule is evaluated on every row in one projection (no
  per-rule passes); a row's disposition is the STRICTEST action among
  its failed rules (quarantine > drop > warn).
- Quarantined rows keep their full payload plus ``_failed_rules``
  (array of rule names, deterministic order) and land in
  ``<path>/_olive_quarantine/`` — itself a snapshot-logged olive
  table, so triage gets time travel and the change feed like any
  other table.  They can be repaired and re-ingested later; re-ingest
  goes through the gate again.
- The gate is ONE wide projection + two filtered writes: rows stream
  through a single stage, per-rule failure counts come from the same
  pass via observe() metrics (no second scan), and at 100 TB the cost
  over a plain write is the rule predicates' codegen — no shuffle, no
  Python.

The reference format has no constraint layer
(/root/reference/src/root.zig:9-16); this is engine extension surface.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, functions as F

QUARANTINE_DIR = "_olive_quarantine"
_ACTIONS = ("warn", "drop", "quarantine")


def _validate(rules: "dict[str, tuple[str, str]]") -> None:
    if not rules:
        raise ValueError("rules must be non-empty")
    for name, spec in rules.items():
        if not isinstance(spec, tuple) or len(spec) != 2:
            raise ValueError(
                f"rule {name!r}: expected (sql_expr, action) tuple, "
                f"got {spec!r}"
            )
        expr, action = spec
        if action not in _ACTIONS:
            raise ValueError(
                f"rule {name!r}: unknown action {action!r} "
                f"(one of {_ACTIONS})"
            )
        if not isinstance(expr, str) or not expr.strip():
            raise ValueError(f"rule {name!r}: empty expression")
        if name.startswith("_"):
            raise ValueError(
                f"rule name {name!r} must not start with '_' "
                "(reserved for gate internals)"
            )


def apply_expectations(
    df: DataFrame,
    rules: "dict[str, tuple[str, str]]",
) -> "tuple[DataFrame, DataFrame, dict]":
    """Evaluate ``rules`` ({name: (sql_bool_expr, action)}) over ``df``.

    Returns (passed, quarantined, observation):
      - ``passed``: rows whose failed rules are at worst ``warn``
      - ``quarantined``: rows with >= 1 failed ``quarantine`` rule,
        carrying ``_failed_rules`` (names of ALL their failed rules,
        rule-declaration order)
      - ``observation``: a lazy handle — after ANY action on a plan
        containing ``passed``/``quarantined``, ``observation.get``
        yields {rule -> failed_count} plus ``_rows_in`` (single-pass
        observe() metrics, no extra scan)

    Rows failing only ``drop`` rules appear in NEITHER frame."""
    from pyspark.sql import Observation

    _validate(rules)
    clash = [c for c in ("_failed_rules", "__disp") if c in df.columns]
    if clash:
        raise ValueError(f"input columns collide with gate internals: {clash}")
    names = list(rules)
    fails = {
        n: ~F.coalesce(F.expr(rules[n][0]), F.lit(False)) for n in names
    }
    obs = Observation(f"expectations_{uuid.uuid4().hex[:8]}")
    rank = {"warn": 0, "drop": 1, "quarantine": 2}
    disp = F.greatest(
        F.lit(0),
        *[
            F.when(fails[n], F.lit(rank[rules[n][1]])).otherwise(F.lit(0))
            for n in names
        ],
    )
    metrics = [
        F.count(F.lit(1)).alias("_rows_in"),
        F.sum((disp == 1).cast("long")).alias("_rows_dropped"),
        F.sum((disp == 2).cast("long")).alias("_rows_quarantined"),
    ] + [F.sum(fails[n].cast("long")).alias(n) for n in names]
    observed = df.observe(obs, *metrics)
    failed_arr = F.filter(
        F.array(*[
            F.when(fails[n], F.lit(n)).otherwise(F.lit(None))
            for n in names
        ]),
        lambda x: x.isNotNull(),
    )
    tagged = observed.withColumn("__disp", disp)
    passed = tagged.filter(F.col("__disp") <= 0).drop("__disp")
    quarantined = (
        tagged.filter(F.col("__disp") == 2)
        .withColumn("_failed_rules", failed_arr)
        .drop("__disp")
    )

    class _Obs:
        def __init__(self, o):
            self._o = o

        @property
        def get(self) -> dict:
            return dict(self._o.get)

    return passed, quarantined, _Obs(obs)


def write_with_expectations(
    spark,
    df: DataFrame,
    path: str,
    rules: "dict[str, tuple[str, str]]",
    table: str = "data",
) -> dict:
    """Gate ``df`` through ``rules`` and append the survivors to the
    olive table at ``path``; quarantined rows (full payload +
    ``_failed_rules``) land in ``<path>/_olive_quarantine/`` — both
    writes are ordinary snapshot-logged commits.  Returns
    {rows_in, rows_written, rows_quarantined, rows_dropped,
    failed_counts: {rule: n}}.

    The two writes are two jobs over one gate projection, QUARANTINE
    FIRST (crash-ordering rationale inline below); a clean batch's
    quarantine commit is a zero-row schema sentinel, so the sidecar is
    always readable once the gate has run."""
    import os

    from olive_spark.datasource import register_olive

    register_olive(spark)
    passed, quarantined, obs = apply_expectations(df, rules)
    # QUARANTINE FIRST: the sidecar holds the rows the gate exists to
    # preserve for triage.  A crash between the two commits then leaves
    # quarantine landed and the main append missing — the re-run
    # appends survivors once and at worst re-appends quarantine rows
    # (duplicate triage noise, deduplicable by key), never silently
    # LOSES the bad rows, which main-first would.
    quarantined.write.format("olive").option("table", "quarantine") \
        .mode("append").save(os.path.join(path, QUARANTINE_DIR))
    # every stat comes from the one observe pass the gate already paid
    # for — no rescans of either side
    counts = obs.get
    rows_in = int(counts.get("_rows_in", 0) or 0)
    n_drop = int(counts.get("_rows_dropped", 0) or 0)
    n_quar = int(counts.get("_rows_quarantined", 0) or 0)
    failed = {n: int(counts.get(n, 0) or 0) for n in rules}
    passed.write.format("olive").option("table", table) \
        .mode("append").save(path)
    return {
        "rows_in": rows_in,
        "rows_written": rows_in - n_drop - n_quar,
        "rows_dropped": n_drop,
        "rows_quarantined": n_quar,
        "failed_counts": failed,
        "quarantine_path": os.path.join(path, QUARANTINE_DIR),
    }
