"""Streaming query surface (engine extension — the reference format is
batch-only, SURVEY.md §2.6).

Each query runs a Structured Streaming job over the olive chunk
directory to completion (availableNow) and returns the final batch
result, so the driver's DuckDB oracle can check streaming semantics
against plain SQL on the same data.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from olive_spark import streaming
from olive_spark.queries import data


def stream_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked tumbling-window (1h) counts per event_type, streamed
    file-by-file from the olive events directory; complete output mode →
    the final state equals the batch GROUP BY."""
    path = os.path.join(data.ensure_olive(sf), "events")
    sdf = streaming.read_stream(spark, path, columns="ts,event_type,value")
    agg = streaming.tumbling_counts(
        sdf, time_col="ts", window="1 hour", keys=("event_type",),
        watermark="2 hours", value_col="value",
    )
    return streaming.run_available_now(
        agg, output_mode="complete", state_partitions=8
    )  # state keys = hours x event_type (hundreds) — 8 stores suffice


SQL_STREAM_WINDOW = (
    "SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type, "
    "COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value "
    "FROM events GROUP BY 1, 2"
)


def stream_sliding_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked SLIDING-window (1h window / 15min slide) counts per
    event_type — each event lands in 4 overlapping windows; complete
    output mode → final state equals the batch expansion the oracle
    computes with an explicit window-start UNNEST."""
    path = os.path.join(data.ensure_olive(sf), "events")
    sdf = streaming.read_stream(spark, path, columns="ts,event_type,value")
    agg = streaming.sliding_counts(
        sdf, time_col="ts", window="1 hour", slide="15 minutes",
        keys=("event_type",), watermark="2 hours", value_col="value",
    )
    return streaming.run_available_now(
        agg, output_mode="complete", state_partitions=8
    )  # state keys = 4x hours x event_type


SQL_STREAM_SLIDING = (
    # every event at epoch-µs t belongs to window starts
    # s ∈ {S·k : t-3600e6 < S·k <= t, S = 900e6}, i.e. 4 slides
    "SELECT window_start_us, event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value FROM ("
    "SELECT CAST(s AS BIGINT) AS window_start_us, event_type, value "
    "FROM events, UNNEST(range("
    "((epoch_us(ts) - 3600000000) // 900000000 + 1) * 900000000, "
    "(epoch_us(ts) // 900000000) * 900000000 + 1, 900000000)) AS t(s)"
    ") GROUP BY 1, 2"
)


def stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment join: streaming events joined per
    microbatch against the static customer dimension (broadcast, no
    state store), then a complete-mode aggregate per market segment."""
    path = os.path.join(data.ensure_olive(sf), "events")
    sdf = streaming.read_stream(spark, path, columns="user_id,value")
    dim = data.load(spark, sf, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = streaming.stream_static_join(
        sdf, dim, sdf.user_id == dim.c_custkey
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_value"),
    )
    return streaming.run_available_now(
        agg, output_mode="complete", state_partitions=8
    )  # state keys = 5 segments


SQL_STREAM_STATIC_JOIN = (
    "SELECT c_mktsegment, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value "
    "FROM events JOIN customer ON user_id = c_custkey "
    "GROUP BY c_mktsegment"
)


def stream_user_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-user totals across microbatches.  Values are quantized
    to integer cents BEFORE the stateful sum — integer-valued doubles
    under 2^53 add exactly in any accumulation order, so the final
    state is deterministic and the DuckDB oracle can hash-check it
    (a raw float sum would depend on microbatch order)."""
    path = os.path.join(data.ensure_olive(sf), "events")
    sdf = streaming.read_stream(spark, path, columns="user_id,value")
    cents = sdf.select(
        "user_id", F.round(F.col("value") * 100).alias("value")
    )
    totals = streaming.stateful_user_totals(cents, key="user_id")
    out = streaming.run_available_now(
        totals, output_mode="update", state_partitions=8
    )  # state keys = distinct user_id
    return out.select(
        "user_id", "n_events",
        (F.col("total_value") / 100.0).alias("total_value"),
    )


SQL_STREAM_USER_TOTALS = (
    "SELECT user_id, COUNT(*) AS n_events, "
    "SUM(ROUND(value * 100)) / 100.0 AS total_value "
    "FROM events GROUP BY user_id"
)


def stream_olive_sink(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end streaming pipeline: olive source → filter → olive SINK
    (streamWriter appends chunk files per microbatch) → batch scan of the
    sink → aggregate; checked against SQL over the original parquet."""
    src = os.path.join(data.ensure_olive(sf), "events")
    run = uuid.uuid4().hex[:12]
    out = os.path.join(tempfile.gettempdir(), f"olive_stream_sink_{run}")
    ckpt = os.path.join(tempfile.gettempdir(), f"olive_stream_ckpt_{run}")
    sdf = streaming.read_stream(spark, src).filter(F.col("event_type") != "error")
    streaming.write_stream_olive(sdf, out, ckpt)
    written = spark.read.format("olive").load(out)
    return written.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_value"),
    )


SQL_STREAM_SINK = (
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value "
    "FROM events WHERE event_type != 'error' GROUP BY event_type"
)


def stream_branch_wap(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming WRITE-AUDIT-PUBLISH (streaming.stream_to_branch_
    available_now — r12): a filtered event stream drains microbatch by
    microbatch onto a WAP BRANCH of a fresh table (replay-safe via
    per-epoch ids in the branch ref; live scans see NOTHING while
    draining — pinned in-query by counting live rows before publish),
    then the whole backlog is audited and published as ONE tagged
    commit.  The oracle recomputes the filtered aggregate from the
    base events table, so staged rows leaking early, a dropped or
    double-delivered microbatch, or a lost publish all
    hash-mismatch."""
    from olive_spark.ops import branch as _branch

    src = os.path.join(data.ensure_olive(sf), "events")
    run = uuid.uuid4().hex[:12]
    out = os.path.join(tempfile.gettempdir(), f"olive_sbranch_{run}")
    ckpt = os.path.join(tempfile.gettempdir(), f"olive_sbranch_ck_{run}")
    # seed the table with the error rows so the branch has a live base
    base = spark.read.format("olive").load(src)
    base.filter(F.col("event_type") == "error").write.format("olive") \
        .mode("append").save(out)
    _branch.create_branch(out, "ingest")
    sdf = streaming.read_stream(spark, src).filter(
        F.col("event_type") != "error"
    )
    streaming.stream_to_branch_available_now(
        sdf, out, "ingest", ckpt, source_path=src
    )
    n_live_before = spark.read.format("olive").load(out).count()
    _branch.publish_branch(
        spark, out, "ingest", expect={"typed": "event_type IS NOT NULL"}
    )
    written = spark.read.format("olive").load(out)
    return written.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("sum_value"),
        # isolation pinned IN the result: rows visible before publish
        # must be exactly the seeded error rows
        F.lit(n_live_before).alias("n_live_before_publish"),
    )


SQL_STREAM_BRANCH_WAP = (
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value, "
    "(SELECT COUNT(*) FROM events WHERE event_type = 'error') "
    "AS n_live_before_publish "
    "FROM events GROUP BY event_type"
)


def stream_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming gap-based session windows (30-min gap) per user —
    F.session_window state machine; the oracle recomputes the same
    sessions with LAG/SUM window SQL over the original parquet."""
    path = os.path.join(data.ensure_olive(sf), "events")
    sdf = streaming.read_stream(spark, path, columns="user_id,ts")
    sess = streaming.session_windows(
        sdf, time_col="ts", gap="30 minutes", key="user_id", watermark="2 hours"
    )
    return streaming.run_available_now(
        sess, output_mode="complete", state_partitions=8
    )  # state keys = (user_id, open session)


SQL_STREAM_SESSION = (
    "WITH g AS (SELECT user_id, epoch_us(ts) AS tus, "
    "CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER "
    "(PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000 "
    "OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL "
    "THEN 1 ELSE 0 END AS brk FROM events), "
    "s AS (SELECT user_id, tus, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
    "SELECT user_id, MIN(tus) AS start_us, MAX(tus) + 1800000000 AS end_us, "
    "COUNT(*) AS n_events FROM s GROUP BY user_id, sid"
)


def stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stream-stream inner join: click events matched to the
    same user's view events in the trailing hour.  Time-bounded join
    condition → both state stores age out past the watermark (bounded
    memory at 100 TB; an unbounded stream-stream join would retain
    everything).  Output: matched id pairs, append mode."""
    path = os.path.join(data.ensure_olive(sf), "events")
    # ONE stream source, self-joined (r16): both sides tail the same
    # directory with the same projection, and Spark's microbatch
    # executor dedups sources by plan node — two separate read_stream
    # calls spawned two Python source-runner lifecycles (~1.6 s of
    # fixed setup each, the measured per-source floor) to deliver
    # identical offsets.  Branching one source halves that fixed cost;
    # rows, watermarks and join semantics are unchanged.
    base = streaming.read_stream(
        spark, path, columns="event_id,user_id,ts,event_type"
    )
    clicks = base.filter(F.col("event_type") == "click")
    views = base.filter(F.col("event_type") == "view")
    joined = streaming.stream_stream_join(
        clicks, views, key="user_id", time_col="ts", lookback="1 hour",
    )
    out = joined.select(
        F.col("a.event_id").alias("click_id"),
        F.col("b.event_id").alias("view_id"),
        F.col("a.user_id").alias("user_id"),
    )
    return streaming.run_available_now(
        out, output_mode="append", state_partitions=8
    )  # two stores keyed by user_id; tasks-per-microbatch = 2x this


SQL_STREAM_JOIN = (
    "SELECT a.event_id AS click_id, b.event_id AS view_id, a.user_id "
    "FROM events a JOIN events b ON a.user_id = b.user_id "
    "AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts "
    "WHERE a.event_type = 'click' AND b.event_type = 'view'"
)


def stream_dedup_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type) followed by a
    complete-mode aggregation — two chained stateful operators.  Which
    physical row survives dedup varies with microbatch order, but the
    count of distinct keys per event_type is exact and deterministic,
    so that is the checked output."""
    path = os.path.join(data.ensure_olive(sf), "events")
    sdf = streaming.read_stream(spark, path, columns="user_id,event_type")
    dedup = streaming.stream_dedup(sdf, ["user_id", "event_type"])
    agg = dedup.groupBy("event_type").agg(F.count("*").alias("n_users"))
    return streaming.run_available_now(
        agg, output_mode="complete", state_partitions=8
    )  # dedup store keyed by (user_id, event_type)


SQL_STREAM_DEDUP = (
    "SELECT event_type, COUNT(DISTINCT user_id) AS n_users "
    "FROM events GROUP BY event_type"
)


def stream_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ingest dedup: the documents stream anti-joined per
    microbatch against a static corpus's content hashes (even doc_ids)
    — a stream-static left_anti join with the slim hash side broadcast.
    Stateless by construction: the static side re-resolves per
    microbatch and no watermark state accrues, so it runs identically
    at any stream length — the streaming face of
    ops.dedup.incremental_dedup (whose Bloom prefilter slots in front
    of the same join when the corpus hash set outgrows a broadcast)."""
    path = os.path.join(data.ensure_olive(sf), "documents")
    sdf = streaming.read_stream(spark, path, columns="doc_id,text")
    corpus = (
        data.load(spark, sf, "documents", columns=["doc_id", "text"])
        .filter(F.col("doc_id") % 2 == 0)
        .select(F.md5(F.col("text")).alias("content_hash"))
    )
    hashed = sdf.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
    fresh = hashed.join(F.broadcast(corpus), "content_hash", "left_anti")
    return streaming.run_available_now(fresh, output_mode="append")


SQL_STREAM_INCR_DEDUP = (
    "SELECT d.doc_id, md5(d.text) AS content_hash FROM documents d "
    "WHERE NOT EXISTS (SELECT 1 FROM documents c WHERE c.doc_id % 2 = 0 "
    "AND md5(c.text) = md5(d.text))"
)


def stream_snapshot_tail(spark: SparkSession, sf: str) -> DataFrame:
    """Backfill-then-stream handoff (startingSnapshot): the derived
    events_versioned table has two logged commit versions (v1 =
    user_id < 50, v2 appends the rest); tailing with
    ``startingSnapshot=1`` must stream EXACTLY the post-v1 files — the
    oracle recomputes v2's content from the base events table, so a
    tail that re-read the backfill (or skipped part of v2)
    hash-mismatches."""
    path = os.path.join(data.ensure_olive(sf), "events_versioned")
    sdf = streaming.read_stream(spark, path, startingSnapshot="1")
    agg = sdf.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
        .alias("sum_value"),
    )
    return streaming.run_available_now(
        agg, output_mode="complete", state_partitions=4
    )


SQL_SNAPSHOT_TAIL = (
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value "
    "FROM events WHERE user_id >= 50 GROUP BY event_type"
)


def stream_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CDC upsert (the lakehouse MERGE loop): a target table
    starts as the latest %3==0 order per customer; the full orders
    directory is then tailed as a CAPPED stream (maxFilesPerTrigger +
    admissionStateDir → several bounded epochs) and every microbatch is
    MERGEd copy-on-write with latest-wins resolution on o_orderkey
    (streaming.stream_upsert_available_now →
    ops.maintenance.merge_upsert(latest_by=)).  Latest-wins makes the
    final table a pure function of each customer's max-orderkey row —
    independent of how the admission caps partition the stream into
    batches — so the oracle is a plain ROW_NUMBER window over orders.
    Returns the per-customer winner rows.

    The pipeline runs ONCE per cache (build-once marker, like
    _ensure_orders_merged) under the olive cache dir — an ephemeral
    /tmp target per call would re-copy the orders table every
    invocation and never reclaim it."""
    import shutil

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    src = os.path.join(data.ensure_olive(sf), "orders")
    root = os.path.join(data.ensure_olive(sf), "orders_cdc")
    target = os.path.join(root, "table")
    marker = os.path.join(root, "_CDC_OK")
    if not os.path.exists(marker):
        if os.path.exists(root):
            shutil.rmtree(root)  # half-built from a crashed run
        from pyspark.sql.window import Window as W

        base = (
            data.load(spark, sf, "orders", columns=cols)
            .filter(F.col("o_orderkey") % 3 == 0)
            .withColumn(
                "__rn",
                F.row_number().over(
                    W.partitionBy("o_custkey")
                    .orderBy(F.col("o_orderkey").desc())
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        base.write.format("olive").option("table", "data") \
            .mode("append").save(target)
        sdf = streaming.read_stream(
            spark, src, columns=",".join(cols),
            maxFilesPerTrigger="8",
            admissionStateDir=os.path.join(root, "adm"),
        ).filter(F.col("o_orderkey") % 3 != 0)
        streaming.stream_upsert_available_now(
            sdf, target, ["o_custkey"], os.path.join(root, "ckpt"),
            latest_by="o_orderkey", source_path=src,
        )
        with open(marker, "w") as f:
            f.write("ok")
    final = spark.read.format("olive").load(target)
    return final.select(
        "o_custkey", "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )


SQL_STREAM_MERGE = (
    "SELECT o_custkey, o_orderkey, o_orderstatus, "
    "CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1"
)


def stream_matview(spark: SparkSession, sf: str) -> DataFrame:
    """Continuously-maintained aggregate (the streaming leg of
    ops/matview.py): a src table starts as the %3==0 orders and a
    materialized GROUP BY o_orderstatus view is FULL-built over it;
    the remaining orders then arrive as a CAPPED stream through the
    exactly-once olive sink (maxFilesPerTrigger + admissionStateDir →
    several bounded epochs), and after EVERY epoch the view is
    delta-refreshed from that commit's change feed
    (streaming.stream_matview_available_now).  Every order lands
    exactly once, and decimal folding is exact, so the final view must
    hash-match the oracle's one-shot GROUP BY over the full orders
    view — a refresh that double-folded a replayed epoch, missed a
    commit, or drifted a cent fails the gate.

    Runs ONCE per cache (build-once marker, like stream_merge_upsert);
    later calls only read the maintained view."""
    import shutil

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    src = os.path.join(data.ensure_olive(sf), "orders")
    root = os.path.join(data.ensure_olive(sf), "orders_mv_stream")
    table = os.path.join(root, "table")
    view = os.path.join(root, "view")
    marker = os.path.join(root, "_MV_STREAM_OK")
    if not os.path.exists(marker):
        if os.path.exists(root):
            shutil.rmtree(root)  # half-built from a crashed run
        base = data.load(spark, sf, "orders", columns=cols) \
            .filter(F.col("o_orderkey") % 3 == 0)
        base.write.format("olive").option("table", "data") \
            .mode("append").save(table)
        sdf = streaming.read_stream(
            spark, src, columns=",".join(cols),
            maxFilesPerTrigger="8",
            admissionStateDir=os.path.join(root, "adm"),
        ).filter(F.col("o_orderkey") % 3 != 0)
        streaming.stream_matview_available_now(
            sdf, table, os.path.join(root, "ckpt"), view,
            stream_source_path=src,
            group_cols=["o_orderstatus"],
            aggs={
                "n": "count(*)",
                "sum_price": "sum(CAST(o_totalprice AS DECIMAL(18,2)))",
                "sum_keys": "sum(o_orderkey)",
            },
        )
        with open(marker, "w") as f:
            f.write("ok")
    df = spark.read.format("olive").option("table", "matview").load(view)
    return df.select(
        "o_orderstatus", "n",
        F.col("sum_price").cast("decimal(18,2)").alias("sum_price"),
        "sum_keys",
    )


SQL_STREAM_MATVIEW = (
    "SELECT o_orderstatus, COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price, "
    "CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys "
    "FROM orders GROUP BY o_orderstatus"
)


def stream_cdc_pump(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental CDC delivery end-to-end (ops.changes.pump_changes —
    the streaming leg of the change feed): the orders_merged fixture's
    three commits (base append, MERGE, DELETE) are pumped one commit at
    a time into a downstream ``cdc_audit`` olive table, with the cursor
    sidecar proving resume — the first pump call is capped at 2 commits,
    a second call delivers the rest from the persisted cursor.  Backfill
    from version 0 makes v1 arrive as a synthetic all-insert batch, so
    the audit table is a pure function of the base orders view: the
    oracle replays v1 as base inserts plus each commit's EXCEPT ALL
    delta.  A pump that skipped a commit, re-delivered one (cursor not
    advancing), or mislabeled the backfill batch hash-mismatches."""
    import shutil

    from olive_spark.ops.changes import pump_changes
    from olive_spark.queries.relational2 import _ensure_orders_merged

    src_path = _ensure_orders_merged(spark, sf)
    root = os.path.join(data.ensure_olive(sf), "orders_cdc_pump")
    audit = os.path.join(root, "audit")
    marker = os.path.join(root, "_PUMP_OK")
    if not os.path.exists(marker):
        if os.path.exists(root):
            shutil.rmtree(root)

        def apply_fn(df, v):
            df.withColumn("_commit_version", F.lit(int(v))) \
                .write.format("olive").option("table", "cdc_audit") \
                .mode("append").save(audit)

        state = os.path.join(root, "state")
        out1 = pump_changes(
            spark, src_path, state, apply_fn, table="orders_merged",
            starting_version=0, max_commits_per_run=2,
        )
        out2 = pump_changes(
            spark, src_path, state, apply_fn, table="orders_merged"
        )
        assert (out1["applied"], out2["applied"]) == (2, 1), (out1, out2)
        with open(marker, "w") as f:
            f.write("ok")
    feed = spark.read.format("olive").option("table", "cdc_audit") \
        .load(audit)
    return feed.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("o_totalprice").alias("price"),
        "_change_type", "_commit_version",
    )


SQL_CDC_PUMP = (
    "WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders), "
    "src AS ("
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000 AS o_totalprice "
    "FROM orders WHERE o_custkey % 10 = 0 "
    "UNION ALL "
    "SELECT o_orderkey + 900000000, o_custkey, o_orderstatus, o_totalprice * 2 "
    "FROM orders WHERE o_custkey % 10 = 5), "
    "post2 AS ("
    "SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src) "
    "UNION ALL SELECT * FROM src), "
    "post3 AS (SELECT * FROM post2 WHERE NOT (o_orderstatus = 'P')) "
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice AS price, "
    "'insert' AS _change_type, CAST(1 AS INT) AS _commit_version FROM base "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'insert', CAST(2 AS INT) "
    "FROM (SELECT * FROM post2 EXCEPT ALL SELECT * FROM base) "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'delete', CAST(2 AS INT) "
    "FROM (SELECT * FROM base EXCEPT ALL SELECT * FROM post2) "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'insert', CAST(3 AS INT) "
    "FROM (SELECT * FROM post3 EXCEPT ALL SELECT * FROM post2) "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'delete', CAST(3 AS INT) "
    "FROM (SELECT * FROM post2 EXCEPT ALL SELECT * FROM post3)"
)


QUERIES: dict[str, tuple] = {
    "stream_cdc_pump": (stream_cdc_pump, SQL_CDC_PUMP),
    "stream_snapshot_tail": (stream_snapshot_tail, SQL_SNAPSHOT_TAIL),
    "stream_merge_upsert": (stream_merge_upsert, SQL_STREAM_MERGE),
    "stream_matview": (stream_matview, SQL_STREAM_MATVIEW),
    "stream_window_counts": (stream_window_counts, SQL_STREAM_WINDOW),
    "stream_sliding_counts": (stream_sliding_counts, SQL_STREAM_SLIDING),
    "stream_static_join": (stream_static_join, SQL_STREAM_STATIC_JOIN),
    "stream_stream_join": (stream_stream_join, SQL_STREAM_JOIN),
    "stream_dedup_counts": (stream_dedup_counts, SQL_STREAM_DEDUP),
    "stream_session_window": (stream_session_window, SQL_STREAM_SESSION),
    "stream_user_totals": (stream_user_totals, SQL_STREAM_USER_TOTALS),
    "stream_olive_sink": (stream_olive_sink, SQL_STREAM_SINK),
    "stream_branch_wap": (stream_branch_wap, SQL_STREAM_BRANCH_WAP),
    "stream_incremental_dedup": (stream_incremental_dedup, SQL_STREAM_INCR_DEDUP),
}
