"""Declared relational query surface (SURVEY.md §2.7).

Every query scans olive-format data (converted from the driver parquet via
:mod:`olive_spark.queries.data`) and is paired with an ANSI-SQL oracle that
DuckDB runs against the *original parquet* — a hash match therefore proves
both the format round-trip and the operator semantics.

Float-sum hygiene: aggregates over doubles are computed on
``decimal(18,2)``-cast inputs and the results cast to fixed decimals in
BOTH engines, so value hashes are exact, not within-epsilon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from olive_spark.queries import data

D = "decimal(18,2)"


def _dec(c):  # exact money arithmetic in both engines
    return F.col(c).cast(D)


# --------------------------------------------------------------- scan layer


def scan_roundtrip_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Full-fidelity scan of every lineitem column through olive
    (write path reference src/write.zig:761-839, read src/read.zig:719-812)."""
    return data.load(spark, sf, "lineitem")


SQL_SCAN_ROUNDTRIP = "SELECT * FROM lineitem"


def scan_projection_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """Column pruning: only two columns' buffers are decompressed
    (per-column buffers, reference src/header.zig:131-134)."""
    return data.load(spark, sf, "lineitem", columns=["l_orderkey", "l_extendedprice"])


SQL_SCAN_PROJECTION = "SELECT l_orderkey, l_extendedprice FROM lineitem"


def scan_filter_pages(spark: SparkSession, sf: str) -> DataFrame:
    """Filter pushdown → page-granular row skipping on row_index_ends
    (reference src/header.zig:41-45, src/write.zig:861-917)."""
    df = data.load(spark, sf, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"],
                   pushdown=True)  # single filtered scan — safe to prune
    return df.filter(F.col("o_totalprice") > 400000.0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


SQL_SCAN_FILTER = (
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
    "WHERE o_totalprice > 400000.0"
)


def scan_nulls_validity(spark: SparkSession, sf: str) -> DataFrame:
    """Validity bitmaps written only when null_count>0
    (reference src/write.zig:841-857); nulls injected at conversion time."""
    return data.load(spark, sf, "customer_nulls")


SQL_SCAN_NULLS = (
    "SELECT c_custkey, "
    "CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal "
    "FROM customer"
)


def scan_nested_list(spark: SparkSession, sf: str) -> DataFrame:
    """List-typed column through olive (reference src/write.zig:604-648).
    The list is scalarized to a fixed-scale CSV string for the driver's
    pandas canonicalizer (which cannot sort raw list cells); every
    element still round-trips the nested offsets+values writers."""
    df = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    return df.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_join(
            F.transform(
                "embedding",
                lambda x: x.cast("double").cast("decimal(18,6)").cast("string"),
            ),
            ",",
        ).alias("emb_csv"),
    )


SQL_SCAN_NESTED = (
    "SELECT vec_id, len(embedding) AS dim, "
    "array_to_string(list_transform(embedding, "
    "x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR)), ',') AS emb_csv "
    "FROM embeddings"
)


def scan_multi_table_chunk(spark: SparkSession, sf: str) -> DataFrame:
    """Two named tables from ONE chunk file (reference src/chunk.zig:15-19),
    then a broadcast join above the scan."""
    region = data.load(spark, sf, "multi", chunk_table="region")
    nation = data.load(spark, sf, "multi", chunk_table="nation")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


SQL_SCAN_MULTI = (
    "SELECT r_name, n_name FROM nation JOIN region ON n_regionkey = r_regionkey "
    "ORDER BY r_name, n_name"
)


def dict_encode_fsb(spark: SparkSession, sf: str) -> DataFrame:
    """Global fsb20/32 dictionary round-trip (reference src/dict.zig:493-536):
    the addr20/hash32 columns were dict-encoded as u32 indices on write."""
    df = data.load(spark, sf, "orders_fsb", columns=["addr20", "hash32"])
    return (
        df.groupBy(F.col("addr20").cast("string").alias("addr"))
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct(F.col("hash32").cast("string")).alias("n_hashes"),
        )
    )


SQL_DICT_FSB = (
    "SELECT lpad(CAST(o_custkey AS VARCHAR), 20, '0') AS addr, "
    "COUNT(*) AS n_orders, "
    "COUNT(DISTINCT lpad(CAST(o_custkey AS VARCHAR), 32, '0')) AS n_hashes "
    "FROM orders GROUP BY 1"
)


def compression_codecs(spark: SparkSession, sf: str) -> DataFrame:
    """Same data through both compression biases → identical results
    (reference src/compression.zig:12-21, write.zig:30-33)."""
    import os

    from olive_spark.format.writer import write_chunk
    import pyarrow.parquet as pq

    base = data.ensure_olive(sf)
    for bias in ("balanced", "read_optimized"):
        tdir = os.path.join(base, f"orders_{bias}")
        if not os.path.exists(os.path.join(tdir, "part-00000.olive")):
            os.makedirs(tdir, exist_ok=True)
            t = pq.read_table(os.path.join(sf, "orders.parquet"))
            with open(os.path.join(tdir, "part-00000.olive"), "wb") as f:
                f.write(write_chunk({"orders": t}, compression_bias=bias))
    outs = []
    for bias in ("balanced", "read_optimized"):
        df = data.load(
            spark, sf, f"orders_{bias}", columns=["o_orderstatus", "o_totalprice"]
        )
        outs.append(
            df.groupBy("o_orderstatus").agg(
                F.count("*").alias("n"),
                F.sum(_dec("o_totalprice")).cast(D).alias("total"),
            ).withColumn("bias", F.lit(bias))
        )
    return outs[0].unionByName(outs[1]).select("bias", "o_orderstatus", "n", "total")


SQL_COMPRESSION = (
    "WITH agg AS (SELECT o_orderstatus, COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total "
    "FROM orders GROUP BY o_orderstatus) "
    "SELECT 'balanced' AS bias, o_orderstatus, n, total FROM agg "
    "UNION ALL "
    "SELECT 'read_optimized' AS bias, o_orderstatus, n, total FROM agg"
)


def types_decimal_date(spark: SparkSession, sf: str) -> DataFrame:
    """decimal128 + date32 storage mappings (reference src/write.zig:138-177)."""
    df = data.load(
        spark, sf, "lineitem_dec", columns=["price_dec", "disc_dec", "ship_date"]
    )
    return (
        df.groupBy(F.year("ship_date").alias("ship_year"))
        .agg(
            F.sum("price_dec").cast(D).alias("sum_price"),
            F.min("disc_dec").cast("decimal(12,2)").alias("min_disc"),
            F.max("disc_dec").cast("decimal(12,2)").alias("max_disc"),
            F.count("*").alias("n"),
        )
    )


SQL_TYPES_DECIMAL = (
    "SELECT EXTRACT(year FROM l_shipdate) AS ship_year, "
    "CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_price, "
    "CAST(MIN(CAST(ROUND(l_discount, 2) AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS min_disc, "
    "CAST(MAX(CAST(ROUND(l_discount, 2) AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS max_disc, "
    "COUNT(*) AS n "
    "FROM lineitem GROUP BY 1"
)


# ------------------------------------------------- relational operator layer


def agg_groupby_sum(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation over the olive scan — partial (map-side)
    aggregation + single shuffle on the group keys; all expressions stay in
    whole-stage codegen."""
    df = data.load(
        spark, sf, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast(D).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast(D).alias("sum_base_price"),
            # full-precision product summed, ONE cast at the end — per-row
            # decimal rounding would diverge between engines (HALF_UP vs
            # HALF_EVEN)
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast(D) - _dec("l_discount"))
            ).cast("decimal(28,4)").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_AGG_GROUPBY = (
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS sum_disc_price, "
    "COUNT(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
)


def agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    df = data.load(spark, sf, "lineitem", columns=["l_returnflag", "l_partkey", "l_suppkey"])
    return df.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.count("*").alias("n"),
    )


SQL_AGG_DISTINCT = (
    "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts, "
    "COUNT(DISTINCT l_suppkey) AS nd_supps, COUNT(*) AS n "
    "FROM lineitem GROUP BY l_returnflag"
)


def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    df = data.load(spark, sf, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return (
        df.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(_dec("o_totalprice")).cast(D).alias("total"))
    )


SQL_AGG_ROLLUP = (
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total "
    "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"
)


def join_hash_orders_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle hash / sort-merge join on the key; AQE picks the strategy."""
    orders = data.load(spark, sf, "orders", columns=["o_custkey", "o_totalprice"])
    cust = data.load(spark, sf, "customer", columns=["c_custkey", "c_mktsegment"])
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.sum(_dec("o_totalprice")).cast(D).alias("revenue"))
    )


SQL_JOIN_HASH = (
    "SELECT c_mktsegment, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue "
    "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
)


def join_broadcast_dims(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-join with explicitly broadcast small dimensions (scale path:
    region/nation are tiny at any SF — never shuffle them)."""
    cust = data.load(spark, sf, "customer", columns=["c_nationkey", "c_acctbal"])
    nation = data.load(spark, sf, "nation", columns=["n_nationkey", "n_regionkey"])
    region = data.load(spark, sf, "region", columns=["r_regionkey", "r_name"])
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_cust"), F.sum(_dec("c_acctbal")).cast(D).alias("acctbal"))
    )


SQL_JOIN_BROADCAST = (
    "SELECT r_name, COUNT(*) AS n_cust, "
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS acctbal "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
)


def join_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi + left-anti joins (customers with vs without orders)."""
    cust = data.load(spark, sf, "customer", columns=["c_custkey"])
    orders = data.load(spark, sf, "orders", columns=["o_custkey"])
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        with_orders.agg(F.count("*").alias("n")).withColumn("kind", F.lit("with_orders"))
        .unionByName(without.agg(F.count("*").alias("n")).withColumn("kind", F.lit("without_orders")))
        .select("kind", "n")
    )


SQL_JOIN_SEMI_ANTI = (
    "SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer "
    "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
    "UNION ALL "
    "SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer "
    "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
)


def window_rank_events(spark: SparkSession, sf: str) -> DataFrame:
    """Window rank per user over the events table (ingested through olive —
    Spark's parquet scanner cannot read its TIMESTAMP(NANOS) at all)."""
    df = data.load(spark, sf, "events", columns=["event_id", "user_id", "ts"])
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id"))
    return (
        df.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "rk")
    )


SQL_WINDOW_RANK = (
    "SELECT user_id, event_id, rk FROM ("
    "SELECT user_id, event_id, RANK() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id) AS rk FROM events"
    ") WHERE rk <= 3"
)


def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative windowed aggregation with frame specification."""
    df = data.load(spark, sf, "events", columns=["event_id", "user_id", "ts", "value"])
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(D)).over(w).cast(D).alias("running_value"),
    )


SQL_WINDOW_RUNNING = (
    "SELECT user_id, event_id, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS running_value "
    "FROM events"
)


def sort_limit_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — no global sort shuffle."""
    df = data.load(spark, sf, "orders", columns=["o_orderkey", "o_totalprice"])
    return (
        df.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


SQL_SORT_TOPK = (
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
)


def setop_union_except(spark: SparkSession, sf: str) -> DataFrame:
    """UNION / EXCEPT over two filtered scans of the same olive table."""
    orders = data.load(spark, sf, "orders", columns=["o_custkey", "o_orderstatus"])
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        a.union(b).distinct().withColumn("setop", F.lit("union"))
        .unionByName(a.subtract(b).withColumn("setop", F.lit("except")))
        .groupBy("setop").agg(F.count("*").alias("n"))
    )


SQL_SETOP = (
    "WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'), "
    "b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') "
    "SELECT 'union' AS setop, COUNT(*) AS n FROM (SELECT DISTINCT o_custkey FROM (SELECT * FROM a UNION ALL SELECT * FROM b)) "
    "UNION ALL "
    "SELECT 'except' AS setop, COUNT(*) AS n FROM (SELECT DISTINCT o_custkey FROM a EXCEPT SELECT DISTINCT o_custkey FROM b)"
)


def scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """String/date/math scalar surface over an olive scan (reference has
    none — SURVEY.md §2.6; all built-in pyspark.sql.functions, JVM-side)."""
    df = data.load(
        spark, sf, "customer",
        columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
    )
    return df.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.round(F.abs(F.col("c_acctbal")), 1).alias("abs_bal"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        (F.col("c_custkey") % 7).alias("key_mod"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_pos"),
    )


SQL_SCALAR = (
    "SELECT c_custkey, UPPER(c_name) AS name_upper, LENGTH(c_name) AS name_len, "
    "SUBSTRING(c_mktsegment, 1, 3) AS seg3, ROUND(ABS(c_acctbal), 1) AS abs_bal, "
    "CONCAT_WS('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key, "
    "c_custkey % 7 AS key_mod, GREATEST(c_acctbal, 0.0) AS bal_pos FROM customer"
)


def join_asof_event_order(spark: SparkSession, sf: str) -> DataFrame:
    """Backward as-of join: each event picks the most recent order of the
    same customer with o_orderdate <= ts (olive_spark.ops.timeseries —
    union-sort formulation, one shuffle, no range explosion)."""
    from olive_spark.ops.timeseries import asof_join

    events = data.load(spark, sf, "events", columns=["event_id", "user_id", "ts"])
    orders = data.load(spark, sf, "orders", columns=["o_custkey", "o_orderdate"])
    out = asof_join(
        events, orders, on=("user_id", "o_custkey"), left_time="ts",
        right_time="o_orderdate", right_cols=["o_orderdate"],
    )
    return out.select("event_id", "user_id", "o_orderdate")


SQL_JOIN_ASOF = (
    "SELECT event_id, user_id, o_orderdate FROM events "
    "ASOF LEFT JOIN orders ON user_id = o_custkey AND ts >= o_orderdate"
)


def join_range_events(spark: SparkSession, sf: str) -> DataFrame:
    """Range self-join: for every 'click' event, the same user's events in
    the following 5 minutes; equality key keeps it a hash join with the
    range as a post-join predicate. Epoch-µs comparisons (events carry
    ns-precision timestamps; µs is what both engines see exactly)."""
    from olive_spark.ops.timeseries import range_join

    events = data.load(spark, sf, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    anchors = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("anchor_id"),
            F.col("user_id").alias("anchor_user"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("anchor_us"),
        )
    )
    follow = events.select(
        "user_id", "event_type", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    joined = range_join(
        anchors, follow, on=("anchor_user", "user_id"),
        left_time="anchor_us", right_time="tus",
        lower=F.lit(1), upper=F.lit(5 * 60 * 1_000_000 + 1),
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(_dec("value")).cast(D).alias("sum_value"),
    )


SQL_JOIN_RANGE = (
    "SELECT f.event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(f.value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value "
    "FROM (SELECT user_id, epoch_us(ts) AS anchor_us FROM events WHERE event_type = 'click') a "
    "JOIN events f ON f.user_id = a.user_id "
    "AND epoch_us(f.ts) >= a.anchor_us + 1 "
    "AND epoch_us(f.ts) < a.anchor_us + 300000001 "
    "GROUP BY f.event_type"
)


def window_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) per user over events; all
    integer epoch-µs math so both engines agree exactly."""
    from olive_spark.ops.timeseries import sessionize

    df = data.load(spark, sf, "events", columns=["user_id", "ts"])
    return sessionize(df, key="user_id", time_col="ts", gap_minutes=30)


SQL_WINDOW_SESSION = (
    "WITH g AS (SELECT user_id, epoch_us(ts) AS tus, "
    "CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER "
    "(PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000 "
    "OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL "
    "THEN 1 ELSE 0 END AS brk FROM events), "
    "s AS (SELECT user_id, tus, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g) "
    "SELECT user_id, session_id, COUNT(*) AS n_events, MIN(tus) AS t_start_us, "
    "MAX(tus) - MIN(tus) AS dur_us FROM s GROUP BY user_id, session_id"
)


def agg_cube_events(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (event_type, iso weekday) with count + decimal sum."""
    df = data.load(spark, sf, "events", columns=["event_type", "ts", "value"])
    return (
        df.withColumn("isodow", F.weekday("ts") + F.lit(1))
        .cube("event_type", "isodow")
        .agg(F.count("*").alias("n"), F.sum(_dec("value")).cast(D).alias("sum_value"))
    )


SQL_AGG_CUBE = (
    "SELECT event_type, isodow(ts) AS isodow, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value "
    "FROM events GROUP BY CUBE (event_type, isodow(ts))"
)


def join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join of per-customer order counts vs per-user event
    counts (key ranges only partially overlap — both null sides appear)."""
    oc = (
        data.load(spark, sf, "orders", columns=["o_custkey"])
        .groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    )
    ec = (
        data.load(spark, sf, "events", columns=["user_id"])
        .groupBy("user_id").agg(F.count("*").alias("n_events"))
    )
    j = oc.join(ec, oc.o_custkey == ec.user_id, "full_outer")
    return j.select(
        F.coalesce("o_custkey", "user_id").alias("key"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


SQL_JOIN_FULL_OUTER = (
    "SELECT COALESCE(o_custkey, user_id) AS key, "
    "COALESCE(n_orders, 0) AS n_orders, COALESCE(n_events, 0) AS n_events "
    "FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o "
    "FULL OUTER JOIN (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) e "
    "ON o_custkey = user_id"
)


def null_handling(spark: SparkSession, sf: str) -> DataFrame:
    """Null-handling surface over the injected-null scan: coalesce/nvl,
    null-safe equality, conditional defaults, dropna/fillna."""
    df = data.load(spark, sf, "customer_nulls")
    filled = df.select(
        "c_custkey",
        F.coalesce("c_acctbal", F.lit(0.0)).alias("bal_filled"),
        F.col("c_acctbal").isNull().cast("int").alias("was_null"),
        F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double")).cast("int").alias("nullsafe_eq_null"),
    )
    return filled.groupBy("was_null", "nullsafe_eq_null").agg(
        F.count("*").alias("n"),
        F.sum(F.col("bal_filled").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_bal"),
    )


SQL_NULL_HANDLING = (
    "WITH cn AS (SELECT c_custkey, "
    "CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal FROM customer) "
    "SELECT CAST(c_acctbal IS NULL AS INT) AS was_null, "
    "CAST(c_acctbal IS NOT DISTINCT FROM NULL AS INT) AS nullsafe_eq_null, "
    "COUNT(*) AS n, "
    "CAST(SUM(CAST(COALESCE(c_acctbal, 0.0) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_bal "
    "FROM cn GROUP BY 1, 2"
)


def agg_pivot_status(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (orders status × priority) — conditional-aggregation oracle."""
    df = data.load(spark, sf, "orders", columns=["o_orderstatus", "o_orderpriority"])
    return (
        df.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


SQL_AGG_PIVOT = (
    "SELECT o_orderpriority, "
    "CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS F, "
    "CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS O, "
    "CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END), 0) AS BIGINT) AS P "
    "FROM orders GROUP BY o_orderpriority"
)


def explode_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """posexplode (lateral unnest) of the embedding arrays + per-dimension
    aggregate — the array-flattening shape feature pipelines use."""
    df = data.load(spark, sf, "embeddings")
    return (
        df.select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        .filter(F.col("dim") < 8)
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("double").cast("decimal(18,6)"))
            .cast("decimal(18,6)").alias("sum_x"),
        )
    )


SQL_EXPLODE = (
    "SELECT dim, COUNT(*) AS n, "
    "CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sum_x FROM ("
    "SELECT vec_id, embedding[ord] AS x, CAST(ord - 1 AS INT) AS dim "
    "FROM embeddings, UNNEST(range(1, LEAST(len(embedding) + 1, 9))) AS t(ord)"
    ") GROUP BY dim"
)


def window_ntile_percent(spark: SparkSession, sf: str) -> DataFrame:
    """ntile + percent_rank window functions over the customer balance."""
    df = data.load(spark, sf, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return df.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


SQL_WINDOW_NTILE = (
    "SELECT c_custkey, c_mktsegment, "
    "NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile, "
    "ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS pct_rank "
    "FROM customer"
)


def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT over two filtered scans (customers active in both F and
    O order statuses)."""
    orders = data.load(spark, sf, "orders", columns=["o_custkey", "o_orderstatus"])
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b).agg(F.count("*").alias("n_both"))


SQL_SETOP_INTERSECT = (
    "SELECT COUNT(*) AS n_both FROM ("
    "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F' "
    "INTERSECT "
    "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')"
)


def tpch_q3_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + agg + top-k, all over olive scans."""
    cust = data.load(
        spark, sf, "customer", columns=["c_custkey", "c_mktsegment"]
    ).filter(F.col("c_mktsegment") == "BUILDING")
    orders = data.load(
        spark, sf, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz"))
    li = data.load(
        spark, sf, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast(D) - _dec("l_discount"))
            ).cast("decimal(28,4)").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .limit(10)
    )


SQL_TPCH_Q3 = (
    "SELECT o_orderkey, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS revenue, "
    "o_orderdate, o_orderpriority "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00' "
    "AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00' "
    "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
    "ORDER BY revenue DESC, o_orderkey LIMIT 10"
)


def scalar_json_events(spark: SparkSession, sf: str) -> DataFrame:
    """JSON scalar functions over the events.props column (JVM-side
    get_json_object — the reference has no scalar surface, SURVEY.md §2.6)."""
    df = data.load(spark, sf, "events", columns=["event_id", "event_type", "props"])
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        df.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_big"),
        )
    )


SQL_SCALAR_JSON = (
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
    "CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big "
    "FROM events GROUP BY event_type"
)


def tpch_q5_local_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join: revenue by nation where customer and
    supplier share the nation; dims broadcast, facts shuffle once."""
    cust = data.load(spark, sf, "customer", columns=["c_custkey", "c_nationkey"])
    orders = data.load(spark, sf, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = data.load(spark, sf, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    supp = data.load(spark, sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = data.load(spark, sf, "nation", columns=["n_nationkey", "n_name"])
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast(D) - _dec("l_discount"))
            ).cast("decimal(28,4)").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


SQL_TPCH_Q5 = (
    "SELECT n_name, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS revenue, "
    "COUNT(*) AS n "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE c_nationkey = s_nationkey "
    "AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY n_name"
)


def tpch_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: join against an aggregated subquery (orders whose
    total quantity exceeds a threshold)."""
    li = data.load(spark, sf, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = data.load(spark, sf, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast(D).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
        .limit(100)
    )


SQL_TPCH_Q18 = (
    "SELECT o_orderkey, o_custkey, o_totalprice, sum_qty FROM orders JOIN ("
    "SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty "
    "FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) > 150"
    ") ON o_orderkey = l_orderkey "
    "ORDER BY sum_qty DESC, o_orderkey LIMIT 100"
)


def agg_approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate sketches — the 100 TB path where exact distinct/
    quantiles would shuffle every value: HLL++ distinct + approximate
    percentiles, both map-side-combinable. Rows-only check (sketch
    estimates differ across engines by design).  Percentiles come back
    as scalar p50/p95/p99 columns — the driver canonicalizer cannot
    sort list-typed cells."""
    df = data.load(spark, sf, "lineitem", columns=["l_returnflag", "l_partkey", "l_extendedprice"])
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("nd_parts_approx"),
            pcts.alias("_pcts"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "nd_parts_approx",
            F.element_at("_pcts", 1).alias("price_p50"),
            F.element_at("_pcts", 2).alias("price_p95"),
            F.element_at("_pcts", 3).alias("price_p99"),
            "n",
        )
    )


def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS through the SQL surface (spark.sql over an olive
    scan registered as a temp view)."""
    df = data.load(spark, sf, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
    df.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total "
        "FROM _orders_gs "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"
    )


SQL_AGG_GROUPING_SETS = (
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total "
    "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"
)


def tpch_q6_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the pushdown
    showcase (every predicate reaches the olive scan as a page-skip
    candidate; no shuffle at all beyond the final single-row reduce)."""
    df = data.load(
        spark, sf, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    return (
        df.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 15)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("decimal(28,4)")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


SQL_TPCH_Q6 = (
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)) AS revenue, "
    "COUNT(*) AS n FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 15"
)


def tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS subquery — Catalyst decorrelates
    it into a left-semi join (no per-row subquery execution at scale)."""
    data.load(spark, sf, "orders").createOrReplaceTempView("_q4_orders")
    data.load(spark, sf, "lineitem", columns=["l_orderkey", "l_quantity"]) \
        .createOrReplaceTempView("_q4_lineitem")
    return spark.sql(
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM _q4_orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM _q4_lineitem "
        "WHERE l_orderkey = o_orderkey AND l_quantity > 45) "
        "GROUP BY o_orderpriority"
    )


SQL_TPCH_Q4 = (
    "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
    "AND EXISTS (SELECT 1 FROM lineitem "
    "WHERE l_orderkey = o_orderkey AND l_quantity > 45) "
    "GROUP BY o_orderpriority"
)


def subquery_correlated_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (per-customer order count) — Catalyst
    rewrites it as an aggregate + left outer join, not a per-row probe."""
    data.load(spark, sf, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .createOrReplaceTempView("_sq_customer")
    data.load(spark, sf, "orders", columns=["o_custkey"]) \
        .createOrReplaceTempView("_sq_orders")
    return spark.sql(
        "SELECT c_mktsegment, COUNT(*) AS n_cust, SUM(n_orders) AS sum_orders FROM ("
        "SELECT c_custkey, c_mktsegment, "
        "(SELECT COUNT(*) FROM _sq_orders WHERE o_custkey = c_custkey) AS n_orders "
        "FROM _sq_customer) GROUP BY c_mktsegment"
    )


SQL_SUBQUERY_SCALAR = (
    "SELECT c_mktsegment, COUNT(*) AS n_cust, CAST(SUM(n_orders) AS BIGINT) AS sum_orders FROM ("
    "SELECT c_custkey, c_mktsegment, "
    "(SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders "
    "FROM customer) GROUP BY c_mktsegment"
)


def subquery_in_uncorrelated(spark: SparkSession, sf: str) -> DataFrame:
    """IN / NOT IN subqueries → semi/anti join under Catalyst."""
    data.load(spark, sf, "part", columns=["p_partkey", "p_brand"]) \
        .createOrReplaceTempView("_in_part")
    data.load(spark, sf, "lineitem", columns=["l_partkey", "l_quantity"]) \
        .createOrReplaceTempView("_in_lineitem")
    return spark.sql(
        "SELECT p_brand, COUNT(*) AS n_parts FROM _in_part "
        "WHERE p_partkey IN (SELECT l_partkey FROM _in_lineitem WHERE l_quantity > 48) "
        "GROUP BY p_brand"
    )


SQL_SUBQUERY_IN = (
    "SELECT p_brand, COUNT(*) AS n_parts FROM part "
    "WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 48) "
    "GROUP BY p_brand"
)


def window_lead_lag(spark: SparkSession, sf: str) -> DataFrame:
    """lead/lag/first_value navigation functions per user over events —
    inter-event gap in epoch-µs (integer math, exact in both engines)."""
    df = data.load(spark, sf, "events", columns=["event_id", "user_id", "ts", "event_type"])
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(tus, F.col("event_id"))
    return df.select(
        "user_id",
        "event_id",
        (tus - F.lag(tus, 1).over(w)).alias("gap_us"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.first("event_id").over(w).alias("first_event"),
    )


SQL_WINDOW_LEAD_LAG = (
    "SELECT user_id, event_id, "
    "epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us, "
    "LEAD(event_type, 1) OVER w AS next_type, "
    "FIRST_VALUE(event_id) OVER w AS first_event "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"
)


def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame (value-based window): per user, events in the trailing
    10 minutes counted on the epoch-µs axis."""
    df = data.load(spark, sf, "events", columns=["event_id", "user_id", "ts"])
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(tus)
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return df.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_trailing_10m"),
    )


SQL_WINDOW_RANGE_FRAME = (
    "SELECT user_id, event_id, "
    "COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) "
    "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS n_trailing_10m "
    "FROM events"
)


def agg_stats_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance) —
    all map-side-combinable single-pass moments; rounded so both engines'
    double summation agrees exactly."""
    df = data.load(
        spark, sf, "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return df.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 8).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
        F.count("*").alias("n"),
    )


SQL_AGG_STATS = (
    "SELECT l_returnflag, "
    "ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price, "
    "ROUND(VAR_SAMP(l_quantity), 6) AS var_qty, "
    "ROUND(CORR(l_quantity, l_extendedprice), 8) AS corr_qp, "
    "ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qp, "
    "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
)


def scalar_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Array/lambda scalar functions (transform/filter/aggregate) over the
    embedding arrays — all JVM-side higher-order functions, no UDFs."""
    df = data.load(spark, sf, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return df.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max(emb), 6).alias("max_x"),
        F.round(F.array_min(emb), 6).alias("min_x"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(F.element_at(emb, 1), 6).alias("x0"),
    )


SQL_SCALAR_ARRAY = (
    "SELECT vec_id, len(embedding) AS dim, "
    "ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS max_x, "
    "ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'min'), 6) AS min_x, "
    "len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_pos, "
    "ROUND(CAST(embedding[1] AS DOUBLE), 6) AS x0 "
    "FROM embeddings"
)


def scalar_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Map construction + element access (create_map / element_at /
    map_keys). The oracle recomputes the same values without maps — the
    check pins Spark's map semantics to the plain-SQL meaning."""
    df = data.load(spark, sf, "events", columns=["event_id", "event_type", "value"])
    m = F.create_map(F.col("event_type"), F.col("value"))
    return df.select(
        "event_id",
        F.element_at(m, F.lit("click")).alias("click_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_values(m), 1).alias("first_value"),
    )


SQL_SCALAR_MAP = (
    "SELECT event_id, "
    "CASE WHEN event_type = 'click' THEN value END AS click_value, "
    "1 AS n_keys, value AS first_value FROM events"
)


def dedup_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """The classic pipeline dedup: keep the newest row per key via
    row_number — one shuffle on the key, no global sort."""
    df = data.load(spark, sf, "events", columns=["event_id", "user_id", "ts", "event_type"])
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


SQL_DEDUP_LATEST = (
    "SELECT user_id, event_id, event_type FROM ("
    "SELECT user_id, event_id, event_type, "
    "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "FROM events) WHERE rn = 1"
)


def join_nested_loop(spark: SparkSession, sf: str) -> DataFrame:
    """Pure non-equi join (no equality key) → BroadcastNestedLoopJoin;
    only sane when one side is broadcast-small, which nation always is."""
    n1 = data.load(spark, sf, "nation", columns=["n_nationkey", "n_name"])
    n2 = data.load(spark, sf, "nation", columns=["n_nationkey"]).select(
        F.col("n_nationkey").alias("other_key")
    )
    return (
        n1.join(F.broadcast(n2), F.col("n_nationkey") < F.col("other_key"))
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("*").alias("n_pairs"))
    )


SQL_JOIN_NESTED_LOOP = (
    "SELECT n1.n_nationkey, n1.n_name, COUNT(*) AS n_pairs "
    "FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey "
    "GROUP BY n1.n_nationkey, n1.n_name"
)


def types_unsigned_time(spark: SparkSession, sf: str) -> DataFrame:
    """Unsigned-int + time-of-day storage mappings (SURVEY.md §1.2):
    uint8→smallint, uint16→int, uint32→bigint, uint64→decimal(20,0),
    time32(s)→int, time64(µs)→bigint — widened on scan, exact values."""
    df = data.load(spark, sf, "customer_uints")
    return df.select(
        "c_custkey", "u8", "u16", "u32", "u64", "t32_s", "t64_us"
    )


SQL_TYPES_UNSIGNED = (
    "SELECT c_custkey, "
    "CAST(c_custkey % 251 AS SMALLINT) AS u8, "
    "CAST(c_custkey % 65521 AS INT) AS u16, "
    "CAST(c_custkey AS BIGINT) AS u32, "
    "CAST(9223372036854775807 AS DECIMAL(20,0)) + 1 + CAST(c_custkey AS DECIMAL(20,0)) AS u64, "
    "CAST(c_custkey % 86400 AS INT) AS t32_s, "
    "CAST(c_custkey % 86400 AS BIGINT) * 1000000 AS t64_us "
    "FROM customer"
)


def scalar_datetime_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Datetime scalar surface: trunc/extract/diff/add — JVM-side, all
    folded into the scan's project (no shuffle)."""
    df = data.load(spark, sf, "orders", columns=["o_orderkey", "o_orderdate"])
    d = F.col("o_orderdate")
    return df.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.hour(d).alias("hr"),
        F.unix_micros(F.date_trunc("month", d).cast("timestamp")).alias("month_start_us"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias("days_to_y2k"),
        F.unix_micros(F.date_add(d.cast("date"), 30).cast("timestamp")).alias("plus30_us"),
    )


SQL_SCALAR_DATETIME = (
    "SELECT o_orderkey, "
    "EXTRACT(year FROM o_orderdate) AS yr, "
    "EXTRACT(quarter FROM o_orderdate) AS qtr, "
    "EXTRACT(month FROM o_orderdate) AS mo, "
    "EXTRACT(day FROM o_orderdate) AS dom, "
    "EXTRACT(hour FROM o_orderdate) AS hr, "
    "epoch_us(date_trunc('month', o_orderdate)) AS month_start_us, "
    "datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k, "
    "epoch_us(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP)) AS plus30_us "
    "FROM orders"
)


def scalar_string_advanced(spark: SparkSession, sf: str) -> DataFrame:
    """Regex + string-transform scalar surface (regexp_extract/replace,
    translate, initcap, lpad, split element access)."""
    df = data.load(spark, sf, "part", columns=["p_partkey", "p_name", "p_type", "p_brand"])
    return df.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_masked"),
        F.translate("p_brand", "#", "N").alias("brand_norm"),
        F.initcap("p_name").alias("name_title"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.split("p_type", " ").getItem(0).alias("type_first"),
        F.reverse("p_brand").alias("brand_rev"),
    )


SQL_SCALAR_STRING = (
    "SELECT p_partkey, "
    "regexp_extract(p_type, '^(\\w+)', 1) AS type_head, "
    "regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked, "
    "replace(p_brand, '#', 'N') AS brand_norm, "
    "list_aggregate(list_transform(regexp_split_to_array(p_name, ' '), "
    "  x -> upper(x[1]) || lower(x[2:])), 'string_agg', ' ') AS name_title, "
    "lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad, "
    "split_part(p_type, ' ', 1) AS type_first, "
    "reverse(p_brand) AS brand_rev "
    "FROM part"
)


def join_left_right_outer(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT and RIGHT outer joins with unmatched sides (suppliers never
    appear in lineitem at partial key ranges)."""
    supp = data.load(spark, sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    li = (
        data.load(spark, sf, "lineitem", columns=["l_suppkey", "l_quantity"])
        .filter(F.col("l_quantity") > 49)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_big"))
    )
    left = supp.join(li, supp.s_suppkey == li.l_suppkey, "left").select(
        "s_suppkey", F.coalesce("n_big", F.lit(0)).alias("n_big"),
        F.lit("left").alias("side"),
    )
    right = li.join(supp, supp.s_suppkey == li.l_suppkey, "right").select(
        "s_suppkey", F.coalesce("n_big", F.lit(0)).alias("n_big"),
        F.lit("right").alias("side"),
    )
    return left.unionByName(right)


SQL_JOIN_LEFT_RIGHT = (
    "WITH li AS (SELECT l_suppkey, COUNT(*) AS n_big FROM lineitem "
    "WHERE l_quantity > 49 GROUP BY l_suppkey) "
    "SELECT s_suppkey, COALESCE(n_big, 0) AS n_big, 'left' AS side "
    "FROM supplier LEFT JOIN li ON s_suppkey = l_suppkey "
    "UNION ALL "
    "SELECT s_suppkey, COALESCE(n_big, 0) AS n_big, 'right' AS side "
    "FROM li RIGHT JOIN supplier ON s_suppkey = l_suppkey"
)


def tpch_q12_shipmode(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional CASE aggregation by flag."""
    orders = data.load(spark, sf, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = data.load(spark, sf, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    hi = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi).alias("high_line_count"),
            F.sum(1 - hi).alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = (
    "SELECT l_returnflag, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY l_returnflag"
)


def tpch_q14_promo_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio over a join — exact
    decimal arithmetic, single output row."""
    part = data.load(spark, sf, "part", columns=["p_partkey", "p_type"])
    li = data.load(
        spark, sf, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast(D) - _dec("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0).cast(D))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("decimal(28,4)").alias("promo_revenue"),
            F.sum(rev).cast("decimal(28,4)").alias("total_revenue"),
            F.count("*").alias("n"),
        )
    )


SQL_TPCH_Q14 = (
    "SELECT "
    "CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(28,4)) AS promo_revenue, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS total_revenue, "
    "COUNT(*) AS n "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
)


def agg_collect_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """collect_set / collect_list aggregation (sorted for determinism) —
    the array-building agg shape feature pipelines use for grouping."""
    df = data.load(spark, sf, "orders", columns=["o_orderstatus", "o_orderpriority"])
    return df.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
        F.count("*").alias("n"),
    )


SQL_AGG_COLLECT = (
    "SELECT o_orderstatus, "
    "array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities, "
    "COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
)


QUERIES: dict[str, tuple] = {
    "scan_roundtrip_lineitem": (scan_roundtrip_lineitem, SQL_SCAN_ROUNDTRIP),
    "scan_projection_pruning": (scan_projection_pruning, SQL_SCAN_PROJECTION),
    "scan_filter_pages": (scan_filter_pages, SQL_SCAN_FILTER),
    "scan_nulls_validity": (scan_nulls_validity, SQL_SCAN_NULLS),
    "scan_nested_list": (scan_nested_list, SQL_SCAN_NESTED),
    "scan_multi_table_chunk": (scan_multi_table_chunk, SQL_SCAN_MULTI),
    "dict_encode_fsb": (dict_encode_fsb, SQL_DICT_FSB),
    "compression_codecs": (compression_codecs, SQL_COMPRESSION),
    "types_decimal_date": (types_decimal_date, SQL_TYPES_DECIMAL),
    "agg_groupby_sum": (agg_groupby_sum, SQL_AGG_GROUPBY),
    "agg_distinct": (agg_distinct, SQL_AGG_DISTINCT),
    "agg_rollup": (agg_rollup, SQL_AGG_ROLLUP),
    "agg_approx_sketches": (agg_approx_sketches, None),
    "join_hash_orders_customer": (join_hash_orders_customer, SQL_JOIN_HASH),
    "join_broadcast_dims": (join_broadcast_dims, SQL_JOIN_BROADCAST),
    "join_semi_anti": (join_semi_anti, SQL_JOIN_SEMI_ANTI),
    "join_asof_event_order": (join_asof_event_order, SQL_JOIN_ASOF),
    "join_full_outer": (join_full_outer, SQL_JOIN_FULL_OUTER),
    "null_handling": (null_handling, SQL_NULL_HANDLING),
    "join_range_events": (join_range_events, SQL_JOIN_RANGE),
    "window_sessionize": (window_sessionize, SQL_WINDOW_SESSION),
    "agg_cube_events": (agg_cube_events, SQL_AGG_CUBE),
    "window_rank_events": (window_rank_events, SQL_WINDOW_RANK),
    "window_running_sum": (window_running_sum, SQL_WINDOW_RUNNING),
    "sort_limit_topk": (sort_limit_topk, SQL_SORT_TOPK),
    "setop_union_except": (setop_union_except, SQL_SETOP),
    "setop_intersect": (setop_intersect, SQL_SETOP_INTERSECT),
    "agg_pivot_status": (agg_pivot_status, SQL_AGG_PIVOT),
    "explode_embeddings": (explode_embeddings, SQL_EXPLODE),
    "window_ntile_percent": (window_ntile_percent, SQL_WINDOW_NTILE),
    "scalar_functions": (scalar_functions, SQL_SCALAR),
    "tpch_q3_shipping": (tpch_q3_shipping, SQL_TPCH_Q3),
    "tpch_q5_local_revenue": (tpch_q5_local_revenue, SQL_TPCH_Q5),
    "tpch_q18_large_orders": (tpch_q18_large_orders, SQL_TPCH_Q18),
    "scalar_json_events": (scalar_json_events, SQL_SCALAR_JSON),
    "agg_grouping_sets": (agg_grouping_sets, SQL_AGG_GROUPING_SETS),
    "tpch_q4_order_priority": (tpch_q4_order_priority, SQL_TPCH_Q4),
    "tpch_q6_revenue": (tpch_q6_revenue, SQL_TPCH_Q6),
    "subquery_correlated_scalar": (subquery_correlated_scalar, SQL_SUBQUERY_SCALAR),
    "subquery_in_uncorrelated": (subquery_in_uncorrelated, SQL_SUBQUERY_IN),
    "window_lead_lag": (window_lead_lag, SQL_WINDOW_LEAD_LAG),
    "window_range_frame": (window_range_frame, SQL_WINDOW_RANGE_FRAME),
    "agg_stats_moments": (agg_stats_moments, SQL_AGG_STATS),
    "scalar_array_functions": (scalar_array_functions, SQL_SCALAR_ARRAY),
    "scalar_map_functions": (scalar_map_functions, SQL_SCALAR_MAP),
    "dedup_latest_per_key": (dedup_latest_per_key, SQL_DEDUP_LATEST),
    "join_nested_loop": (join_nested_loop, SQL_JOIN_NESTED_LOOP),
    "types_unsigned_time": (types_unsigned_time, SQL_TYPES_UNSIGNED),
    "scalar_datetime_functions": (scalar_datetime_functions, SQL_SCALAR_DATETIME),
    "scalar_string_advanced": (scalar_string_advanced, SQL_SCALAR_STRING),
    "join_left_right_outer": (join_left_right_outer, SQL_JOIN_LEFT_RIGHT),
    "tpch_q12_shipmode": (tpch_q12_shipmode, SQL_TPCH_Q12),
    "tpch_q14_promo_ratio": (tpch_q14_promo_ratio, SQL_TPCH_Q14),
    "agg_collect_sorted": (agg_collect_sorted, SQL_AGG_COLLECT),
}
