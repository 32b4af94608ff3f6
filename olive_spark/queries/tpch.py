"""TPC-H-shaped query coverage, part 2 (Q7-Q10, Q13, Q15-Q17, Q19, Q22).

The reference implements no relational operators (SURVEY.md §2.6 —
verified against /root/reference/src/root.zig:9-16); these queries
exercise Spark's built-in join/agg/subquery surface over olive-format
scans, shaped after the remaining classic TPC-H patterns the driver
testdata can express (no partsupp table → lineitem's (l_partkey,
l_suppkey) pairs stand in for it; no c_phone/receiptdate → adapted
predicates, noted per query).

Exactness: money math is done on decimal(18,2) casts in BOTH engines
(see relational.py); predicates that TPC-H states as ``x < frac * AVG``
are algebraically cleared of division (``x * 5 * n < sum``) so the
comparison is exact integer/decimal arithmetic in both Spark and DuckDB
— a float average in a predicate could flip rows between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from olive_spark.queries import data
from olive_spark.queries.relational import D, _dec


def _rev():
    return _dec("l_extendedprice") * (F.lit(1).cast(D) - _dec("l_discount"))


# ------------------------------------------------------------------- Q7


def tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 shape: revenue shipped between two nations, by direction and
    year — two independent dimension paths (supplier→nation,
    customer→orders→nation) over one lineitem scan; both nation dims
    broadcast, so the only shuffles are the two fact joins."""
    li = data.load(
        spark, sf, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = data.load(spark, sf, "orders", columns=["o_orderkey", "o_custkey"])
    cust = data.load(spark, sf, "customer", columns=["c_custkey", "c_nationkey"])
    supp = data.load(spark, sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    n1 = data.load(spark, sf, "nation", columns=["n_nationkey", "n_name"]) \
        .withColumnRenamed("n_name", "supp_nation")
    n2 = data.load(spark, sf, "nation", columns=["n_nationkey", "n_name"]) \
        .withColumnRenamed("n_name", "cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.n_nationkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("decimal(28,4)").alias("revenue"),
             F.count("*").alias("n"))
    )


SQL_TPCH_Q7 = (
    "SELECT supp_nation, cust_nation, l_year, "
    "CAST(SUM(rev) AS DECIMAL(28,4)) AS revenue, COUNT(*) AS n FROM ("
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "EXTRACT(YEAR FROM l_shipdate) AS l_year, "
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
    "WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') "
    "OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')"
    ") GROUP BY supp_nation, cust_nation, l_year"
)


# ------------------------------------------------------------------- Q8


def tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 shape: one nation's revenue vs total revenue in a region, per
    year.  Ratio returned as (nation_volume, total_volume) numerator/
    denominator pair — exact decimals instead of a float division whose
    rounding could differ between engines."""
    li = data.load(
        spark, sf, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    part = data.load(spark, sf, "part", columns=["p_partkey", "p_type"]) \
        .filter(F.col("p_type") == "ECONOMY")
    orders = data.load(spark, sf, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = data.load(spark, sf, "customer", columns=["c_custkey", "c_nationkey"])
    nat_c = data.load(spark, sf, "nation", columns=["n_nationkey", "n_regionkey"])
    region = data.load(spark, sf, "region", columns=["r_regionkey", "r_name"]) \
        .filter(F.col("r_name") == "ASIA")
    supp = data.load(spark, sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat_s = data.load(spark, sf, "nation", columns=["n_nationkey", "n_name"]) \
        .withColumnRenamed("n_nationkey", "sn_nationkey")
    vol = F.col("rev")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat_c), cust.c_nationkey == nat_c.n_nationkey)
        .join(F.broadcast(region), nat_c.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat_s), supp.s_nationkey == F.col("sn_nationkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select(F.year("o_orderdate").alias("o_year"), _rev().alias("rev"),
                F.col("n_name"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("n_name") == "NATION_5", vol).otherwise(F.lit(0).cast(D)))
            .cast("decimal(28,4)").alias("nation_volume"),
            F.sum(vol).cast("decimal(28,4)").alias("total_volume"),
            F.count("*").alias("n"),
        )
    )


SQL_TPCH_Q8 = (
    "SELECT o_year, "
    "CAST(SUM(CASE WHEN n_name = 'NATION_5' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(28,4)) AS nation_volume, "
    "CAST(SUM(rev) AS DECIMAL(28,4)) AS total_volume, COUNT(*) AS n FROM ("
    "SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year, "
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev, "
    "n2.n_name AS n_name "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
    "JOIN region ON n1.n_regionkey = r_regionkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
    "WHERE p_type = 'ECONOMY' AND r_name = 'ASIA' "
    "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    ") GROUP BY o_year"
)


# ------------------------------------------------------------------- Q9


def tpch_q9_product_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape: revenue by supplier-nation and order-year for parts
    matching a name pattern (no ps_supplycost in the testdata → profit
    reduces to revenue; the join/agg topology is Q9's)."""
    li = data.load(
        spark, sf, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    part = data.load(spark, sf, "part", columns=["p_partkey", "p_name"]) \
        .filter(F.col("p_name").contains("red"))
    supp = data.load(spark, sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = data.load(spark, sf, "nation", columns=["n_nationkey", "n_name"])
    orders = data.load(spark, sf, "orders", columns=["o_orderkey", "o_orderdate"])
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev()).cast("decimal(28,4)").alias("sum_profit"),
             F.count("*").alias("n"))
    )


SQL_TPCH_Q9 = (
    "SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS sum_profit, "
    "COUNT(*) AS n "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "WHERE p_name LIKE '%red%' "
    "GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)"
)


# ------------------------------------------------------------------ Q10


def tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in one
    quarter — join-heavy agg with a deterministic top-k tail sort."""
    li = data.load(
        spark, sf, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).filter(F.col("l_returnflag") == "R")
    orders = data.load(
        spark, sf, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    cust = data.load(
        spark, sf, "customer",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nation = data.load(spark, sf, "nation", columns=["n_nationkey", "n_name"])
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", _dec("c_acctbal").alias("c_acctbal"), "n_name")
        .agg(F.sum(_rev()).cast("decimal(28,4)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


SQL_TPCH_Q10 = (
    "SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal, n_name, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE l_returnflag = 'R' "
    "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
    "GROUP BY c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)), n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20"
)


# ------------------------------------------------------------------ Q13


def tpch_q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 shape: distribution of customers by order count — LEFT OUTER
    join with an ON-clause predicate (kept distinct from a WHERE filter:
    customers with zero qualifying orders must survive with count 0),
    then a second aggregation over the first."""
    cust = data.load(spark, sf, "customer", columns=["c_custkey"])
    orders = data.load(
        spark, sf, "orders", columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH_Q13 = (
    "SELECT c_count, COUNT(*) AS custdist FROM ("
    "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
    "FROM customer LEFT OUTER JOIN orders "
    "ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
    "GROUP BY c_custkey) "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
)


# ------------------------------------------------------------------ Q15


def tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: supplier(s) whose revenue equals the global max — a
    scalar MAX subquery over a derived aggregate (the reference's only
    max computation is dict-key rebasing, src/write.zig:373-375)."""
    data.load(
        spark, sf, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).createOrReplaceTempView("lineitem")
    data.load(spark, sf, "supplier", columns=["s_suppkey", "s_name"]) \
        .createOrReplaceTempView("supplier")
    return spark.sql(SQL_TPCH_Q15)


SQL_TPCH_Q15 = (
    "WITH revenue AS ("
    "SELECT l_suppkey AS supplier_no, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS total_revenue "
    "FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00' "
    "GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, total_revenue "
    "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
    "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
    "ORDER BY s_suppkey"
)


# ------------------------------------------------------------------ Q16


def tpch_q16_parts_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute bucket,
    with a NOT IN subquery excluding flagged suppliers.  lineitem's
    (l_partkey, l_suppkey) pairs stand in for partsupp."""
    data.load(spark, sf, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]) \
        .createOrReplaceTempView("part")
    data.load(spark, sf, "lineitem", columns=["l_partkey", "l_suppkey"]) \
        .createOrReplaceTempView("lineitem")
    data.load(spark, sf, "supplier", columns=["s_suppkey", "s_acctbal"]) \
        .createOrReplaceTempView("supplier")
    return spark.sql(SQL_TPCH_Q16)


SQL_TPCH_Q16 = (
    "SELECT p_brand, p_type, p_size, "
    "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO' "
    "AND p_size IN (1, 5, 10, 15, 20, 25) "
    "AND l_suppkey NOT IN "
    "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0) "
    "GROUP BY p_brand, p_type, p_size "
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
)


# ------------------------------------------------------------------ Q17


def tpch_q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 shape: lineitems under 20%% of their part's average quantity.
    The fractional-average predicate is cleared of division —
    ``qty * 5 * n_part < sum_qty_part`` — so both engines compare exact
    decimals (a float avg could flip boundary rows)."""
    data.load(spark, sf, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]) \
        .createOrReplaceTempView("lineitem")
    data.load(spark, sf, "part", columns=["p_partkey", "p_brand"]) \
        .createOrReplaceTempView("part")
    return spark.sql(SQL_TPCH_Q17)


SQL_TPCH_Q17 = (
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sum_extprice, "
    "COUNT(*) AS n FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand = 'Brand#3' "
    "AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * ("
    "SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey) < ("
    "SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) FROM lineitem l2 "
    "WHERE l2.l_partkey = part.p_partkey)"
)


# ------------------------------------------------------------------ Q19


def tpch_q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: disjunction of three brand/size/quantity conjunct
    groups — Catalyst pushes the shared part-join key through the OR
    and broadcasts the dimension."""
    li = data.load(
        spark, sf, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = data.load(spark, sf, "part", columns=["p_partkey", "p_brand", "p_size"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_rev()).cast("decimal(28,4)").alias("revenue"),
             F.count("*").alias("n"))
    )


SQL_TPCH_Q19 = (
    "SELECT "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS revenue, "
    "COUNT(*) AS n "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) "
    "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) "
    "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"
)


# ------------------------------------------------------------------ Q22


def tpch_q22_global_sales(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: customers with above-average positive balance and no
    urgent orders — scalar AVG subquery (division-cleared:
    ``bal * n > sum``) plus NOT EXISTS anti-join.  Country code derived
    from c_custkey and the anti-join restricted to urgent orders
    (testdata has no c_phone, and every customer has ≥1 order)."""
    data.load(spark, sf, "customer", columns=["c_custkey", "c_acctbal"]) \
        .createOrReplaceTempView("customer")
    data.load(spark, sf, "orders", columns=["o_custkey", "o_orderpriority"]) \
        .createOrReplaceTempView("orders")
    return spark.sql(SQL_TPCH_Q22)


SQL_TPCH_Q22 = (
    "SELECT cntrycode, COUNT(*) AS numcust, "
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS totacctbal FROM ("
    "SELECT CAST(c_custkey % 7 AS INT) AS cntrycode, c_acctbal "
    "FROM customer "
    "WHERE CAST(c_acctbal AS DECIMAL(18,2)) * ("
    "SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0) > ("
    "SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0.0) "
    "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
    "AND o_orderpriority = '1-URGENT')"
    ") GROUP BY cntrycode ORDER BY cntrycode"
)


QUERIES: dict[str, tuple] = {
    "tpch_q7_volume_shipping": (tpch_q7_volume_shipping, SQL_TPCH_Q7),
    "tpch_q8_market_share": (tpch_q8_market_share, SQL_TPCH_Q8),
    "tpch_q9_product_revenue": (tpch_q9_product_revenue, SQL_TPCH_Q9),
    "tpch_q10_returned_items": (tpch_q10_returned_items, SQL_TPCH_Q10),
    "tpch_q13_customer_distribution": (tpch_q13_customer_distribution, SQL_TPCH_Q13),
    "tpch_q15_top_supplier": (tpch_q15_top_supplier, SQL_TPCH_Q15),
    "tpch_q16_parts_suppliers": (tpch_q16_parts_suppliers, SQL_TPCH_Q16),
    "tpch_q17_small_quantity": (tpch_q17_small_quantity, SQL_TPCH_Q17),
    "tpch_q19_discounted_revenue": (tpch_q19_discounted_revenue, SQL_TPCH_Q19),
    "tpch_q22_global_sales": (tpch_q22_global_sales, SQL_TPCH_Q22),
}
