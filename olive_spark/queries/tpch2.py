"""TPC-H-shaped query coverage, part 3 (Q2, Q11, Q20, Q21 adaptations).

The reference implements no relational operators (SURVEY.md §2.6 —
verified against /root/reference/src/root.zig:9-16); these close out the
TPC-H subquery topologies not yet exercised: correlated MIN over a
derived "partsupp" (Q2), HAVING against a scalar global fraction (Q11),
nested IN with a correlated-aggregate threshold (Q20), and the
EXISTS / NOT EXISTS same-table double correlation (Q21).

The driver testdata has no partsupp table and no commit/receipt dates;
the distinct (l_partkey, l_suppkey) pairs of lineitem stand in for
partsupp, s_acctbal for ps_supplycost, and l_returnflag = 'R' for
"late" (noted per query).  Fractional thresholds are cleared of
division (``x * k > total`` instead of ``x > total / k``) so both
engines compare exact decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from olive_spark.queries import data


def _views(spark: SparkSession, sf: str, spec: dict[str, list[str]]) -> None:
    for table, cols in spec.items():
        data.load(spark, sf, table, columns=cols).createOrReplaceTempView(table)


# ------------------------------------------------------------------- Q2


def tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the supplier(s) with the
    minimum cost — correlated scalar MIN subquery over the derived
    partsupp (distinct lineitem pairs; s_acctbal as the cost proxy).
    Catalyst rewrites the correlation into an aggregate + re-join, so
    the 100 TB side is scanned twice but never nested-loop probed."""
    _views(spark, sf, {
        "lineitem": ["l_partkey", "l_suppkey"],
        "part": ["p_partkey", "p_brand", "p_size", "p_type"],
        "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        "nation": ["n_nationkey", "n_name", "n_regionkey"],
        "region": ["r_regionkey", "r_name"],
    })
    return spark.sql(SQL_TPCH_Q2)


SQL_TPCH_Q2 = (
    "WITH partsupp AS (SELECT DISTINCT l_partkey AS ps_partkey, "
    "l_suppkey AS ps_suppkey FROM lineitem) "
    "SELECT /*+ BROADCAST(nation, region, n2, r2) */ "
    "CAST(s_acctbal AS DECIMAL(18,2)) AS s_acctbal, s_name, n_name, "
    "p_partkey, p_brand "
    "FROM part, partsupp, supplier, nation, region "
    "WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey "
    "AND p_size = 15 AND p_type = 'ECONOMY' "
    "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
    "AND r_name = 'ASIA' "
    "AND CAST(s_acctbal AS DECIMAL(18,2)) = ("
    "SELECT MIN(CAST(s2.s_acctbal AS DECIMAL(18,2))) "
    "FROM partsupp ps2, supplier s2, nation n2, region r2 "
    "WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey "
    "AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey "
    "AND r2.r_name = 'ASIA') "
    "ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100"
)


# ------------------------------------------------------------------ Q11


def tpch_q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape: part values held by one nation's suppliers, keeping
    parts whose value exceeds a fraction of that nation's total — a
    grouped aggregate HAVING-compared against a scalar subquery over the
    same aggregate.  Threshold cleared of division: value * 1000 > total
    (exact decimal × integer, no float fraction)."""
    _views(spark, sf, {
        "lineitem": ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        "supplier": ["s_suppkey", "s_nationkey"],
        "nation": ["n_nationkey", "n_name"],
    })
    return spark.sql(SQL_TPCH_Q11)


SQL_TPCH_Q11 = (
    "WITH nat_value AS ("
    "SELECT /*+ BROADCAST(nation) */ l_partkey AS ps_partkey, "
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS part_value "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name = 'NATION_5' GROUP BY l_partkey) "
    "SELECT ps_partkey, CAST(part_value AS DECIMAL(28,4)) AS part_value "
    "FROM nat_value "
    "WHERE part_value * 1000 > (SELECT SUM(part_value) FROM nat_value) "
    "ORDER BY part_value DESC, ps_partkey"
)


# ------------------------------------------------------------------ Q20


def tpch_q20_excess_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape: suppliers of one nation who shipped more than a
    threshold quantity of any name-matched part in one year — nested IN
    over a correlated-aggregate derived table (availqty comparison in
    the original; here the per-(supp, part) shipped sum plays availqty)."""
    _views(spark, sf, {
        "lineitem": ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        "part": ["p_partkey", "p_name"],
        "supplier": ["s_suppkey", "s_name", "s_nationkey"],
        "nation": ["n_nationkey", "n_name"],
    })
    return spark.sql(SQL_TPCH_Q20)


SQL_TPCH_Q20 = (
    "SELECT /*+ BROADCAST(nation) */ s_name "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name = 'NATION_2' AND s_suppkey IN ("
    "SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE p_name LIKE '%gear%' "
    "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY l_suppkey, l_partkey "
    "HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 40) "
    "ORDER BY s_name"
)


# ------------------------------------------------------------------ Q21


def tpch_q21_waiting_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: suppliers whose lineitems were returned in
    multi-supplier orders where no other supplier's items were returned
    — the classic EXISTS(other supplier) AND NOT EXISTS(other supplier
    also failed) double correlation on the same fact table
    (l_returnflag = 'R' standing in for receipt-after-commit)."""
    _views(spark, sf, {
        "lineitem": ["l_orderkey", "l_suppkey", "l_returnflag"],
        "orders": ["o_orderkey", "o_orderstatus"],
        "supplier": ["s_suppkey", "s_name", "s_nationkey"],
        "nation": ["n_nationkey", "n_name"],
    })
    return spark.sql(SQL_TPCH_Q21)


SQL_TPCH_Q21 = (
    "SELECT /*+ BROADCAST(nation) */ s_name, COUNT(*) AS numwait "
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND n_name = 'NATION_1' "
    "AND l1.l_returnflag = 'R' "
    "AND EXISTS (SELECT 1 FROM lineitem l2 "
    "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
    "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey "
    "AND l3.l_returnflag = 'R') "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
)


QUERIES: dict[str, tuple] = {
    "tpch_q2_min_cost_supplier": (tpch_q2_min_cost_supplier, SQL_TPCH_Q2),
    "tpch_q11_important_stock": (tpch_q11_important_stock, SQL_TPCH_Q11),
    "tpch_q20_excess_shippers": (tpch_q20_excess_shippers, SQL_TPCH_Q20),
    "tpch_q21_waiting_orders": (tpch_q21_waiting_orders, SQL_TPCH_Q21),
}
