"""Driver contract for the spark-graft builder (PySpark target).

The engine: olive_spark — a PySpark-native analytics engine with the
capabilities of steelcake/olive (an Arrow-based columnar file format;
reference at /root/reference, studied for behavior only — SURVEY.md).

Every query scans data through the olive format (parquet → olive
conversion cached under /tmp/olive_cache); the DuckDB oracles read the
original parquet, so a hash match proves both the format round-trip and
the operator semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def _prepare(spark: SparkSession) -> None:
    from olive_spark import register_olive

    register_olive(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # Under local[32] bursts, freshly-forked Python workers can miss
        # the 15 s default connect-back window → transient
        # "Python worker failed to connect back" failures.  The factory
        # reads the live SparkConf at worker spawn, so this takes effect
        # even though the session already exists.
        spark.sparkContext._jsc.sc().conf().set(
            "spark.python.authenticate.socketTimeout", "120s"
        )
    except Exception:
        pass  # conf shape differs on Connect sessions — best-effort


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shaped aggregation over a lineitem scan
    that goes parquet → olive format → Spark columnar scan → agg."""
    _prepare(spark)
    from olive_spark.queries.relational import agg_groupby_sum

    return agg_groupby_sum(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§2.7."""
    from olive_spark.queries import ALL_QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    from olive_spark.queries import ALL_QUERIES

    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
