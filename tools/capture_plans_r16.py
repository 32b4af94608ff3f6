"""Capture .explain('formatted') before/after evidence for the r16
optimization round (plans/r16/).  Run once on the r15 tree (mode
'before') and once on the r16 tree (mode 'after'); each file says
exactly what it shows.

Run: python tools/capture_plans_r16.py before|after
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r16")
SF = "/root/testdata/sf0.1"


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write(name: str, header: str, body: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        f.write(header.rstrip() + "\n\n" + body)
    print("wrote", name)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "after"
    suffix = f"_{mode}.txt"

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )
    from olive_spark import register_olive

    register_olive(spark)
    import __spark_entry__ as E

    qs = E.queries()

    # Batch-plan targets: the final DataFrame each query returns.
    for name in (
        "events_window_funnel_chained",
        "llm_similarity_ivf_persisted",
        "llm_similarity_pq_persisted",
        "llm_dedup_incremental",
        "llm_dedup_index_update",
        "stream_cdc_pump",
    ):
        df = qs[name](spark, SF)
        write(name + suffix, f"# {name}: final query plan ({mode} r16).",
              fmt(df))

    # pagerank: the per-round step plan (the loop body), captured by
    # running one round's construction by hand off the op's own pieces.
    from olive_spark.queries import data
    from olive_spark.ops import graph as G

    docs = data.load(spark, SF, "documents", columns=["doc_id"])
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    src = F.col("doc_id")
    edges = None
    for a, b in ((7, 3), (13, 11), (29, 17)):
        leg = docs.select(src.alias("src"), ((src * a + b) % n).alias("dst"))
        edges = leg if edges is None else edges.unionByName(leg)
    step = G._pagerank_round_plan_for_capture(edges)
    write(
        "llm_graph_pagerank_round" + suffix,
        f"# pagerank per-round step plan ({mode} r16): the Exchanges\n"
        "# INSIDE one power-iteration round (links join + transpose\n"
        "# groupBy + Observation).",
        fmt(step),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
