"""Recall tests for the approximate similarity paths against the exact
brute-force ranking (sf0.001 embeddings)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_pq_recall_vs_brute_force(spark):
    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    # separate relations per filtered/unfiltered use: a filtered action
    # poisons the relation's cached scan plan for later filter-less
    # actions (see OliveReader.pushFilters)
    qdf = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    qrows = [(r["vec_id"], r["embedding"])
             for r in qdf.filter(F.col("vec_id") < 5).collect()]
    k = 10
    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    exact = similarity.cosine_topk(
        corpus,
        data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
        .filter(F.col("vec_id") < 5),
        k=k,
    ).collect()
    corpus2 = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    approx = similarity.pq_topk(corpus2, qrows, k=k).collect()

    def by_query(rows):
        out: dict = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    ex, ap = by_query(exact), by_query(approx)
    assert set(ex) == set(ap)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.8, f"recall too low: {recalls}"
    # re-rank stage must emit exact cosine ordering among survivors
    for r in approx:
        assert 1 <= r["rk"] <= k
