"""Unit tests pinning connected-components semantics on handcrafted
graphs (the oracle harness cross-checks a corpus-sized instance against
a recursive CTE; these pin exact behavior: chains needing >1 round,
isolated self-loops, label minimality)."""

from __future__ import annotations

import pytest


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


def _cc(spark, edges):
    from olive_spark.ops.graph import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    return {r["node"]: r["cluster"] for r in rows}


def test_chain_converges_past_one_hop(spark):
    # 1-2-3-4-5 chain: min label must travel 4 hops
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_self_loop(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 30)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}


def test_overlapping_cliques_merge(spark):
    # {1,2,3} and {3,4,5} share node 3 → one component labeled 1
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 5


def _cc_algo(spark, edges, algorithm, **kw):
    from olive_spark.ops.graph import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df, algorithm=algorithm, **kw).collect()
    return {r["node"]: r["cluster"] for r in rows}


def test_star_and_label_agree_on_long_chain(spark):
    # 40-node chain: the worst case for diameter-bound propagation and
    # the case large-star/small-star exists for — star finishes within
    # the DEFAULT iteration budget (O(log n) rounds), while min-label
    # needs one round per hop (39 > the default 25; why star is default)
    edges = [(i, i + 1) for i in range(1, 40)]
    expect = {i: 1 for i in range(1, 41)}
    assert _cc_algo(spark, edges, "star") == expect
    assert _cc_algo(spark, edges, "label", max_iter=45) == expect


def test_star_handles_merging_stars_and_singletons(spark):
    edges = [(5, 9), (9, 2), (2, 7), (100, 100), (50, 60), (60, 40)]
    got = _cc_algo(spark, edges, "star")
    assert got == {2: 2, 5: 2, 7: 2, 9: 2, 100: 100, 40: 40, 50: 40, 60: 40}


def _numpy_pagerank(edge_list, damping=0.85, iters=60):
    import numpy as np

    nodes = sorted({x for e in edge_list for x in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    simple = sorted(set(edge_list))
    for s, d in simple:
        out.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1.0 - damping) / n)
        dang = sum(r[ix[v]] for v in nodes if v not in out)
        nr += damping * dang / n
        for s, ds in out.items():
            share = damping * r[ix[s]] / len(ds)
            for d in ds:
                nr[ix[d]] += share
        r = nr
    return {v: r[ix[v]] for v in nodes}


def test_pagerank_matches_numpy_reference(spark):
    """Power iteration parity on a graph mixing a hub, a chain, a
    dangling sink, and parallel edges (deduplicated)."""
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1),  # hub
        (5, 6), (6, 7), (7, 8),                          # chain -> sink 8
        (2, 5), (2, 5),                                  # parallel edge
        (9, 9),                                          # self loop
        (3, 9),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    from olive_spark.ops.graph import pagerank

    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=60, tol=1e-12).collect()
    }
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle has the uniform stationary distribution."""
    n = 8
    df = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    from olive_spark.ops.graph import pagerank

    got = [r["rank"] for r in pagerank(df, max_iter=40).collect()]
    assert len(got) == n
    for v in got:
        assert abs(v - 1.0 / n) < 1e-9
