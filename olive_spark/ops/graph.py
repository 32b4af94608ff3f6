"""Distributed connected components for dedup clustering.

The reference implements nothing graph-shaped (it is a file format,
/root/reference/src/root.zig:9-16); this is north-star pipeline
machinery: near-dup *pairs* (minhash/simhash/fingerprint buckets) only
become actionable when merged into clusters ("keep one doc per
component").

Implementation is iterative min-label propagation over DataFrames:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Each round is one shuffle join + one groupBy —
the standard open formulation (see also the large-star/small-star
algorithm of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) whose round count is O(log d) in component diameter.
Dedup-cluster graphs are unions of near-cliques, so 2-4 rounds suffice
at any scale; every round's lineage is cut with a localCheckpoint so
the plan does not grow exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 1,
) -> DataFrame:
    """(src, dst) undirected edge list → (node, cluster) with cluster =
    min node id reachable.  Nodes are whatever appears in the edge list
    (callers add self-loops for isolated nodes they want labeled).

    Two scale-critical choices: the symmetrized edge list is PERSISTED —
    it is joined every round, and without a cache each round would
    re-run the upstream pipeline that produced the edges (for dedup
    that is the whole fingerprint/LSH scan); and convergence is detected
    by a label-checksum aggregate instead of a second join per round.
    Labels are monotone non-increasing (the self-loop puts each node's
    own label into its min), so an unchanged label-sum between rounds
    is a sound fixpoint witness — one cheap agg replaces a full
    prop-vs-labels equi-join."""
    from pyspark import StorageLevel

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(edges.select(F.col("src").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = sym.groupBy("src").agg(F.min("dst").alias("label")) \
        .withColumnRenamed("src", "node")

    def _checksum(df: DataFrame):
        # decimal(38,0) sum: overflow-safe for arbitrary long ids
        row = df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        return (row["s"], row["n"])

    prev = _checksum(labels)
    for i in range(max_iter):
        # propagate: each node adopts the min label among itself and
        # its neighbors' current labels
        prop = (
            sym.join(labels, sym.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if checkpoint_every and (i % checkpoint_every == 0):
            prop = prop.localCheckpoint(eager=False)
        cur = _checksum(prop)
        labels = prop
        if cur == prev:
            break
        prev = cur
    sym.unpersist(blocking=False)
    return labels.select("node", F.col("label").alias("cluster"))
