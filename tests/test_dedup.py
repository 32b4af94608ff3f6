"""Unit tests pinning dedup-operator semantics on handcrafted rows:
planted near-duplicates must pair, distinct texts must not, and the
vectorized minhash signature path must behave like a per-document
minimum (same text → same signature; signature length/domain)."""

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


BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun")
NEAR = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the evening sun")
OTHER = ("completely different content about database engines and "
        "columnar storage formats with pages and compression codecs")


def test_minhash_signatures_deterministic_and_bounded(spark):
    from olive_spark.ops import dedup

    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, OTHER)], ["doc_id", "text"]
    )
    sigs = {r["doc_id"]: r["minhash"]
            for r in dedup.minhash_signatures(df).collect()}
    assert len(sigs) == 3
    for s in sigs.values():
        assert len(s) == 64
        assert all(0 <= v < (1 << 31) - 1 for v in s)
    # identical text → identical signature; different text → different
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_minhash_lsh_pairs_plants_and_rejects(spark):
    from olive_spark.ops import dedup

    df = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, "short text")],
        ["doc_id", "text"],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_est"]
             for r in dedup.minhash_lsh_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs, "planted near-duplicate not found"
    assert pairs[(1, 2)] >= 0.5
    assert all(p == (1, 2) for p in pairs), f"false positives: {pairs}"


def test_ngram_jaccard_exact_verification(spark):
    from olive_spark.ops import dedup

    df = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER)], ["doc_id", "text"]
    )
    rows = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)

    # expected = exact set Jaccard under the operator's own shingle
    # definition (word 3-grams, distinct)
    def sh(text):
        w = text.lower().split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    a, b = sh(BASE), sh(NEAR)
    assert r["jaccard"] == pytest.approx(len(a & b) / len(a | b), abs=1e-4)


def test_exact_dedup_groups(spark):
    from olive_spark.ops import dedup

    df = spark.createDataFrame(
        [(1, "same"), (5, "same"), (3, "same"), (2, "unique")],
        ["doc_id", "text"],
    )
    rows = {r["keep_id"]: r["dup_count"]
            for r in dedup.exact_dedup(df).collect()}
    assert rows == {1: 3, 2: 1}


def test_embedding_neardup_rejects_ragged_vectors(spark):
    """Null/ragged embeddings can't be hyperplane-hashed; lumping them
    into one bucket would split true near-dup pairs — fail loudly."""
    from olive_spark.ops import dedup

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="ragged or null"):
        dedup.embedding_neardup_pairs(df).collect()
