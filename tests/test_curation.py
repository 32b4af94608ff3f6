"""Unit tests pinning curation-operator semantics on handcrafted rows
(the oracle harness checks corpus-sized runs; these pin the edge cases:
multiple PII hits per doc, stratum boundary rates, fingerprint length
clamps, packing boundary behavior)."""

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


def test_pii_redact_counts_and_masks(spark):
    from olive_spark.ops.curation import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org, call 555-0123"),
            (2, "no pii here"),
            (3, "555-1 555-2"),
        ],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in pii_redact(df, "text").collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL>, call <PHONE>"
    assert rows[2]["n_emails"] == 0 and rows[2]["redacted"] == "no pii here"
    assert rows[3]["n_phones"] == 2 and rows[3]["redacted"] == "<PHONE> <PHONE>"


def test_stratified_sample_rate_boundaries(spark):
    from olive_spark.ops.curation import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i < 200 else "fr") for i in range(400)], ["k", "lang"]
    )
    kept = stratified_sample(df, "lang", "k", {"en": 10}, default_rate=50).collect()
    en = [r["k"] for r in kept if r["lang"] == "en"]
    fr = [r["k"] for r in kept if r["lang"] == "fr"]
    # en: k%100 < 10 → 0-9 and 100-109; fr: k%100 < 50
    assert sorted(en) == list(range(10)) + list(range(100, 110))
    assert len(fr) == 100 and all(k % 100 < 50 for k in fr)


def test_prefix_fingerprint_clamps_short_docs(spark):
    from pyspark.sql import functions as F

    from olive_spark.ops.curation import prefix_fingerprint

    df = spark.createDataFrame(
        [("one two three four five six seven eight nine",), ("tiny doc",)],
        ["text"],
    )
    got = [r["fp"] for r in df.select(prefix_fingerprint("text", 8).alias("fp")).collect()]
    assert got[0] == "one two three four five six seven eight"
    assert got[1] == "tiny doc"


def test_bigram_topk_counts(spark):
    from olive_spark.ops.curation import bigram_topk

    df = spark.createDataFrame(
        [("a b a b",), ("a b c",), ("solo",)], ["text"]
    )
    got = {(r["bigram"], r["n"]) for r in bigram_topk(df, "text", k=5).collect()}
    # "a b" appears in doc1 twice + doc2 once; "b a" once; "b c" once
    assert got == {("a b", 3), ("b a", 1), ("b c", 1)}


def test_contamination_exact_prefix_only(spark):
    from olive_spark.ops.curation import contamination_check

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma", "s1"), (2, "alpha beta delta", "s1"),
         (3, "other text here", "s2")],
        ["doc_id", "text", "source"],
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma",), ("unrelated words",)], ["text"]
    )
    got = {(r["source"], r["n_contaminated"])
           for r in contamination_check(corpus, bench, "text", n_words=3).collect()}
    assert got == {("s1", 1)}  # only doc 1 matches the full 3-word prefix
