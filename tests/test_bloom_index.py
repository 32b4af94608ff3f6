"""Persisted sharded corpus Bloom index (ops/bloom_index.py): the
bitmap must never materialize on the driver (build streams shard rows
straight to the olive table, probe cogroups per shard), and every path
must be bit-identical to the in-memory build_corpus_bloom +
incremental_dedup reference."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from olive_spark import register_olive

    register_olive(s)
    yield s


def _mk(spark, n=500, dup_mod=300):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"concat('text-', cast(id % {dup_mod} as string)) AS text",
    )


def _probe_ref(spark, batch, corpus, bloom):
    from olive_spark.ops import dedup

    return sorted(
        tuple(r)
        for r in dedup.incremental_dedup(
            batch, corpus, bloom=bloom
        ).collect()
    )


def test_persisted_probe_matches_inmemory(spark, tmp_path):
    from olive_spark.ops import bloom_index, dedup

    docs = _mk(spark)
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id < 100")
    idx = str(tmp_path / "bi")
    meta = bloom_index.build_bloom_index(
        spark, corpus, idx, expected_items=1024, n_shards=4
    )
    # geometry identical to the in-memory derivation
    bloom = dedup.build_corpus_bloom(
        corpus, expected_items=1024, n_shards=4
    )
    assert (meta["m"], meta["k"], meta["n_shards"]) == (
        bloom["m"], bloom["k"], bloom["n_shards"],
    )
    got = sorted(
        tuple(r)
        for r in bloom_index.probe_bloom_index(
            spark, batch, corpus, idx
        ).collect()
    )
    assert got == _probe_ref(spark, batch, corpus, bloom)
    assert got  # non-trivial fixture

    # stored table: one slim row per shard, bitmap-sized binaries
    rows = (
        spark.read.format("olive").option("table", "bloom_shards")
        .load(os.path.join(idx, "shards")).collect()
    )
    assert sorted(r["shard"] for r in rows) == [0, 1, 2, 3]
    assert all(len(r["bloom"]) == meta["m"] // 8 for r in rows)

    # stored bits == in-memory bits, shard for shard (bit-exact parity)
    import numpy as np

    for r in rows:
        assert np.array_equal(
            np.frombuffer(r["bloom"], dtype=np.uint64),
            bloom["bits"][r["shard"]],
        )


def test_append_then_compact_keeps_parity(spark, tmp_path):
    from olive_spark.ops import bloom_index, dedup

    docs = _mk(spark)
    corpus = docs.filter("doc_id % 2 = 0")
    idx = str(tmp_path / "bi")
    bloom_index.build_bloom_index(
        spark, corpus, idx, expected_items=1024, n_shards=4
    )
    extra = spark.range(500, 600).selectExpr(
        "id AS doc_id", "concat('text-', cast(id as string)) AS text"
    )
    bloom_index.append_bloom_index(spark, extra, idx)
    corpus2 = corpus.unionByName(extra)
    batch2 = docs.filter("doc_id < 100").unionByName(
        spark.range(550, 560).selectExpr(
            "id + 5000 AS doc_id",
            "concat('text-', cast(id as string)) AS text",
        )
    )
    ref_bloom = dedup.merge_blooms(
        dedup.build_corpus_bloom(corpus, expected_items=1024, n_shards=4),
        dedup.build_corpus_bloom(extra, expected_items=1024, n_shards=4),
    )
    want = _probe_ref(spark, batch2, corpus2, ref_bloom)

    # fragmented (2 rows per shard) probe: readers OR rows per shard
    got = sorted(
        tuple(r)
        for r in bloom_index.probe_bloom_index(
            spark, batch2, corpus2, idx
        ).collect()
    )
    assert got == want

    # compact folds back to one row per shard, one MERGE version
    bloom_index.compact_bloom_index(spark, idx)
    shards = spark.read.format("olive").option(
        "table", "bloom_shards"
    ).load(os.path.join(idx, "shards"))
    assert shards.count() == 4
    got2 = sorted(
        tuple(r)
        for r in bloom_index.probe_bloom_index(
            spark, batch2, corpus2, idx
        ).collect()
    )
    assert got2 == want


def test_probe_plan_no_driver_bitmap(spark, tmp_path):
    """The 100 TB contract: the probe plan cogroups batch rows with
    shard rows (FlatMapCoGroupsInPandas) — no broadcast of bloom bytes,
    no driver-side collect of the shard table anywhere in the lineage."""
    from olive_spark.ops import bloom_index

    docs = _mk(spark, n=200)
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id < 50")
    idx = str(tmp_path / "bi")
    bloom_index.build_bloom_index(
        spark, corpus, idx, expected_items=256, n_shards=4
    )
    df = bloom_index.probe_bloom_index(spark, batch, corpus, idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    # the bitmap must not ride a broadcast: the only broadcast allowed
    # is AQE broadcasting the (slim) confirm-join hash side
    for line in plan.splitlines():
        if "bloom" in line.lower() and "Broadcast" in line:
            raise AssertionError(f"bloom bytes on a broadcast: {line}")


def test_empty_shard_means_definitely_new(spark, tmp_path):
    """A shard with no stored row = no corpus key ever routed there:
    batch rows routing to it are definitely new and must bypass the
    confirm join (and certainly never error)."""
    from olive_spark.ops import bloom_index

    # corpus of ONE doc → most of the 8 shards have no row
    corpus = spark.createDataFrame(
        [(1, "only-doc")], "doc_id long, text string"
    )
    batch = _mk(spark, n=64, dup_mod=64)
    idx = str(tmp_path / "bi")
    bloom_index.build_bloom_index(
        spark, corpus, idx, expected_items=64, n_shards=8
    )
    got = bloom_index.probe_bloom_index(spark, batch, corpus, idx)
    assert got.count() == 64  # nothing in the batch matches the corpus


def test_build_refuses_overwrite_and_geometry_drift(spark, tmp_path):
    from olive_spark.ops import bloom_index

    corpus = _mk(spark, n=50)
    idx = str(tmp_path / "bi")
    bloom_index.build_bloom_index(
        spark, corpus, idx, expected_items=64, n_shards=2
    )
    with pytest.raises(ValueError, match="already exists"):
        bloom_index.build_bloom_index(
            spark, corpus, idx, expected_items=64, n_shards=2
        )
    # k drift (simulated) fails loud
    import json

    mp = os.path.join(idx, "_bloom_meta.json")
    meta = json.load(open(mp))
    meta["k"] = 3
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="k="):
        bloom_index.load_meta(idx)


def test_lifecycle_model_random_sequences(spark, tmp_path):
    """Model test: a random build/append/append/compact/probe sequence
    over disjoint-vocabulary corpora must always return exactly the
    NOT-IN-union set (exactness is the contract; the index only prunes
    the confirm join).  Deterministic seeds, three sequences."""
    import random

    from pyspark.sql import functions as F

    from olive_spark.ops import bloom_index

    for seed in (3, 17, 29):
        rng = random.Random(seed)
        idx = str(tmp_path / f"m{seed}")
        parts = []
        for j in range(rng.randint(1, 3)):
            lo = j * 1000
            n = rng.randint(20, 120)
            parts.append(
                spark.range(lo, lo + n).selectExpr(
                    "id AS doc_id",
                    f"concat('s{seed}-', cast(id as string)) AS text",
                )
            )
        bloom_index.build_bloom_index(
            spark, parts[0], idx,
            expected_items=512, n_shards=rng.choice([1, 2, 8]),
        )
        for p in parts[1:]:
            bloom_index.append_bloom_index(spark, p, idx)
            if rng.random() < 0.5:
                bloom_index.compact_bloom_index(spark, idx)
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        # batch: half known texts (re-keyed), half brand-new
        known = corpus.limit(30).select(
            (F.col("doc_id") + 900_000).alias("doc_id"), "text"
        )
        new = spark.range(50).selectExpr(
            "id + 500000 AS doc_id",
            f"concat('new{seed}-', cast(id as string)) AS text",
        )
        batch = known.unionByName(new)
        got = sorted(
            r["doc_id"]
            for r in bloom_index.probe_bloom_index(
                spark, batch, corpus, idx
            ).collect()
        )
        assert got == sorted(500000 + i for i in range(50)), (seed, got[:5])


def test_atomic_corpus_index_ingest_crash_injection(spark, tmp_path):
    """r11 verdict task #4: ingest_with_bloom_index leaves corpus and
    index BOTH-or-NEITHER visible under a crash at every phase —
    before the corpus commit (neither), and between the corpus commit
    and the index fold (recovery rolls the index forward)."""
    from pyspark.sql import functions as F

    from olive_spark.ops import bloom_index

    corpus_path = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    base = _mk(spark, n=200, dup_mod=200)
    base.write.format("olive").option("table", "data") \
        .mode("append").save(corpus_path)
    bloom_index.build_bloom_index(
        spark, base, idx, expected_items=4096, n_shards=4
    )

    def corpus_df():
        return spark.read.format("olive").option("table", "data") \
            .load(corpus_path)

    def probe(batch):
        return {
            r["doc_id"]
            for r in bloom_index.probe_bloom_index(
                spark, batch, corpus_df(), idx
            ).collect()
        }

    # happy path: one call commits corpus AND index
    b1 = spark.range(200, 250).selectExpr(
        "id AS doc_id", "concat('text-', cast(id as string)) AS text"
    )
    out = bloom_index.ingest_with_bloom_index(spark, corpus_path, b1, idx)
    assert out["files_folded"] >= 1
    assert corpus_df().count() == 250
    assert not os.path.exists(os.path.join(idx, "_index_txn.pending"))
    # re-probing the ingested texts (re-keyed) finds them all known
    rek = b1.select((F.col("doc_id") + 900_000).alias("doc_id"), "text")
    assert probe(rek) == set()

    class Boom(RuntimeError):
        pass

    def boom():
        raise Boom()

    # crash BEFORE the corpus commit → NEITHER visible after recovery
    b2 = spark.range(250, 300).selectExpr(
        "id AS doc_id", "concat('text-', cast(id as string)) AS text"
    )
    bloom_index._CRASH_HOOKS["after_marker"] = boom
    try:
        with pytest.raises(Boom):
            bloom_index.ingest_with_bloom_index(
                spark, corpus_path, b2, idx
            )
    finally:
        bloom_index._CRASH_HOOKS.clear()
    assert os.path.exists(os.path.join(idx, "_index_txn.pending"))
    healed = bloom_index.recover_index_txn(spark, idx)
    assert healed == {"replayed": False}
    assert corpus_df().count() == 250  # corpus untouched
    assert not os.path.exists(os.path.join(idx, "_index_txn.pending"))

    # crash BETWEEN corpus commit and index fold → recovery (here via
    # the probe's self-heal) rolls the index forward: BOTH visible
    bloom_index._CRASH_HOOKS["after_corpus"] = boom
    try:
        with pytest.raises(Boom):
            bloom_index.ingest_with_bloom_index(
                spark, corpus_path, b2, idx
            )
    finally:
        bloom_index._CRASH_HOOKS.clear()
    assert corpus_df().count() == 300  # corpus landed
    assert os.path.exists(os.path.join(idx, "_index_txn.pending"))
    # probe heals first, then must see the b2 texts as known
    rek2 = b2.select((F.col("doc_id") + 900_000).alias("doc_id"), "text")
    assert probe(rek2) == set()
    assert not os.path.exists(os.path.join(idx, "_index_txn.pending"))
    # and the healed state equals a no-crash ingest: brand-new rows
    # still probe as new
    fresh = spark.range(5).selectExpr(
        "id + 777000 AS doc_id",
        "concat('never-seen-', cast(id as string)) AS text",
    )
    assert len(probe(fresh)) == 5
