"""Persisted MinHash-LSH index (ops.lsh_index): probe parity with the
in-memory LSH self-join, idempotent/healing appends, and the
incremental near-dup ingest wrapper."""

from __future__ import annotations

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


def _doc(i: int, mutate: int = 0) -> str:
    """Deterministic 40-token document; mutate swaps `mutate` token
    positions so jaccard degrades gradually.  Tokens are Knuth-mixed
    from (i, j) so DIFFERENT seeds share ~no tokens — any linear
    (i*a + j*b) % m construction makes documents mere rotations of one
    another (found the hard way: 28/40 shared tokens between 'distinct'
    seeds via the shifted-run solution of the two congruences)."""
    toks = [
        f"t{((i * 1_000_003 + j) * 2654435761) % (1 << 32):x}"
        for j in range(40)
    ]
    for m in range(mutate):
        toks[(m * 5) % 40] = f"zz{i}x{m}"
    return " ".join(toks)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus_rows():
    # 30 base docs; ids 100+ are near-dups of base docs (light mutation)
    rows = [(i, _doc(i)) for i in range(30)]
    rows += [(100 + i, _doc(i, mutate=2)) for i in range(10)]
    return rows


def test_probe_matches_inmemory_lsh(spark, tmp_path, corpus_rows):
    """Cross pairs from probe_index == the (corpus, batch) pairs the
    in-memory minhash_lsh_pairs finds on the union — same signatures,
    same banding, same threshold, so EXACT set equality."""
    from olive_spark.ops.dedup import minhash_lsh_pairs
    from olive_spark.ops.lsh_index import build_lsh_index, probe_index

    batch_rows = [(1000 + i, _doc(i, mutate=1)) for i in range(12)]
    idx = str(tmp_path / "idx")
    corpus = _frame(spark, corpus_rows)
    batch = _frame(spark, batch_rows)
    meta = build_lsh_index(spark, corpus, idx)
    assert meta["n_docs"] == len(corpus_rows)

    got = {
        (r["query_id"], r["corpus_id"], r["jaccard_est"])
        for r in probe_index(spark, batch, idx, threshold=0.5).collect()
    }
    assert got, "mutate=1 batch must match its base docs"
    union = corpus.unionByName(batch)
    full = minhash_lsh_pairs(union, threshold=0.5)
    want = {
        (r["doc_b"], r["doc_a"], r["jaccard_est"])
        for r in full.collect()
        if r["doc_b"] >= 1000 and r["doc_a"] < 1000
    }
    assert got == want


def test_probe_identity_and_threshold(spark, tmp_path, corpus_rows):
    from olive_spark.ops.lsh_index import build_lsh_index, probe_index

    idx = str(tmp_path / "idx")
    corpus = _frame(spark, corpus_rows)
    build_lsh_index(spark, corpus, idx)
    self_probe = probe_index(
        spark, corpus.filter("doc_id < 5"), idx, threshold=0.99
    ).collect()
    ids = {(r["query_id"], r["corpus_id"]) for r in self_probe}
    assert {(i, i) for i in range(5)} <= ids
    assert all(r["jaccard_est"] == 1.0 for r in self_probe
               if r["query_id"] == r["corpus_id"])


def test_append_idempotent_and_healing(spark, tmp_path, corpus_rows):
    from olive_spark.ops.dedup import minhash_signatures
    from olive_spark.ops.lsh_index import (
        append_index,
        build_lsh_index,
        probe_index,
    )

    idx = str(tmp_path / "idx")
    corpus = _frame(spark, corpus_rows)
    build_lsh_index(spark, corpus, idx)

    extra = _frame(spark, [(2000 + i, _doc(50 + i)) for i in range(5)])
    st = append_index(spark, extra, idx)
    assert st["appended"] == 5 and st["healed"] == 0
    st = append_index(spark, extra, idx)  # idempotent replay
    assert st["appended"] == 0

    # simulate the crash window: sigs landed, bands did not
    import os

    orphan = _frame(spark, [(3000, _doc(77))])
    sigs = minhash_signatures(orphan)
    sigs.write.format("olive").mode("append").save(os.path.join(idx, "sigs"))
    # orphan doc is invisible to probes (fail-safe direction) ...
    hit = probe_index(
        spark, _frame(spark, [(9000, _doc(77))]), idx, threshold=0.9,
    ).collect()
    assert not any(r["corpus_id"] == 3000 for r in hit)
    # ... and the next append heals it
    st = append_index(spark, _frame(spark, []
                                    or [(4000, _doc(78))]), idx)
    assert st["healed"] == 1
    hit = probe_index(
        spark, _frame(spark, [(9000, _doc(77))]), idx, threshold=0.9,
    ).collect()
    assert any(r["corpus_id"] == 3000 for r in hit)


def test_incremental_neardup_loop(spark, tmp_path, corpus_rows):
    from olive_spark.ops.lsh_index import build_lsh_index, incremental_neardup

    idx = str(tmp_path / "idx")
    build_lsh_index(spark, _frame(spark, corpus_rows), idx)
    # batch: 3 near-dups of corpus docs, 3 novel docs, and a novel pair
    # that are near-dups of each other
    batch = _frame(spark, [
        (5000, _doc(0, mutate=1)),
        (5001, _doc(1, mutate=1)),
        (5002, _doc(2, mutate=1)),
        (5100, _doc(200)),
        (5101, _doc(201)),
        (5102, _doc(202)),
        (5200, _doc(300)),
        (5201, _doc(300, mutate=1)),
    ])
    survivors, pairs = incremental_neardup(spark, batch, idx, threshold=0.5)
    surv_ids = {r["doc_id"] for r in survivors.collect()}
    assert {5100, 5101, 5102, 5200} <= surv_ids
    assert {5000, 5001, 5002, 5201}.isdisjoint(surv_ids)
    srcs = {r["doc_id"]: r["source"] for r in pairs.collect()}
    assert srcs[5201] == "batch" and srcs[5000] == "corpus"

    # steady state: replaying the same batch now dedups EVERYTHING
    # (survivors are in the index; identity matches at jaccard 1.0)
    survivors2, _ = incremental_neardup(
        spark, batch, idx, threshold=0.5, append_survivors=False,
    )
    assert survivors2.count() == 0


def test_geometry_guard(spark, tmp_path, corpus_rows):
    import json
    import os

    from olive_spark.ops.lsh_index import build_lsh_index, load_meta

    idx = str(tmp_path / "idx")
    build_lsh_index(spark, _frame(spark, corpus_rows[:5]), idx)
    meta = load_meta(idx)
    meta["n_perm"] = 128
    json.dump(meta, open(os.path.join(idx, "_lsh_meta.json"), "w"))
    with pytest.raises(ValueError, match="geometry"):
        load_meta(idx)


@pytest.mark.parametrize("phase", [
    "mid_prepare", "after_prepare", "after_decide", "mid_publish",
])
def test_ingest_with_lsh_index_crash_matrix(
    spark, tmp_path, corpus_rows, phase
):
    """r13 (VERDICT r12 task #2): the atomic corpus+LSH ingest rides
    multi_table_txn — a crash at any protocol phase leaves corpus,
    sigs, and bands ALL-PRE (rollback) or ALL-POST (recovery), never
    a corpus row without its band rows or vice versa."""
    import os

    from olive_spark.ops import lsh_index, txn

    base = [r for r in corpus_rows if r[0] < 30]
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    _frame(spark, base).write.format("olive").mode("append").save(corpus)
    lsh_index.build_lsh_index(spark, _frame(spark, base), idx)
    batch = _frame(spark, [(200 + i, _doc(50 + i)) for i in range(8)])

    class Boom(RuntimeError):
        pass

    def _boom():
        raise Boom()

    txn._CRASH_HOOKS[phase] = _boom
    try:
        with pytest.raises(Boom):
            lsh_index.ingest_with_lsh_index(spark, corpus, batch, idx)
    finally:
        txn._CRASH_HOOKS.clear()
    txn.recover_txns(spark, corpus)

    def counts():
        c = spark.read.format("olive").load(corpus).count()
        s = spark.read.format("olive").load(
            os.path.join(idx, "sigs")).count()
        b = spark.read.format("olive").load(
            os.path.join(idx, "bands")).select("doc_id").distinct().count()
        return c, s, b

    if phase in ("mid_prepare", "after_prepare"):
        assert counts() == (30, 30, 30)
    else:
        assert counts() == (38, 38, 38)
    # no staging debris in any of the three tables
    for p in (corpus, os.path.join(idx, "sigs"), os.path.join(idx, "bands")):
        assert not [
            f for _r, _d, fs in os.walk(p) for f in fs
            if f.endswith(".staging")
        ], (phase, p)
    # a committed ingest is idempotently skippable, and probe serves
    # the healed index
    out = lsh_index.ingest_with_lsh_index(spark, corpus, batch, idx)
    if phase in ("mid_prepare", "after_prepare"):
        assert out["appended"] == 8
    else:
        assert out["appended"] == 0
    hits = lsh_index.probe_index(
        spark, _frame(spark, [(999, _doc(50, mutate=1))]), idx,
        threshold=0.5,
    ).collect()
    assert any(r["corpus_id"] == 200 for r in hits)
