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


def test_centroid_buckets_empty_batch_uses_real_centroid_id():
    """Zero-row batches must fall back to an ACTUAL centroid id, not a
    hardcoded 0 — centroid ids are hash-bucket leaders and 0 need not
    exist, so bucket 0 rows would silently vanish from the bucket join."""
    import numpy as np

    from olive_spark.ops.similarity import _centroid_buckets

    cids = np.array([3, 7, 11], dtype=np.int64)  # note: no centroid 0
    cmat = np.eye(3, dtype=np.float64)
    out = _centroid_buckets(np.zeros((0, 3)), 0, cids, cmat)
    assert out.dtype == np.int32 and len(out) == 0
    # non-empty path picks the nearest centroid (and prefers the higher
    # id on ties, matching the query-side probe expression)
    vecs = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
    assert _centroid_buckets(vecs, 2, cids, cmat).tolist() == [3, 11]
    tie = np.array([[1.0, 1.0, 0.0]])
    assert _centroid_buckets(tie, 1, cids, cmat).tolist() == [7]


def test_ivf_recall_vs_brute_force(spark):
    """IVF with a generous probe budget must land most of the exact
    top-k — pins the bucket-prune + probe pipeline end to end (an
    assignment/probe mismatch collapses recall toward zero)."""
    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    k = 10
    exact = similarity.cosine_topk(
        data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"]),
        data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
        .filter(F.col("vec_id") < 5),
        k=k,
    ).collect()
    approx = similarity.ivf_topk(
        data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"]),
        data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
        .filter(F.col("vec_id") < 5),
        k=k, n_centroids=8, n_probe=6,
    ).collect()

    def by_query(rows):
        out: dict = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    ex, ap = by_query(exact), by_query(approx)
    assert set(ex) == set(ap)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.7, f"recall too low: {recalls}"


def test_persisted_ivf_index_parity_no_retrain_and_stale_guard(spark, tmp_path):
    """build_ivf_index → ivf_topk_indexed must (a) return exactly the
    per-call-trained ivf_topk result, (b) never re-train or rewrite the
    index on later calls (training monkeypatched to explode; index
    files untouched), (c) refuse a stale corpus version loudly."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    queries = corpus.filter(F.col("vec_id") < 5)
    direct = sorted(map(tuple, similarity.ivf_topk(corpus, queries, k=10).collect()))

    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, corpus, idx, corpus_version=7)
    got1 = sorted(map(tuple, similarity.ivf_topk_indexed(
        spark, idx, queries, k=10, expect_corpus_version=7
    ).collect()))
    assert got1 == direct

    # second call: loaded path only — training must not run, and the
    # index artifact must not be rewritten
    state = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(idx) for p in fs
    }

    def boom(*a, **kw):  # noqa: ANN002, ANN003
        raise AssertionError("ivf_topk_indexed re-trained the index")

    orig = similarity._ivf_train_assign
    similarity._ivf_train_assign = boom
    try:
        got2 = sorted(map(tuple, similarity.ivf_topk_indexed(
            spark, idx, queries, k=10, expect_corpus_version=7
        ).collect()))
    finally:
        similarity._ivf_train_assign = orig
    assert got2 == direct
    after = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(idx) for p in fs
    }
    assert after == state, "serving a query mutated the index artifact"

    with pytest.raises(ValueError, match="stale IVF index"):
        similarity.ivf_topk_indexed(
            spark, idx, queries, k=10, expect_corpus_version=8
        )


def test_append_ivf_index_incremental(spark, tmp_path):
    """append_ivf_index: build on the first half of the corpus, append
    the second half — no re-train (frozen centroids), only the new
    batch scanned/written — then serving must equal the one-shot path
    over the full corpus (valid because each id-hash bucket's min id
    lies in the first half, so the frozen centroids equal the full-
    corpus ones — asserted), and a stale corpus version must refuse."""
    import pytest
    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    half1 = corpus.filter(F.col("vec_id") < 250)
    half2 = corpus.filter(F.col("vec_id") >= 250)
    queries = corpus.filter(F.col("vec_id") < 5)

    c_half, _ = similarity._ivf_train_assign(half1, 16, "embedding", "vec_id")
    c_full, _ = similarity._ivf_train_assign(corpus, 16, "embedding", "vec_id")
    assert c_half == c_full, "test premise: centroid seeds must coincide"

    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, half1, idx, corpus_version=1)
    similarity.append_ivf_index(spark, half2, idx, corpus_version=2)

    with pytest.raises(ValueError, match="stale IVF index"):
        similarity.ivf_topk_indexed(spark, idx, queries, k=10,
                                    expect_corpus_version=1)

    got = sorted(map(tuple, similarity.ivf_topk_indexed(
        spark, idx, queries, k=10, expect_corpus_version=2
    ).collect()))
    direct = sorted(map(tuple, similarity.ivf_topk(
        corpus, queries, k=10
    ).collect()))
    assert got == direct


def test_ivf_append_crash_window_refuses_serving(spark, tmp_path):
    """A pending-append marker (crash between the list append and the
    meta advance) must make serving refuse loudly — the lists may hold
    vectors beyond the recorded corpus version, so the stale check
    alone would pass on a wrong index.  A full rebuild clears it."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    queries = corpus.filter(F.col("vec_id") < 3)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, corpus, idx, corpus_version=1)

    with open(os.path.join(idx, "_ivf_append.pending"), "w") as f:
        f.write("{}")
    with pytest.raises(ValueError, match="interrupted append"):
        similarity.ivf_topk_indexed(spark, idx, queries, k=5,
                                    expect_corpus_version=1)
    similarity.build_ivf_index(spark, corpus, idx, corpus_version=2)
    assert similarity.ivf_topk_indexed(
        spark, idx, queries, k=5, expect_corpus_version=2
    ).count() > 0


def test_ivf_index_drift_gauge(spark, tmp_path):
    """ivf_index_drift: fresh index reports ~zero drift; appending a
    shifted distribution (each vector orthogonalized against its best
    frozen centroid — its assigned-centroid cosine provably drops to at
    most its former SECOND-best) lowers the mean and trips
    rebuild_recommended at a threshold below the measured drift; an
    index without a recorded baseline refuses loudly."""
    import json
    import os

    import numpy as np
    import pytest

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, corpus, idx, corpus_version=1)
    d0 = similarity.ivf_index_drift(spark, idx)
    assert abs(d0["drift"]) < 1e-9 and d0["rebuild_recommended"] is False
    assert d0["n_rows"] == corpus.count()
    assert -1.0 <= d0["worst_bucket"]["tightness"] <= d0["current_tightness"]

    cents = sorted(
        ((r["centroid_id"], np.array(r["centroid_vec"], dtype=float))
         for r in spark.read.format("olive")
         .load(os.path.join(idx, "centroids")).collect()),
        key=lambda t: t[0],
    )
    cmat = np.array([v for _, v in cents])
    cmat = cmat / np.maximum(
        np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300
    )
    shifted_rows = []
    for r in corpus.collect():
        v = np.array(r["embedding"], dtype=float)
        nv = v / max(np.linalg.norm(v), 1e-300)
        best = cmat[(cmat @ nv).argmax()]
        w = v - (v @ best) * best  # kill the assigned-centroid component
        if np.linalg.norm(w) < 1e-9:
            w = np.roll(best, 1) - best * (np.roll(best, 1) @ best)
        shifted_rows.append(
            (int(r["vec_id"]) + 1_000_000, [float(x) for x in w])
        )
    shifted = spark.createDataFrame(
        shifted_rows, "vec_id bigint, embedding array<double>"
    )
    similarity.append_ivf_index(spark, shifted, idx, corpus_version=2)
    d1 = similarity.ivf_index_drift(spark, idx)
    assert d1["current_tightness"] < d1["train_tightness"]
    assert d1["drift"] > 1e-6
    assert d1["n_rows"] == 2 * d0["n_rows"]
    d2 = similarity.ivf_index_drift(
        spark, idx, rebuild_threshold=d1["drift"] / 2
    )
    assert d2["rebuild_recommended"] is True

    meta_p = os.path.join(idx, "_ivf_meta.json")
    with open(meta_p) as f:
        meta = json.load(f)
    meta.pop("train_tightness")
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="no train_tightness baseline"):
        similarity.ivf_index_drift(spark, idx)


def test_ivf_build_survives_zero_vectors_and_drift_refuses_pending(spark, tmp_path):
    """A dead/padding (all-zero) vector must not crash the build-time
    tightness pass (ANSI divide-by-zero) — it scores 0 to its centroid,
    matching assignment-time treatment; and the drift gauge / append
    must refuse an index with an interrupted append/rebuild marker."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    dead = corpus.limit(1).select(
        (F.col("vec_id") + 500_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.0).alias("embedding"),
    )
    idx = str(tmp_path / "ivf")
    meta = similarity.build_ivf_index(
        spark, corpus.unionByName(dead), idx, corpus_version=1
    )
    assert meta["train_tightness"] is not None
    d0 = similarity.ivf_index_drift(spark, idx)
    assert d0["n_rows"] == corpus.count() + 1

    # SERVING must also survive the dead vector (its bucket's cosines
    # evaluate with zero_as=0.0, not a raw ANSI divide) — including a
    # zero-norm QUERY vector
    got = similarity.ivf_topk_indexed(
        spark, idx, corpus.filter(F.col("vec_id") < 3), k=5,
        expect_corpus_version=1,
    )
    assert got.count() == 15
    zq = dead.select(F.col("vec_id"), F.col("embedding"))
    assert similarity.ivf_topk_indexed(
        spark, idx, zq, k=3, expect_corpus_version=1
    ).count() == 3

    with open(os.path.join(idx, "_ivf_append.pending"), "w") as f:
        f.write("{}")
    with pytest.raises(ValueError, match="interrupted append/rebuild"):
        similarity.ivf_index_drift(spark, idx)
    with pytest.raises(ValueError, match="interrupted append/rebuild"):
        similarity.append_ivf_index(spark, dead, idx, corpus_version=2)


def test_pq_persisted_parity_and_recall(spark, tmp_path):
    """Persisted PQ index (r10): identical results to the in-memory
    pq_topk under the same geometry (same deterministic codebooks, same
    stored codes), recall floor held, stale-version and pending-marker
    refusals loud."""
    import json
    import os

    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    qdf = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    qrows = [(r["vec_id"], r["embedding"])
             for r in qdf.filter(F.col("vec_id") < 5).collect()]
    k = 10
    index_dir = str(tmp_path / "pq_index")
    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    meta = similarity.build_pq_index(
        spark, corpus, index_dir, corpus_version=7
    )
    assert meta["corpus_version"] == 7 and meta["ivf_centroids"] is None
    corpus2 = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    served = similarity.pq_topk_indexed(
        spark, index_dir, corpus2, qrows, k=k, expect_corpus_version=7,
    ).collect()
    corpus3 = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    inmem = similarity.pq_topk(corpus3, qrows, k=k).collect()
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    assert sorted([(r["query_id"], r["rk"], r["neighbor_id"])
                   for r in served]) == \
        sorted([(r["query_id"], r["rk"], r["neighbor_id"]) for r in inmem])
    # recall floor vs exact
    corpus4 = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    exact = similarity.cosine_topk(
        corpus4,
        data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
        .filter(F.col("vec_id") < 5),
        k=k,
    ).collect()

    def by_query(rows):
        out: dict = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    ex, ap = by_query(exact), by_query(served)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    # staleness: wrong expected version refuses
    with pytest.raises(ValueError, match="stale PQ index"):
        similarity.pq_topk_indexed(
            spark, index_dir, corpus2, qrows, k=k,
            expect_corpus_version=8,
        )
    # interrupted build refuses
    with open(os.path.join(index_dir, "_pq_build.pending"), "w") as f:
        json.dump({"op": "build"}, f)
    with pytest.raises(ValueError, match="interrupted build"):
        similarity.pq_topk_indexed(spark, index_dir, corpus2, qrows, k=k)
    os.remove(os.path.join(index_dir, "_pq_build.pending"))


def test_ivf_pq_composition_prunes_and_recalls(spark, tmp_path):
    """IVF-PQ: the coarse bucket layer dir-prunes the codes scan (the
    codes table is bucket-hive-partitioned) while PQ codes bound memory;
    recall floor holds at moderate probe width."""
    import glob
    import os

    from pyspark.sql import functions as F

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    qdf = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    qrows = [(r["vec_id"], r["embedding"])
             for r in qdf.filter(F.col("vec_id") < 5).collect()]
    k = 10
    index_dir = str(tmp_path / "ivfpq_index")
    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    meta = similarity.build_pq_index(
        spark, corpus, index_dir, corpus_version=1, ivf_centroids=8,
    )
    assert meta["ivf_centroids"] == 8
    # codes table is bucket-partitioned on disk
    assert glob.glob(os.path.join(index_dir, "codes", "bucket=*")), (
        os.listdir(os.path.join(index_dir, "codes"))
    )
    corpus2 = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    served = similarity.pq_topk_indexed(
        spark, index_dir, corpus2, qrows, k=k, n_probe=6,
        expect_corpus_version=1,
    ).collect()
    corpus3 = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    exact = similarity.cosine_topk(
        corpus3,
        data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
        .filter(F.col("vec_id") < 5),
        k=k,
    ).collect()

    def by_query(rows):
        out: dict = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    ex, ap = by_query(exact), by_query(served)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_pq_residual_beats_raw_encoding(spark, tmp_path):
    """r11 verdict task #5: residual IVF-PQ (encode vec − centroid,
    Faiss's IVF-PQ encoding) must rank candidates better than raw
    encoding at IDENTICAL m/n_cent geometry on CLUSTERED data — the
    distribution real embeddings have, where residuals concentrate
    around zero and the codebook budget stops re-describing the coarse
    structure.  Measured on the CANDIDATE sets (refine=1, so the exact
    re-rank can't paper over a bad code ordering); both numbers pinned.
    (Fixture note: the sf0.001 embeddings are near-uniform on the
    sphere — residual variance EXCEEDS vector variance there and
    residual encoding cannot help; with flat isotropic clusters the
    fine structure is white noise, whose independent quantization
    errors hurt RANKING even at lower reconstruction error.  The
    fixture is therefore HIERARCHICAL — coarse topic centers × a small
    set of shared fine offsets — the structure real embedding corpora
    have and the case residual encoding exists for: the codebook
    learns the fine offsets near-exactly once the coarse layer is
    subtracted.)"""
    import numpy as np

    from olive_spark.ops import similarity

    rng = np.random.default_rng(7)
    d, n_clusters, n_fine, per = 64, 8, 16, 64
    coarse = rng.normal(size=(n_clusters, d))
    coarse /= np.linalg.norm(coarse, axis=1, keepdims=True)
    fine = rng.normal(size=(n_fine, d))
    fine = 0.4 * fine / np.linalg.norm(fine, axis=1, keepdims=True)
    n = n_clusters * per
    pts = (
        coarse[np.arange(n) % n_clusters]
        + fine[rng.integers(0, n_fine, size=n)]
        + 0.02 * rng.normal(size=(n, d))
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(pts)]
    k = 10
    qrows = rows[:16]

    def recall(index_dir, residual):
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        meta = similarity.build_pq_index(
            spark, corpus, index_dir, m=16, n_cent=32,
            ivf_centroids=8, residual=residual, corpus_version=1,
        )
        assert meta["residual"] is residual
        served = similarity.pq_topk_indexed(
            spark, index_dir, corpus, qrows, k=k, refine=1, n_probe=3,
            expect_corpus_version=1,
        ).collect()
        exact = similarity.cosine_topk(
            corpus,
            spark.createDataFrame(
                qrows, "vec_id long, embedding array<double>"
            ),
            k=k,
        ).collect()
        ex, ap = {}, {}
        for r in exact:
            ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for r in served:
            ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        rs = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
        return sum(rs) / len(rs)

    r_raw = recall(str(tmp_path / "raw"), residual=False)
    r_res = recall(str(tmp_path / "res"), residual=True)
    # pin both numbers: residual strictly better on hierarchical data,
    # raw keeps a sane floor
    assert r_res > r_raw, (r_res, r_raw)
    assert r_res >= 0.68, (r_res, r_raw)
    assert r_raw >= 0.45, r_raw


def test_rebuild_ivf_index_if_needed(spark, tmp_path):
    """r13 (VERDICT r12 task #6): drift gauge wired to the re-train —
    healthy index returns rebuilt=False untouched; a drifted index
    re-trains (fresh build_id + baseline, drift back to ~0, scratch
    snapshot removed, no pending marker), and the served top-k still
    honors the index contract."""
    import json
    import os

    import numpy as np

    from olive_spark.ops import similarity
    from olive_spark.queries import data

    corpus = data.load(spark, SF, "embeddings", columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, corpus, idx, corpus_version=1)
    with open(os.path.join(idx, "_ivf_meta.json")) as f:
        build0 = json.load(f)["build_id"]
    out = similarity.rebuild_ivf_index_if_needed(spark, idx)
    assert out["rebuilt"] is False
    with open(os.path.join(idx, "_ivf_meta.json")) as f:
        assert json.load(f)["build_id"] == build0

    # force drift: orthogonalize a copy of every vector against its
    # assigned centroid (the drift-gauge test's recipe)
    cents = sorted(
        ((r["centroid_id"], np.array(r["centroid_vec"], dtype=float))
         for r in spark.read.format("olive")
         .load(os.path.join(idx, "centroids")).collect()),
        key=lambda t: t[0],
    )
    cmat = np.array([v for _, v in cents])
    cmat = cmat / np.maximum(
        np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300
    )
    shifted_rows = []
    for r in corpus.collect():
        v = np.array(r["embedding"], dtype=float)
        nv = v / max(np.linalg.norm(v), 1e-300)
        best = cmat[(cmat @ nv).argmax()]
        w = v - (v @ best) * best
        if np.linalg.norm(w) < 1e-9:
            w = np.roll(best, 1) - best * (np.roll(best, 1) @ best)
        shifted_rows.append(
            (int(r["vec_id"]) + 1_000_000, [float(x) for x in w])
        )
    similarity.append_ivf_index(
        spark,
        spark.createDataFrame(
            shifted_rows, "vec_id bigint, embedding array<double>"
        ),
        idx, corpus_version=2,
    )
    drift = similarity.ivf_index_drift(spark, idx)["drift"]
    assert drift > 1e-6
    out = similarity.rebuild_ivf_index_if_needed(
        spark, idx, rebuild_threshold=drift / 2,
    )
    assert out["rebuilt"] is True and out["pre_drift"] > 0
    with open(os.path.join(idx, "_ivf_meta.json")) as f:
        meta = json.load(f)
    assert meta["build_id"] not in (build0,)
    assert not os.path.exists(os.path.join(idx, "_ivf_append.pending"))
    assert not os.path.exists(os.path.join(idx, "rebuild-src-tmp"))
    d2 = similarity.ivf_index_drift(spark, idx)
    assert abs(d2["drift"]) < 1e-9
    assert d2["n_rows"] == 2 * corpus.count()
    # the rebuilt index still serves: exact top-1 self-match
    probe = corpus.limit(1).collect()[0]
    hits = similarity.ivf_topk_indexed(
        spark, idx,
        spark.createDataFrame(
            [(999_999_999, list(probe["embedding"]))],
            "vec_id bigint, embedding array<double>",
        ),
        k=1, n_probe=16, expect_corpus_version=2,
    ).collect()
    assert hits and hits[0]["neighbor_id"] == probe["vec_id"]
    assert hits[0]["cosine"] > 0.999
