"""Similarity search over embedding columns (SURVEY.md north star).

Two paths, same semantics:

- ``cosine_topk`` — declarative: broadcast the (small) query set, JVM-side
  dot products via ``zip_with``/``aggregate``, per-query top-k via window.
  Catalyst handles it end-to-end; zero Python in the hot path.
- ``cosine_topk_arrow`` — the throughput path: ``mapInArrow`` over corpus
  partitions with a broadcast numpy query matrix; each Arrow batch becomes
  one BLAS matmul, partitions emit local top-k, a tiny global top-k
  reduces. This is the shape that survives 100 TB (corpus never leaves
  its partitions; only n_queries × k rows shuffle).
- ``ivf_topk`` — the scale path for huge corpora: k-means-ish coarse
  centroids (deterministic seed sample), corpus bucketed by nearest
  centroid; queries probe the nearest ``n_probe`` buckets only.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def batch_matrix(col) -> "np.ndarray":  # noqa: F821
    """Arrow list<float> column → (n, d) float64 matrix WITHOUT Python
    object materialization: flatten the child buffer and reshape when all
    rows share one width (always true for embeddings). Falls back to
    to_pylist for ragged/null inputs."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_list(t):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(len(col), t.list_size)
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and col.null_count == 0:
        widths = np.diff(np.asarray(col.offsets))
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(
                len(col), int(widths[0])
            )
    return np.asarray(col.to_pylist(), dtype=np.float64)


def cosine_expr(a, b, zero_as: "float | None" = None):
    """cos(a, b) as a JVM expression over two array columns (double math).

    ``zero_as``: value to yield when either vector has zero norm —
    required wherever a corpus may contain dead/padding vectors, because
    the raw division raises DIVIDE_BY_ZERO under Spark's ANSI default
    (and yields NULL otherwise, silently mis-weighting averages).  The
    default (None) keeps the raw division for callers whose inputs are
    known non-degenerate and whose oracles expect plain `/` semantics."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x))
    if zero_as is None:
        return dot / (na * nb)
    return F.coalesce(F.try_divide(dot, na * nb), F.lit(float(zero_as)))


def cosine_range(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Range search: every corpus vector with cos ≥ threshold of each
    query (radius-neighbor variant of top-k; the k-free API retrieval
    pipelines want for 'everything this similar').  Queries broadcast,
    corpus never shuffles."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("corpus_vec")
    )
    sim = F.round(cosine_expr(F.col("query_vec"), F.col("corpus_vec")), 6)
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k, declarative: broadcast-join queries
    against the corpus, rank per query. Deterministic tie-break on id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("corpus_vec")
    )
    sim = F.round(cosine_expr(F.col("query_vec"), F.col("corpus_vec")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    query_rows: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Throughput path: numpy matmul per Arrow batch, local top-k per
    partition, global top-k reduce. ``query_rows`` is a small in-memory
    list [(query_id, vector), ...] — broadcast to executors."""
    import numpy as np
    import pyarrow as pa

    spark = corpus.sparkSession
    qids = np.array([q[0] for q in query_rows], dtype=np.int64)
    qmat = np.array([q[1] for q in query_rows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qmat))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        qids_, qmat_ = bc.value
        best: list = []
        for batch in batches:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            vecs = batch_matrix(batch.column(vec_col))
            if len(vecs) == 0:
                continue
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (vecs / norms) @ qmat_.T  # (batch, n_queries)
            for qi in range(len(qids_)):
                col = sims[:, qi]
                mask = ids != qids_[qi]
                cid, csim = ids[mask], col[mask]
                if len(cid) > k:
                    part = np.argpartition(-csim, k)[:k]
                    cid, csim = cid[part], csim[part]
                best.append((qids_[qi], cid, csim))
        agg: dict = {}
        for qid, cid, csim in best:
            pid, psim = agg.get(qid, (np.array([], np.int64), np.array([], np.float64)))
            agg[qid] = (np.concatenate([pid, cid]), np.concatenate([psim, csim]))
        rows_q, rows_n, rows_s = [], [], []
        for qid, (cid, csim) in agg.items():
            if len(cid) > k:
                part = np.argpartition(-csim, k)[:k]
                cid, csim = cid[part], csim[part]
            rows_q.extend([qid] * len(cid))
            rows_n.extend(cid.tolist())
            rows_s.extend(np.round(csim, 6).tolist())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(rows_q, pa.int64()),
                pa.array(rows_n, pa.int64()),
                pa.array(rows_s, pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cosine"],
        )

    local = corpus.select(id_col, vec_col).mapInArrow(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _centroid_buckets(vecs, num_rows: int, cids, cmat):
    """Nearest-centroid assignment for one Arrow batch: (n, d) vectors ×
    broadcast normalized centroid matrix → int32 centroid ids.
    Zero-row batches return ``cids[0]``-typed emptiness — never the
    hardcoded bucket 0, which need not be a real centroid id and would
    silently drop any row that ever reached it via a bucket join."""
    import numpy as np

    if len(vecs) == 0:
        return np.full(num_rows, cids[0], dtype=np.int32)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (vecs / norms) @ cmat.T  # (n, n_centroids)
    # argmax picks the FIRST max; reversing columns makes the
    # highest centroid id win ties, like the sort-based probe
    rev_am = sims[:, ::-1].argmax(axis=1)
    return cids[sims.shape[1] - 1 - rev_am].astype(np.int32)


def _ivf_train_assign(
    corpus: DataFrame, n_centroids: int, vec_col: str, id_col: str,
):
    """IVF build phase: deterministic coarse centroids (first row of
    every id-hash bucket — cheap, reproducible) and the corpus with a
    nearest-centroid ``bucket`` column.  Returns (cents_rows,
    c_assigned) — the two artifacts :func:`build_ivf_index` persists."""
    cents = (
        corpus.withColumn("_b", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids)))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_b").orderBy(F.col(id_col))),
        )
        .filter(F.col("_rn") == 1)
        .select(F.col("_b").alias("centroid_id"), F.col(vec_col).alias("centroid_vec"))
    )
    cents_rows = sorted(
        ((r["centroid_id"], r["centroid_vec"]) for r in cents.collect()),
        key=lambda t: t[0],
    )

    return cents_rows, _ivf_assign(corpus, cents_rows, vec_col)


def _ivf_assign(corpus: DataFrame, cents_rows, vec_col: str) -> DataFrame:
    """Corpus-side centroid assignment: one numpy matmul per Arrow batch
    against the broadcast (normalized) centroid matrix.  An expression
    tree would re-evaluate an n_centroids-wide cosine per row — fine at
    16 centroids, a scale-killer at real centroid counts.  Tie-break
    matches the query-side expression (highest centroid_id wins)."""
    import numpy as np
    import pyarrow as pa

    cids_arr = np.array([c for c, _ in cents_rows], dtype=np.int64)
    cmat = np.array([v for _, v in cents_rows], dtype=np.float64)
    cmat = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300)
    bc = corpus.sparkSession.sparkContext.broadcast((cids_arr, cmat))
    assign_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in corpus.dtypes
    ) + ", bucket int"

    def assign(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        cids_, cmat_ = bc.value
        for batch in batches:
            bucket = _centroid_buckets(
                batch_matrix(batch.column(vec_col)), batch.num_rows, cids_, cmat_
            )
            yield batch.append_column(
                pa.field("bucket", pa.int32()), pa.array(bucket, pa.int32())
            )

    return corpus.mapInArrow(assign, assign_schema)


#: memoized probe-assignment bucket expressions: the JVM expression
#: tree over N centroids costs N array-literal py4j calls to build —
#: ~1.5 s of pure driver-side chatter per serve on a 64-centroid
#: index (the r11→r11 serve-latency drift, r12 verdict task #4).  The
#: expression is a pure function of (centroids, n_probe, vec_col), so
#: persisted serves reuse it across calls; keyed alongside the
#: centroid cache's build_id so a rebuild can never serve stale
#: geometry.
_QEXPR_CACHE: dict = {}


def _ivf_q_assigned(
    queries: DataFrame, cents_rows, n_probe: int, vec_col: str, id_col: str,
    cache_key: "tuple | None" = None,
) -> DataFrame:
    """Query-side probe assignment: one row per (query, probed bucket),
    buckets ranked by centroid cosine via a JVM expression tree (exact
    and shared by the trained and persisted paths, so both produce
    bit-identical probe sets).  ``cache_key`` (persisted serves) memos
    the built bucket expression — it references only the unresolved
    ``vec_col`` column, so it re-resolves against any query frame with
    that column."""

    def nearest_buckets(vec, n):
        # zero_as=0.0: a zero-norm QUERY vector (or a zero centroid —
        # hash-bucket leaders are arbitrary corpus rows) must rank
        # buckets at similarity 0, not raise ANSI DIVIDE_BY_ZERO.
        # One F.lit per centroid VECTOR (an array literal), not one
        # per element — the per-element form was n_cents*dim py4j
        # round trips
        sims = [
            (cid, cosine_expr(vec, F.lit([float(x) for x in cvec]),
                              zero_as=0.0))
            for cid, cvec in cents_rows
        ]
        arr = F.array(*[
            F.struct(s.alias("sim"), F.lit(cid).alias("cid")) for cid, s in sims
        ])
        return F.slice(F.reverse(F.array_sort(arr)), 1, n)

    full_key = None
    if cache_key is not None:
        full_key = (*cache_key, int(n_probe), vec_col)
        hit = _QEXPR_CACHE.get(full_key)
        if hit is not None:
            buckets_expr = hit
        else:
            buckets_expr = nearest_buckets(F.col(vec_col), n_probe)
            if len(_QEXPR_CACHE) > 64:
                _QEXPR_CACHE.clear()
            _QEXPR_CACHE[full_key] = buckets_expr
    else:
        buckets_expr = nearest_buckets(F.col(vec_col), n_probe)
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(
            F.transform(buckets_expr, lambda s: s["cid"])
        ).alias("bucket"),
    )


def _ivf_probe(
    c_assigned: DataFrame, q_assigned: DataFrame,
    k: int, vec_col: str, id_col: str,
) -> DataFrame:
    """IVF query phase over a bucketed corpus (freshly assigned or
    loaded from a persisted index): equi-join on bucket with the slim
    probe set broadcast, score only in-bucket candidates, per-query
    top-k.  zero_as=0.0: the build path admits dead (zero-norm)
    vectors into the lists — the raw division would turn them into a
    per-query ANSI DIVIDE_BY_ZERO crash at serve time."""
    sim = F.round(
        cosine_expr(F.col("query_vec"), F.col(vec_col), zero_as=0.0), 6
    )
    scored = (
        c_assigned.join(F.broadcast(q_assigned), "bucket")
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), sim.alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids, corpus assigned to
    nearest centroid, queries probe the ``n_probe`` nearest buckets.
    Recall < 1 by design; the 100 TB shape (bucket-pruned scan) is the
    point.  Trains per call — for an ingest pipeline that queries the
    same corpus repeatedly, persist once with :func:`build_ivf_index`
    and serve with :func:`ivf_topk_indexed`."""
    cents_rows, c_assigned = _ivf_train_assign(
        corpus, n_centroids, vec_col, id_col
    )
    q_assigned = _ivf_q_assigned(queries, cents_rows, n_probe, vec_col, id_col)
    return _ivf_probe(c_assigned, q_assigned, k, vec_col, id_col)


_IVF_META = "_ivf_meta.json"
_IVF_PENDING = "_ivf_append.pending"


_CENTROID_CACHE: dict = {}

def _load_centroids(spark, index_dir: str, build_key: str):
    """Collect the (tiny) centroid table, memoized per (app, dir,
    build_id): every fresh Python-DSv2 relation costs two plan-worker
    round trips, which dominates serving a small index.  The key is
    the meta's ``build_id`` nonce — minted fresh by every
    ``build_ivf_index`` — NOT the meta file's mtime: on a
    coarse-granularity filesystem a rebuild within one mtime quantum
    would serve STALE centroids against new assignments, the silent
    wrong-neighbors failure this index is built to refuse.  Appends
    keep the build_id (centroids are frozen across appends), so the
    cache stays valid through them."""
    import os

    key = (spark.sparkContext.applicationId, index_dir, build_key)
    hit = _CENTROID_CACHE.get(key)
    if hit is not None:
        return hit
    cents = spark.read.format("olive").load(os.path.join(index_dir, "centroids"))
    rows = sorted(
        ((r["centroid_id"], r["centroid_vec"]) for r in cents.collect()),
        key=lambda t: t[0],
    )
    if len(_CENTROID_CACHE) > 64:
        _CENTROID_CACHE.clear()
    _CENTROID_CACHE[key] = rows
    return rows


def _write_meta(index_dir: str, meta: dict) -> None:
    import json
    import os

    tmp = os.path.join(index_dir, _IVF_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _IVF_META))


def build_ivf_index(
    spark,
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_version: "int | None" = None,
) -> dict:
    """Persist an IVF index as olive tables so later queries skip
    training AND skip the full-corpus assignment pass:

        index_dir/centroids/    (centroid_id, centroid_vec) — tiny
        index_dir/assignments/  corpus rows + their bucket — the
                                inverted lists, written bucket-hive-
                                partitioned so an n_probe query scans
                                ONLY the probed buckets' directories
        index_dir/_ivf_meta.json  geometry + the corpus snapshot
                                version the index was built from

    ``corpus_version`` keys the artifact to the snapshot log of the
    source table (olive_spark.format.snapshots.current_version):
    :func:`ivf_topk_indexed` refuses a stale index loudly when the
    caller passes the corpus's CURRENT version — the same
    build-once/validate-on-read contract as the incremental-dedup
    Bloom sidecar.  Returns the meta dict."""
    import os

    from olive_spark.datasource import register_olive

    register_olive(spark)
    # rebuild crash window: assignments/centroids are overwritten BELOW
    # but the meta (with its fresh build_id + version) lands LAST — a
    # crash in between would leave new lists under the OLD meta, whose
    # version check PASSES against a stale expectation and whose
    # build_id-keyed centroid memo can serve stale centroids against
    # the new lists.  The pending marker (which ivf_topk_indexed and
    # ivf_index_drift refuse to read through) covers the whole rebuild;
    # it is removed only after the meta is committed.
    import json as _json

    pending = os.path.join(index_dir, _IVF_PENDING)
    os.makedirs(index_dir, exist_ok=True)
    with open(pending, "w") as f:
        f.write(_json.dumps({"op": "rebuild", "to_version": corpus_version}))
    cents_rows, c_assigned = _ivf_train_assign(
        corpus.select(id_col, vec_col), n_centroids, vec_col, id_col
    )
    (
        c_assigned.write.format("olive")
        .option("table", "assignments")
        .option("partitionBy", "bucket")
        .mode("overwrite")
        .save(os.path.join(index_dir, "assignments"))
    )
    cents_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents_rows],
        "centroid_id int, centroid_vec array<double>",
    )
    (
        cents_df.coalesce(1).write.format("olive")
        .option("table", "centroids")
        .mode("overwrite")
        .save(os.path.join(index_dir, "centroids"))
    )
    import uuid

    # drift baseline: mean vector-to-assigned-centroid cosine, measured
    # on the PERSISTED lists (read-back doubles as a write check).  One
    # extra aggregate over data this build already wrote; ivf_index_drift
    # compares tonight's lists against it to decide when frozen
    # centroids have degraded enough to re-train.
    train_tightness, _, _ = _assignment_tightness(
        spark.read.format("olive").load(os.path.join(index_dir, "assignments")),
        cents_df, vec_col,
    )
    meta = {
        "n_centroids": int(n_centroids),
        "vec_col": vec_col,
        "id_col": id_col,
        "corpus_version": corpus_version,
        "train_tightness": train_tightness,
        # fresh nonce per build: content-keys the centroid memo (and any
        # future cached artifact) — mtime would alias rebuilds within
        # one filesystem time quantum
        "build_id": uuid.uuid4().hex,
    }
    _write_meta(index_dir, meta)
    # the meta is committed: clear the rebuild marker (which also
    # supersedes any interrupted incremental append's marker)
    try:
        os.remove(pending)
    except FileNotFoundError:
        pass
    return meta


def append_ivf_index(
    spark,
    new_rows: DataFrame,
    index_dir: str,
    corpus_version: "int | None",
) -> dict:
    """Incrementally extend a persisted IVF index with newly ingested
    vectors: assign them to the EXISTING centroids (no re-train — the
    coarse geometry is frozen; that is what makes the append cheap and
    the old inverted lists immutable), append the new rows into the
    bucket-partitioned assignments table, and advance the meta's
    ``corpus_version`` so serving with the new corpus version succeeds
    and serving with a stale expectation still fails loud.

    100 TB shape: the nightly-ingest path — only the NEW batch is
    scanned and written; existing lists keep their files.  Centroid
    drift is the standard IVF trade: frozen centroids degrade recall
    gradually as the distribution shifts; rebuild with
    :func:`build_ivf_index` when it matters.

    ``corpus_version`` is REQUIRED (pass None deliberately to opt out
    of version keying): defaulting would silently erase the stored
    version and with it the staleness protection.  The append is
    guarded by a ``_ivf_append.pending`` marker written before the
    list append and cleared after the meta advances: a crash in
    between would otherwise leave extended lists under the OLD
    version — the stale check would pass on a wrong index — so
    :func:`ivf_topk_indexed` refuses while the marker exists (rebuild
    with :func:`build_ivf_index` to recover; a retried append cannot
    know whether the interrupted one committed).  Returns the updated
    meta."""
    import json
    import os

    from olive_spark.datasource import register_olive

    register_olive(spark)
    pending = os.path.join(index_dir, _IVF_PENDING)
    if os.path.exists(pending):
        raise ValueError(
            f"IVF index at {index_dir} has an interrupted append/rebuild "
            "(_ivf_append.pending) — appending onto it would extend "
            "inconsistent lists; rebuild with build_ivf_index"
        )
    with open(os.path.join(index_dir, _IVF_META)) as f:
        meta = json.load(f)
    cents_rows = _load_centroids(
        spark, index_dir, meta.get("build_id", "")
    )
    assigned = _ivf_assign(
        new_rows.select(meta["id_col"], meta["vec_col"]), cents_rows,
        meta["vec_col"],
    )
    with open(pending, "w") as f:
        f.write(json.dumps({"to_version": corpus_version}))
    (
        assigned.write.format("olive")
        .option("table", "assignments")
        .option("partitionBy", "bucket")
        .mode("append")
        .save(os.path.join(index_dir, "assignments"))
    )
    meta["corpus_version"] = corpus_version
    _write_meta(index_dir, meta)
    os.remove(pending)
    return meta


def _assignment_tightness(assigned: DataFrame, cents_df: DataFrame, vec_col: str):
    """Mean cosine of each vector to its ASSIGNED centroid, plus the
    per-bucket breakdown (tiny: one row per centroid).  The quantization
    statistic IVF recall tracks — computed JVM-side (cosine_expr over a
    broadcast centroid join), one pass, no Python in the loop."""
    j = assigned.join(
        F.broadcast(cents_df),
        assigned["bucket"] == cents_df["centroid_id"],
    )
    per_bucket = (
        j.groupBy("bucket")
        .agg(
            # zero_as=0.0: a dead/padding vector scores 0 to its
            # centroid — same treatment _centroid_buckets gives it at
            # assignment time; the raw division would raise
            # DIVIDE_BY_ZERO under the ANSI default mid-build
            F.avg(
                cosine_expr(F.col(vec_col), F.col("centroid_vec"),
                            zero_as=0.0)
            ).alias("tightness"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    total = sum(r["n"] for r in per_bucket)
    if total == 0:
        return None, [], 0
    overall = sum(r["tightness"] * r["n"] for r in per_bucket) / total
    return float(overall), per_bucket, int(total)


def ivf_index_drift(
    spark, index_dir: str, rebuild_threshold: float = 0.05
) -> dict:
    """Centroid-drift gauge for a persisted IVF index: how much worse
    the frozen centroids quantize TODAY's inverted lists than they did
    the corpus they were trained on.

    :func:`build_ivf_index` records the build-time mean
    vector-to-assigned-centroid cosine (``train_tightness``) in the
    meta; appends assign new vectors to the frozen centroids
    (:func:`append_ivf_index`), so as the ingest distribution shifts,
    the current mean drops below the baseline.  ``drift`` = train −
    current (cosine units); ``rebuild_recommended`` fires when it
    exceeds ``rebuild_threshold`` (default 0.05 — at cosines ≈0.7-0.9 a
    0.05 mean drop is a large recall regression in practice; tune per
    corpus).  Also reports the WORST bucket — drift usually
    concentrates where new content lands, and one collapsed bucket can
    hide inside a healthy mean.

    One aggregate pass over the assignments table (bucket-partitioned
    scan + broadcast centroid join, no shuffle of vectors) — at 100 TB
    this is the cheap nightly health check that decides when to pay for
    a :func:`build_ivf_index` re-train; nothing here mutates the index.

    Returns {train_tightness, current_tightness, drift,
    rebuild_recommended, n_rows, worst_bucket: {bucket, tightness, n}}.
    Raises if the index predates drift tracking (no recorded baseline —
    rebuild once to record it)."""
    import json
    import os

    from olive_spark.datasource import register_olive

    register_olive(spark)
    if os.path.exists(os.path.join(index_dir, _IVF_PENDING)):
        raise ValueError(
            f"IVF index at {index_dir} has an interrupted append/rebuild "
            "(_ivf_append.pending): a drift gauge over half-written "
            "lists would report health for a corrupt-window index — "
            "rebuild with build_ivf_index"
        )
    with open(os.path.join(index_dir, _IVF_META)) as f:
        meta = json.load(f)
    train = meta.get("train_tightness")
    if train is None:
        raise ValueError(
            f"IVF index at {index_dir} has no train_tightness baseline "
            "(built before drift tracking) — rebuild with build_ivf_index "
            "to record it"
        )
    cents_df = spark.read.format("olive").load(
        os.path.join(index_dir, "centroids")
    )
    assigned = spark.read.format("olive").load(
        os.path.join(index_dir, "assignments")
    )
    current, per_bucket, n_rows = _assignment_tightness(
        assigned, cents_df, meta["vec_col"]
    )
    if current is None:
        raise ValueError(f"IVF index at {index_dir} has no assignments")
    worst = min(per_bucket, key=lambda r: r["tightness"])
    drift = float(train) - current
    return {
        "train_tightness": float(train),
        "current_tightness": current,
        "drift": drift,
        "rebuild_recommended": drift > rebuild_threshold,
        "n_rows": n_rows,
        "worst_bucket": {
            "bucket": int(worst["bucket"]),
            "tightness": float(worst["tightness"]),
            "n": int(worst["n"]),
        },
    }


def rebuild_ivf_index_if_needed(
    spark, index_dir: str, rebuild_threshold: float = 0.05,
    corpus=None, corpus_version: "int | None" = None,
) -> dict:
    """Wire the drift gauge to the re-train (r13, VERDICT r12 task #6):
    run :func:`ivf_index_drift`; when it recommends a rebuild, re-train
    the centroids with :func:`build_ivf_index` and return the fresh
    meta, otherwise return the gauge verdict with ``rebuilt: False`` —
    the schedulable nightly "check, and pay for the rebuild only when
    recall is actually at risk" verb.

    ``corpus``: the vector source for the re-train.  At 100 TB pass
    the live corpus DataFrame (the source of truth); when omitted, the
    index's own assignments table is snapshotted to a scratch parquet
    under the index dir first — build_ivf_index OVERWRITES assignments,
    and lazily reading the table being overwritten would corrupt the
    rebuild.  ``corpus_version`` defaults to the meta's recorded
    version (the corpus didn't change, only the geometry)."""
    import json as _json
    import os
    import shutil as _sh

    drift = ivf_index_drift(spark, index_dir, rebuild_threshold)
    if not drift["rebuild_recommended"]:
        return {"rebuilt": False, **drift}
    with open(os.path.join(index_dir, _IVF_META)) as f:
        meta = _json.load(f)
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    ver = corpus_version if corpus_version is not None \
        else meta.get("corpus_version")
    scratch = None
    if corpus is None:
        scratch = os.path.join(index_dir, "rebuild-src-tmp")
        (
            spark.read.format("olive")
            .load(os.path.join(index_dir, "assignments"))
            .select(id_col, vec_col)
            .write.mode("overwrite").parquet(scratch)
        )
        corpus = spark.read.parquet(scratch)
    try:
        new_meta = build_ivf_index(
            spark, corpus, index_dir,
            n_centroids=int(meta["n_centroids"]),
            vec_col=vec_col, id_col=id_col, corpus_version=ver,
        )
    finally:
        if scratch is not None:
            _sh.rmtree(scratch, ignore_errors=True)
    return {"rebuilt": True, "pre_drift": drift["drift"], **new_meta}


def ivf_topk_indexed(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    expect_corpus_version: "int | None" = None,
) -> DataFrame:
    """Serve IVF top-k from a persisted index (:func:`build_ivf_index`)
    — no training, no corpus assignment pass; identical results to
    :func:`ivf_topk` with the same geometry over the same corpus.

    ``expect_corpus_version`` (pass the source table's CURRENT snapshot
    version) fails loud if the corpus advanced since the index was
    built — a silently stale index returns confidently wrong neighbors,
    the worst failure mode an ANN serving path has."""
    import json
    import os

    from olive_spark.datasource import register_olive

    register_olive(spark)
    if os.path.exists(os.path.join(index_dir, _IVF_PENDING)):
        raise ValueError(
            f"IVF index at {index_dir} has an interrupted append/rebuild "
            "(_ivf_append.pending): its lists may not match the recorded "
            "meta — rebuild with build_ivf_index"
        )
    with open(os.path.join(index_dir, _IVF_META)) as f:
        meta = json.load(f)
    if (
        expect_corpus_version is not None
        and meta.get("corpus_version") != expect_corpus_version
    ):
        raise ValueError(
            f"stale IVF index at {index_dir}: built from corpus version "
            f"{meta.get('corpus_version')}, current is "
            f"{expect_corpus_version} — rebuild with build_ivf_index"
        )
    cents_rows = _load_centroids(
        spark, index_dir, meta.get("build_id", "")
    )
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    q_assigned = _ivf_q_assigned(
        queries, cents_rows, n_probe, vec_col, id_col,
        cache_key=(
            spark.sparkContext.applicationId, index_dir,
            meta.get("build_id", ""),
        ),
    )
    # Directory-pruned inverted-list scan: the probed-bucket IN filter
    # pushed into the hive-partitioned assignments scan skips every
    # unprobed bucket=... directory at PLAN time — the point of an IVF
    # index at 100 TB (n_probe/n_centroids of the corpus is read, not
    # all of it).  ONE slim job computes it (r11 verdict task #7): the
    # whole assignment result — (query_id, query_vec, bucket), a few
    # rows per query — collects WITHOUT the former distinct shuffle,
    # the buckets come from it locally, and the probe join broadcasts
    # the localized assignment instead of re-scanning + re-assigning
    # the queries relation (one fixed Python-DSv2 round trip saved per
    # serve).  The probe-set bits are identical: the same JVM
    # expression computed them.  A query set too large to localize
    # (batch ANN join, > max_local rows) falls back to the two-job
    # plan, which never collects query vectors.
    max_local = 4096 * max(1, int(n_probe))
    # ONE job for the guarded collect: a bare .limit(n).collect() is
    # CollectLimitExec.executeTake, which scans 1 partition first and
    # retries with 4x more until the limit fills — on a query scan that
    # can't fill it (the normal serve: a handful of queries) that is
    # TWO jobs per serve where one suffices.  Scoping
    # spark.sql.limit.initialNumPartitions to the scan width makes the
    # first (and only) take cover every partition.
    sess = q_assigned.sparkSession
    _lim_key = "spark.sql.limit.initialNumPartitions"
    _lim_prev = sess.conf.get(_lim_key, None)
    try:
        sess.conf.set(_lim_key, "10000")
        q_local = q_assigned.limit(max_local + 1).collect()
    finally:
        if _lim_prev is None:
            sess.conf.unset(_lim_key)
        else:
            sess.conf.set(_lim_key, _lim_prev)
    if len(q_local) <= max_local:
        buckets = sorted({r["bucket"] for r in q_local})
        q_assigned = spark.createDataFrame(q_local, q_assigned.schema)
    else:
        buckets = sorted(
            r["bucket"]
            for r in q_assigned.select("bucket").distinct().collect()
        )
    # version-keyed relation cache (ops/relcache): an IVF append bumps
    # the assignments snapshot version, so the cached lazy relation can
    # never serve a pre-append file list; the per-serve bucket filter
    # layers on top of the immutable cached frame
    from olive_spark.ops.relcache import cached_relation

    c_assigned = cached_relation(
        spark, os.path.join(index_dir, "assignments"),
        options={"pushdown": "true"},
    ).filter(F.col("bucket").isin(buckets))
    return _ivf_probe(c_assigned, q_assigned, k, vec_col, id_col)


def _pq_train_codebooks(sample, m: int, n_cent: int, iters: int = 8):
    """Deterministic per-subspace k-means: init = first n_cent sample
    rows (caller passes an id-ordered sample), fixed iteration count,
    empty clusters re-seeded from the sample cyclically.  numpy only —
    runs on the driver over a few hundred rows."""
    import numpy as np

    n, d = sample.shape
    sub = d // m
    books = []
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        cents = x[:n_cent].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(n_cent):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(0)
                else:
                    cents[c] = x[c % n]
        books.append(cents)
    return books


def pq_topk(
    corpus: DataFrame,
    query_rows: "list[tuple[int, list[float]]]",
    k: int = 10,
    m: int = 16,
    n_cent: int = 64,
    refine: int = 10,
    sample_rows: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization ANN with exact re-rank — the two-stage shape
    for corpora whose full vectors can't be rescanned per query:

    1. train: driver-side deterministic k-means over an id-ordered
       sample (m subspaces × n_cent centroids; m·n_cent·(d/m) floats —
       a few KB — broadcast everywhere)
    2. encode + ADC scan (mapInArrow): each corpus vector becomes m
       uint8 codes; per query an asymmetric-distance lookup table makes
       scoring a table-gather, no float dot products against the corpus
    3. candidates: per (query, partition) the best k·refine codes
       survive, then a global top k·refine
    4. re-rank: candidates join back to their full vectors (broadcast
       semi-join on id), exact cosine orders the final k

    Approximate recall is the price of never matmul-ing the corpus; the
    re-rank stage restores exact ordering among survivors.  Defaults
    (m=16 subspaces of d/16 dims, 64 centroids) are tuned for
    unstructured/near-random embeddings — the hardest PQ case, where
    distances concentrate and coarse subspaces lose the signal; real
    model embeddings have lower intrinsic dimension and tolerate
    coarser settings."""
    import numpy as np
    import pyarrow as pa

    spark = corpus.sparkSession

    def _norm(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    # everything is row-normalized: squared L2 on the unit sphere is
    # 2 - 2cos, so the ADC ordering matches the cosine ordering the
    # re-rank stage (and the exact baseline) use
    sample_df = corpus.orderBy(id_col).limit(sample_rows)
    sample = _norm(np.array(
        [r[vec_col] for r in sample_df.collect()], dtype=np.float64
    ))
    books = _pq_train_codebooks(sample, m, n_cent)

    qids = np.array([q[0] for q in query_rows], dtype=np.int64)
    qmat = _norm(np.array([q[1] for q in query_rows], dtype=np.float64))
    bc = spark.sparkContext.broadcast((books, qids, qmat))
    n_cand = k * refine
    out_schema = "query_id long, neighbor_id long, adc double"

    def adc_scan(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        books_, qids_, qmat_ = bc.value
        m_ = len(books_)
        sub = qmat_.shape[1] // m_
        # per-query LUT: (m, n_cent) squared-distance tables
        luts = []
        for qv in qmat_:
            lut = np.stack([
                ((books_[j] - qv[j * sub : (j + 1) * sub]) ** 2).sum(1)
                for j in range(m_)
            ])
            luts.append(lut)
        best: dict = {}
        for batch in batches:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            vecs = batch_matrix(batch.column(vec_col))
            if len(vecs) == 0:
                continue
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs = vecs / norms
            # encode: nearest centroid per subspace → (n, m) codes
            codes = np.empty((len(vecs), m_), dtype=np.int64)
            for j in range(m_):
                x = vecs[:, j * sub : (j + 1) * sub]
                d2 = ((x[:, None, :] - books_[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(1)
            for qi in range(len(qids_)):
                # ADC: gather per-subspace distances from the LUT
                dist = luts[qi][np.arange(m_)[None, :], codes].sum(1)
                mask = ids != qids_[qi]
                cid, cd = ids[mask], dist[mask]
                if len(cid) > n_cand:
                    part = np.argpartition(cd, n_cand)[:n_cand]
                    cid, cd = cid[part], cd[part]
                pid, pd_ = best.get(qi, (None, None))
                if pid is not None:
                    cid = np.concatenate([pid, cid])
                    cd = np.concatenate([pd_, cd])
                    if len(cid) > n_cand:
                        part = np.argpartition(cd, n_cand)[:n_cand]
                        cid, cd = cid[part], cd[part]
                best[qi] = (cid, cd)
        for qi, (cid, cd) in best.items():
            yield pa.RecordBatch.from_pydict({
                "query_id": np.full(len(cid), qids_[qi]),
                "neighbor_id": cid,
                "adc": cd,
            })

    cands = corpus.select(id_col, vec_col).mapInArrow(adc_scan, out_schema)
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    cands = (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_cand)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: candidates ⋈ corpus vectors, JVM cosine, final top-k
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("corpus_vec")
    )
    qdf = corpus.sparkSession.createDataFrame(
        [(int(q), list(map(float, v))) for q, v in query_rows],
        "query_id long, query_vec array<double>",
    )
    sim = F.round(cosine_expr(F.col("query_vec"), F.col("corpus_vec")), 6)
    wf = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    # BROADCAST the candidate list into the re-rank join (guide §3.1):
    # cands is bounded by k·refine rows per query (a few hundred), while
    # ``full`` is the whole corpus — without the hint the planner's
    # stats for the mapInArrow output are unknowable and it falls back
    # to a SortMergeJoin that SHUFFLES EVERY CORPUS VECTOR by id just to
    # look up the survivors (measured r16: the serve's only full-corpus
    # exchange).  Broadcasting cands turns the re-rank into a pruned
    # probe of the corpus scan: no corpus shuffle at any scale.
    return (
        full.join(F.broadcast(cands), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


# ---- persisted product-quantization index (r10) -------------------------

_PQ_META = "_pq_meta.json"
_PQ_PENDING = "_pq_build.pending"


def _codes_matrix(col, m: int):
    """Arrow binary column of m-byte PQ codes → (n, m) uint8 matrix,
    zero-copy off the values buffer (validated uniform stride)."""
    import numpy as np
    import pyarrow as pa

    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(a) == 0:
        return np.zeros((0, m), np.uint8)
    off = np.frombuffer(a.buffers()[1], np.int32)[
        a.offset : a.offset + len(a) + 1
    ]
    if not (np.diff(off) == m).all():
        raise ValueError("PQ codes column has non-uniform code width")
    data = np.frombuffer(a.buffers()[2], np.uint8)
    return data[off[0] : off[-1]].reshape(-1, m)


def build_pq_index(
    spark,
    corpus: DataFrame,
    index_dir: str,
    m: int = 16,
    n_cent: int = 64,
    sample_rows: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_version: "int | None" = None,
    ivf_centroids: "int | None" = None,
    residual: bool = True,
) -> dict:
    """Persist a product-quantization index as olive tables — the
    memory-bounded ANN shape for corpora whose full vectors can't be
    rescanned per query (10^9 vectors × d floats don't fit; 10^9 × m
    BYTES of codes do):

        index_dir/codebooks/  (subspace, centroid, vec) — m·n_cent
                              sub-vectors, a few KB, trained once on an
                              id-ordered sample (same deterministic
                              k-means as :func:`pq_topk`)
        index_dir/codes/      (id, codes binary[m]) — every corpus
                              vector encoded ONCE at build time; queries
                              never re-encode the corpus (the whole win
                              over per-call :func:`pq_topk`)
        index_dir/_pq_meta.json  geometry + corpus snapshot version +
                              build_id nonce

    ``ivf_centroids=N`` composes IVF-PQ: a coarse N-centroid layer
    (trained like :func:`build_ivf_index`) bucket-hive-partitions the
    codes table, so an ``n_probe`` query scans only the probed
    ``bucket=`` directories — dir-pruned IO on top of code-compressed
    IO, the standard billion-scale layout.  With ``residual=True``
    (the default, r11 — Faiss IVF-PQ's encoding) the codes quantize
    ``vec − centroid[assigned]`` instead of the raw vector, so the
    SAME m·n_cent codebook budget stops re-describing the coarse
    structure and spends its resolution on what the coarse layer
    didn't explain.  This wins on the HIERARCHICAL distributions real
    embedding corpora have (topic clusters × shared fine structure —
    measurably better candidate ranking at identical geometry, pinned
    in tests/test_similarity.py); on unstructured/near-uniform vectors
    residuals are white noise whose independent quantization errors
    can hurt ranking — pass ``residual=False`` there (the r10 raw
    encoding; older indexes read as raw via the meta flag).  Serving
    builds per-(query, probed bucket) ADC tables.

    Crash safety and staleness mirror the IVF index: a pending marker
    covers the whole build, and ``corpus_version`` keys the artifact to
    the source table's snapshot version.  Returns the meta dict."""
    import json as _json
    import os
    import uuid

    import numpy as np
    import pyarrow as pa

    from olive_spark.datasource import register_olive

    register_olive(spark)
    if n_cent > 256:
        raise ValueError("n_cent must fit uint8 codes (<= 256)")
    pending = os.path.join(index_dir, _PQ_PENDING)
    os.makedirs(index_dir, exist_ok=True)
    with open(pending, "w") as f:
        f.write(_json.dumps({"op": "build", "to_version": corpus_version}))

    def _norm(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    sample_df = corpus.orderBy(id_col).limit(sample_rows)
    sample = _norm(np.array(
        [r[vec_col] for r in sample_df.collect()], dtype=np.float64
    ))
    d = sample.shape[1]
    cents_rows = None
    cmat = None
    use_residual = bool(residual and ivf_centroids)
    if ivf_centroids:
        # coarse layer: deterministic first-N-sample centroids, same
        # geometry rule as _ivf_train_assign's trainer
        cmat = sample[: int(ivf_centroids)]
        cents_rows = [
            (int(i), [float(x) for x in v]) for i, v in enumerate(cmat)
        ]
    train = sample
    if use_residual:
        # train the codebooks on residuals w.r.t. each sample vector's
        # own assigned coarse centroid — the distribution the encoder
        # will actually quantize
        assign = (sample @ _norm(cmat).T).argmax(1)
        train = sample - cmat[assign]
    books = _pq_train_codebooks(train, m, n_cent)
    bc = spark.sparkContext.broadcast(
        (books, cmat, use_residual)
    )
    out_schema = (
        f"{id_col} long, codes binary" + (", bucket int" if cents_rows else "")
    )

    def encode(batches):
        books_, cmat_, residual_ = bc.value
        m_ = len(books_)
        sub = d // m_
        for batch in batches:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            vecs = batch_matrix(batch.column(vec_col))
            if len(vecs) == 0:
                continue
            vecs = _norm(np.asarray(vecs, np.float64))
            bkt = None
            if cmat_ is not None:
                sims = _norm(vecs) @ _norm(cmat_).T
                bkt = sims.argmax(1)
            enc_in = vecs - cmat_[bkt] if residual_ else vecs
            codes = np.empty((len(vecs), m_), dtype=np.uint8)
            for j in range(m_):
                x = enc_in[:, j * sub : (j + 1) * sub]
                d2 = ((x[:, None, :] - books_[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(1)
            cols = {
                id_col: pa.array(ids, pa.int64()),
                "codes": pa.array(
                    [c.tobytes() for c in codes], pa.binary()
                ),
            }
            if bkt is not None:
                cols["bucket"] = pa.array(
                    bkt.astype(np.int32), pa.int32()
                )
            yield pa.RecordBatch.from_pydict(cols)

    codes_df = corpus.select(id_col, vec_col).mapInArrow(encode, out_schema)
    w = codes_df.write.format("olive").option("table", "codes")
    if cents_rows:
        w = w.option("partitionBy", "bucket")
    w.mode("overwrite").save(os.path.join(index_dir, "codes"))
    book_rows = [
        (int(j), int(c), [float(x) for x in books[j][c]])
        for j in range(m) for c in range(n_cent)
    ]
    (
        spark.createDataFrame(
            book_rows, "subspace int, centroid int, vec array<double>"
        )
        .coalesce(1).write.format("olive").option("table", "codebooks")
        .mode("overwrite").save(os.path.join(index_dir, "codebooks"))
    )
    if cents_rows:
        (
            spark.createDataFrame(
                cents_rows, "centroid_id int, centroid_vec array<double>"
            )
            .coalesce(1).write.format("olive").option("table", "centroids")
            .mode("overwrite").save(os.path.join(index_dir, "centroids"))
        )
    meta = {
        "m": int(m), "n_cent": int(n_cent), "dims": int(d),
        "vec_col": vec_col, "id_col": id_col,
        "ivf_centroids": int(ivf_centroids) if ivf_centroids else None,
        "residual": use_residual,
        "corpus_version": corpus_version,
        "build_id": uuid.uuid4().hex,
    }
    tmp = os.path.join(index_dir, _PQ_META + ".tmp")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _PQ_META))
    os.remove(pending)
    return meta


def pq_topk_indexed(
    spark,
    index_dir: str,
    corpus: DataFrame,
    query_rows: "list[tuple[int, list[float]]]",
    k: int = 10,
    refine: int = 10,
    n_probe: int = 4,
    expect_corpus_version: "int | None" = None,
) -> DataFrame:
    """Serve PQ top-k from a persisted index (:func:`build_pq_index`):
    the ADC scan reads m-byte CODES, never corpus vectors — no
    training, no re-encode; with an IVF-PQ index the probed-bucket IN
    filter additionally dir-prunes the codes scan at plan time.
    ``corpus`` supplies full vectors ONLY for the exact re-rank of the
    k·refine survivors (a semi-join-sized read).  Same result contract
    as :func:`pq_topk` with the same geometry (parity pinned in
    tests/test_similarity.py); ``expect_corpus_version`` refuses a
    stale index loudly."""
    import json as _json
    import os

    import numpy as np
    import pyarrow as pa

    from olive_spark.datasource import register_olive

    register_olive(spark)
    if os.path.exists(os.path.join(index_dir, _PQ_PENDING)):
        raise ValueError(
            f"PQ index at {index_dir} has an interrupted build "
            "(_pq_build.pending) — rebuild with build_pq_index"
        )
    with open(os.path.join(index_dir, _PQ_META)) as f:
        meta = _json.load(f)
    if (
        expect_corpus_version is not None
        and meta.get("corpus_version") != expect_corpus_version
    ):
        raise ValueError(
            f"stale PQ index at {index_dir}: built from corpus version "
            f"{meta.get('corpus_version')}, current is "
            f"{expect_corpus_version} — rebuild with build_pq_index"
        )
    m, n_cent, d = meta["m"], meta["n_cent"], meta["dims"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    # codebooks are tiny (m·n_cent sub-vectors) but each fresh DSv2
    # relation costs two plan-worker round trips — memoize per (app,
    # dir, build_id), the same content-keyed scheme as _load_centroids
    ckey = (
        spark.sparkContext.applicationId, index_dir,
        "pq:" + meta.get("build_id", ""),
    )
    books = _CENTROID_CACHE.get(ckey)
    if books is None:
        brows = (
            spark.read.format("olive")
            .load(os.path.join(index_dir, "codebooks")).collect()
        )
        books = [np.zeros((n_cent, d // m)) for _ in range(m)]
        for r in brows:
            books[r["subspace"]][r["centroid"]] = np.array(r["vec"])
        if len(_CENTROID_CACHE) > 64:
            _CENTROID_CACHE.clear()
        _CENTROID_CACHE[ckey] = books

    def _norm(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    qids = np.array([q[0] for q in query_rows], dtype=np.int64)
    qmat = _norm(np.array([q[1] for q in query_rows], dtype=np.float64))
    codes_scan = spark.read.format("olive").option("pushdown", "true")
    cmat = None
    if meta.get("ivf_centroids"):
        # memoized like the codebooks: the centroid table is tiny but a
        # fresh DSv2 relation per serve pays the fixed plan-worker
        # round trip (r11 verdict task #7)
        skey = (
            spark.sparkContext.applicationId, index_dir,
            "pqcents:" + meta.get("build_id", ""),
        )
        cmat = _CENTROID_CACHE.get(skey)
        if cmat is None:
            cents = (
                spark.read.format("olive")
                .load(os.path.join(index_dir, "centroids")).collect()
            )
            cmat = _norm(np.array(
                [r["centroid_vec"] for r in
                 sorted(cents, key=lambda r: r["centroid_id"])]
            ))
            if len(_CENTROID_CACHE) > 64:
                _CENTROID_CACHE.clear()
            _CENTROID_CACHE[skey] = cmat
        sims = qmat @ cmat.T
        probe = min(int(n_probe), sims.shape[1])
        buckets = sorted({
            int(b) for row in sims.argsort(1)[:, ::-1][:, :probe]
            for b in row
        })
        codes = codes_scan.load(os.path.join(index_dir, "codes")).filter(
            F.col("bucket").isin(buckets)
        )
    else:
        codes = codes_scan.load(os.path.join(index_dir, "codes"))
    residual = bool(meta.get("residual"))
    bc = spark.sparkContext.broadcast(
        (books, qids, qmat, cmat if residual else None)
    )
    n_cand = k * refine
    sub = d // m

    def adc_scan(batches):
        books_, qids_, qmat_, cres_ = bc.value
        # ADC tables: raw encoding keys them by query; residual
        # encoding (Faiss IVF-PQ, r11) by (query, bucket) — the code
        # approximates vec - centroid[bucket], so the query side
        # subtracts the same centroid.  Built lazily per bucket seen:
        # hive partitioning means a task usually sees ONE bucket.
        lut_cache: dict = {}

        def lut(qi, b):
            got = lut_cache.get((qi, b))
            if got is None:
                qv = qmat_[qi] if b is None else qmat_[qi] - cres_[b]
                got = np.stack([
                    ((books_[j] - qv[j * sub : (j + 1) * sub]) ** 2).sum(1)
                    for j in range(m)
                ])
                lut_cache[(qi, b)] = got
            return got

        cols_m = np.arange(m)[None, :]
        best: dict = {}
        for batch in batches:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            codes_ = _codes_matrix(batch.column("codes"), m).astype(np.int64)
            if len(codes_) == 0:
                continue
            bkts = (
                batch.column("bucket").to_numpy(zero_copy_only=False)
                if cres_ is not None else None
            )
            for qi in range(len(qids_)):
                if bkts is None:
                    dist = lut(qi, None)[cols_m, codes_].sum(1)
                else:
                    dist = np.empty(len(codes_), np.float64)
                    for b in np.unique(bkts):
                        msk = bkts == b
                        dist[msk] = lut(qi, int(b))[
                            cols_m, codes_[msk]
                        ].sum(1)
                mask = ids != qids_[qi]
                cid, cd = ids[mask], dist[mask]
                if len(cid) > n_cand:
                    part = np.argpartition(cd, n_cand)[:n_cand]
                    cid, cd = cid[part], cd[part]
                pid, pd_ = best.get(qi, (None, None))
                if pid is not None:
                    cid = np.concatenate([pid, cid])
                    cd = np.concatenate([pd_, cd])
                    if len(cid) > n_cand:
                        part = np.argpartition(cd, n_cand)[:n_cand]
                        cid, cd = cid[part], cd[part]
                best[qi] = (cid, cd)
        for qi, (cid, cd) in best.items():
            yield pa.RecordBatch.from_pydict({
                "query_id": np.full(len(cid), qids_[qi]),
                "neighbor_id": cid,
                "adc": cd,
            })

    scan_cols = [id_col, "codes"] + (["bucket"] if residual else [])
    cands = codes.select(*scan_cols).mapInArrow(
        adc_scan, "query_id long, neighbor_id long, adc double"
    )
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    cands = (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_cand)
        .select("query_id", "neighbor_id")
    )
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
    )
    qdf = spark.createDataFrame(
        [(int(q), list(map(float, v))) for q, v in query_rows],
        "query_id long, query_vec array<double>",
    )
    sim = F.round(cosine_expr(F.col("query_vec"), F.col("corpus_vec")), 6)
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    # BROADCAST the candidate list into the re-rank join (guide §3.1):
    # cands is bounded by k·refine rows per query (a few hundred), while
    # ``full`` is the whole corpus — without the hint the planner's
    # stats for the mapInArrow output are unknowable and it falls back
    # to a SortMergeJoin that SHUFFLES EVERY CORPUS VECTOR by id just to
    # look up the survivors (measured r16: the serve's only full-corpus
    # exchange).  Broadcasting cands turns the re-rank into a pruned
    # probe of the corpus scan: no corpus shuffle at any scale.
    return (
        full.join(F.broadcast(cands), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
