"""LLM-pipeline query surface (SURVEY.md §2.7 north-star rows).

Each query reads olive-format data. SQL-expressible ops carry a DuckDB
oracle; genuinely non-SQL ops (LSH banding, simhash bit votes) are
rows-only per the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from olive_spark.ops import curation, dedup, multimodal, similarity, textstats
from olive_spark.queries import data


def llm_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return dedup.exact_dedup(df)


SQL_DEDUP_EXACT = (
    "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count, md5(text) AS content_hash "
    "FROM documents GROUP BY md5(text)"
)


def llm_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ingest dedup: a new batch (doc_id < 200) against an
    existing corpus (even doc_ids), prefiltered by the PERSISTED
    sharded Bloom index (ops/bloom_index.py — built once per cache, no
    bitmap ever on the driver) with exact anti-join confirmation —
    output is exact, so the DuckDB oracle is a plain NOT EXISTS on the
    content hash.  The overlap comes from the splits sharing documents,
    the realistic re-ingest scenario."""
    import os as _os

    from olive_spark.ops import bloom_index

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") < 200)
    index_dir = _os.path.join(data.ensure_olive(sf), "bloom_index_documents")
    if not _os.path.exists(_os.path.join(index_dir, "_bloom_meta.json")):
        bloom_index.build_bloom_index(
            spark, corpus, index_dir, expected_items=4096, n_shards=4
        )
    return bloom_index.probe_bloom_index(spark, batch, corpus, index_dir)


SQL_DEDUP_INCR = (
    "WITH corpus AS (SELECT md5(text) AS content_hash FROM documents "
    "WHERE doc_id % 2 = 0), "
    "batch AS (SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash "
    "FROM documents WHERE doc_id < 200 GROUP BY md5(text)) "
    "SELECT b.doc_id, b.content_hash FROM batch b "
    "WHERE NOT EXISTS (SELECT 1 FROM corpus c "
    "WHERE c.content_hash = b.content_hash)"
)


def llm_dedup_index_update(spark: SparkSession, sf: str) -> DataFrame:
    """The persisted Bloom index's per-ingest LIFECYCLE, driver-gated
    (r9, extended r11): build over the even-id corpus, APPEND the
    %3==0 documents' shard partials (Bloom OR-composition as a table
    append), COMPACT back to one row per shard, then run a
    TRANSACTIONAL corpus+index ingest of the %5==0 stragglers with a
    CRASH INJECTED between the corpus commit and the index fold
    (ops/bloom_index.ingest_with_bloom_index, r11 verdict task #4) —
    the probe's self-heal must roll the index forward so both land.
    Output stays exact (the index only prunes the confirm join), so
    the oracle is plain NOT EXISTS over the final corpus — a heal that
    lost the crashed ingest, an append that dropped a shard row, a
    compact that OR'd wrong, or a probe that skipped the confirm join
    hash-mismatches."""
    import os as _os

    from olive_spark.ops import bloom_index

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    corpus_a = docs.filter(F.col("doc_id") % 2 == 0)
    corpus_b = docs.filter(
        (F.col("doc_id") % 2 != 0) & (F.col("doc_id") % 3 == 0)
    )
    corpus_c = docs.filter(
        (F.col("doc_id") % 2 != 0) & (F.col("doc_id") % 3 != 0)
        & (F.col("doc_id") % 5 == 0)
    )
    batch = docs.filter(F.col("doc_id") < 300)
    root = data.ensure_olive(sf)
    index_dir = _os.path.join(root, "bloom_index_lifecycle")
    corpus_dir = _os.path.join(root, "bloom_lifecycle_corpus")
    done = _os.path.join(index_dir, "_TXN_OK")
    if not _os.path.exists(done):
        import shutil as _shutil

        for d in (index_dir, corpus_dir):
            if _os.path.exists(d):
                _shutil.rmtree(d)
        corpus_a.unionByName(corpus_b).write.format("olive") \
            .option("table", "data").mode("append").save(corpus_dir)
        bloom_index.build_bloom_index(
            spark, corpus_a, index_dir, expected_items=4096, n_shards=4
        )
        bloom_index.append_bloom_index(spark, corpus_b, index_dir)
        bloom_index.compact_bloom_index(spark, index_dir)
        # transactional ingest with a crash between the corpus commit
        # and the index fold: the corpus version lands, the marker
        # stays, and the next probe heals the index forward
        class _Boom(RuntimeError):
            pass

        def _boom() -> None:
            raise _Boom()

        bloom_index._CRASH_HOOKS["after_corpus"] = _boom
        try:
            bloom_index.ingest_with_bloom_index(
                spark, corpus_dir, corpus_c, index_dir
            )
            raise AssertionError("crash hook did not fire")
        except _Boom:
            pass
        finally:
            bloom_index._CRASH_HOOKS.clear()
        assert _os.path.exists(
            _os.path.join(index_dir, "_index_txn.pending")
        ), "crash must leave the txn marker"
        with open(done, "w") as f:
            f.write("ok")
    from olive_spark.ops.relcache import cached_relation

    corpus = cached_relation(spark, corpus_dir, table="data")
    # probe_bloom_index self-heals the interrupted txn before serving
    return bloom_index.probe_bloom_index(spark, batch, corpus, index_dir)


SQL_DEDUP_INDEX_UPDATE = (
    "WITH corpus AS (SELECT md5(text) AS content_hash FROM documents "
    "WHERE doc_id % 2 = 0 OR doc_id % 3 = 0 OR doc_id % 5 = 0), "
    "batch AS (SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash "
    "FROM documents WHERE doc_id < 300 GROUP BY md5(text)) "
    "SELECT b.doc_id, b.content_hash FROM batch b "
    "WHERE NOT EXISTS (SELECT 1 FROM corpus c "
    "WHERE c.content_hash = b.content_hash)"
)


def llm_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (rows-only check: banding + xxhash64
    permutations aren't reproducible in ANSI SQL)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return dedup.minhash_lsh_pairs(df, threshold=0.5)


def llm_neardup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental NEAR-dup against a PERSISTED MinHash-LSH index
    (ops/lsh_index.py) — the near-dup counterpart of the exact
    llm_dedup_incremental: the corpus' signatures + band hashes are
    built ONCE per cache and every later call only signs the probe
    batch and equi-joins band triples (the corpus text is never
    re-read).  Probe batch = re-keyed copies of doc_id % 4 == 1
    documents, so identity-level matches are guaranteed and the result
    is a deterministic function of the fixture.  Rows-only (banding +
    xxhash64 permutations aren't ANSI SQL); probe parity with the
    in-memory LSH self-join is pinned exactly by
    tests/test_lsh_index.py::test_probe_matches_inmemory_lsh."""
    import os as _os

    from olive_spark.ops import lsh_index

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    index_dir = _os.path.join(data.ensure_olive(sf), "lsh_index_documents")
    if not _os.path.exists(_os.path.join(index_dir, "_lsh_meta.json")):
        lsh_index.build_lsh_index(spark, docs, index_dir)
    batch = docs.filter(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    pairs = lsh_index.probe_index(spark, batch, index_dir, threshold=0.5)
    # per-probe-doc summary: bounded rows; best = (max jaccard, min
    # corpus_id at that jaccard) via one struct-max — deterministic
    return pairs.groupBy("query_id").agg(
        F.count("*").alias("n_matches"),
        F.max(
            F.struct(
                F.col("jaccard_est").alias("j"),
                (-F.col("corpus_id")).alias("nc"),
            )
        ).alias("__best"),
    ).select(
        "query_id", "n_matches",
        F.col("__best.j").alias("best_jaccard"),
        (-F.col("__best.nc")).alias("best_corpus_id"),
    )


def llm_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Authority scoring for curation weighting (ops/graph.pagerank):
    power-iteration PageRank over a deterministic pseudo link graph on
    the documents table (each doc links to three affine-mapped ids —
    hubs, chains, and dangling sinks all arise).  Returns the top 50
    (node, rank) with ranks rounded to 6 decimals, (rank, node)
    tie-broken.  Rows-only: iterative float fixpoints aren't ANSI SQL;
    value parity is pinned against a numpy reference implementation in
    tests/test_graph.py."""
    from olive_spark.ops.graph import pagerank

    docs = data.load(spark, sf, "documents", columns=["doc_id"])
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    src = F.col("doc_id")
    edges = None
    for a, b in ((7, 3), (13, 11), (29, 17)):
        leg = docs.select(
            src.alias("src"), ((src * a + b) % n).alias("dst")
        )
        edges = leg if edges is None else edges.unionByName(leg)
    pr = pagerank(edges, max_iter=15)
    return (
        pr.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "node").limit(50)
    )


def llm_keyword_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact multi-term keyword search served from the persisted
    inverted index (ops/text_index.py): postings (token, doc_id) are
    token-range-clustered olive files with per-file token Blooms, built
    once per cache; every later call reads only the files whose token
    stats straddle the terms — the corpus text is never re-scanned.
    Output is EXACT (AND + OR of literal tokens), so the DuckDB oracle
    is a plain tokenize-and-filter over the documents view — an index
    that dropped a posting file, double-counted a token, or diverged
    from the engine's \\s+-lowercase tokenizer hash-mismatches."""
    import os as _os

    from olive_spark.ops import text_index

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    index_dir = _os.path.join(data.ensure_olive(sf), "text_index_documents")
    if not _os.path.exists(_os.path.join(index_dir, "_text_meta.json")):
        text_index.build_text_index(spark, docs, index_dir)
    both = text_index.search_tokens(
        spark, index_dir, ["vector", "customer"], "all"
    ).withColumn("match_kind", F.lit("both"))
    either = text_index.search_tokens(
        spark, index_dir, ["vector", "customer"], "any"
    ).withColumn("match_kind", F.lit("either"))
    return both.unionByName(either)


def llm_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact phrase search ("table hash") from a POSITIONAL inverted
    index (ops/text_index.search_phrase — Manning IIR §2.4 positional
    postings): per-term position arrays ride in the postings rows;
    adjacency is array_intersect of offset-shifted positions, so only
    the two terms' posting files are read (token-range + Bloom pruned),
    never the corpus text.  n_hits counts occurrences (one doc at
    sf0.01 contains the phrase twice — both count branches live).  The
    DuckDB oracle re-derives occurrence positions straight from the
    text, so a positional index that dropped, duplicated, or
    off-by-one'd a position hash-mismatches."""
    import os as _os

    from olive_spark.ops import text_index

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    index_dir = _os.path.join(
        data.ensure_olive(sf), "text_index_documents_pos"
    )
    if not _os.path.exists(_os.path.join(index_dir, "_text_meta.json")):
        text_index.build_text_index(
            spark, docs, index_dir, positions=True
        )
    return text_index.search_phrase(spark, index_dir, "table hash")


SQL_PHRASE_SEARCH = (
    "WITH tok AS (SELECT doc_id, "
    "  list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
    "    x -> x <> '') AS w FROM documents), "
    "hits AS (SELECT doc_id, len(list_filter(range(1, len(w)), "
    "  i -> w[i] = 'table' AND w[i+1] = 'hash')) AS n_hits FROM tok) "
    "SELECT doc_id, n_hits FROM hits WHERE n_hits > 0"
)


SQL_KEYWORD_SEARCH = (
    "WITH toks AS (SELECT doc_id, "
    "regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents) "
    "SELECT doc_id, 'both' AS match_kind FROM toks "
    "WHERE list_contains(t, 'vector') AND list_contains(t, 'customer') "
    "UNION ALL "
    "SELECT doc_id, 'either' AS match_kind FROM toks "
    "WHERE list_contains(t, 'vector') OR list_contains(t, 'customer')"
)


def llm_search_after_compact(spark: SparkSession, sf: str) -> DataFrame:
    """Text-index APPEND→COMPACT lifecycle (ops/text_index.
    compact_text_index — r12 verdict task #5): the fixture builds the
    index over the even-id half of the corpus, APPENDS the odd half in
    two batches (each lands token-clustered only among itself, so the
    per-file token ranges overlap), then re-clusters with
    compact_text_index — disjoint ranges, fresh per-file token Blooms,
    atomic meta-pointer swap.  The search output is EXACT over the full
    corpus, so the oracle is a plain tokenize-and-filter: a compaction
    that dropped a posting file, double-landed a batch, or served the
    half-swapped state hash-mismatches."""
    import os as _os

    from olive_spark.ops import text_index

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    index_dir = _os.path.join(data.ensure_olive(sf), "text_index_compacted")
    marker = _os.path.join(index_dir, "_COMPACT_OK")
    if not _os.path.exists(marker):
        import shutil as _shutil

        if _os.path.exists(index_dir):
            _shutil.rmtree(index_dir)
        text_index.build_text_index(
            spark, docs.filter(F.col("doc_id") % 2 == 0), index_dir
        )
        text_index.append_text_index(
            spark, docs.filter(F.col("doc_id") % 4 == 1), index_dir
        )
        text_index.append_text_index(
            spark, docs.filter(F.col("doc_id") % 4 == 3), index_dir
        )
        text_index.compact_text_index(spark, index_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return text_index.search_tokens(
        spark, index_dir, ["vector", "customer"], "all"
    )


SQL_SEARCH_AFTER_COMPACT = (
    "WITH toks AS (SELECT doc_id, "
    "regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents) "
    "SELECT doc_id FROM toks "
    "WHERE list_contains(t, 'vector') AND list_contains(t, 'customer')"
)


def llm_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weights (ops/curation.dsir_importance — Xie et
    al. 2023, arXiv:2302.03169): hashed-bigram log-likelihood ratios
    against a target domain, the classifier-free lever for tilting a
    crawl toward a curated reference.  Target subset = doc_id % 7 == 0
    (deterministic, oracle-replayable); features hash through the same
    md5-hex bridge as hash_split, so DuckDB replays the exact buckets;
    weights round to 6 decimals (libm-vs-JVM log agrees far beyond
    that).  A scorer that mixed up the distributions, dropped Laplace
    smoothing, or mis-bucketed a single bigram hash-mismatches."""
    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return curation.dsir_importance(
        docs, F.col("doc_id") % 7 == 0, n_buckets=4096,
    )


SQL_DSIR_WEIGHTS = (
    "WITH toks AS (SELECT doc_id, doc_id % 7 = 0 AS tgt, "
    "  list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
    "    x -> x <> '') AS w FROM documents), "
    "ex AS (SELECT doc_id, tgt, "
    "  CAST(('0x' || substr(md5(w[i+1] || ' ' || w[i+2]), 1, 8)) AS BIGINT) "
    "    % 4096 AS bucket "
    "  FROM toks, UNNEST(range(0, CAST(len(w) AS BIGINT) - 1)) AS u(i) "
    "  WHERE len(w) >= 2), "
    "pd AS (SELECT doc_id, bucket, COUNT(*) AS c FROM ex "
    "  GROUP BY doc_id, bucket), "
    "dist AS (SELECT bucket, COUNT(*) AS n_raw, "
    "  SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS n_tgt FROM ex "
    "  GROUP BY bucket), "
    "tot AS (SELECT SUM(n_raw) AS t_raw, SUM(n_tgt) AS t_tgt FROM dist), "
    "r AS (SELECT bucket, "
    "  ln((n_tgt + 1.0) / (t_tgt + 4096.0)) "
    "  - ln((n_raw + 1.0) / (t_raw + 4096.0)) AS lr FROM dist, tot) "
    "SELECT pd.doc_id, CAST(SUM(pd.c) AS BIGINT) AS n_feats, "
    "  ROUND(SUM(pd.c * r.lr), 6) AS logw "
    "FROM pd JOIN r USING (bucket) GROUP BY pd.doc_id"
)


def llm_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25-ranked keyword search from the persisted inverted index
    (ops/text_index.search_bm25): tf/dl ride in the postings rows, N
    and avgdl in the index meta, df aggregates over the same
    file-pruned term scan the scoring reads.  The oracle replays the
    Okapi formula in DuckDB SQL over the documents view; scores are
    rounded to 4 decimals with (score, doc_id) tie-break so the top-k
    is deterministic and cross-engine stable."""
    import os as _os

    from olive_spark.ops import text_index

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    index_dir = _os.path.join(data.ensure_olive(sf), "text_index_documents")
    if not _os.path.exists(_os.path.join(index_dir, "_text_meta.json")):
        text_index.build_text_index(spark, docs, index_dir)
    return text_index.search_bm25(
        spark, index_dir, ["vector", "stream"], k=25
    )


SQL_BM25_SEARCH = (
    # len(t) > 0 everywhere: the index deliberately excludes tokenless
    # documents from N/avgdl (build_text_index docstring) — an oracle
    # counting ALL docs would diverge the moment the corpus held a
    # whitespace-only text
    "WITH toks AS (SELECT doc_id, t FROM (SELECT doc_id, "
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
    "x -> x <> '') AS t FROM documents) WHERE len(t) > 0), "
    "stats AS (SELECT COUNT(*) AS n, SUM(len(t)) * 1.0 / COUNT(*) AS avgdl "
    "FROM toks), "
    "tf AS (SELECT doc_id, len(t) AS dl, "
    "len(list_filter(t, x -> x = 'vector')) AS tf_v, "
    "len(list_filter(t, x -> x = 'stream')) AS tf_s FROM toks), "
    "dfs AS (SELECT COUNT(*) FILTER (tf_v > 0) AS df_v, "
    "COUNT(*) FILTER (tf_s > 0) AS df_s FROM tf) "
    "SELECT doc_id, score, n_terms_hit FROM ("
    "SELECT doc_id, "
    "ROUND("
    "  CASE WHEN tf_v > 0 THEN ln(1 + (n - df_v + 0.5)/(df_v + 0.5)) "
    "    * tf_v * 2.2 / (tf_v + 1.2 * (0.25 + 0.75 * dl / avgdl)) "
    "  ELSE 0 END + "
    "  CASE WHEN tf_s > 0 THEN ln(1 + (n - df_s + 0.5)/(df_s + 0.5)) "
    "    * tf_s * 2.2 / (tf_s + 1.2 * (0.25 + 0.75 * dl / avgdl)) "
    "  ELSE 0 END, 4) AS score, "
    "CAST((tf_v > 0) AS INT) + CAST((tf_s > 0) AS INT) AS n_terms_hit "
    "FROM tf, stats, dfs WHERE tf_v > 0 OR tf_s > 0) "
    "ORDER BY score DESC, doc_id LIMIT 25"
)


def llm_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (rows-only)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return dedup.simhash_neardup_pairs(df, max_hamming=3)


def llm_dedup_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates (rows-only)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return dedup.ngram_jaccard_pairs(df, threshold=0.5)


def llm_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding cosine near-dup pairs via hyperplane LSH over the
    embeddings table with planted scaled duplicates (scaling preserves
    cosine, so every planted pair MUST be found — a 0-row result would
    mean the LSH bucketing is broken)."""
    df = data.load(spark, sf, "embeddings_dup")
    return dedup.embedding_neardup_pairs(df, threshold=0.98)


def llm_dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup retention decisions (ops/dedup.semantic_dedup): k-means
    clusters + within-cluster cosine pruning over embeddings with
    planted scaled duplicates.  Scaling preserves cosine exactly, so
    each planted duplicate shares its original's cluster and MUST come
    back kept=false — an all-kept result would mean the clustering or
    pruning is broken.  Rows-only check (k-means isn't ANSI SQL);
    value-level semantics pinned in tests/test_dedup.py."""
    df = data.load(spark, sf, "embeddings_dup")
    return dedup.semantic_dedup(df, threshold=0.98).orderBy("vec_id")


def llm_similarity_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k for a deterministic query set (vec_id < 5),
    declarative path — DuckDB oracle via list_cosine_similarity."""
    corpus = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    queries = corpus.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(corpus, queries, k=10)


SQL_SIMILARITY_TOPK = (
    "SELECT query_id, neighbor_id, cosine, rk FROM ("
    "  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
    "         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cosine, "
    "         ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
    "           ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS rk "
    "  FROM embeddings q CROSS JOIN embeddings c "
    "  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id"
    ") WHERE rk <= 10"
)


def llm_similarity_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """Same top-k via the Arrow/numpy matmul scale path — same oracle."""
    corpus = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    qrows = [
        (r["vec_id"], r["embedding"])
        for r in corpus.filter(F.col("vec_id") < 5).collect()
    ]
    return similarity.cosine_topk_arrow(corpus, qrows, k=10)


def llm_similarity_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-bucketed ANN (rows-only: recall < 1 by design — the point is
    the bucket-pruned scan shape that survives 100 TB)."""
    corpus = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    queries = corpus.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(corpus, queries, k=10)


def llm_similarity_ivf_persisted(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN served from a PERSISTED index (rows-only like the other
    recall<1 ANN entries; result-parity with the per-call-trained
    ivf_topk is pinned by tests/test_similarity.py).  The index —
    centroids + bucket-hive-partitioned inverted lists + a meta sidecar
    keyed to the corpus snapshot version — is built once per cache
    (ops/similarity.build_ivf_index) and every later call loads it:
    no re-train, no corpus assignment pass, and the probed-bucket IN
    filter prunes unprobed bucket=... directories at plan time."""
    import os as _os

    corpus = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    index_dir = _os.path.join(data.ensure_olive(sf), "ivf_index_embeddings")
    if not _os.path.exists(_os.path.join(index_dir, "_ivf_meta.json")):
        similarity.build_ivf_index(spark, corpus, index_dir, corpus_version=1)
    queries = corpus.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk_indexed(
        spark, index_dir, queries, k=10, expect_corpus_version=1
    )


def llm_similarity_pq_persisted(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ ANN served from a PERSISTED index (rows-only like the
    other recall<1 ANN entries; result-parity with in-memory pq_topk
    and the recall floor are pinned by tests/test_similarity.py).  The
    index — driver-trained codebooks + every corpus vector encoded ONCE
    into m-byte codes, bucket-hive-partitioned under a coarse IVF layer
    — is built once per cache (ops/similarity.build_pq_index); serving
    reads codes (never corpus vectors) from only the probed bucket=…
    directories, then re-ranks the survivors exactly.  The
    memory-bounded ANN shape for 10^9-vector corpora."""
    import os as _os

    corpus = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    index_dir = _os.path.join(data.ensure_olive(sf), "pq_index_embeddings")
    if not _os.path.exists(_os.path.join(index_dir, "_pq_meta.json")):
        similarity.build_pq_index(
            spark, corpus, index_dir, corpus_version=1, ivf_centroids=8,
        )
    qdf = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    qrows = [
        (r["vec_id"], r["embedding"])
        for r in qdf.filter(F.col("vec_id") < 5).collect()
    ]
    corpus2 = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    return similarity.pq_topk_indexed(
        spark, index_dir, corpus2, qrows, k=10, n_probe=6,
        expect_corpus_version=1,
    )


def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal frame sampling: binary payload → per-frame rows via
    Arrow-batched mapInPandas (decoder stubbed deterministically, so the
    oracle reproduces frames + byte slices arithmetically)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    frames = multimodal.frame_sample(multimodal.attach_binary_payload(df))
    # hex-project the binary payload: Spark returns ``bytes`` where
    # DuckDB's pandas path returns ``bytearray`` — same value, different
    # repr under the driver's canonicalizer
    return frames.select(
        "doc_id", "frame_no", F.lower(F.hex("frame_bytes")).alias("frame_hex")
    )


SQL_MM_FRAMES = (
    # documents.text is pure ASCII in the testdata, so the VARCHAR
    # substring is byte-identical to the Python bytes slice
    "SELECT doc_id, CAST(fi AS INT) AS frame_no, "
    "lower(hex(encode(substring(text, CAST((fi * 97) % GREATEST(strlen(text), 1) AS INT) + 1, 16)))) AS frame_hex "
    "FROM documents, UNNEST(range(0, strlen(text) % 30 + 1, 10)) AS t(fi)"
)


def llm_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return textstats.text_stats(df)


SQL_TEXT_STATS = (
    "SELECT doc_id, LENGTH(text) AS n_chars, "
    "CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens, "
    "LENGTH(text) - LENGTH(REPLACE(text, CHR(10), '')) + 1 AS n_lines "
    "FROM documents"
)


def llm_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic quality filters.  Every ratio is an int/int IEEE
    division and the word-length mean sums integer-valued doubles —
    exact in both engines — so the oracle is a full hash check (both
    engines round half-away-from-zero on doubles, verified)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return textstats.quality_score(df)


def _quality_sql() -> str:
    from olive_spark.ops.textstats import _STOPWORDS

    sw = ", ".join(f"'{w}'" for w in _STOPWORDS["en"])
    return (
        "WITH s AS (SELECT doc_id, text, "
        "CASE WHEN length(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[]) "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks "
        "FROM documents) "
        "SELECT doc_id, "
        f"ROUND(len(list_intersect(toks, [{sw}])) / GREATEST(len(toks), 1), 4) AS stopword_ratio, "
        "ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / GREATEST(length(text), 1), 4) AS punct_ratio, "
        "ROUND((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) / GREATEST(length(text), 1), 4) AS upper_ratio, "
        "ROUND(CASE WHEN len(toks) > 0 THEN "
        "list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum') / len(toks) "
        "ELSE 0.0 END, 4) AS mean_word_len "
        "FROM s"
    )


SQL_QUALITY = _quality_sql()


def llm_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-hit language ID; DuckDB reproduces the argmax with
    struct list_sort (both engines compare (hits, lang) structs)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return textstats.lang_id(df)


def _lang_id_sql() -> str:
    from olive_spark.ops.textstats import _STOPWORDS

    packs = ", ".join(
        "struct_pack(hits := len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in ws)
        + f"])), lang := '{code}')"
        for code, ws in sorted(_STOPWORDS.items())
    )
    return (
        "WITH s AS (SELECT doc_id, "
        "regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents), "
        f"m AS (SELECT doc_id, list_sort([{packs}])[-1] AS best FROM s) "
        "SELECT doc_id, "
        "CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred, "
        "best.hits AS lang_hits FROM m"
    )


SQL_LANG_ID = _lang_id_sql()


def llm_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return textstats.fingerprint(df)


SQL_FINGERPRINT = (
    "SELECT doc_id, md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp "
    "FROM documents"
)


def llm_token_count(spark: SparkSession, sf: str) -> DataFrame:
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return textstats.token_count(df)


SQL_TOKEN_COUNT = (
    "SELECT doc_id, "
    "CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_ws_tokens, "
    "LEN(list_filter(regexp_split_to_array("
    "regexp_replace(text, '([0-9]+|[^A-Za-z0-9\\s]+)', ' \\1 ', 'g'), '\\s+'), "
    "x -> x != '')) AS n_bpe_tokens "
    "FROM documents"
)


def llm_lsh_ingest_txn(spark: SparkSession, sf: str) -> DataFrame:
    """Atomic corpus+LSH-index ingest (ops/lsh_index.
    ingest_with_lsh_index riding ops/txn.multi_table_txn — r13,
    VERDICT r12 task #2): the fixture seeds corpus+index with
    doc_id % 3 != 0, transactionally ingests the remaining third with
    a crash injected BETWEEN participant publishes (corpus landed,
    index legs not — the torn state the bespoke Bloom path needed
    hand-rolled idempotent redo for), then heals via recover_txns.
    The gate: corpus rows, signature rows, and distinct banded doc ids
    must all equal the FULL documents count — a lost index leg, a
    double publish, or an unhealed tear shifts a count and
    hash-mismatches against the oracle's replay from the base table."""
    import os as _os

    from olive_spark.ops import lsh_index, txn as _txn

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    root = data.ensure_olive(sf)
    corpus = _os.path.join(root, "lsh_txn_corpus")
    idx = _os.path.join(root, "lsh_txn_idx")
    marker = _os.path.join(root, "_LSH_TXN_OK")
    if not _os.path.exists(marker):
        seed = docs.filter(F.col("doc_id") % 3 != 0)
        seed.write.format("olive").mode("append").save(corpus)
        lsh_index.build_lsh_index(spark, seed, idx)
        batch = docs.filter(F.col("doc_id") % 3 == 0)

        class _Torn(RuntimeError):
            pass

        def _die():
            raise _Torn()

        _txn._CRASH_HOOKS["mid_publish"] = _die
        try:
            lsh_index.ingest_with_lsh_index(spark, corpus, batch, idx)
        except _Torn:
            pass
        finally:
            _txn._CRASH_HOOKS.clear()
        _txn.recover_txns(spark, corpus)
        with open(marker, "w") as f:
            f.write("ok")
    ca = (
        spark.read.format("olive").load(corpus)
        .agg(F.count("*").alias("n_corpus"))
    )
    sa = (
        spark.read.format("olive").load(_os.path.join(idx, "sigs"))
        .agg(F.count("*").alias("n_sigs"))
    )
    ba = (
        spark.read.format("olive").load(_os.path.join(idx, "bands"))
        .select("doc_id").distinct()
        .agg(F.count("*").alias("n_band_docs"))
    )
    return ca.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(ba))


SQL_LSH_INGEST_TXN = (
    "SELECT COUNT(*) AS n_corpus, COUNT(*) AS n_sigs, "
    "COUNT(*) AS n_band_docs FROM documents"
)


def llm_token_count_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """Model-accurate token counts (ops/tokenize.py, r13 — VERDICT r12
    task #1): every doc encoded with the committed BPE fixture
    (vocab.json + merges.txt, the public GPT-2 artifact shape) via the
    Arrow-batched pandas UDF; whitespace count alongside for the
    under-count comparison (~1.6× on this corpus).  ``ids_ck`` is the
    POSITIONAL checksum Σ i·ids[i] computed JVM-side from the id array
    — it pins token identity AND order, so a wrong merge order, a
    dropped rank, or an off-by-one in the loop hash-mismatches.  The
    oracle replays the exact merge loop as a DuckDB recursive CTE over
    the same fixture (first occurrence of the min-rank adjacent pair
    per step, § the tokenize.py spec)."""
    from olive_spark.ops import tokenize

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    enc = tokenize.bpe_encode(docs)
    ids = F.col("token_ids")
    ck = F.when(F.size(ids) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.zip_with(
                ids, F.sequence(F.lit(1), F.size(ids)),
                lambda t, i: i.cast("long") * t.cast("long"),
            ),
            F.lit(0).cast("long"), lambda a, x: a + x,
        )
    )
    return enc.select(
        "doc_id",
        F.size(textstats.tokens(F.col("text"))).alias("n_ws"),
        F.col("n_tokens_bpe").alias("n_bpe"),
        ck.alias("ids_ck"),
    )


def _bpe_cte(bpe: "dict | None" = None) -> str:
    """The shared recursive-CTE replay of the BPE merge loop, built
    from the SAME committed fixture the Spark path encodes with:
    merges and vocab embed as MAP literals; the CTE merges the first
    occurrence of the min-rank adjacent pair per iteration until
    fixpoint — the tokenize.py spec, replayed independently by DuckDB
    (encoding runs over DISTINCT words, then joins back in word order).
    Merge-table-agnostic: pass any ``bpe`` dict (default: the char
    fixture).  A byte-level table swaps only the ``init`` step — each
    char UTF-8-encodes ARITHMETICALLY in SQL (the standard public
    codepoint→byte construction) and maps through the embedded 256-
    entry bytes-to-unicode table, so DuckDB replays byte mode with no
    Python in the loop.  Ends with ``per_doc(doc_id, ids)``; consumers
    append their own final SELECT."""
    from olive_spark.ops.tokenize import B2U, default_bpe

    b = bpe or default_bpe()

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    mk = ", ".join(q(l + " " + r) for l, r in b["merges"])
    mv = ", ".join(str(i) for i in range(len(b["merges"])))
    vk = ", ".join(q(t) for t in b["vocab"])
    vv = ", ".join(str(i) for i in b["vocab"].values())
    if b.get("byte_level"):
        bk = ", ".join(str(i) for i in sorted(B2U))
        bv = ", ".join(q(B2U[i]) for i in sorted(B2U))
        init = f"""b2u AS (SELECT MAP([{bk}], [{bv}]) AS m),
init AS (
  SELECT word, flatten(list_transform(string_split(word, ''),
    c -> CASE
      WHEN unicode(c) < 128 THEN [map_extract(m, unicode(c))[1]]
      WHEN unicode(c) < 2048 THEN
        [map_extract(m, 192 + unicode(c) // 64)[1],
         map_extract(m, 128 + unicode(c) % 64)[1]]
      WHEN unicode(c) < 65536 THEN
        [map_extract(m, 224 + unicode(c) // 4096)[1],
         map_extract(m, 128 + (unicode(c) // 64) % 64)[1],
         map_extract(m, 128 + unicode(c) % 64)[1]]
      ELSE
        [map_extract(m, 240 + unicode(c) // 262144)[1],
         map_extract(m, 128 + (unicode(c) // 4096) % 64)[1],
         map_extract(m, 128 + (unicode(c) // 64) % 64)[1],
         map_extract(m, 128 + unicode(c) % 64)[1]]
    END)) || ['</w>'] AS s
  FROM dw, b2u),"""
    else:
        init = (
            "init AS (SELECT word, string_split(word, '') || ['</w>'] "
            "AS s FROM dw),"
        )
    if b.get("pretokenizer", "whitespace") == "gpt2":
        from olive_spark.ops.tokenize import GPT2_SPLIT_PATTERN

        pat = GPT2_SPLIT_PATTERN.replace("'", "''")
        words_expr = f"regexp_extract_all(text, '{pat}')"
    else:
        words_expr = (
            "list_filter(string_split_regex(trim(text), '\\s+'), "
            "x -> x <> '')"
        )
    return f"""
WITH words AS (
  SELECT doc_id, i AS widx, w[CAST(i AS INT)+1] AS word FROM (
    SELECT doc_id, {words_expr} AS w
    FROM documents), UNNEST(range(0, CAST(len(w) AS BIGINT))) AS u(i)
),
dw AS (SELECT DISTINCT word FROM words),
{init}
rec AS (
  WITH RECURSIVE r(word, s, done) AS (
    SELECT word, s, false FROM init
    UNION ALL
    SELECT word,
      CASE WHEN b IS NULL THEN s
           ELSE list_slice(s, 1, b.j - 1) || [s[b.j] || s[b.j + 1]]
                || list_slice(s, b.j + 2, len(s)) END,
      b IS NULL
    FROM (
      SELECT word, s,
        list_sort(list_filter(list_transform(
          range(1, CAST(len(s) AS BIGINT)),
          j -> {{rk: coalesce(map_extract(MAP([{mk}], [{mv}]),
                  s[CAST(j AS INT)] || ' ' || s[CAST(j AS INT) + 1])[1],
                  2147483647),
                j: CAST(j AS INT)}}),
          x -> x.rk < 2147483647))[1] AS b
      FROM r WHERE NOT done
    )
  )
  SELECT word, s FROM r WHERE done
),
toks AS (
  SELECT word, list_transform(s, x -> coalesce(
    map_extract(MAP([{vk}], [{vv}]), x)[1], 0)) AS tids
  FROM rec
),
per_doc AS (
  SELECT w.doc_id, flatten(list(t.tids ORDER BY w.widx)) AS ids
  FROM words w JOIN toks t USING (word) GROUP BY w.doc_id
)"""


_SQL_TOKEN_COUNT_TAIL = """
SELECT d.doc_id,
  CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                       x -> x <> '')) AS INT) AS n_ws,
  CAST(coalesce(len(p.ids), 0) AS INT) AS n_bpe,
  CAST(coalesce(list_sum(list_transform(
    range(1, CAST(len(p.ids) AS BIGINT) + 1),
    i -> i * p.ids[CAST(i AS INT)])), 0) AS BIGINT) AS ids_ck
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

SQL_TOKEN_COUNT_BPE = _bpe_cte() + _SQL_TOKEN_COUNT_TAIL


def llm_token_count_bpe_bytes(spark: SparkSession, sf: str) -> DataFrame:
    """BYTE-LEVEL BPE token counts (r14, VERDICT r13 task #2): the
    committed byte fixture (GPT-2 bytes-to-unicode alphabet, full
    256-byte coverage — ``<unk>`` unreachable) through the same
    Arrow-batched encode projection; the positional checksum pins
    every id and its position.  The oracle is the SAME recursive-CTE
    merge replay — only the ``init`` step changes: each char UTF-8-
    encodes arithmetically in SQL and maps through the embedded
    bytes-to-unicode table, proving the byte mode end-to-end with no
    Python in the oracle loop."""
    from olive_spark.ops import tokenize

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    enc = tokenize.bpe_encode(docs, bpe=tokenize.default_bpe_bytes())
    ids = F.col("token_ids")
    ck = F.when(F.size(ids) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.zip_with(
                ids, F.sequence(F.lit(1), F.size(ids)),
                lambda t, i: i.cast("long") * t.cast("long"),
            ),
            F.lit(0).cast("long"), lambda a, x: a + x,
        )
    )
    return enc.select(
        "doc_id",
        F.size(textstats.tokens(F.col("text"))).alias("n_ws"),
        F.col("n_tokens_bpe").alias("n_bpe"),
        ck.alias("ids_ck"),
    )


def _sql_token_count_bpe_bytes() -> str:
    from olive_spark.ops.tokenize import default_bpe_bytes

    return _bpe_cte(default_bpe_bytes()) + _SQL_TOKEN_COUNT_TAIL


def llm_token_count_gpt2(spark: SparkSession, sf: str) -> DataFrame:
    """GPT-2-SHAPED tokenization (r14): byte-level BPE behind the
    ASCII-explicit regex pre-tokenizer — contractions split off, one
    leading space rides the word, whitespace runs are in-band tokens,
    so decode is a LOSSLESS inverse (pinned in tests/test_tokenize.py).
    The oracle swaps only the words step of the shared recursive-CTE
    replay to ``regexp_extract_all`` with the same pattern: Python re
    (spec), Java regex (Spark executors), and RE2 (DuckDB) all
    tokenize identically because every class is explicit ASCII."""
    from olive_spark.ops import tokenize

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    enc = tokenize.bpe_encode(docs, bpe=tokenize.default_bpe_gpt2())
    ids = F.col("token_ids")
    ck = F.when(F.size(ids) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.zip_with(
                ids, F.sequence(F.lit(1), F.size(ids)),
                lambda t, i: i.cast("long") * t.cast("long"),
            ),
            F.lit(0).cast("long"), lambda a, x: a + x,
        )
    )
    return enc.select(
        "doc_id",
        F.size(textstats.tokens(F.col("text"))).alias("n_ws"),
        F.col("n_tokens_bpe").alias("n_bpe"),
        ck.alias("ids_ck"),
    )


def _sql_token_count_gpt2() -> str:
    from olive_spark.ops.tokenize import default_bpe_gpt2

    return _bpe_cte(default_bpe_gpt2()) + _SQL_TOKEN_COUNT_TAIL


_TRAIN_MERGES = 16


def llm_bpe_train_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """TRAIN BPE on the corpus with the HYBRID trainer (r14, VERDICT
    r13 task #4, driver-gated): the first 16 merges learned from the
    documents table by train_bpe_distributed.  Honest gate scope
    (ADVICE r14): at this corpus' ~31 distinct words the trainer's
    small-state cutover (local_threshold) iterates the merge loop
    driver-local after the one distributed word-count — so this gate
    pins the trainer's RESULT and its word-count aggregation, while
    the full Spark pair-count/fold loop is pinned by
    tests/test_tokenize.py (local_threshold=0 parity + 10× scale
    smoke).  Above the threshold the loop runs distributed: pair
    counting as Spark aggregations, one 2-field argmax row to the
    driver per merge, merge application as a JVM array fold.  The
    same-result property is the cutover's contract.  The oracle replays
    the ENTIRE TRAINING LOOP as a DuckDB recursive CTE: state = one
    row per iteration carrying every word's symbol sequence; the best
    pair is the same max-count/lexicographic argmax; the merge applies
    via a separator-framed string REPLACE (left-to-right
    non-overlapping — exactly the trainer's scan).  A trainer that
    miscounts a pair, breaks a tie differently, or merges overlapping
    occurrences diverges at some rank and hash-mismatches."""
    from olive_spark.ops import tokenize

    docs = data.load(spark, sf, "documents", columns=["text"])
    b = tokenize.train_bpe_distributed(
        spark, docs, vocab_size=1 << 20, max_merges=_TRAIN_MERGES
    )
    rows = [(i, f"{l} {r}") for i, (l, r) in enumerate(b["merges"])]
    return spark.createDataFrame(rows, schema="rank int, pair string")


def _sql_bpe_train_corpus() -> str:
    # Framing separator (absent from the corpus text).  Symbols join
    # with a DOUBLED separator and the pattern consumes exactly one of
    # the pair, so the boundary survives for the next adjacent match:
    # with a single separator, adjacent occurrences of the winning pair
    # share it and REPLACE treats them as overlapping — 'a b a b'
    # would merge only the first (ab, a, b) instead of the trainer's
    # left-to-right scan (ab, ab) (ADVICE r14, fixed r15; pinned by
    # tests/test_tokenize.py::test_trainer_oracle_agrees_on_adjacent_pairs).
    sep = "\x1e"
    return rf"""
WITH RECURSIVE
words AS (
  SELECT w AS word, count(*)::BIGINT AS c FROM (
    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '')) AS w
    FROM documents
  ) GROUP BY w
),
init AS (
  SELECT list({{s: string_split(word, '') || ['</w>'], c: c}}
              ORDER BY word) AS seqs
  FROM words
),
state(iter, seqs, merges, done) AS (
  SELECT 0, seqs, []::VARCHAR[], false FROM init
  UNION ALL
  SELECT iter + 1,
    CASE WHEN best.l IS NULL THEN seqs ELSE
      list_transform(seqs, w -> {{
        s: list_filter(string_split(
             replace('{sep}' || array_to_string(w.s, '{sep}{sep}') || '{sep}',
                     '{sep}' || best.l || '{sep}{sep}' || best.r || '{sep}',
                     '{sep}' || best.l || best.r || '{sep}'),
             '{sep}'), x -> x <> ''),
        c: w.c }})
    END,
    CASE WHEN best.l IS NULL THEN merges
         ELSE merges || [best.l || ' ' || best.r] END,
    best.l IS NULL
  FROM (
    SELECT iter, seqs, merges,
      (SELECT {{l: q.l, r: q.r}} FROM (
         SELECT l, r, SUM(c) AS n FROM (
           SELECT u.pr.l AS l, u.pr.r AS r, u.c AS c
           FROM (
             SELECT unnest(list_transform(range(1, len(w.s)::BIGINT),
                    j -> {{l: w.s[j::INT], r: w.s[j::INT + 1]}})) AS pr,
                    w.c AS c
             FROM unnest(seqs) AS t(w)
           ) u
         ) GROUP BY l, r
         HAVING SUM(c) >= 2
         ORDER BY n DESC, l, r LIMIT 1
      ) q) AS best
    FROM state WHERE NOT done AND iter < {_TRAIN_MERGES}
  )
)
SELECT CAST(i - 1 AS INT) AS rank, m.merges[i::INT] AS pair
FROM (SELECT merges FROM state ORDER BY iter DESC LIMIT 1) m,
     UNNEST(range(1, len(m.merges)::BIGINT + 1)) AS u(i)
"""


def llm_pack_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-wise sequence packing budgeted in REAL subword tokens
    (the second curation opt-in, r13): pack_sequences_sharded with
    ``n_tokens_col=bpe_token_count_col`` — 512-token packs, 100-doc id
    shards, pack ids offset by earlier shards' pack counts exactly as
    the whitespace variant.  BPE counts run ~1.6× whitespace here, so
    pack boundaries land visibly differently; the oracle recomputes
    counts through the recursive-CTE merge-loop replay and applies the
    identical shard math."""
    from olive_spark.ops import tokenize

    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    packed = curation.pack_sequences_sharded(
        df, capacity=512, shard_size=100,
        n_tokens_col=tokenize.bpe_token_count_col(df),
    )
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


SQL_PACK_BPE = _bpe_cte() + """,
tcounts AS (
  SELECT d.doc_id, CAST(FLOOR(d.doc_id / 100) AS BIGINT) AS shard,
    CAST(coalesce(len(p.ids), 0) AS INT) AS n_tokens
  FROM documents d LEFT JOIN per_doc p USING (doc_id)),
off AS (
  SELECT shard, CAST(COALESCE(SUM(GREATEST(
      CAST(FLOOR((total + 511) / 512) AS BIGINT), 1)) OVER (
    ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    AS BIGINT) AS pack_off
  FROM (SELECT shard, SUM(n_tokens) AS total FROM tcounts GROUP BY shard)),
packed AS (
  SELECT t.doc_id, t.n_tokens,
    o.pack_off + CAST(FLOOR(COALESCE(SUM(t.n_tokens) OVER (
      PARTITION BY t.shard ORDER BY t.doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT)
    AS pack_id
  FROM tcounts t JOIN off o USING (shard))
SELECT pack_id, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, MIN(doc_id) AS first_doc
FROM packed GROUP BY pack_id
"""


def llm_tokenize_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenized context-window shards (ops/tokenize.chunk_token_ids,
    r13): every document BPE-encoded and its id stream split into
    ≤64-token chunks — the artifact a pretraining pipeline actually
    emits (mid-word splits included; sequences are id streams).  Each
    chunk reports count, boundary ids, and the positional checksum, so
    a shifted boundary, a dropped tail chunk, or a mis-merged word
    anywhere in the stream hash-mismatches against the oracle's
    recursive-CTE + list-slice replay."""
    from olive_spark.ops import tokenize

    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    ch = tokenize.chunk_token_ids(docs, capacity=64)
    ids = F.col("token_ids")
    ck = F.aggregate(
        F.zip_with(
            ids, F.sequence(F.lit(1), F.size(ids)),
            lambda t, i: i.cast("long") * t.cast("long"),
        ),
        F.lit(0).cast("long"), lambda a, x: a + x,
    )
    return ch.select(
        "doc_id", "chunk_id", "n_tokens",
        F.element_at(ids, 1).alias("first_id"),
        F.element_at(ids, -1).alias("last_id"),
        ck.alias("ids_ck"),
    )


SQL_TOKENIZE_CHUNKS = _bpe_cte() + """,
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_id,
    list_slice(ids, CAST(i * 64 + 1 AS BIGINT),
               CAST(least((i + 1) * 64, len(ids)) AS BIGINT)) AS cids
  FROM per_doc,
    UNNEST(range(0, CAST(ceil(len(ids) / 64.0) AS BIGINT))) AS u(i)
  WHERE len(ids) > 0
)
SELECT doc_id, chunk_id, CAST(len(cids) AS INT) AS n_tokens,
  CAST(cids[1] AS INT) AS first_id,
  CAST(cids[CAST(len(cids) AS INT)] AS INT) AS last_id,
  CAST(list_sum(list_transform(range(1, CAST(len(cids) AS BIGINT) + 1),
    j -> j * cids[CAST(j AS INT)])) AS BIGINT) AS ids_ck
FROM chunks
"""


def llm_budget_mix_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """The BPE opt-in END-TO-END (r13, VERDICT r12 task #1): the same
    per-source longest-first token-budget mix as llm_token_budget_mix,
    but budgeted in REAL subword tokens — ``token_budget_mix(...,
    n_tokens_col=bpe_token_count_col(df))``.  BPE counts run ~1.6× the
    whitespace counts on this corpus, so the same 800-token budget
    selects a visibly different document set; the oracle recomputes
    the counts through the recursive-CTE merge-loop replay and applies
    the identical window — a mis-merged word, a count drift, or a
    broken opt-in plumbing path shifts the selection and
    hash-mismatches."""
    from olive_spark.ops import tokenize

    df = data.load(
        spark, sf, "documents", columns=["doc_id", "text", "source"],
    )
    return curation.token_budget_mix(
        df, budget_per_source=800,
        n_tokens_col=tokenize.bpe_token_count_col(df),
    )


SQL_BUDGET_MIX_BPE = _bpe_cte() + """,
counts AS (
  SELECT d.doc_id, d.source,
    CAST(coalesce(len(p.ids), 0) AS INT) AS n_tokens
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
SELECT source, doc_id, n_tokens, cum_tokens FROM (
  SELECT source, doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY source
      ORDER BY n_tokens DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM counts)
WHERE cum_tokens <= 800
"""


def llm_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Composite training-data curation pipeline: quality gate (token/char
    bounds) → fingerprint dedup (keep lowest doc_id) → per-language doc
    and token budget. Integer-only outputs so the oracle is exact."""
    from pyspark.sql.window import Window

    df = data.load(spark, sf, "documents", columns=["doc_id", "lang", "text"])
    toks = textstats.tokens(F.col("text"))
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    staged = df.select(
        "doc_id", "lang",
        F.size(toks).alias("n_tok"),
        F.length("text").alias("len"),
        F.md5(norm).alias("fp"),
    )
    gated = staged.filter((F.col("n_tok") >= 10) & (F.col("len") <= 20000))
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


SQL_CURATION = (
    "WITH t AS (SELECT doc_id, lang, "
    "CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tok, "
    "LENGTH(text) AS len, "
    "md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp FROM documents), "
    "f AS (SELECT * FROM t WHERE n_tok >= 10 AND len <= 20000), "
    "d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f) "
    "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens "
    "FROM d WHERE rn = 1 GROUP BY lang"
)


def mm_decode_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal decode plumbing: binary payload → Arrow-batched
    mapInPandas metadata extraction. Decoder is a deterministic stub, so
    the oracle reproduces it arithmetically from the byte length."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return multimodal.decode_metadata(multimodal.attach_binary_payload(df))


SQL_MM_DECODE = (
    "SELECT doc_id, "
    "CAST(strlen(text) AS INT) AS n_bytes, "
    "CAST(strlen(text) % 512 + 16 AS INT) AS width, "
    "CAST((strlen(text) * 7) % 512 + 16 AS INT) AS height, "
    "CAST(strlen(text) % 30 + 1 AS INT) AS n_frames, "
    "TRUE AS ok "
    "FROM documents"
)


def mm_phash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash image near-dup (ops.multimodal.phash64 +
    phash_pairs): payload → 32² stub decode → 2-D DCT → 64-bit sign
    hash; pairs via byte-band blocking (pigeonhole-complete for
    hamming < bands) + exact JVM bit_count filter — the image-side
    MinHash.  Rows-only: the DCT is not ANSI-SQL-expressible; the
    corpus plants its own duplicates (texts are unique in the raw
    table): every doc_id % 101 == 0 re-appears at +10⁷ byte-identical
    (must pair at hamming 0) and at +2·10⁷ with one byte flipped
    (must pair within the radius) — 0 pairs would mean broken banding
    (pytest pins the planted-pair semantics and the completeness
    guard)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    planted = df.filter(F.col("doc_id") % 101 == 0)
    corpus = df.unionByName(
        planted.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    ).unionByName(
        planted.select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.concat(F.lit("x"), F.substring(F.col("text"), 2, 1 << 20))
            .alias("text"),  # flip the first byte, keep the length
        )
    )
    hashes = multimodal.phash64(multimodal.attach_binary_payload(corpus))
    return multimodal.phash_pairs(hashes, max_hamming=6).orderBy(
        "a_id", "b_id"
    )


def mm_image_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Image resize plumbing: payload → aspect-preserving 64-box thumb
    dims via Arrow-batched mapInPandas (decoder stubbed; integer resize
    math is reproduced by the oracle)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return multimodal.image_resize(multimodal.attach_binary_payload(df))


SQL_MM_RESIZE = (
    "WITH d AS (SELECT doc_id, strlen(text) % 512 + 16 AS w, "
    "(strlen(text) * 7) % 512 + 16 AS h FROM documents) "
    "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
    "CAST(CASE WHEN w >= h THEN 64 ELSE GREATEST(1, w * 64 // h) END AS INT) AS out_w, "
    "CAST(CASE WHEN w >= h THEN GREATEST(1, h * 64 // w) ELSE 64 END AS INT) AS out_h, "
    "CAST((CASE WHEN w >= h THEN 64 ELSE GREATEST(1, w * 64 // h) END) * "
    "(CASE WHEN w >= h THEN GREATEST(1, h * 64 // w) ELSE 64 END) AS INT) AS n_thumb_bytes "
    "FROM d"
)


def mm_audio_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Audio analysis-window plumbing: payload → strided 1024/512 window
    counts via Arrow-batched mapInPandas (DSP stubbed; the sample math
    is reproduced arithmetically by the oracle)."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return multimodal.audio_windows(multimodal.attach_binary_payload(df))


SQL_MM_AUDIO = (
    "SELECT doc_id, "
    "CAST(strlen(text) // 2 AS BIGINT) AS n_samples, "
    "CAST(CASE WHEN strlen(text) // 2 < 1024 THEN 0 "
    "ELSE (strlen(text) // 2 - 1024) // 512 + 1 END AS BIGINT) AS n_windows "
    "FROM documents"
)


def mm_decode_png_real(spark: SparkSession, sf: str) -> DataFrame:
    """REAL-codec image decode, driver-gated: the documents_media table
    carries actual PNG bytes (Sub/Up-filtered scanlines, CRC-bearing
    chunks, zlib IDAT — planted at fixture time as a pure function of
    doc_id, queries/data.py), and this query decodes them with the
    stdlib-only PNG decoder (ops/media_codecs.py).  The oracle
    recomputes width/height/bit_depth AND the decoded pixel sum
    integer-exactly from doc_id — a decoder that skips CRCs, mis-parses
    a chunk, or botches filter reconstruction hash-mismatches here, not
    just in a skip-marked unit test."""
    df = data.load(spark, sf, "documents_media", columns=["doc_id", "png"])
    return multimodal.decode_png_meta(df)


SQL_MM_PNG_REAL = (
    "SELECT doc_id, "
    "CAST(doc_id % 48 + 4 AS INT) AS width, "
    "CAST((doc_id * 3) % 48 + 4 AS INT) AS height, "
    "CAST(8 AS INT) AS bit_depth, "
    "CAST(list_sum(flatten(list_transform(range(0, (doc_id * 3) % 48 + 4), "
    "y -> list_transform(range(0, doc_id % 48 + 4), "
    "x -> (doc_id + x + 2 * y) % 256)))) AS BIGINT) AS px_sum, "
    "TRUE AS ok "
    "FROM documents"
)


def mm_audio_wav_real(spark: SparkSession, sf: str) -> DataFrame:
    """REAL-codec audio decode, driver-gated: documents_media's wav
    column holds stdlib-written RIFF/WAVE PCM16 files; this query
    parses the container (frames, channels, rate) and sums the decoded
    int16 stream.  The oracle recomputes all of it from doc_id — a
    parser that drops frames or misreads the fmt chunk hash-mismatches."""
    df = data.load(spark, sf, "documents_media", columns=["doc_id", "wav"])
    return multimodal.decode_wav_meta(df)


SQL_MM_WAV_REAL = (
    "SELECT doc_id, "
    "CAST(doc_id % 1000 + 100 AS BIGINT) AS n_frames, "
    "CAST(doc_id % 2 + 1 AS INT) AS n_channels, "
    "CAST(8000 + (doc_id % 3) * 4000 AS INT) AS framerate, "
    "CAST(list_sum(list_transform(range(0, (doc_id % 1000 + 100) * (doc_id % 2 + 1)), "
    "i -> (doc_id + i) % 201 - 100)) AS BIGINT) AS sample_sum, "
    "CAST(CASE WHEN doc_id % 1000 + 100 < 256 THEN 0 "
    "ELSE (doc_id % 1000 + 100 - 256) // 128 + 1 END AS BIGINT) AS n_windows, "
    "TRUE AS ok "
    "FROM documents"
)


def llm_dedup_substring(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring duplication profile (ops/dedup.
    substring_dup_spans — Lee et al. 2022 suffix-array dedup,
    re-expressed as a Spark fragment-hash sweep): EVERY 16-token window
    (stride 1, the exact-recall mode — duplicates are found regardless
    of their offset in either document); a window duplicated anywhere
    in the corpus marks its span; per doc the UNION of duplicated spans
    over token positions is the dup coverage.  The corpus is augmented
    with a deterministic 20-token family preamble (doc_id % 7) PLUS a
    one-token per-doc phase shim before it on doc_id % 3 == 0, so the
    preamble run sits at OFFSET 0 or 1 depending on the doc — a
    stride-anchored scan would miss every cross-phase pair; the stride=1
    sweep must cover the full 20-token preamble in every doc.  The 0.3
    flag threshold splits the corpus on length — both branches live at
    sf0.01 (short docs flag, long docs don't)."""
    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    pre = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.concat(
                F.lit("p"), (F.col("doc_id") % 7).cast("string"),
                F.lit("t"), i.cast("string"),
            ),
        ),
    )
    shim = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("shim"), (F.col("doc_id") % 11).cast("string"), F.lit(" ")),
    ).otherwise(F.lit(""))
    aug = docs.select(
        "doc_id",
        F.concat(shim, F.concat_ws(" ", pre, F.col("text"))).alias("text"),
    )
    return dedup.substring_dup_spans(
        aug, width=16, stride=1, min_count=2, flag_coverage=0.3
    )


def llm_dedup_span_removal(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT-SUBSTRING REMOVAL (ops/dedup.remove_dup_spans — the
    second half of Lee et al. 2022: excise every duplicated 16-token
    window, keeping the corpus-wide canonical (min doc_id, min offset)
    copy).  Same shim+preamble fixture as llm_dedup_substring, so each
    ~70-doc family's preamble survives in exactly ONE document and is
    cut from every other — cross-phase (the shim offsets the run by
    one token in a third of the docs), intra-doc, and boundary cases
    all live at sf0.01.  The oracle replays the full rule in SQL
    including the reconstructed clean text, so a removal that excised
    the canonical copy, missed a phase-shifted occurrence, or
    re-joined tokens off by one position hash-mismatches."""
    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    pre = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.concat(
                F.lit("p"), (F.col("doc_id") % 7).cast("string"),
                F.lit("t"), i.cast("string"),
            ),
        ),
    )
    shim = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("shim"), (F.col("doc_id") % 11).cast("string"), F.lit(" ")),
    ).otherwise(F.lit(""))
    aug = docs.select(
        "doc_id",
        F.concat(shim, F.concat_ws(" ", pre, F.col("text"))).alias("text"),
    )
    return dedup.remove_dup_spans(aug, width=16, min_count=2)


SQL_DEDUP_SPAN_REMOVAL = (
    "WITH aug AS (SELECT doc_id, "
    "  (CASE WHEN doc_id % 3 = 0 THEN 'shim' || (doc_id % 11) || ' ' "
    "   ELSE '' END) || "
    "  array_to_string(list_transform(range(1, 21), "
    "    i -> 'p' || (doc_id % 7) || 't' || i), ' ') || ' ' || text AS t "
    "  FROM documents), "
    "tok AS (SELECT doc_id, "
    "  list_filter(string_split_regex(trim(t), '\\s+'), x -> x <> '') AS w "
    "  FROM aug), "
    "fr AS (SELECT doc_id, CAST(k AS BIGINT) AS k, "
    "  array_to_string(w[k+1 : k+16], ' ') AS frag "
    "  FROM tok, UNNEST(range(0, CAST(len(w)-16 AS BIGINT)+1)) AS u(k) "
    "  WHERE len(w) >= 16), "
    "oc AS (SELECT frag, COUNT(*) AS c, MIN(doc_id) AS od FROM fr "
    "  GROUP BY frag), "
    "own AS (SELECT fr.frag, fr.doc_id AS od, MIN(fr.k) AS ok FROM fr "
    "  JOIN oc ON fr.frag = oc.frag AND fr.doc_id = oc.od "
    "  WHERE oc.c >= 2 GROUP BY fr.frag, fr.doc_id), "
    "rm AS (SELECT fr.doc_id, fr.k FROM fr JOIN own "
    "  ON fr.frag = own.frag "
    "  WHERE NOT (fr.doc_id = own.od AND fr.k = own.ok)), "
    "rmpos AS (SELECT DISTINCT doc_id, p FROM rm, "
    "  UNNEST(range(k+1, k+17)) AS v(p)), "
    "tokpos AS (SELECT doc_id, p, w[p] AS tok FROM tok, "
    "  UNNEST(range(1, CAST(len(w) AS BIGINT)+1)) AS v(p)), "
    "kept AS (SELECT t.doc_id, t.p, t.tok FROM tokpos t "
    "  LEFT JOIN rmpos r ON t.doc_id = r.doc_id AND t.p = r.p "
    "  WHERE r.p IS NULL) "
    "SELECT tok.doc_id, CAST(len(tok.w) AS BIGINT) AS n_tokens, "
    "  CAST(COALESCE(rc.c, 0) AS BIGINT) AS n_removed, "
    "  COALESCE(ks.txt, '') AS clean_text "
    "FROM tok "
    "LEFT JOIN (SELECT doc_id, COUNT(*) AS c FROM rmpos GROUP BY doc_id) rc "
    "  ON tok.doc_id = rc.doc_id "
    "LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS txt "
    "  FROM kept GROUP BY doc_id) ks ON tok.doc_id = ks.doc_id"
)


SQL_DEDUP_SUBSTRING = (
    "WITH aug AS (SELECT doc_id, "
    "  (CASE WHEN doc_id % 3 = 0 THEN 'shim' || (doc_id % 11) || ' ' "
    "   ELSE '' END) || "
    "  array_to_string(list_transform(range(1, 21), "
    "    i -> 'p' || (doc_id % 7) || 't' || i), ' ') || ' ' || text AS t "
    "  FROM documents), "
    "tok AS (SELECT doc_id, "
    "  list_filter(string_split_regex(trim(t), '\\s+'), x -> x <> '') AS w "
    "  FROM aug), "
    "fr AS (SELECT doc_id, len(w) AS n_tokens, CAST(k AS BIGINT) AS k, "
    "  array_to_string(w[k+1 : k+16], ' ') AS frag "
    "  FROM tok, UNNEST(range(0, CAST(len(w)-16 AS BIGINT)+1)) "
    "    AS u(k) WHERE len(w) >= 16), "
    "dup AS (SELECT frag FROM fr GROUP BY frag HAVING COUNT(*) >= 2), "
    "mk AS (SELECT fr.doc_id, fr.n_tokens, fr.k, "
    "  (fr.frag IN (SELECT frag FROM dup)) AS is_dup FROM fr), "
    "cov AS (SELECT doc_id, COUNT(DISTINCT p) AS c FROM mk, "
    "  UNNEST(range(k+1, k+17)) AS v(p) WHERE is_dup GROUP BY doc_id) "
    "SELECT mk.doc_id, MIN(mk.n_tokens) AS n_tokens, "
    "  COUNT(*) AS n_frag, "
    "  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, "
    "  CAST(LEAST(COALESCE(MIN(cov.c), 0), MIN(mk.n_tokens)) AS DOUBLE) "
    "    / MIN(mk.n_tokens) AS dup_cov, "
    "  (CAST(LEAST(COALESCE(MIN(cov.c), 0), MIN(mk.n_tokens)) AS DOUBLE) "
    "    / MIN(mk.n_tokens)) >= 0.3 AS flagged "
    "FROM mk LEFT JOIN cov ON mk.doc_id = cov.doc_id GROUP BY mk.doc_id"
)


QUERIES: dict[str, tuple] = {
    "llm_dedup_exact": (llm_dedup_exact, SQL_DEDUP_EXACT),
    "llm_dedup_substring": (llm_dedup_substring, SQL_DEDUP_SUBSTRING),
    "llm_dedup_span_removal": (
        llm_dedup_span_removal, SQL_DEDUP_SPAN_REMOVAL,
    ),
    "mm_phash_pairs": (mm_phash_pairs, None),
    "mm_decode_png_real": (mm_decode_png_real, SQL_MM_PNG_REAL),
    "mm_audio_wav_real": (mm_audio_wav_real, SQL_MM_WAV_REAL),
    "mm_audio_windows": (mm_audio_windows, SQL_MM_AUDIO),
    "mm_image_resize": (mm_image_resize, SQL_MM_RESIZE),
    "llm_dedup_incremental": (llm_dedup_incremental, SQL_DEDUP_INCR),
    "llm_dedup_index_update": (
        llm_dedup_index_update, SQL_DEDUP_INDEX_UPDATE,
    ),
    "llm_dedup_minhash": (llm_dedup_minhash, None),
    "llm_neardup_incremental": (llm_neardup_incremental, None),
    "llm_keyword_search": (llm_keyword_search, SQL_KEYWORD_SEARCH),
    "llm_search_after_compact": (
        llm_search_after_compact, SQL_SEARCH_AFTER_COMPACT,
    ),
    "llm_phrase_search": (llm_phrase_search, SQL_PHRASE_SEARCH),
    "llm_bm25_search": (llm_bm25_search, SQL_BM25_SEARCH),
    "llm_graph_pagerank": (llm_graph_pagerank, None),
    "llm_dedup_simhash": (llm_dedup_simhash, None),
    "llm_dedup_ngram": (llm_dedup_ngram, None),
    "llm_dedup_embedding": (llm_dedup_embedding, None),
    "llm_dedup_semantic": (llm_dedup_semantic, None),
    "llm_similarity_topk": (llm_similarity_topk, SQL_SIMILARITY_TOPK),
    "llm_similarity_arrow": (llm_similarity_arrow, SQL_SIMILARITY_TOPK),
    "llm_similarity_ivf": (llm_similarity_ivf, None),
    "llm_similarity_ivf_persisted": (llm_similarity_ivf_persisted, None),
    "llm_similarity_pq_persisted": (llm_similarity_pq_persisted, None),
    "mm_frame_sample": (mm_frame_sample, SQL_MM_FRAMES),
    "llm_text_stats": (llm_text_stats, SQL_TEXT_STATS),
    "llm_quality_score": (llm_quality_score, SQL_QUALITY),
    "llm_lang_id": (llm_lang_id, SQL_LANG_ID),
    "llm_fingerprint": (llm_fingerprint, SQL_FINGERPRINT),
    "llm_token_count": (llm_token_count, SQL_TOKEN_COUNT),
    "llm_token_count_bpe": (llm_token_count_bpe, SQL_TOKEN_COUNT_BPE),
    "llm_token_count_bpe_bytes": (
        llm_token_count_bpe_bytes, _sql_token_count_bpe_bytes()
    ),
    "llm_bpe_train_corpus": (
        llm_bpe_train_corpus, _sql_bpe_train_corpus()
    ),
    "llm_token_count_gpt2": (
        llm_token_count_gpt2, _sql_token_count_gpt2()
    ),
    "llm_lsh_ingest_txn": (llm_lsh_ingest_txn, SQL_LSH_INGEST_TXN),
    "llm_budget_mix_bpe": (llm_budget_mix_bpe, SQL_BUDGET_MIX_BPE),
    "llm_tokenize_chunks": (llm_tokenize_chunks, SQL_TOKENIZE_CHUNKS),
    "llm_pack_bpe": (llm_pack_bpe, SQL_PACK_BPE),
    "llm_curation_pipeline": (llm_curation_pipeline, SQL_CURATION),
    "llm_dsir_weights": (llm_dsir_weights, SQL_DSIR_WEIGHTS),
    "mm_decode_meta": (mm_decode_meta, SQL_MM_DECODE),
}
