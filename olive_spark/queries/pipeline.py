"""Training-data-pipeline query surface: PII redaction, deterministic
stratified sampling, vocabulary/n-gram statistics, benchmark
contamination, length percentiles.

All operators are built-in-function compositions (olive_spark.ops.
curation) — no Python UDFs — and each carries a DuckDB oracle, so the
driver's hash gate checks exact semantics, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from olive_spark.ops import curation
from olive_spark.queries import data


def llm_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Regex PII masking over the documents_pii table (synthetic emails/
    phones appended as a pure function of doc_id — see queries.data)."""
    df = data.load(spark, sf, "documents_pii", columns=["doc_id", "text_pii"])
    return curation.pii_redact(df, "text_pii").select(
        "doc_id", "n_emails", "n_phones", "redacted"
    )


SQL_PII_REDACT = (
    "SELECT doc_id, "
    "length(regexp_extract_all(text_pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS n_emails, "
    "length(regexp_extract_all(text_pii, '555-[0-9]+')) AS n_phones, "
    "regexp_replace(regexp_replace(text_pii, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'555-[0-9]+', '<PHONE>', 'g') AS redacted "
    "FROM (SELECT doc_id, text || ' contact user' || doc_id || "
    "'@example.com or call 555-0' || (doc_id % 10000) || '.' AS text_pii "
    "FROM documents)"
)


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SEED = 42


def _split_cuts() -> "list[tuple[str, str]]":
    """Cumulative hex thresholds, computed with the SAME accumulation
    loop as ops.curation.hash_split so the oracle can never drift from
    the operator by a floating-point ulp."""
    names = list(_SPLIT_WEIGHTS)
    acc, cuts = 0.0, []
    for n in names[:-1]:
        acc += _SPLIT_WEIGHTS[n]
        cuts.append((n, format(int(acc * (1 << 32)), "08x")))
    return cuts


def llm_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """Seeded hash train/val/test assignment
    (ops.curation.hash_split): split decided by the first 8 md5-hex
    chars of "<doc_id>:<seed>" against cumulative-weight thresholds —
    identical on every run/engine/partitioning, which is the whole
    point (randomSplit() re-deals per run and per layout).  md5 hex is
    engine-portable, so the oracle replays the EXACT assignment in
    DuckDB; the aggregate checks counts AND membership (sum of ids)
    per split."""
    from olive_spark.ops.curation import hash_split

    docs = data.load(spark, sf, "documents", columns=["doc_id"])
    out = hash_split(docs, "doc_id", _SPLIT_WEIGHTS, seed=_SPLIT_SEED)
    return out.groupBy("split").agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("sum_ids"),
    )


def _sql_train_split() -> str:
    cuts = _split_cuts()
    case = "CASE"
    for n, c in cuts:
        case += f" WHEN hx < '{c}' THEN '{n}'"
    case += f" ELSE '{list(_SPLIT_WEIGHTS)[-1]}' END"
    return (
        "WITH h AS (SELECT doc_id, "
        f"substring(md5(CAST(doc_id AS VARCHAR) || ':{_SPLIT_SEED}'), 1, 8)"
        " AS hx FROM documents) "
        f"SELECT split, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids "
        f"FROM (SELECT doc_id, {case} AS split FROM h) GROUP BY split"
    )


SQL_TRAIN_SPLIT = _sql_train_split()


def llm_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language sampling (en kept at 10%, others at
    50%) — modulo on doc_id, reproducible across engines and runs."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "lang", "n_chars"])
    sampled = curation.stratified_sample(
        df, "lang", "doc_id", {"en": 10}, default_rate=50
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.sum("n_chars").alias("sum_chars"),
    )


SQL_STRATIFIED = (
    "SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
    "FROM documents "
    "WHERE doc_id % 100 < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END) "
    "GROUP BY lang"
)


def llm_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary histogram, top 40 (tie-broken by word)."""
    df = data.load(spark, sf, "documents", columns=["text"])
    return curation.vocab_topk(df, "text", k=40)


SQL_VOCAB = (
    "SELECT word, COUNT(*) AS n FROM ("
    "SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents"
    ") WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 40"
)


def llm_ngram_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Word-bigram histogram, top 30 — JVM higher-order transform, no
    UDF."""
    df = data.load(spark, sf, "documents", columns=["text"])
    return curation.bigram_topk(df, "text", k=30)


SQL_NGRAM = (
    "SELECT bigram, COUNT(*) AS n FROM ("
    "SELECT unnest(list_transform(range(2, len(w) + 1), "
    "i -> w[i - 1] || ' ' || w[i])) AS bigram "
    "FROM (SELECT list_filter(string_split_regex(text, '\\s+'), "
    "x -> x <> '') AS w FROM documents) WHERE len(w) >= 2"
    ") GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30"
)


def llm_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-leakage scan: docs sharing an 8-word prefix fingerprint
    with the held-out set (doc_id % 11 = 0), counted per source; the
    benchmark fingerprints broadcast, the corpus never shuffles."""
    docs = data.load(spark, sf, "documents", columns=["doc_id", "text", "source"])
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    return curation.contamination_check(corpus, bench, "text", n_words=8)


SQL_CONTAMINATION = (
    "SELECT source, COUNT(*) AS n_contaminated FROM documents d "
    "JOIN (SELECT DISTINCT array_to_string(string_split(text, ' ')[1:8], ' ') AS h "
    "FROM documents WHERE doc_id % 11 = 0) b "
    "ON array_to_string(string_split(d.text, ' ')[1:8], ' ') = b.h "
    "WHERE d.doc_id % 11 <> 0 GROUP BY source"
)


def llm_length_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact length percentiles per language (quality-gate thresholds
    are usually set from these).  Integer inputs → the interpolated
    quantiles are exact dyadic fractions, identical in both engines."""
    from pyspark.sql.window import Window as W

    df = data.load(spark, sf, "documents", columns=["lang", "n_chars"])
    # Value-histogram order statistics instead of F.percentile: Spark's
    # exact percentile buffers EVERY group value in executor memory (a
    # 100 TB hazard); the histogram shuffles only (lang, value, count)
    # rows, bounded by the distinct-length count.  Type-7 interpolation
    # x[l] + frac·(x[l+1]−x[l]) with l = floor((n−1)·q) reproduces both
    # engines' quantile_cont exactly (frac ∈ {0,¼,½,¾} — exact doubles).
    hist = df.groupBy("lang", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    wcum = W.partitionBy("lang").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy("lang").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    vals = hist.select(
        "lang", "v", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    qs = (("p25", 1), ("p50", 2), ("p75", 3))  # quarters
    aggs = []
    for name, num in qs:
        pos = (F.col("n") - 1) * num  # position in units of 1/4
        idx = F.floor(pos / 4).cast("long")
        rem = (pos - idx * 4).cast("long")
        aggs.append(
            F.min(F.when(F.col("cum") >= idx + 1, F.col("v"))).alias(f"_{name}_lo")
        )
        aggs.append(
            F.min(F.when(F.col("cum") >= idx + 2, F.col("v"))).alias(f"_{name}_hi")
        )
        aggs.append(F.first(rem).alias(f"_{name}_rem"))
    stats = vals.groupBy("lang").agg(*aggs, F.sum("cnt").alias("n"))
    cols = ["lang"]
    for name, _num in qs:
        lo = F.col(f"_{name}_lo").cast("double")
        hi = F.coalesce(F.col(f"_{name}_hi"), F.col(f"_{name}_lo")).cast("double")
        frac = F.col(f"_{name}_rem").cast("double") / 4.0
        cols.append((lo + frac * (hi - lo)).alias(f"{name}_chars"))
    cols.append("n")
    return stats.select(*cols)


SQL_LENGTH_PCT = (
    "SELECT lang, quantile_cont(n_chars, 0.25) AS p25_chars, "
    "quantile_cont(n_chars, 0.5) AS p50_chars, "
    "quantile_cont(n_chars, 0.75) AS p75_chars, "
    "COUNT(*) AS n FROM documents GROUP BY lang"
)


def llm_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document repetition gate: distinct-word / total-word ratio
    per doc (boilerplate and degenerate generations score low).  The
    ratio is a division of two small ints — bit-identical IEEE doubles
    in both engines — and the gate keeps docs under 0.5."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text", "source"])
    w = curation.words("text")
    ratio = F.size(F.array_distinct(w)).cast("double") / F.size(w)
    return (
        df.select("doc_id", "source", F.round(ratio, 9).alias("distinct_ratio"))
        .filter(F.col("distinct_ratio") < 0.5)
    )


SQL_REPETITION = (
    "SELECT doc_id, source, ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 9) AS distinct_ratio "
    "FROM (SELECT doc_id, source, "
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w "
    "FROM documents) WHERE len(list_distinct(w)) < 0.5 * len(w)"
)


def llm_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-capacity sequence packing for training batches: docs in
    doc_id order are assigned to 4096-token packs by cumulative token
    count (pack = floor(cumsum_before / capacity)); returns per-pack
    doc count and token totals.  All integer window math — exact in
    both engines.  At scale the single global cumsum would serialize;
    partition-wise packing (pack per shard) is the 100 TB variant, this
    query pins the windowed-cumsum semantics."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    from pyspark.sql.window import Window

    ntok = F.size(curation.words("text"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    toks = df.select("doc_id", ntok.alias("n_tokens"))
    packed = toks.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 4096).cast("long"),
    )
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


SQL_PACK = (
    "SELECT pack_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, "
    "MIN(doc_id) AS first_doc FROM ("
    "SELECT CAST(FLOOR(COALESCE(SUM(n_tokens) OVER "
    "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096) AS BIGINT) AS pack_id, "
    "doc_id, n_tokens FROM (SELECT doc_id, "
    "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens "
    "FROM documents)"
    ") GROUP BY pack_id"
)


def llm_decontaminate_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram-overlap decontamination (ops/curation.ngram_decontaminate,
    GPT-3-style): fraction of each corpus doc's distinct 3-grams that
    appear in the held-out set (doc_id % 13 = 0); flagged at >= 10%
    via the integer-cleared compare.  At sf0.01: 408 of 461 docs have
    some overlap, 84 flag — both branches live."""
    docs = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    corpus = docs.filter(F.col("doc_id") % 13 != 0)
    return curation.ngram_decontaminate(
        corpus, bench, n=3, max_overlap_pct=10
    )


SQL_DECONTAMINATE = (
    "WITH tok AS (SELECT doc_id, "
    "  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w "
    "  FROM documents), "
    "gr AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1), "
    "  i -> array_to_string(w[i:i+2], ' '))) AS gs FROM tok WHERE len(w) >= 3), "
    "bench AS (SELECT DISTINCT unnest(gs) AS g FROM gr WHERE doc_id % 13 = 0), "
    "ex AS (SELECT doc_id, unnest(gs) AS g FROM gr WHERE doc_id % 13 <> 0) "
    "SELECT ex.doc_id, COUNT(*) AS total_ngrams, COUNT(b.g) AS matched_ngrams, "
    "  (COUNT(b.g) * 100 >= 10 * COUNT(*)) AS flagged "
    "FROM ex LEFT JOIN bench b ON ex.g = b.g GROUP BY ex.doc_id"
)


def _derived_lines_cols():
    """Shared derivation for the line-based queries: the synthetic docs
    are single-line keyword text, so line structure is synthesized as a
    pure function of (doc_id, text) — reproducible in SQL like the
    documents_pii derivation: a per-doc-family boilerplate footer
    (doc_id % 5 → appears in ~20% of docs, twice per doc), the first 8
    tokens, the footer again, then the remainder."""
    w = F.split(F.col("text"), " ")
    footer = F.concat(F.lit("boilerplate footer "),
                      (F.col("doc_id") % 5).cast("string"))
    head = F.concat_ws(" ", F.slice(w, 1, 8))
    rest = F.concat_ws(" ", F.slice(w, 9, F.greatest(F.size(w), F.lit(1))))
    return F.array_join(F.array(footer, head, footer, rest), "\n")


_SQL_LINES_SRC = (
    "(SELECT doc_id, "
    "  'boilerplate footer ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) || "
    "  array_to_string(w[1:8], ' ') || chr(10) || "
    "  'boilerplate footer ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) || "
    "  array_to_string(w[9:], ' ') AS text_lines "
    "  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))"
)


def llm_dedup_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document line dedup (ops/curation.dedup_lines): the
    injected footer repeats within every doc and must collapse to its
    first occurrence, order preserved — the driver hash-checks every
    cleaned document byte-for-byte."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    lined = df.select("doc_id", _derived_lines_cols().alias("text_lines"))
    return curation.dedup_lines(lined, "text_lines")


SQL_DEDUP_LINES = (
    "SELECT doc_id, len(l) AS n_lines, len(u) AS n_unique, "
    "  array_to_string(u, chr(10)) AS cleaned FROM ("
    "SELECT doc_id, l, list_filter(l, (x, i) -> list_position(l, x) = i) AS u "
    "FROM (SELECT doc_id, string_split(text_lines, chr(10)) AS l "
    f"FROM {_SQL_LINES_SRC}))"
)


def llm_boilerplate_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document boilerplate removal (ops/curation.
    remove_boilerplate_lines): the injected footers appear in ~100 docs
    each at sf0.01 (>= min_docs=10, counted per distinct doc despite
    appearing twice per doc) and are deleted everywhere; the unique
    head/rest lines survive in order."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    lined = df.select("doc_id", _derived_lines_cols().alias("text_lines"))
    return curation.remove_boilerplate_lines(lined, min_docs=10, text_col="text_lines")


SQL_BOILERPLATE = (
    "WITH lines AS (SELECT doc_id, i AS pos, l[i] AS line FROM ("
    "  SELECT doc_id, string_split(text_lines, chr(10)) AS l "
    f"  FROM {_SQL_LINES_SRC}), "
    "  UNNEST(range(1, len(l) + 1)) AS t(i)), "
    "freq AS (SELECT line FROM ("
    "  SELECT line, COUNT(DISTINCT doc_id) AS c FROM lines GROUP BY line) "
    "  WHERE c >= 10) "
    "SELECT doc_id, COUNT(*) AS n_kept, "
    "  array_to_string(list(line ORDER BY pos), chr(10)) AS cleaned "
    "FROM lines WHERE line NOT IN (SELECT line FROM freq) GROUP BY doc_id"
)


def llm_pack_sequences_sharded(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-wise sequence packing (ops/curation.
    pack_sequences_sharded) — the at-scale variant of
    llm_pack_sequences: docs shard by id range (100 docs/shard), each
    shard packs independently to 4096-token packs, pack ids offset by
    the pack counts of earlier shards.  The row-level cumsum window
    partitions by shard (no global sort / SinglePartition exchange —
    plan contract in tests/test_plans.py); the oracle reproduces the
    shard math exactly, so the driver hash-checks pack contents."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    packed = curation.pack_sequences_sharded(
        df, capacity=4096, shard_size=100
    )
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


SQL_PACK_SHARDED = (
    "WITH toks AS ("
    "  SELECT doc_id, CAST(FLOOR(doc_id / 100) AS BIGINT) AS shard, "
    "    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens "
    "  FROM documents), "
    "off AS ("
    "  SELECT shard, CAST(COALESCE(SUM(GREATEST("
    "      CAST(FLOOR((total + 4095) / 4096) AS BIGINT), 1)) OVER ("
    "    ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "    AS BIGINT) AS pack_off "
    "  FROM (SELECT shard, SUM(n_tokens) AS total FROM toks GROUP BY shard)), "
    "packed AS ("
    "  SELECT t.doc_id, t.n_tokens, "
    "    o.pack_off + CAST(FLOOR(COALESCE(SUM(t.n_tokens) OVER ("
    "      PARTITION BY t.shard ORDER BY t.doc_id "
    "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096) AS BIGINT) "
    "    AS pack_id "
    "  FROM toks t JOIN off o USING (shard)) "
    "SELECT pack_id, COUNT(*) AS n_docs, "
    "  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, MIN(doc_id) AS first_doc "
    "FROM packed GROUP BY pack_id"
)


def llm_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clusters via connected components: docs are linked when
    they share a HEAD (first 6 words) or TAIL (last 6 words) prefix
    fingerprint — two overlapping clique families, so real transitive
    closure is required, not just a GROUP BY.  Spark runs iterative
    min-label propagation (olive_spark.ops.graph); the oracle computes
    the same fixpoint with a recursive CTE.  Star edges (doc → group
    min per fingerprint) keep the edge list linear in corpus size."""
    from olive_spark.ops.graph import connected_components
    from pyspark.sql.window import Window

    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    w = F.split(F.col("text"), " ")
    head = F.array_join(F.slice(w, 1, 6), " ")
    tail = F.array_join(
        F.slice(w, F.greatest(F.lit(1), F.size(w) - 5), 6), " "
    )
    edges = None
    for fp in (head, tail):
        grp = Window.partitionBy("fp")
        e = (
            df.select(F.col("doc_id").alias("src"), fp.alias("fp"))
            .withColumn("dst", F.min("src").over(grp))
            .select("src", "dst")
        )
        edges = e if edges is None else edges.union(e)
    cc = connected_components(edges)
    return (
        cc.groupBy(F.col("cluster").alias("cluster_id"))
        .agg(F.count("*").alias("n_docs"), F.max("node").alias("max_doc"))
        .filter(F.col("n_docs") >= 2)
    )


SQL_DEDUP_CLUSTERS = (
    "WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "fps AS ("
    "SELECT doc_id, array_to_string(ws[1:6], ' ') AS fp FROM w "
    "UNION ALL "
    "SELECT doc_id, array_to_string(ws[greatest(1, len(ws) - 5):], ' ') AS fp FROM w), "
    "edges AS ("
    "SELECT DISTINCT a.doc_id AS src, b.m AS dst FROM fps a "
    "JOIN (SELECT fp, MIN(doc_id) AS m FROM fps GROUP BY fp) b USING (fp)), "
    "sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges "
    "UNION SELECT src, src FROM edges), "
    "reach(a, b) AS ("
    "SELECT src, dst FROM sym "
    "UNION "
    "SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src) "
    "SELECT cluster_id, COUNT(*) AS n_docs, MAX(a) AS max_doc FROM ("
    "SELECT a, MIN(b) AS cluster_id FROM reach GROUP BY a) "
    "GROUP BY cluster_id HAVING COUNT(*) >= 2"
)


def llm_dedup_clusters_star(spark: SparkSession, sf: str) -> DataFrame:
    """Same clustering task as llm_dedup_clusters but through the
    alternating large-star/small-star algorithm (ops/graph._cc_star,
    Kiveris et al. "Connected Components in MapReduce" — O(log n)
    rounds vs min-label's O(diameter)): the 100 TB path for graphs with
    long chains.  Shares llm_dedup_clusters' recursive-CTE oracle, so
    the driver value-checks that both algorithms reach the identical
    fixpoint."""
    from pyspark.sql.window import Window

    from olive_spark.ops.graph import connected_components

    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    w = F.split(F.col("text"), " ")
    head = F.array_join(F.slice(w, 1, 6), " ")
    tail = F.array_join(
        F.slice(w, F.greatest(F.lit(1), F.size(w) - 5), 6), " "
    )
    edges = None
    for fp in (head, tail):
        grp = Window.partitionBy("fp")
        e = (
            df.select(F.col("doc_id").alias("src"), fp.alias("fp"))
            .withColumn("dst", F.min("src").over(grp))
            .select("src", "dst")
        )
        edges = e if edges is None else edges.union(e)
    cc = connected_components(edges, algorithm="star")
    return (
        cc.groupBy(F.col("cluster").alias("cluster_id"))
        .agg(F.count("*").alias("n_docs"), F.max("node").alias("max_doc"))
        .filter(F.col("n_docs") >= 2)
    )


def llm_similarity_range(spark: SparkSession, sf: str) -> DataFrame:
    """Radius-neighbor search: all corpus vectors with cosine ≥ 0.3 of
    each query vector (vec_id < 3) — the k-free retrieval variant."""
    from olive_spark.ops import similarity

    corpus = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    queries = corpus.filter(F.col("vec_id") < 3)
    return similarity.cosine_range(corpus, queries, threshold=0.3)


SQL_SIMILARITY_RANGE = (
    "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
    "ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
    "CAST(c.embedding AS DOUBLE[])), 6) AS cosine "
    "FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id "
    "WHERE q.vec_id < 3 AND ROUND(list_cosine_similarity("
    "CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) >= 0.3"
)


def llm_similarity_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (ops/similarity.
    pq_topk): codes + ADC lookup replace corpus dot products; survivors
    re-rank exactly.  Rows-only check (driver-side k-means isn't
    ANSI-SQL); the unit test pins recall ≥ 80% of brute force."""
    from olive_spark.ops import similarity

    # Two separate load() relations: the filtered collect would otherwise
    # poison the shared readInfo cache of the corpus scan (see
    # OliveReader.pushFilters on Spark's per-relation plan caching).
    qdf = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    qrows = [(r["vec_id"], r["embedding"])
             for r in qdf.filter(F.col("vec_id") < 3).collect()]
    corpus = data.load(spark, sf, "embeddings", columns=["vec_id", "embedding"])
    return similarity.pq_topk(corpus, qrows, k=10)


def llm_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 terms by tf-idf with LINEAR idf
    (score = tf · N / df): every input to the score is an exact integer,
    so the IEEE division is bit-identical across engines — no
    transcendental log whose last ulp could flip a ranking.  Two-level
    aggregation: doc-term tf, corpus df, broadcast-joined back."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    from pyspark.sql.window import Window

    n_docs = df.count()
    terms = df.select(
        "doc_id", F.explode(curation.words("text")).alias("word")
    )
    tf = terms.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "word").select(
        "doc_id", "word",
        F.round(F.col("tf") * F.lit(float(n_docs)) / F.col("df"), 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "word")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "word", "score", "rk")
    )


SQL_TFIDF = (
    "WITH terms AS (SELECT doc_id, unnest(list_filter("
    "string_split_regex(text, '\\s+'), x -> x <> '')) AS word FROM documents), "
    "tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM terms GROUP BY doc_id, word), "
    "dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word), "
    "n AS (SELECT COUNT(*) AS n_docs FROM documents) "
    "SELECT doc_id, word, score, rk FROM ("
    "SELECT doc_id, word, "
    "ROUND(tf * (SELECT CAST(n_docs AS DOUBLE) FROM n) / df, 6) AS score, "
    "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "
    "ROUND(tf * (SELECT CAST(n_docs AS DOUBLE) FROM n) / df, 6) DESC, word) AS rk "
    "FROM tf JOIN dfreq USING (word)) "
    "WHERE rk <= 3 AND doc_id < 100"
)


def llm_token_budget_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source token-budgeted mixture sampling: longest-first up to
    800 whitespace tokens per source (ws-token definition shared with
    llm_token_count).  One window shuffle; exact SQL oracle."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text", "source"])
    return curation.token_budget_mix(df, budget_per_source=800)


SQL_TOKEN_BUDGET = (
    "SELECT source, doc_id, n_tokens, cum_tokens FROM ("
    "SELECT source, doc_id, n_tokens, "
    "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM ("
    "SELECT source, doc_id, CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens "
    "FROM documents))"
    " WHERE cum_tokens <= 800"
)


def llm_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-quality rule gate (ops/textstats.gopher_rules): canonical
    Rae-et-al. document filters as integer-exact booleans; ~half the
    synthetic docs clear the 50-word floor so both branches of every
    rule are exercised."""
    from olive_spark.ops import textstats

    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return textstats.gopher_rules(df)


# Integer-cleared thresholds mirror gopher_rules exactly; tokenization
# is the same trim + \s+ split with empties dropped on both engines.
SQL_GOPHER = (
    "SELECT doc_id, n_words, ok_word_count, ok_mean_word_len, "
    "ok_symbol_ratio, ok_bullet, ok_ellipsis, ok_alpha, ok_stopwords, "
    "(ok_word_count AND ok_mean_word_len AND ok_symbol_ratio AND ok_bullet "
    "AND ok_ellipsis AND ok_alpha AND ok_stopwords) AS passed FROM ("
    "SELECT doc_id, n_words, "
    "  (n_words >= 50 AND n_words <= 100000) AS ok_word_count, "
    "  (n_words > 0 AND total_wlen >= 3*n_words AND total_wlen <= 10*n_words) AS ok_mean_word_len, "
    "  (10*(n_hash + n_ell) < n_words) AS ok_symbol_ratio, "
    "  (10*n_bullet < 9*n_lines) AS ok_bullet, "
    "  (10*n_ell_end < 3*n_lines) AS ok_ellipsis, "
    "  (5*n_alpha >= 4*n_words) AS ok_alpha, "
    "  (n_stop >= 2) AS ok_stopwords "
    "FROM ("
    "  SELECT doc_id, "
    "    len(toks) AS n_words, "
    "    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS total_wlen, "
    "    length(text) - length(replace(text, '#', '')) AS n_hash, "
    "    CAST((length(text) - length(replace(text, '...', ''))) / 3 "
    "      + (length(text) - length(replace(text, '…', ''))) AS BIGINT) AS n_ell, "
    "    len(lines) AS n_lines, "
    "    len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]'))) AS n_bullet, "
    "    len(list_filter(lines, x -> regexp_matches(rtrim(x), '(\\.\\.\\.|…)$'))) AS n_ell_end, "
    "    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha, "
    "    len(list_intersect(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''), "
    "        ['the','be','to','of','and','that','have','with'])) AS n_stop "
    "  FROM (SELECT doc_id, text, "
    "          list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks, "
    "          string_split(text, chr(10)) AS lines "
    "        FROM documents)"
    "))"
)


def llm_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping 64-token / stride-48 context windows over documents
    (ops/curation.chunk_documents) — one explode, no shuffle; the
    driver hash-checks every chunk's exact text."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    return curation.chunk_documents(df, chunk=64, stride=48)


SQL_CHUNKS = (
    # range() is EXCLUSIVE of the stop bound, matching Spark's inclusive
    # sequence(0, size-chunk+stride-1): starts while s-stride+chunk<size
    "SELECT doc_id, s AS chunk_start, "
    "  array_to_string(toks[s+1:s+64], ' ') AS chunk_text, "
    "  len(toks[s+1:s+64]) AS n_chunk_tokens "
    "FROM ("
    "  SELECT doc_id, "
    "    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks "
    "  FROM documents), "
    "  UNNEST(range(0, greatest(len(toks) - 64 + 48, 1), 48)) AS t(s)"
)


def llm_pretrain_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Composite pretraining-prep pipeline, three ops chained in one
    plan: Gopher-rule gate (passed docs only, text carried through so
    no re-join of the scan) → 64/48 overlapping context windows →
    1024-token sequence packing by windowed cumsum over (doc, window)
    order.  Integer-only outputs; the oracle chains the same three
    stages in SQL.  The global cumsum pins semantics — partition-wise
    packing is the 100 TB variant (see llm_pack_sequences)."""
    from pyspark.sql.window import Window

    from olive_spark.ops import textstats

    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    # domain-tuned gate: the synthetic corpus is short keyword text, so
    # the canonical 50-word / 2-stop-word thresholds would pass nothing
    # (llm_gopher_rules keeps the canonical config; per-rule booleans
    # are exercised there)
    gated = (
        textstats.gopher_rules(df, min_words=30, min_stopwords=1, keep=("text",))
        .filter(F.col("passed"))
        .select("doc_id", "text")
    )
    chunks = curation.chunk_documents(gated, chunk=64, stride=48)
    w = (
        Window.orderBy("doc_id", "chunk_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = chunks.withColumn(
        "pack_id",
        F.floor(
            F.coalesce(F.sum("n_chunk_tokens").over(w), F.lit(0)) / 1024
        ).cast("long"),
    )
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("long").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


SQL_PRETRAIN = (
    "WITH stats AS ("
    "  SELECT doc_id, text, "
    "    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks, "
    "    string_split(text, chr(10)) AS lines "
    "  FROM documents), "
    "gated AS ("
    "  SELECT doc_id, toks FROM stats WHERE "
    "    len(toks) BETWEEN 30 AND 100000 "
    "    AND len(toks) > 0 "
    "    AND CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) "
    "        BETWEEN 3*len(toks) AND 10*len(toks) "
    "    AND 10*(length(text) - length(replace(text, '#', '')) "
    "        + CAST((length(text) - length(replace(text, '...', ''))) / 3 "
    "          + (length(text) - length(replace(text, '…', ''))) AS BIGINT)) < len(toks) "
    "    AND 10*len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]'))) < 9*len(lines) "
    "    AND 10*len(list_filter(lines, x -> regexp_matches(rtrim(x), '(\\.\\.\\.|…)$'))) < 3*len(lines) "
    "    AND 5*len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) >= 4*len(toks) "
    "    AND len(list_intersect(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''), "
    "        ['the','be','to','of','and','that','have','with'])) >= 1), "
    "chunks AS ("
    "  SELECT doc_id, s AS chunk_start, len(toks[s+1:s+64]) AS n_chunk_tokens "
    "  FROM gated, UNNEST(range(0, greatest(len(toks) - 64 + 48, 1), 48)) AS t(s)) "
    "SELECT pack_id, COUNT(*) AS n_chunks, "
    "  CAST(SUM(n_chunk_tokens) AS BIGINT) AS sum_tokens, "
    "  MIN(doc_id) AS first_doc FROM ("
    "  SELECT CAST(FLOOR(COALESCE(SUM(n_chunk_tokens) OVER "
    "    (ORDER BY doc_id, chunk_start ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "    / 1024) AS BIGINT) AS pack_id, doc_id, n_chunk_tokens FROM chunks"
    ") GROUP BY pack_id"
)


def llm_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain quota cap (curation.cap_per_group): keep the 20
    longest docs per source, ties broken by doc_id — the C4/RefinedWeb
    megasite guard.  The Spark side runs the SKEW-SAFE two-phase
    (salted local top-n, then re-rank survivors); the oracle is the
    naive single window, so the phases' exactness — not just the row
    count — is what the hash checks."""
    df = data.load(
        spark, sf, "documents", columns=["doc_id", "source", "n_chars"]
    )
    kept = curation.cap_per_group(
        df, "source", 20, "n_chars", descending=True, tiebreak_col="doc_id"
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("sum_ids"),
        F.sum("n_chars").alias("sum_chars"),
    )


SQL_DOMAIN_CAP = (
    "WITH ranked AS (SELECT doc_id, source, n_chars, "
    "ROW_NUMBER() OVER (PARTITION BY source "
    "ORDER BY n_chars DESC, doc_id) AS rn FROM documents) "
    "SELECT source, COUNT(*) AS n, "
    "CAST(SUM(doc_id) AS BIGINT) AS sum_ids, "
    "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
    "FROM ranked WHERE rn <= 20 GROUP BY source"
)


def llm_word_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document Shannon entropy of the word distribution — the
    repetition/gibberish quality signal (a doc that repeats one token
    scores ~0 bits; diverse prose scores high).  Computed as
    log2(n) − Σ cnt·log2(cnt)/n from one explode + two aggregations —
    map-side partial combine shrinks the (doc, word) shuffle to
    distinct pairs; no UDFs.  Output bucketed to one row per entropy
    decile for a stable small frame."""
    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    words = df.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    ).filter(F.col("w") != "")
    per_word = words.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    ent = per_word.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("s"),
    ).select(
        "doc_id",
        F.round(F.log2("n") - F.col("s") / F.col("n"), 6).alias("entropy"),
    )
    return ent.groupBy(
        F.floor(F.col("entropy")).cast("int").alias("bits_floor")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
    )


SQL_WORD_ENTROPY = (
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), "
    "pw AS (SELECT doc_id, w, COUNT(*) AS cnt FROM w WHERE w <> '' "
    "GROUP BY doc_id, w), "
    "ent AS (SELECT doc_id, "
    "ROUND(LOG2(SUM(cnt)) - SUM(cnt * LOG2(cnt)) / SUM(cnt), 6) AS entropy "
    "FROM pw GROUP BY doc_id) "
    "SELECT CAST(FLOOR(entropy) AS INT) AS bits_floor, COUNT(*) AS n_docs, "
    "CAST(SUM(doc_id) AS BIGINT) AS sum_ids "
    "FROM ent GROUP BY 1"
)


def llm_unigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-unigram LM curation scoring (ops/textstats.
    unigram_lm_score — the CCNet-style 'looks like the corpus' signal):
    Laplace-smoothed unigram NLL per document, bucketed to one row per
    integer NLL for a stable small frame (per-term ln of integer ratios
    is bit-identical across engines; the avg's summation-order jitter
    sits ~1e-13 under the 1e-6 rounding)."""
    from olive_spark.ops.textstats import unigram_lm_score

    df = data.load(spark, sf, "documents", columns=["doc_id", "text"])
    sc = unigram_lm_score(df)
    return sc.groupBy(
        F.floor(F.col("nll") * 4).cast("int").alias("nll_q")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
        F.round(F.avg("nll"), 4).alias("avg_nll"),
    )


SQL_UNIGRAM_LM = (
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), "
    "t AS (SELECT doc_id, w FROM w WHERE w <> ''), "
    "wc AS (SELECT w, COUNT(*) AS cnt FROM t GROUP BY w), "
    "s AS (SELECT SUM(cnt) AS n, COUNT(*) AS v FROM wc), "
    "sc AS (SELECT doc_id, ROUND(-AVG(LN((cnt + 1.0) / (n + v))), 6) AS nll "
    "FROM t JOIN wc USING (w) CROSS JOIN s GROUP BY doc_id) "
    "SELECT CAST(FLOOR(nll * 4) AS INT) AS nll_q, COUNT(*) AS n_docs, "
    "CAST(SUM(doc_id) AS BIGINT) AS sum_ids, "
    "ROUND(AVG(nll), 4) AS avg_nll "
    "FROM sc GROUP BY 1"
)


QUERIES: dict[str, tuple] = {
    "llm_domain_cap": (llm_domain_cap, SQL_DOMAIN_CAP),
    "llm_unigram_lm_score": (llm_unigram_lm_score, SQL_UNIGRAM_LM),
    "llm_word_entropy": (llm_word_entropy, SQL_WORD_ENTROPY),
    "llm_gopher_rules": (llm_gopher_rules, SQL_GOPHER),
    "llm_chunk_documents": (llm_chunk_documents, SQL_CHUNKS),
    "llm_pretrain_pipeline": (llm_pretrain_pipeline, SQL_PRETRAIN),
    "llm_pii_redact": (llm_pii_redact, SQL_PII_REDACT),
    "llm_token_budget_mix": (llm_token_budget_mix, SQL_TOKEN_BUDGET),
    "llm_similarity_range": (llm_similarity_range, SQL_SIMILARITY_RANGE),
    "llm_similarity_pq": (llm_similarity_pq, None),
    "llm_tfidf_topk": (llm_tfidf_topk, SQL_TFIDF),
    "llm_repetition_ratio": (llm_repetition_ratio, SQL_REPETITION),
    "llm_pack_sequences": (llm_pack_sequences, SQL_PACK),
    "llm_pack_sequences_sharded": (llm_pack_sequences_sharded, SQL_PACK_SHARDED),
    "llm_decontaminate_ngram": (llm_decontaminate_ngram, SQL_DECONTAMINATE),
    "llm_dedup_lines": (llm_dedup_lines, SQL_DEDUP_LINES),
    "llm_boilerplate_lines": (llm_boilerplate_lines, SQL_BOILERPLATE),
    "llm_stratified_sample": (llm_stratified_sample, SQL_STRATIFIED),
    "llm_train_split": (llm_train_split, SQL_TRAIN_SPLIT),
    "llm_vocab_topk": (llm_vocab_topk, SQL_VOCAB),
    "llm_ngram_topk": (llm_ngram_topk, SQL_NGRAM),
    "llm_contamination": (llm_contamination, SQL_CONTAMINATION),
    "llm_length_percentiles": (llm_length_percentiles, SQL_LENGTH_PCT),
    "llm_dedup_clusters": (llm_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "llm_dedup_clusters_star": (llm_dedup_clusters_star, SQL_DEDUP_CLUSTERS),
}
