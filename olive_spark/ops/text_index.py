"""Persisted keyword inverted index over a document corpus: exact
multi-term search without re-scanning document text.

Layout:

    index_dir/postings/   (token, doc_id) — one row per DISTINCT token
                          per document, range-CLUSTERED by token
    index_dir/_text_meta.json

The postings table is written ``repartitionByRange(token) +
sortWithinPartitions(token, id)``, so each file owns a contiguous token
range: a term lookup prunes to the files whose [min, max] token stats
straddle the term (format/manifest.py) and the per-file token Bloom
(``bloomColumns``) kills the range stragglers — at 100 TB a search
reads a few postings files, never the corpus.  AND semantics are a
group-count over the term-filtered postings (a slim (token, id)
shuffle); the matched ids then semi-join back to whatever document
table the caller wants hydrated — ids-only until the last step.

This is the classic distributed inverted-index shape (term-partitioned
postings lists — e.g. Zobel & Moffat, "Inverted files for text search
engines", ACM Computing Surveys 2006); the reference format has no
search layer (/root/reference/src/root.zig:9-16).

Tokenization is the engine's standard ``\\s+``-split lowercase
(shared with ops/dedup.py shingling and ops/textstats.py counting), so
index hits agree with what those operators see as tokens.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, functions as F

_TEXT_META = "_text_meta.json"


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, _TEXT_META)


def _pdir(index_dir: str, meta: dict) -> str:
    """The CURRENT postings directory — meta-resolved so
    compact_text_index can swap in a re-clustered copy with one atomic
    meta replace (readers resolve through the meta, never a hardcoded
    name; pre-r12 metas default to 'postings')."""
    return os.path.join(index_dir, meta.get("postings_dir", "postings"))


def load_meta(index_dir: str) -> dict:
    p = _meta_path(index_dir)
    if not os.path.exists(p):
        raise ValueError(
            f"no text index at {index_dir} (missing {_TEXT_META})"
        )
    with open(p, "r") as f:
        return json.load(f)


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _meta_path(index_dir))


def _postings(
    docs: DataFrame, text_col: str, id_col: str, positions: bool = False
) -> DataFrame:
    """(id, token, tf, dl[, pos]): term frequency + document length ride
    along in each posting row (denormalized — repeating the small dl int
    per posting compresses to nothing and saves the doc-length join every
    ranked search would otherwise pay).  The explode + groupBy shuffles
    (id, token) pairs once at BUILD time; searches never re-derive.

    With ``positions``, each posting also carries the sorted 1-based
    token positions of the term inside the document (array<int>,
    tf elements) — the payload :func:`search_phrase` intersects for
    adjacency.  Storage grows by one int per token occurrence, i.e. by
    O(corpus tokens) total — the classical positional-index overhead."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    ex = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").alias("dl"),
            F.posexplode("__toks").alias("__p", "token"),
        )
    )
    aggs = [
        F.count("*").cast("int").alias("tf"),
        F.first("dl").alias("dl"),
    ]
    if positions:
        aggs.append(
            F.sort_array(
                F.collect_list((F.col("__p") + 1).cast("int"))
            ).alias("pos")
        )
    return ex.groupBy(id_col, "token").agg(*aggs)


def _write_postings(postings: DataFrame, path: str, id_col: str,
                    n_files: int) -> None:
    (
        postings.repartitionByRange(n_files, "token")
        .sortWithinPartitions("token", id_col)
        .write.format("olive").option("bloomColumns", "token")
        .mode("append").save(path)
    )


def build_text_index(
    spark,
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_files: int = 16,
    positions: bool = False,
) -> dict:
    """Create the index from scratch.  ``n_files`` sets the token-range
    granularity — more files = finer pruning; size it so a file is a
    few hundred MB at your corpus scale.

    Documents with NO tokens (empty/whitespace text) produce no
    postings and are deliberately excluded from ``n_docs``/``avgdl``:
    they can never match a term, and counting them would only deflate
    every BM25 length normalization.  Same rule on append — a
    tokenless doc is retried by the next append rather than counted."""
    if os.path.exists(_meta_path(index_dir)):
        raise ValueError(
            f"text index already exists at {index_dir} — use append_text_index"
        )
    from olive_spark.datasource import register_olive

    register_olive(spark)
    os.makedirs(index_dir, exist_ok=True)
    pdir = os.path.join(index_dir, "postings")
    if os.path.exists(pdir):
        # a prior build crashed between the postings commit and the
        # meta write (meta is the completion marker): rebuilding over
        # the half-landed copy would append a SECOND posting per
        # (id, token) and silently zero out every AND search
        import shutil

        shutil.rmtree(pdir)
    p = _postings(docs, text_col, id_col, positions=positions).persist()
    try:
        n, total = p.agg(
            F.count_distinct(F.col(id_col)), F.sum("tf")
        ).first()
        _write_postings(p, pdir, id_col, n_files)
    finally:
        p.unpersist()
    meta = {
        "id_col": id_col, "n_docs": int(n or 0),
        "n_tokens": int(total or 0), "n_files": int(n_files),
        "positions": bool(positions),
        "build_id": uuid.uuid4().hex,
    }
    _write_meta(index_dir, meta)
    return meta


def append_text_index(
    spark,
    new_docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Add new documents (idempotent on already-indexed ids).  Appended
    postings land token-clustered among THEMSELVES; interleaving with
    the existing token ranges degrades term-lookup pruning gradually —
    run :func:`compact_text_index` to restore a single global
    clustering with fresh per-file token Blooms (r12 verdict task #5;
    a plain maintenance.compact would re-sort but silently DROP the
    Blooms, which only the writer option recreates)."""
    from olive_spark.datasource import register_olive

    register_olive(spark)
    meta = load_meta(index_dir)
    if meta["id_col"] != id_col:
        raise ValueError(f"index id_col is {meta['id_col']!r}, got {id_col!r}")
    path = _pdir(index_dir, meta)
    indexed = (
        spark.read.format("olive").load(path)
        .select(F.col(id_col)).distinct()
    )
    fresh = new_docs.join(indexed, id_col, "left_anti")
    # appends MUST match the index's posting shape: a positional index
    # appended without positions would leave phrase search silently
    # blind to the new documents (nulls never intersect)
    p = _postings(
        fresh, text_col, id_col, positions=bool(meta.get("positions"))
    ).persist()
    try:
        n_new = int(p.agg(F.count_distinct(F.col(id_col))).first()[0] or 0)
        if n_new:
            _write_postings(p, path, id_col, max(1, meta["n_files"] // 4))
    finally:
        p.unpersist()
    # meta stats are RECOMPUTED from the stored postings, not folded in
    # incrementally: a prior append that crashed between its postings
    # commit and its meta write would otherwise undercount
    # n_docs/n_tokens FOREVER (the anti-join skips its docs as already
    # indexed), silently skewing every future BM25 idf/avgdl — the
    # one-aggregate re-derivation self-heals that drift at every append
    stored = spark.read.format("olive").load(path)
    n, total = stored.agg(
        F.count_distinct(F.col(id_col)), F.sum("tf")
    ).first()
    meta["n_docs"] = int(n or 0)
    meta["n_tokens"] = int(total or 0)
    meta["build_id"] = uuid.uuid4().hex
    _write_meta(index_dir, meta)
    return {**meta, "appended": n_new}


def compact_text_index(
    spark, index_dir: str, n_files: "int | None" = None
) -> dict:
    """Re-cluster the postings back into DISJOINT token ranges with
    fresh per-file token Blooms (r12 verdict task #5).  Each
    ``append_text_index`` lands its batch as new files clustered only
    among themselves; after many appends the per-file token ranges
    overlap and a term lookup degrades toward opening every file.
    This rewrites ALL postings through the same
    ``repartitionByRange(token) + sortWithinPartitions`` +
    ``bloomColumns`` writer the fresh build uses — a plain
    ``maintenance.compact(sort_by='token')`` would re-sort but drop
    the Blooms, which only the writer option recreates.

    Swap is ATOMIC via the meta file: the rewrite lands in a new
    ``postings-<build>`` directory, one ``os.replace`` of the meta
    points readers at it (every search resolves the directory through
    the meta), then the old directory is removed.  A crash before the
    meta swap leaves the old index fully live (the orphan rewrite dir
    is GC'd by the next compact); a crash after it leaves the new
    index fully live (the old dir likewise GC'd)."""
    import shutil

    from olive_spark.datasource import register_olive

    register_olive(spark)
    meta = load_meta(index_dir)
    cur_rel = meta.get("postings_dir", "postings")
    # GC debris from prior crashed compacts (either orphan rewrites or
    # a replaced dir whose removal crashed): every postings* dir that
    # is not the meta-referenced one is dead
    for d in sorted(os.listdir(index_dir)):
        if d != cur_rel and d.startswith("postings") \
                and os.path.isdir(os.path.join(index_dir, d)):
            shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
    nf = int(n_files or meta["n_files"])
    new_build = uuid.uuid4().hex
    new_rel = f"postings-{new_build[:12]}"
    old = _pdir(index_dir, meta)
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    files_before = len(_list_chunk_files(old))
    stored = spark.read.format("olive").load(old)
    _write_postings(
        stored, os.path.join(index_dir, new_rel), meta["id_col"], nf,
    )
    meta["postings_dir"] = new_rel
    meta["n_files"] = nf
    meta["build_id"] = new_build
    _write_meta(index_dir, meta)  # THE swap — readers move atomically
    shutil.rmtree(old, ignore_errors=True)
    files_after = len(
        _list_chunk_files(os.path.join(index_dir, new_rel))
    )
    return {
        **meta, "files_before": files_before, "files_after": files_after,
    }


def compact_text_index_if_needed(
    spark, index_dir: str, max_file_ratio: float = 2.0,
    n_files: "int | None" = None,
) -> dict:
    """Threshold-scheduled re-clustering (r13, VERDICT r12 task #6 —
    the text-index sibling of ``maintenance.compact_if_needed``): run
    :func:`compact_text_index` when the live posting chunk-file count
    has grown past ``max_file_ratio`` × the index's target file count
    (every ``append_text_index`` adds files clustered only among
    themselves, so file growth IS range-overlap growth — a term lookup
    opens proportionally more files until compaction restores the
    disjoint global clustering).

    The check is one directory listing — no Spark job on the no-op
    path, so a scheduler can call it after every append for free.
    Returns ``{"compacted": False, ...}`` or the compaction's result
    dict with ``compacted: True``."""
    from olive_spark.datasource.olive_datasource import _list_chunk_files

    meta = load_meta(index_dir)
    target = int(meta["n_files"])
    live = len(_list_chunk_files(_pdir(index_dir, meta)))
    if live <= max(target, int(float(max_file_ratio) * target)):
        return {
            "compacted": False, "files_live": live,
            "files_target": target, "ratio": live / max(1, target),
        }
    out = compact_text_index(spark, index_dir, n_files=n_files)
    return {**out, "compacted": True, "files_live": live}


def search_tokens(
    spark,
    index_dir: str,
    terms: "list[str]",
    mode: str = "all",
) -> DataFrame:
    """Document ids whose token set matches ``terms`` — ``all`` (AND)
    or ``any`` (OR).  Terms are normalized with the index's own
    tokenizer rule (lowercase; a term containing whitespace is
    rejected — this is a token index, not a phrase index)."""
    from olive_spark.datasource import register_olive

    register_olive(spark)
    norm = _normalize_terms(terms)
    if mode not in ("all", "any"):
        raise ValueError(f"unknown mode {mode!r}")
    meta = load_meta(index_dir)
    id_col = meta["id_col"]
    postings = spark.read.format("olive").load(_pdir(index_dir, meta))
    # isin on the clustered token column: min/max stats prune whole
    # files, the token Bloom kills range stragglers (plan-contract
    # tested).  Postings are UNIQUE per (id, token) — the build groupBy
    # guarantees it and appends anti-join already-indexed ids — so the
    # AND check is a plain count, not count_distinct (which would plan
    # a second expansion shuffle for nothing; plan-contract tested)
    hits = postings.filter(F.col("token").isin(norm))
    if mode == "any":
        return hits.select(id_col).distinct()
    return (
        hits.groupBy(id_col)
        .agg(F.count("*").alias("__nt"))
        .filter(F.col("__nt") == len(norm))
        .select(id_col)
    )


def search_phrase(
    spark,
    index_dir: str,
    phrase: str,
    hits_col: str = "n_hits",
) -> DataFrame:
    """Exact phrase search over a POSITIONAL index (``build_text_index
    (..., positions=True)``): document ids containing the consecutive
    token sequence ``phrase`` (the index tokenizer's rule — lowercased,
    whitespace-split), plus the occurrence count (overlapping
    occurrences included, the positional-intersection definition).

    Classic information-retrieval positional postings (Manning/IIR
    §2.4): candidates are the postings rows of ONLY the phrase's
    tokens (token-range file pruning + per-file token Blooms apply,
    same as search_tokens), grouped per doc; adjacency is the
    intersection of the first token's positions with each later
    token's positions shifted left by its offset — all array built-ins,
    no text re-scan, no Python UDF.  Cost ∝ the phrase tokens' posting
    lists, never corpus size."""
    from functools import reduce as _reduce

    from olive_spark.datasource import register_olive

    register_olive(spark)
    toks = [t.lower() for t in phrase.strip().split()]
    if not toks:
        raise ValueError("phrase must contain at least one token")
    meta = load_meta(index_dir)
    if not meta.get("positions"):
        raise ValueError(
            f"index at {index_dir} has no positional postings — rebuild "
            "with build_text_index(..., positions=True) for phrase search"
        )
    id_col = meta["id_col"]
    uniq = sorted(set(toks))
    postings = spark.read.format("olive").load(_pdir(index_dir, meta))
    per_doc = (
        postings.filter(F.col("token").isin(uniq))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("token", "pos"))
            ).alias("__m")
        )
        .filter(
            _reduce(
                lambda a, b: a & b,
                [F.map_contains_key("__m", t) for t in uniq],
            )
        )
    )
    def _shifted(col, off: int):
        # NOTE: F.transform dispatches on lambda ARITY — a two-arg
        # lambda means (element, index), so the off parameter must be
        # captured by closure, never as a defaulted second argument
        return F.transform(col, lambda p: p - F.lit(off))

    base = F.col("__m").getItem(toks[0])
    for i, t in enumerate(toks[1:], start=1):
        base = F.array_intersect(
            base, _shifted(F.col("__m").getItem(t), i)
        )
    n = F.size(base)
    return (
        per_doc.select(F.col(id_col), n.alias(hits_col))
        .filter(F.col(hits_col) > 0)
    )


def _normalize_terms(terms: "list[str]") -> "list[str]":
    if not terms:
        raise ValueError("terms must be non-empty")
    norm = [t.strip().lower() for t in terms]
    if any((not t) or any(c.isspace() for c in t) for t in norm):
        raise ValueError(
            f"terms must be single non-empty tokens, got {terms!r} — "
            "for phrases, AND the tokens and post-filter the text"
        )
    return sorted(set(norm))


def search_bm25(
    spark,
    index_dir: str,
    terms: "list[str]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Top-``k`` documents by BM25 (Robertson/Spärck Jones probabilistic
    ranking — the standard Okapi formulation) over the indexed corpus:

        idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))
        score(d)   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

    N and avgdl come from the index meta; df(t) aggregates over the
    SAME term-filtered postings the scoring reads (one file-pruned
    scan, persisted).  df is collected to the driver — bounded by
    len(terms), never by corpus.  Scores are rounded to ``round_to``
    decimals and tie-broken by id so the ranking is deterministic and
    reproducible cross-engine.  Returns (id, score, n_terms_hit)."""
    from olive_spark.datasource import register_olive

    register_olive(spark)
    norm = _normalize_terms(terms)
    meta = load_meta(index_dir)
    id_col = meta["id_col"]
    n_docs = int(meta["n_docs"])
    if not n_docs:
        raise ValueError(f"index at {index_dir} is empty")
    if "n_tokens" not in meta:
        raise ValueError(
            "index predates tf/dl postings — rebuild with this version"
        )
    avgdl = float(meta["n_tokens"]) / float(n_docs)
    hits = spark.read.format("olive").load(
        _pdir(index_dir, meta)
    ).filter(F.col("token").isin(norm)).persist()
    try:
        import math

        dfs = {
            r["token"]: r["df"]
            for r in hits.groupBy("token")
            .agg(F.count("*").alias("df")).collect()
        }
        idf = {
            t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for t, df in dfs.items()
        }
        if not idf:
            return (
                hits.select(
                    F.col(id_col),
                    F.lit(0.0).alias("score"),
                    F.lit(0).alias("n_terms_hit"),
                ).limit(0)
            )
        idf_expr = F.create_map(
            *[x for t, v in sorted(idf.items())
              for x in (F.lit(t), F.lit(float(v)))]
        )
        tf = F.col("tf").cast("double")
        dl = F.col("dl").cast("double")
        part = (
            idf_expr[F.col("token")]
            * tf * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl
                                 / F.lit(avgdl)))
        )
        scored = (
            hits.withColumn("__s", part)
            .groupBy(id_col)
            .agg(
                F.round(F.sum("__s"), round_to).alias("score"),
                F.count("*").cast("int").alias("n_terms_hit"),
            )
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k)
        )
        # top-k is tiny: materialize before unpersisting the hits the
        # plan reads
        rows = scored.collect()
        return spark.createDataFrame(rows, scored.schema)
    finally:
        hits.unpersist()


def search_docs(
    spark,
    docs: DataFrame,
    index_dir: str,
    terms: "list[str]",
    mode: str = "all",
) -> DataFrame:
    """``docs`` rows whose ids match the term search — the hydration
    join is a left_semi on ids, so document payloads never shuffle."""
    meta = load_meta(index_dir)
    ids = search_tokens(spark, index_dir, terms, mode)
    return docs.join(ids, meta["id_col"], "left_semi")
