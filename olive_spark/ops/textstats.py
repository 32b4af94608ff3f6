"""Text-analysis operators for LLM data pipelines (SURVEY.md north star).

All hot-path computation uses built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Designed for 100 TB: every operator
is a narrow map over the scan, no shuffle, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Small per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deterministic, broadcast as literals (tiny), JVM-evaluated.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "pour", "dans", "que", "pas", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "un", "para", "en", "que", "no", "por"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty text → empty array (not [''])."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document counting stats: chars, whitespace tokens, lines,
    alpha ratio, mean token length."""
    t = F.col(text_col)
    toks = tokens(t)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (F.length(t) - F.length(F.regexp_replace(t, r"\n", "")) + 1).alias("n_lines"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals: stopword ratio, punctuation density,
    mean word length, uppercase ratio — the standard pre-training filters
    (C4/Gopher-style), all in codegen'd expressions."""
    t = F.col(text_col)
    toks = tokens(F.lower(t))
    n_tok = F.size(toks)
    sw = F.array([F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(toks, sw))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    mean_wl = F.when(n_tok > 0, F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / n_tok).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_punct / F.greatest(F.length(t), F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_upper / F.greatest(F.length(t), F.lit(1)), 4).alias("upper_ratio"),
        F.round(mean_wl, 4).alias("mean_word_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: argmax over per-language stopword counts.
    Tie-break by language code for determinism; 'und' when no hits."""
    toks = tokens(F.lower(F.col(text_col)))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array([F.lit(w) for w in ws]))).alias("hits"),
            F.lit(code).alias("lang"),
        )
        for code, ws in sorted(_STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))  # struct compare: hits first, then lang
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (md5 so the DuckDB oracle can reproduce it bit-for-bit; the scale path
    would use xxhash64 — same plan shape, cheaper hash.)"""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp"),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
    keep: tuple = (),
) -> DataFrame:
    """Gopher-style document-quality rule gate (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): per-document booleans for the canonical
    repetition-free quality rules plus the combined verdict.  All rules
    are integer comparisons (ratio thresholds cleared of division:
    ``sym/words < 0.1`` becomes ``10*sym < words``), so results are
    bit-stable and the DuckDB oracle hash-matches.  Pure JVM
    expressions, zero shuffles — a narrow map over the scan.

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; symbol-to-word ratio (# or ellipsis) < 0.1; <90% of lines
    bullet-started; <30% of lines ellipsis-ended; >=80% of words
    contain an alphabetic character; >=2 of the 8 Gopher stop words
    present.

    Words are whitespace tokens with empties DROPPED (a trailing
    newline/tab otherwise leaves a boundary "" token that inflates the
    word count and every per-word denominator — and diverges from the
    oracle's ``x <> ''`` filter).  Token/line arrays are projected ONCE
    per row: higher-order functions run interpreted, so every textual
    re-occurrence of the split would re-run the regex over the full
    document (see bigram_topk for the same discipline).  ``keep``
    passes extra input columns through to the output, so gate→transform
    pipelines filter on ``passed`` without re-joining the scan."""
    t = F.col(text_col)
    no_empty = lambda arr: F.filter(arr, lambda x: x != "")  # noqa: E731
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        t.alias("__t"),
        no_empty(tokens(t)).alias("__toks"),
        no_empty(tokens(F.lower(t))).alias("__lt"),
        F.split(t, r"\n").alias("__lines"),
    )
    t = F.col("__t")
    toks = F.col("__toks")
    lines = F.col("__lines")
    n_words = F.size(toks)
    total_wlen = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ell = (
        (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
        + (F.length(t) - F.length(F.regexp_replace(t, r"…", "")))
    ).cast("long")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    n_ell_end = F.size(
        F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"))
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike(r"[A-Za-z]")))
    gopher_sw = F.array(*[
        F.lit(w) for w in ["the", "be", "to", "of", "and", "that", "have", "with"]
    ])
    n_stop = F.size(F.array_intersect(F.col("__lt"), gopher_sw))
    sym = n_hash + n_ell
    rules = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (n_words > 0)
        & (total_wlen >= 3 * n_words)
        & (total_wlen <= 10 * n_words),
        "ok_symbol_ratio": 10 * sym < n_words,
        "ok_bullet": 10 * n_bullet < 9 * n_lines,
        "ok_ellipsis": 10 * n_ell_end < 3 * n_lines,
        "ok_alpha": 5 * n_alpha >= 4 * n_words,
        "ok_stopwords": n_stop >= min_stopwords,
    }
    passed = None
    for c in rules.values():
        passed = c if passed is None else (passed & c)
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        n_words.alias("n_words"),
        *[c.alias(name) for name, c in rules.items()],
        passed.alias("passed"),
    )


def unigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-unigram language-model scoring — the CCNet-style curation
    signal: train a Laplace-smoothed unigram model on the WHOLE corpus
    and score every document by mean negative log-likelihood per token,
    ``nll = −avg ln((cnt_w + 1) / (N + V))``.  Prose near the corpus
    mode scores low; gibberish, OOV-heavy, and off-distribution docs
    score high — the standard cheap proxy for "looks like the reference
    corpus" used to rank crawl text before an expensive model pass.

    Plan shape at 100 TB: one explode; the vocabulary count is a
    map-side-combined word agg (vocab-sized, not corpus-sized); the
    scalar (N, V) totals ride along as a broadcast 1-row aggregate; the
    score join shuffles (doc, word) pairs against the vocab — AQE
    broadcasts the vocab side when it fits.  No UDFs, no driver state."""
    t = F.col(text_col)
    words = df.select(
        F.col(id_col), F.explode(F.split(t, " ")).alias("__w")
    ).filter(F.col("__w") != "")
    wc = words.groupBy("__w").agg(F.count("*").alias("__cnt"))
    totals = wc.agg(
        F.sum("__cnt").alias("__n"), F.count("*").alias("__v")
    )
    return (
        words.join(wc, "__w")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.round(
                -F.avg(
                    F.log(
                        (F.col("__cnt") + F.lit(1.0))
                        / (F.col("__n") + F.col("__v"))
                    )
                ),
                6,
            ).alias("nll")
        )
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts (budgeting for LLM training)."""
    t = F.col(text_col)
    ws_toks = tokens(t)
    # words / digit runs / punctuation runs — a BPE pre-tokenizer's split
    pieces = F.filter(
        F.split(F.regexp_replace(t, r"([0-9]+|[^A-Za-z0-9\s]+)", " $1 "), r"\s+"),
        lambda x: x != "",
    )
    return df.select(
        F.col(id_col),
        F.size(ws_toks).alias("n_ws_tokens"),
        F.size(pieces).alias("n_bpe_tokens"),
    )
