"""Subword tokenization: a self-contained byte-pair-encoding (BPE)
tokenizer — trainer, encoder, persisted vocab/merges artifacts in the
public GPT-2 shape (``vocab.json`` + ``merges.txt``), and the Spark
column path (Arrow-batched pandas UDF over a broadcast merge table).

Why this exists (VERDICT r12 task #1): every "token" elsewhere in the
pipeline (``llm_token_count``, ``token_budget_mix``, ``pack_sequences``,
span-dedup widths) is a WHITESPACE token.  Real training pipelines
budget, pack, and chunk in subword tokens — whitespace undercounts
prose by ~30-40% and code by far more.  This module supplies the
model-accurate count as an OPT-IN: the curation ops accept an
``n_tokens_col`` override, and :func:`bpe_token_count_col` builds it.

Tokenizer SPEC (deterministic, oracle-replayable — the DuckDB oracle
in queries/llm.py replays this exact loop as a recursive CTE):

1. Pre-tokenize: split the trimmed text on ``\\s+``, drop empties.
   No case folding, no byte remapping (the corpus convention shared by
   every op in this repo; a byte-level pre-tokenizer slots in here
   without touching the merge machinery).
2. Per word: symbols = the word's characters + a final ``</w>``
   end-of-word marker (Sennrich et al. 2016, the original public BPE
   formulation).
3. Merge loop: repeatedly find the adjacent symbol pair with the
   LOWEST merge rank (ties impossible — ranks are unique); merge its
   FIRST occurrence; stop when no adjacent pair is in the merge
   table.  Merging first-occurrence-per-step is equivalent to the
   usual all-occurrences-per-step variant: a merge at rank r can only
   create pairs learned AFTER r, so the remaining occurrences of the
   rank-r pair stay minimal until exhausted.
4. Symbol → id through the vocab; unknown symbols (characters never
   seen in training) map to ``<unk>`` = id 0.

Scale shape: encoding is a pandas UDF (Arrow batch transfer, no
row-at-a-time Python UDF) with a per-executor word→ids cache — real
corpora are Zipf-distributed, so the cache converts per-word cost into
per-DISTINCT-word cost.  The merge table rides a Spark broadcast
(kilobytes here; the same path carries a 50k-merge GPT-2 table
unchanged).  No shuffle is introduced: the encode is a projection.

Reference: the reference format engine has no tokenizer (it is a
serialization library, src/root.zig:9-16); this is a north-star
pipeline component, not a parity op.
"""

import json
import os
from collections import Counter

EOW = "</w>"
UNK = "<unk>"

_FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "bpe_fixture")


# ---------------------------------------------------------------- train

def train_bpe(texts, vocab_size: int = 384) -> dict:
    """Learn a BPE vocab + merge list from an iterable of texts.

    Classic Sennrich trainer: count whitespace words, then repeatedly
    merge the most frequent adjacent symbol pair (ties break on the
    lexicographically smallest pair, so training is deterministic for
    a fixed corpus) until ``vocab_size`` is reached or no pair repeats.

    Returns ``{"vocab": {token: id}, "merges": [[left, right], ...]}``
    with ids assigned GPT-2 style: ``<unk>`` = 0, the sorted base
    alphabet next, then one id per merge in learned order.
    """
    words: Counter = Counter()
    for t in texts:
        if t:
            words.update(t.split())
    seqs: dict[tuple, int] = {
        tuple(w) + (EOW,): c for w, c in words.items()
    }
    alphabet = sorted({s for seq in seqs for s in seq})
    merges: list[list[str]] = []
    max_merges = max(0, int(vocab_size) - 1 - len(alphabet))
    for _ in range(max_merges):
        pairs: Counter = Counter()
        for seq, c in seqs.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        best_c = max(pairs.values())
        if best_c < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_c)
        merges.append([best[0], best[1]])
        merged = best[0] + best[1]
        new_seqs: dict[tuple, int] = {}
        for seq, c in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == best[0] and seq[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + c
        seqs = new_seqs
    vocab = {UNK: 0}
    for s in alphabet:
        vocab[s] = len(vocab)
    for l, r in merges:
        tok = l + r
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return {"vocab": vocab, "merges": merges}


# ----------------------------------------------------------- artifacts

def save_bpe(bpe: dict, dirpath: str) -> None:
    """Persist in the public GPT-2 artifact shape: ``vocab.json``
    (token → id) + ``merges.txt`` (one ``left right`` pair per line,
    ``#version`` header)."""
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump(bpe["vocab"], f, indent=0, sort_keys=True)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for l, r in bpe["merges"]:
            f.write(f"{l} {r}\n")


def load_bpe(dirpath: str) -> dict:
    with open(os.path.join(dirpath, "vocab.json")) as f:
        vocab = json.load(f)
    merges: list[list[str]] = []
    with open(os.path.join(dirpath, "merges.txt")) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            l, _, r = line.partition(" ")
            merges.append([l, r])
    return {"vocab": vocab, "merges": merges}


_DEFAULT: "dict | None" = None


def default_bpe() -> dict:
    """The committed fixture vocab (built by tools/build_bpe_fixture.py
    from a fixed in-repo corpus — no external fetch)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = load_bpe(_FIXTURE_DIR)
    return _DEFAULT


# -------------------------------------------------------------- encode

def _ranks(bpe: dict) -> dict:
    return {(l, r): i for i, (l, r) in enumerate(bpe["merges"])}


def encode_word(word: str, ranks: dict) -> "tuple[str, ...]":
    """Spec step 3: first occurrence of the min-rank pair, repeated to
    fixpoint.  Returns the final symbol tuple."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_r = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def encode_text(text: "str | None", bpe: dict,
                _cache: "dict | None" = None) -> "list[int]":
    """Pure-Python reference encoder (the spec; also the UDF body).
    ``_cache`` maps word → id tuple across calls."""
    if not text:
        return []
    vocab = bpe["vocab"]
    ranks = bpe.get("_ranks")
    if ranks is None:
        ranks = _ranks(bpe)
        bpe["_ranks"] = ranks
    cache = _cache if _cache is not None else {}
    out: list[int] = []
    unk = vocab[UNK]
    for w in text.split():
        ids = cache.get(w)
        if ids is None:
            ids = tuple(
                vocab.get(s, unk) for s in encode_word(w, ranks)
            )
            cache[w] = ids
        out.extend(ids)
    return out


def decode_ids(ids, bpe: "dict | None" = None) -> str:
    """Inverse of :func:`encode_text` up to whitespace normalization:
    ids → symbols, concatenate, split on the ``</w>`` markers and
    rejoin with single spaces.  Round-trip contract (pinned in
    tests/test_tokenize.py): ``decode_ids(encode_text(t)) ==
    " ".join(t.split())`` whenever every character of ``t`` is in the
    vocab alphabet; unknown characters encode to ``<unk>`` and decode
    to the literal ``<unk>`` marker (standard lossy-unk behavior)."""
    b = bpe or default_bpe()
    inv = b.get("_inv")
    if inv is None:
        inv = {v: k for k, v in b["vocab"].items()}
        b["_inv"] = inv
    text = "".join(inv.get(int(i), "") for i in ids)
    return " ".join(w for w in text.split(EOW) if w != "")


# --------------------------------------------------------------- spark

#: executor-lifetime word→ids caches, keyed by broadcast id: a scalar
#: pandas UDF is invoked once per Arrow batch, and a per-invocation
#: cache would re-encode every distinct word once per batch instead of
#: once per executor.  Zipf economics at 100 TB: the cache converts
#: per-word cost into per-distinct-word cost ACROSS the whole task
#: stream.  Bounded: reset when it outgrows the cap (cold restart, not
#: an error).
_WORD_CACHES: dict = {}


def _shared_cache(key, cap: int = 1_000_000) -> dict:
    c = _WORD_CACHES.get(key)
    if c is None or len(c) > cap:
        c = {}
        _WORD_CACHES[key] = c
    return c


def _vocab_key(bpe: dict) -> str:
    """Content fingerprint of a vocab (driver-side, shipped in the UDF
    closure): stable across calls and processes, so every task stream
    encoding with the same fixture shares one executor cache."""
    import hashlib

    k = bpe.get("_key")
    if k is None:
        k = hashlib.md5(json.dumps(
            [bpe["merges"], sorted(bpe["vocab"].items())]
        ).encode()).hexdigest()
        bpe["_key"] = k
    return k


def bpe_encode(df, text_col: str = "text", bpe: "dict | None" = None,
               out_ids: str = "token_ids", out_n: str = "n_tokens_bpe"):
    """Add ``out_ids`` (array<int>) and ``out_n`` (int) columns: the
    BPE token ids of ``text_col`` under the given (default: fixture)
    vocab.  Arrow-batched pandas UDF; merge table broadcast; projection
    only — no shuffle, no join, no driver collect."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    b = bpe or default_bpe()
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast({"vocab": b["vocab"], "merges": b["merges"]})
    ck = _vocab_key(b)

    @pandas_udf("struct<ids: array<int>, n: int>")
    def _enc(texts: pd.Series) -> pd.DataFrame:
        bb = bc.value
        cache = _shared_cache(ck)
        ids_out, n_out = [], []
        for t in texts:
            ids = encode_text(t, bb, cache)
            ids_out.append(ids)
            n_out.append(len(ids))
        return pd.DataFrame({"ids": ids_out, "n": n_out})

    st = _enc(F.col(text_col))
    return df.withColumn(out_ids, st["ids"]).withColumn(out_n, st["n"])


def chunk_token_ids(df, capacity: int, text_col: str = "text",
                    id_col: str = "doc_id", bpe: "dict | None" = None,
                    overlap: int = 0):
    """Tokenized context-window shards (r13): encode each document
    with BPE and split the id stream into chunks of at most
    ``capacity`` tokens — the artifact a pretraining pipeline actually
    emits (chunks may split MID-WORD: sequences are id streams, word
    alignment is not a boundary rule).  ``overlap`` > 0 makes windows
    start every ``capacity - overlap`` tokens (the sliding-context
    variant; the last window still ends at the stream end, shorter
    tails included once).  Returns ``(id_col, chunk_id, token_ids,
    n_tokens)``; documents with zero tokens produce zero chunks.

    Scale shape: one encode projection (:func:`bpe_encode`) + JVM-side
    array slicing and ONE explode per document's chunk list — no
    shuffle, no window, chunk count bounded by doc length/stride."""
    from pyspark.sql import functions as F

    cap = int(capacity)
    ov = int(overlap)
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    if not 0 <= ov < cap:
        raise ValueError("overlap must satisfy 0 <= overlap < capacity")
    stride = cap - ov
    enc = bpe_encode(df, text_col=text_col, bpe=bpe)
    ids = F.col("token_ids")
    # number of windows starting at 0, stride, 2*stride, … that still
    # cover a fresh token: ceil((n - overlap) / stride), floor 1
    n_chunks = F.greatest(
        F.ceil((F.size(ids) - F.lit(ov)) / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(ids, i * stride + 1, cap).alias("ids"),
        ),
    )
    return (
        enc.filter(F.size(ids) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.ids").alias("token_ids"),
            F.size("c.ids").alias("n_tokens"),
        )
    )


def bpe_token_count_col(df, text_col: str = "text",
                        bpe: "dict | None" = None):
    """A Column of model-accurate token counts for ``text_col`` — the
    opt-in ``n_tokens_col`` for token_budget_mix / pack_sequences_
    sharded.  Same UDF as :func:`bpe_encode`, counting only (the ids
    array never materializes on the wire)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    b = bpe or default_bpe()
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast({"vocab": b["vocab"], "merges": b["merges"]})
    ck = _vocab_key(b)

    @pandas_udf("int")
    def _cnt(texts: pd.Series) -> pd.Series:
        bb = bc.value
        cache = _shared_cache(ck)
        return pd.Series(
            [len(encode_text(t, bb, cache)) for t in texts],
            dtype="int32",
        )

    return _cnt(F.col(text_col))
