"""BPE tokenizer (ops/tokenize.py): trainer determinism, artifact
roundtrip, encoder invariants, Spark-UDF vs pure-Python parity, and
the model-accurate opt-in into the curation ops."""

from __future__ import annotations

import random
import string

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
    yield s


def _rand_texts(rng, n, unicode_=False):
    alpha = string.ascii_lowercase + string.digits
    if unicode_:
        alpha += "éüλ✓"
    out = []
    for _ in range(n):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 12)))
            for _ in range(rng.randrange(0, 20))
        ]
        out.append(" ".join(words))
    return out


def test_trainer_deterministic_and_roundtrip(tmp_path):
    from olive_spark.ops import tokenize

    rng = random.Random(7)
    corpus = _rand_texts(rng, 50) + ["the the the cat cat sat"] * 5
    a = tokenize.train_bpe(corpus, vocab_size=96)
    b = tokenize.train_bpe(list(corpus), vocab_size=96)
    assert a == b                           # deterministic
    assert a["vocab"][tokenize.UNK] == 0
    assert len(a["vocab"]) <= 96
    # ids are dense and unique
    ids = sorted(a["vocab"].values())
    assert ids == list(range(len(ids)))
    d = str(tmp_path / "bpe")
    tokenize.save_bpe(a, d)
    back = tokenize.load_bpe(d)
    assert back["vocab"] == a["vocab"]
    assert back["merges"] == a["merges"]


def test_encoder_invariants_random(tmp_path):
    """Symbols always reconstruct word + </w>; every merged symbol is
    in the vocab; unknown chars hit <unk>; empty/None → []."""
    from olive_spark.ops import tokenize

    rng = random.Random(11)
    bpe = tokenize.train_bpe(_rand_texts(rng, 80), vocab_size=128)
    ranks = tokenize._ranks(bpe)
    for w in {w for t in _rand_texts(rng, 40, unicode_=True)
              for w in t.split()}:
        syms = tokenize.encode_word(w, ranks)
        assert "".join(syms) == w + tokenize.EOW
    assert tokenize.encode_text("", bpe) == []
    assert tokenize.encode_text(None, bpe) == []
    assert tokenize.encode_text("   ", bpe) == []
    # unknown char: unicode word vs ascii-trained vocab
    ids = tokenize.encode_text("é", bpe)
    assert 0 in ids


def test_fixture_committed_and_reproducible():
    """The committed fixture loads, has the documented shape, and the
    builder script reproduces it byte-for-byte (no drift between the
    artifact and the trainer)."""
    import importlib.util
    import os

    from olive_spark.ops import tokenize

    b = tokenize.default_bpe()
    assert b["vocab"][tokenize.UNK] == 0
    assert len(b["merges"]) > 50
    spec = importlib.util.spec_from_file_location(
        "build_bpe_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "build_bpe_fixture.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = tokenize.train_bpe(mod.CORPUS, vocab_size=128)
    assert fresh["vocab"] == b["vocab"]
    assert fresh["merges"] == b["merges"]


def test_spark_udf_matches_reference(spark):
    """bpe_encode / bpe_token_count_col == the pure-Python spec encoder
    on randomized strings (incl. empties and unknown chars)."""
    from olive_spark.ops import tokenize

    rng = random.Random(23)
    texts = _rand_texts(rng, 60, unicode_=True) + ["", "   ", "scan scan"]
    b = tokenize.default_bpe()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens_bpe"])
        for r in tokenize.bpe_encode(df).collect()
    }
    cache: dict = {}
    for i, t in enumerate(texts):
        want = tokenize.encode_text(t, b, cache)
        assert got[i] == (want, len(want)), i
    cnt = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", tokenize.bpe_token_count_col(df).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert cnt[i] == len(tokenize.encode_text(t, b, cache)), i


def test_curation_bpe_opt_in(spark):
    """token_budget_mix / pack_sequences_sharded accept the BPE count
    column and reproduce the exact selection a pure-Python replay of
    the same counts predicts."""
    from olive_spark.ops import curation, tokenize

    rng = random.Random(31)
    rows = []
    for i in range(40):
        words = ["tokenization" if rng.random() < 0.5 else "scan"
                 for _ in range(rng.randrange(1, 15))]
        rows.append((i, "s%d" % (i % 2), " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    b = tokenize.default_bpe()
    cache: dict = {}
    nb = {i: len(tokenize.encode_text(t, b, cache)) for i, _s, t in rows}

    got = {
        (r["source"], r["doc_id"]): (r["n_tokens"], r["cum_tokens"])
        for r in curation.token_budget_mix(
            df, 60, n_tokens_col=tokenize.bpe_token_count_col(df),
        ).collect()
    }
    # pure-python replay: per source, longest-first then id, cut at 60
    want = {}
    for s in ("s0", "s1"):
        docs = sorted(
            [(i, nb[i]) for i, src, _t in rows if src == s],
            key=lambda x: (-x[1], x[0]),
        )
        cum = 0
        for i, n in docs:
            if cum + n > 60:
                break
            cum += n
            want[(s, i)] = (n, cum)
    assert got == want

    packs = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"])
        for r in curation.pack_sequences_sharded(
            df, capacity=64, shard_size=10,
            n_tokens_col=tokenize.bpe_token_count_col(df),
        ).collect()
    }
    assert {i for i, _s, _t in rows} == set(packs)
    for i, _s, _t in rows:
        assert packs[i][0] == nb[i], i


def test_decode_roundtrip():
    """decode(encode(t)) == whitespace-normalized t for in-alphabet
    text; unknown chars surface as the literal <unk> marker."""
    from olive_spark.ops import tokenize

    b = tokenize.default_bpe()
    alpha = [s for s in b["vocab"] if len(s) == 1 and s != tokenize.UNK]
    rng = random.Random(41)
    for _ in range(50):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 10)))
            for _ in range(rng.randrange(0, 12))
        ]
        t = "  ".join(words)
        ids = tokenize.encode_text(t, b)
        assert tokenize.decode_ids(ids, b) == " ".join(t.split())
    assert tokenize.decode_ids([], b) == ""
    assert tokenize.UNK in tokenize.decode_ids(
        tokenize.encode_text("λ", b), b
    )


def test_chunk_token_ids(spark):
    """Context-window shards: chunks tile the id stream exactly (incl.
    mid-word splits), last chunk carries the remainder, empty docs
    emit nothing, capacity 1 degenerates to one id per chunk."""
    from olive_spark.ops import tokenize

    b = tokenize.default_bpe()
    texts = ["tokenization scan merge " * 6, "scan", "", "   ",
             "tokenization"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got: dict = {}
    for r in tokenize.chunk_token_ids(df, capacity=7).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], list(r["token_ids"]), r["n_tokens"])
        )
    cache: dict = {}
    for i, t in enumerate(texts):
        ids = tokenize.encode_text(t, b, cache)
        want = [
            (j, ids[j * 7:(j + 1) * 7], min(7, len(ids) - j * 7))
            for j in range((len(ids) + 6) // 7)
        ]
        assert sorted(got.get(i, [])) == want, i
    one = tokenize.chunk_token_ids(df.limit(1), capacity=1).collect()
    assert all(r["n_tokens"] == 1 for r in one)
    with pytest.raises(ValueError):
        tokenize.chunk_token_ids(df, capacity=0)


def test_chunk_token_ids_overlap(spark):
    """Sliding-context shards: windows start every capacity-overlap
    tokens, each covers <=capacity ids, every token appears in at
    least one window, and consecutive windows share exactly `overlap`
    ids away from the tail."""
    from olive_spark.ops import tokenize

    b = tokenize.default_bpe()
    text = "tokenization scan merge window " * 5
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    ids = tokenize.encode_text(text, b)
    cap, ov = 8, 3
    rows = sorted(
        (r["chunk_id"], list(r["token_ids"]))
        for r in tokenize.chunk_token_ids(
            df, capacity=cap, overlap=ov).collect()
    )
    stride = cap - ov
    import math
    assert len(rows) == max(1, math.ceil((len(ids) - ov) / stride))
    covered = []
    for j, (cid, c) in enumerate(rows):
        assert cid == j
        assert c == ids[j * stride: j * stride + cap]
        covered.extend(range(j * stride, j * stride + len(c)))
    assert set(covered) == set(range(len(ids)))
    with pytest.raises(ValueError):
        tokenize.chunk_token_ids(df, capacity=4, overlap=4)


def test_merge_loop_first_occurrence_equivalence():
    """Pins the spec docstring's equivalence claim: merging the FIRST
    occurrence of the min-rank pair per step yields the same fixpoint
    as the standard all-occurrences-left-to-right variant (a merge at
    rank r only creates pairs learned after r).  Randomized over small
    alphabets so repeated/overlapping runs (aaaa…) are common."""
    from olive_spark.ops import tokenize

    def encode_all_occ(word, ranks):
        syms = list(word) + [tokenize.EOW]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and ranks.get((syms[i], syms[i + 1])) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return tuple(syms)

    rng = random.Random(67)
    for trial in range(20):
        alpha = "ab" if trial % 3 == 0 else "abc"
        corpus = [" ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 9)))
            for _ in range(30)
        ) for _ in range(5)]
        bpe = tokenize.train_bpe(corpus, vocab_size=40)
        ranks = tokenize._ranks(bpe)
        for _ in range(60):
            w = "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(1, 14)))
            assert tokenize.encode_word(w, ranks) == \
                encode_all_occ(w, ranks), (trial, w)


# ---------------------------------------------------- byte-level (r14)

def test_bytes_to_unicode_table():
    """The GPT-2 remapping contract: a 256-key bijection onto
    non-whitespace printable chars, identity on printable ASCII."""
    from olive_spark.ops.tokenize import bytes_to_unicode

    m = bytes_to_unicode()
    assert sorted(m) == list(range(256))
    assert len(set(m.values())) == 256
    assert all(not c.isspace() for c in m.values())
    for b in range(ord("!"), ord("~") + 1):
        assert m[b] == chr(b)


def test_byte_level_roundtrip_and_no_unk(tmp_path):
    """Byte mode encodes ANY text — emoji, control chars, mixed
    scripts — with zero <unk>, and decode inverts exactly (modulo
    whitespace normalization)."""
    from olive_spark.ops import tokenize

    corpus = ["scan the column " * 5, "données 😀 naïve café " * 3]
    b = tokenize.train_bpe(corpus, vocab_size=300, byte_level=True)
    assert b["byte_level"]
    # full byte alphabet present: 256 byte symbols + EOW + unk
    assert len(b["vocab"]) >= 258
    hostile = "héΩ😀 x\ty 数据 \x00\x07 end"
    ids = tokenize.encode_text(hostile, b)
    assert ids and 0 not in ids
    assert tokenize.decode_ids(ids, b) == " ".join(hostile.split())
    # artifacts roundtrip with the mode flag
    d = str(tmp_path / "bpe")
    tokenize.save_bpe(b, d)
    b2 = tokenize.load_bpe(d)
    assert b2["byte_level"] and b2["vocab"] == b["vocab"]
    assert tokenize.encode_text(hostile, b2) == ids


def test_byte_fixture_committed_and_reproducible():
    from olive_spark.ops import tokenize

    b = tokenize.default_bpe_bytes()
    assert b["byte_level"]
    assert b["vocab"][tokenize.UNK] == 0
    assert len(b["merges"]) > 50
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "build_bpe_fixture",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "build_bpe_fixture.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = tokenize.train_bpe(mod.CORPUS, vocab_size=384,
                               byte_level=True)
    assert fresh["vocab"] == b["vocab"]
    assert fresh["merges"] == b["merges"]


def test_synthesize_bpe_deterministic_and_valid():
    """The 50k synthetic table: deterministic, structurally valid BPE
    (every merge's parts are earlier tokens or base bytes), GPT-2
    scale, and the encoder runs it unchanged."""
    from olive_spark.ops import tokenize

    big = tokenize.synthesize_bpe(5_000)   # scaled-down for the gate
    big2 = tokenize.synthesize_bpe(5_000)
    assert big["merges"] == big2["merges"]
    assert big["vocab"] == big2["vocab"]
    assert len(big["merges"]) == 5_000
    produced = set(tokenize.B2U.values()) | {tokenize.EOW}
    for l, r in big["merges"]:
        assert l in produced and r in produced, (l, r)
        assert tokenize.EOW not in l  # nothing follows a word end
        produced.add(l + r)
    ids = tokenize.encode_text("scan the column data fast", big)
    assert ids and 0 not in ids


def test_distributed_trainer_parity(spark):
    """train_bpe_distributed produces the IDENTICAL merge list and
    vocab as the driver-local trainer, both modes (r14 task #4)."""
    from olive_spark.ops import tokenize

    corpus = [
        "the scan scans the column columns fast " * 6,
        "pack your box with five dozen jugs " * 3,
        "aa aa aab aab aab bba " * 4,
    ]
    df = spark.createDataFrame([(t,) for t in corpus],
                               schema="text string")
    for bl, vs in ((False, 60), (True, 290)):
        local = tokenize.train_bpe(corpus, vocab_size=vs, byte_level=bl)
        dist = tokenize.train_bpe_distributed(
            spark, df, vocab_size=vs, byte_level=bl, checkpoint_every=8,
            local_threshold=0,   # force the full Spark iteration loop
        )
        assert dist["merges"] == local["merges"], bl
        assert dist["vocab"] == local["vocab"], bl
        assert len(local["merges"]) > 5, bl
        # the small-state cutover (default threshold) is the SAME result
        hybrid = tokenize.train_bpe_distributed(
            spark, df, vocab_size=vs, byte_level=bl
        )
        assert hybrid["merges"] == local["merges"], bl
        assert hybrid["vocab"] == local["vocab"], bl


def test_spark_udf_matches_reference_byte_mode(spark):
    """bpe_encode parity with the pure-Python spec encoder under the
    byte fixture (the plumbing proof: broadcast, Arrow batching, and
    the executor cache keyed by the byte-mode fingerprint)."""
    from olive_spark.ops import tokenize

    b = tokenize.default_bpe_bytes()
    texts = [
        "scan the column data",
        "naïve café 😀 données",
        "", None, "   ", "a b c d e f",
        "tabs\tand\nnewlines mix",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="i int, text string"
    )
    got = {
        r["i"]: (list(r["token_ids"]), r["n_tokens_bpe"])
        for r in tokenize.bpe_encode(df, bpe=b).collect()
    }
    for i, t in enumerate(texts):
        want = tokenize.encode_text(t, b)
        assert got[i] == (want, len(want)), (i, t)


@pytest.mark.slow
def test_real_vocab_scale_proof(spark):
    """VERDICT r13 task #2 'Done' gate: a 50,257-entry / 50k-merge
    byte-level table (synthesize_bpe — the corpus can't train one, it
    has 31 distinct words) through bpe_encode over the FULL sf0.1
    documents corpus (~270k words, ~98 MB text):

    - value parity with the pure-Python spec encoder on every 17th doc,
    - aggregate parity: total token count == pure-Python total on a
      deterministic 500-doc sample,
    - throughput + broadcast size printed for BASELINE.md, measured on
      BOTH the Zipf corpus (cache-friendly) and a high-entropy corpus
      of ~100k DISTINCT words (per-distinct-word cost — the honest
      number, the synthetic corpus has only 31 distinct words)."""
    import pickle
    import time

    from pyspark.sql import functions as F

    from olive_spark.ops import tokenize

    big = tokenize.synthesize_bpe(50_000)
    assert len(big["vocab"]) >= 50_257
    payload = {"vocab": big["vocab"], "merges": big["merges"],
               "byte_level": True}
    bsize = len(pickle.dumps(payload))

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_docs = docs.count()
    t0 = time.time()
    enc = tokenize.bpe_encode(docs, bpe=big)
    agg = enc.agg(F.sum("n_tokens_bpe").alias("n")).collect()[0]
    zipf_s = time.time() - t0
    total = int(agg["n"])
    assert total > 0

    # row-level parity on a deterministic slice
    sample = enc.filter(F.col("doc_id") % 17 == 0) \
        .select("doc_id", "text", "token_ids").collect()
    assert sample
    for r in sample:
        assert list(r["token_ids"]) == tokenize.encode_text(r["text"], big)

    # high-entropy corpus: ~100k distinct words, 8 words per row
    hi = spark.range(100_000 // 8).select(
        F.concat_ws(" ", *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{j}")))
            for j in range(8)
        ]).alias("text")
    )
    t0 = time.time()
    hi_total = int(
        tokenize.bpe_encode(hi, bpe=big)
        .agg(F.sum("n_tokens_bpe").alias("n")).collect()[0]["n"]
    )
    hi_s = time.time() - t0
    print(
        f"\nBPE-50K docs={n_docs} tokens={total} zipf_s={zipf_s:.2f} "
        f"zipf_tok_per_s={total/zipf_s:,.0f} hi_tokens={hi_total} "
        f"hi_s={hi_s:.2f} hi_tok_per_s={hi_total/hi_s:,.0f} "
        f"broadcast_bytes={bsize}"
    )
    assert hi_total > 0


# ------------------------------------------------- gpt2 pretok (r14)

def test_gpt2_pretokenizer_three_engine_parity(spark):
    """The ASCII-explicit pattern must tokenize IDENTICALLY in Python
    re (the spec encoder), Java regex (Spark executors), and RE2
    (the DuckDB oracle) — the property the hash oracle rests on —
    and the token stream must COVER the text exactly (losslessness)."""
    import duckdb
    from pyspark.sql import functions as F

    from olive_spark.ops.tokenize import GPT2_SPLIT_PATTERN, pretokenize

    texts = [
        "Hello world!  It's 2024...", "tabs\tand\nnewlines  end ",
        "  leading", "naïve café 😀", "a1b2 c'd", "don't we'll I'm",
        "   ", "x", "'s alone", "mixé123!!", "a  b   c", "-3.14e+10",
        "__dunder__ [x](y) \"quoted\" 'single'", "\r\n\r\n",
    ]
    py = {t: pretokenize(t, "gpt2") for t in texts}
    for t, toks in py.items():
        assert "".join(toks) == t, (t, toks)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jv = {
        r["text"]: list(r["toks"])
        for r in df.select(
            "text",
            F.regexp_extract_all(
                F.col("text"), F.lit(GPT2_SPLIT_PATTERN), 0
            ).alias("toks"),
        ).collect()
    }
    for t in texts:
        assert jv[t] == py[t], ("java", t, jv[t], py[t])
        db = duckdb.sql(
            "SELECT regexp_extract_all(?, ?)",
            params=[t, GPT2_SPLIT_PATTERN],
        ).fetchone()[0]
        assert db == py[t], ("re2", t, db, py[t])


def test_gpt2_mode_lossless_roundtrip(tmp_path):
    """decode(encode(t)) == t EXACTLY — whitespace runs, tabs,
    newlines, punctuation, unicode — the property whitespace mode
    can't give (it normalizes separators)."""
    from olive_spark.ops import tokenize

    corpus = ["Hello  world!\tIt's 2024... naïve café 😀 scan data "]
    b = tokenize.train_bpe(corpus, vocab_size=330, byte_level=True,
                           pretokenizer="gpt2")
    for t in [
        "Hello  world!\tdon't   x\n\nnaïve 😀 ",
        "  leading and trailing  ", "a\r\nb", "", "x",
    ]:
        ids = tokenize.encode_text(t, b)
        assert tokenize.decode_ids(ids, b) == t, repr(t)
        assert 0 not in ids
    # artifacts roundtrip with both mode flags
    d = str(tmp_path / "g")
    tokenize.save_bpe(b, d)
    b2 = tokenize.load_bpe(d)
    assert b2["byte_level"] and b2["pretokenizer"] == "gpt2"
    assert b2["vocab"] == b["vocab"] and b2["merges"] == b["merges"]
    # gpt2 pretok without byte_level is refused (spaces would break
    # the merges.txt line format)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="byte_level"):
        tokenize.train_bpe(corpus, vocab_size=200, pretokenizer="gpt2")


def test_gpt2_fixture_committed_and_reproducible():
    from olive_spark.ops import tokenize

    b = tokenize.default_bpe_gpt2()
    assert b["byte_level"] and b["pretokenizer"] == "gpt2"
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "build_bpe_fixture",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "build_bpe_fixture.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = tokenize.train_bpe(mod.CORPUS, vocab_size=384,
                               byte_level=True, pretokenizer="gpt2")
    assert fresh["vocab"] == b["vocab"]
    assert fresh["merges"] == b["merges"]


def test_gpt2_spark_udf_and_distributed_trainer_parity(spark):
    from olive_spark.ops import tokenize

    b = tokenize.default_bpe_gpt2()
    texts = ["Hello  world! It's x", None, "", "tab\there  ", "a'd-3"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r["i"]: list(r["token_ids"])
        for r in tokenize.bpe_encode(df, bpe=b).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize.encode_text(t, b), (i, t)
    # distributed trainer parity in gpt2 mode
    corpus = ["the scan scans, the scan's data! " * 4,
              "pack  your box:\twith five jugs " * 3]
    cdf = spark.createDataFrame([(t,) for t in corpus], "text string")
    local = tokenize.train_bpe(corpus, vocab_size=300, byte_level=True,
                               pretokenizer="gpt2")
    dist = tokenize.train_bpe_distributed(
        spark, cdf, vocab_size=300, byte_level=True, pretokenizer="gpt2",
        checkpoint_every=8, local_threshold=0,
    )
    assert dist["merges"] == local["merges"]
    assert dist["vocab"] == local["vocab"]
    assert len(local["merges"]) > 5


def test_trainer_oracle_agrees_on_adjacent_pairs(spark):
    """ADVICE r14 (high): the llm_bpe_train_corpus oracle's
    separator-framed REPLACE must merge ADJACENT occurrences of the
    winning pair exactly like the trainers' left-to-right scan.  With a
    single-separator frame, 'a b a b' shares the middle separator and
    REPLACE merges only the first occurrence — this corpus (abab/haha/
    cocoa words, where the winning pair recurs back-to-back inside one
    word) diverged at rank 0 before the r15 doubled-separator fix."""
    import duckdb
    import pandas as pd

    from olive_spark.ops import tokenize
    from olive_spark.queries.llm import _TRAIN_MERGES, _sql_bpe_train_corpus

    corpus = [
        "abab abab haha cocoa", "cocoa abab haha xyxyxy",
        "abab haha cocoa xyxyxy",
    ]
    local = tokenize.train_bpe(corpus, vocab_size=1 << 20)
    df = spark.createDataFrame([(t,) for t in corpus], schema="text string")
    dist = tokenize.train_bpe_distributed(
        spark, df, vocab_size=1 << 20, max_merges=_TRAIN_MERGES,
        local_threshold=0,
    )
    assert dist["merges"] == local["merges"][:_TRAIN_MERGES]
    local = {"merges": local["merges"][:_TRAIN_MERGES]}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": corpus}))
    got = con.execute(
        _sql_bpe_train_corpus() + " ORDER BY rank"
    ).fetchall()
    want = [(i, f"{l} {r}") for i, (l, r) in enumerate(local["merges"])]
    assert got == want, (got, want)
