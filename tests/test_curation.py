"""Unit tests pinning curation-operator semantics on handcrafted rows
(the oracle harness checks corpus-sized runs; these pin the edge cases:
multiple PII hits per doc, stratum boundary rates, fingerprint length
clamps, packing boundary behavior)."""

from __future__ import annotations

import pytest


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


def test_pii_redact_counts_and_masks(spark):
    from olive_spark.ops.curation import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org, call 555-0123"),
            (2, "no pii here"),
            (3, "555-1 555-2"),
        ],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in pii_redact(df, "text").collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL>, call <PHONE>"
    assert rows[2]["n_emails"] == 0 and rows[2]["redacted"] == "no pii here"
    assert rows[3]["n_phones"] == 2 and rows[3]["redacted"] == "<PHONE> <PHONE>"


def test_stratified_sample_rate_boundaries(spark):
    from olive_spark.ops.curation import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i < 200 else "fr") for i in range(400)], ["k", "lang"]
    )
    kept = stratified_sample(df, "lang", "k", {"en": 10}, default_rate=50).collect()
    en = [r["k"] for r in kept if r["lang"] == "en"]
    fr = [r["k"] for r in kept if r["lang"] == "fr"]
    # en: k%100 < 10 → 0-9 and 100-109; fr: k%100 < 50
    assert sorted(en) == list(range(10)) + list(range(100, 110))
    assert len(fr) == 100 and all(k % 100 < 50 for k in fr)


def test_prefix_fingerprint_clamps_short_docs(spark):
    from pyspark.sql import functions as F

    from olive_spark.ops.curation import prefix_fingerprint

    df = spark.createDataFrame(
        [("one two three four five six seven eight nine",), ("tiny doc",)],
        ["text"],
    )
    got = [r["fp"] for r in df.select(prefix_fingerprint("text", 8).alias("fp")).collect()]
    assert got[0] == "one two three four five six seven eight"
    assert got[1] == "tiny doc"


def test_bigram_topk_counts(spark):
    from olive_spark.ops.curation import bigram_topk

    df = spark.createDataFrame(
        [("a b a b",), ("a b c",), ("solo",)], ["text"]
    )
    got = {(r["bigram"], r["n"]) for r in bigram_topk(df, "text", k=5).collect()}
    # "a b" appears in doc1 twice + doc2 once; "b a" once; "b c" once
    assert got == {("a b", 3), ("b a", 1), ("b c", 1)}


def test_contamination_exact_prefix_only(spark):
    from olive_spark.ops.curation import contamination_check

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma", "s1"), (2, "alpha beta delta", "s1"),
         (3, "other text here", "s2")],
        ["doc_id", "text", "source"],
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma",), ("unrelated words",)], ["text"]
    )
    got = {(r["source"], r["n_contaminated"])
           for r in contamination_check(corpus, bench, "text", n_words=3).collect()}
    assert got == {("s1", 1)}  # only doc 1 matches the full 3-word prefix


def test_token_budget_mix_boundary_and_tiebreak(spark):
    """Longest-first per source; a doc that would cross the budget is
    excluded (hard cap, not nearest); equal lengths break ties by id."""
    from olive_spark.ops import curation

    rows = [
        # src a: 3+3+2 tokens, budget 6 → the two 3-token docs only;
        # ids 2 and 1 share length 3 → both kept, cum order by id
        (1, "one two three", "a"),
        (2, "uno dos tres", "a"),
        (3, "pair of", "a"),
        # src b: single 8-token doc over budget → excluded entirely
        (4, "a b c d e f g h", "b"),
        # src c: empty text (0 tokens) + 1 token
        (5, "", "c"),
        (6, "solo", "c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = curation.token_budget_mix(df, budget_per_source=6)
    got = {(r["source"], r["doc_id"], r["n_tokens"], r["cum_tokens"])
           for r in out.collect()}
    assert got == {
        ("a", 1, 3, 3), ("a", 2, 3, 6),
        ("c", 6, 1, 1), ("c", 5, 0, 1),
    }


def test_chunk_documents_overlap_and_tail(spark):
    """Window starts advance by stride; a tail window exists only when
    it adds uncovered tokens (a start whose predecessor reached the end
    would be a strict subset — duplicated text); empty docs yield one
    empty chunk (provenance preserved)."""
    from olive_spark.ops import curation

    rows = [(1, "w1 w2 w3 w4 w5"), (2, ""), (3, "only"), (4, "a b c d")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["doc_id"], r["chunk_start"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in curation.chunk_documents(df, chunk=3, stride=2).collect()
    }
    assert out == {
        (1, 0): ("w1 w2 w3", 3),
        (1, 2): ("w3 w4 w5", 3),  # reaches the end; no subset chunk at 4
        (2, 0): ("", 0),
        (3, 0): ("only", 1),
        (4, 0): ("a b c", 3),
        (4, 2): ("c d", 2),  # short tail kept: token d was uncovered
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stride"):
        curation.chunk_documents(df, chunk=3, stride=0)

    # gap sampling (stride > chunk): starts clamp to the array — no
    # spurious empty chunk for a non-empty doc
    gap = {
        (r["doc_id"], r["chunk_start"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in curation.chunk_documents(
            spark.createDataFrame([(7, "a b c d e f")], ["doc_id", "text"]),
            chunk=2, stride=4,
        ).collect()
    }
    assert gap == {(7, 0): ("a b", 2), (7, 4): ("e f", 2)}


def test_gopher_rules_individual_gates(spark):
    """Each rule flips on its own trigger; pass requires all."""
    from olive_spark.ops import textstats

    good = ("the cat sat with the dog and that was fine to see " * 6).strip()
    bullets = "\n".join("- item %d here" % i for i in range(10))
    no_stop = "alpha beta gamma delta " * 15
    symbols = ("the cat sat with the dog ### ### ### ### ### "
               "and that was fine " * 3).strip()
    rows = [(1, good), (2, bullets), (3, no_stop), (4, symbols),
            (5, good + "\n"), (6, "\t" + good + " \n ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in textstats.gopher_rules(
        df, min_words=10
    ).collect()}
    assert out[1]["passed"] is True
    assert out[2]["ok_bullet"] is False and out[2]["passed"] is False
    assert out[3]["ok_stopwords"] is False and out[3]["passed"] is False
    assert out[4]["ok_symbol_ratio"] is False and out[4]["passed"] is False
    # boundary whitespace must not mint empty tokens: same word count
    # (and same verdict) as the clean doc — the oracle-parity edge
    assert out[5]["n_words"] == out[1]["n_words"] and out[5]["passed"] is True
    assert out[6]["n_words"] == out[1]["n_words"] and out[6]["passed"] is True


def test_chunk_documents_matches_reference_on_random_docs(spark):
    """200 seeded random docs across the chunk/stride parameter mix
    must reproduce a direct Python reference exactly — pins the start
    bound (no subset tails, no out-of-range starts) over doc lengths
    straddling every boundary case."""
    import random

    from olive_spark.ops import curation

    rng = random.Random(7)
    docs = []
    for i in range(200):
        n = rng.choice([0, 1, rng.randrange(0, 200)])
        docs.append((i, " ".join(f"w{j}" for j in range(n))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    for chunk, stride in [(64, 48), (3, 2), (5, 5), (2, 4)]:
        expect = {}
        for i, text in docs:
            toks = text.split()
            size = len(toks)
            bound = max(min(size - chunk + stride - 1, size - 1), 0)
            s = 0
            while s <= bound:
                piece = toks[s:s + chunk]
                expect[(i, s)] = (" ".join(piece), len(piece))
                s += stride
        got = {
            (r["doc_id"], r["chunk_start"]): (r["chunk_text"], r["n_chunk_tokens"])
            for r in curation.chunk_documents(
                df, chunk=chunk, stride=stride
            ).collect()
        }
        assert got == expect, (chunk, stride)


def test_pack_sequences_sharded_matches_reference(spark):
    """Seeded random corpora across capacity/shard_size configs must
    reproduce a direct Python reference of the shard-restart packing
    semantics exactly: within-shard cumsum in doc-id order, pack ids
    offset by max(1, ceil(shard_tokens/capacity)) of earlier shards —
    including sparse doc ids, empty docs, and all-empty shards."""
    import random

    from olive_spark.ops import curation

    rng = random.Random(11)
    docs = []
    for i in range(180):
        doc_id = i * rng.choice([1, 1, 3])  # sparse ids hit shard gaps
        n = rng.choice([0, 1, rng.randrange(0, 60)])
        docs.append((doc_id, " ".join(f"w{j}" for j in range(n))))
    docs = list({d: t for d, t in docs}.items())
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    for capacity, shard_size in [(64, 25), (4096, 100), (1, 7), (10, 1)]:
        shards: dict[int, list] = {}
        for doc_id, text in docs:
            nt = len(text.split())
            shards.setdefault(doc_id // shard_size, []).append((doc_id, nt))
        expect = {}
        off = 0
        for sh in sorted(shards):
            cum = 0
            for doc_id, nt in sorted(shards[sh]):
                expect[doc_id] = (nt, off + cum // capacity)
                cum += nt
            off += max(1, (cum + capacity - 1) // capacity)
        got = {
            r["doc_id"]: (r["n_tokens"], r["pack_id"])
            for r in curation.pack_sequences_sharded(
                df, capacity=capacity, shard_size=shard_size
            ).collect()
        }
        assert got == expect, (capacity, shard_size)


def test_pack_sequences_sharded_empty_and_validation(spark):
    from olive_spark.ops import curation

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert curation.pack_sequences_sharded(empty).count() == 0
    with pytest.raises(ValueError):
        curation.pack_sequences_sharded(empty, capacity=0)
    with pytest.raises(ValueError):
        curation.pack_sequences_sharded(empty, shard_size=0)


def test_ngram_decontaminate_counts_and_flag_boundary(spark):
    """Distinct n-grams per doc, matched against the benchmark set;
    integer-cleared flag at the exact boundary; docs shorter than n
    have nothing to leak and drop out."""
    from olive_spark.ops import curation

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )  # bench 2-grams: {alpha beta, beta gamma, gamma delta}
    corpus = spark.createDataFrame(
        [
            # 4 distinct 2-grams, 2 matched -> exactly 50% -> flagged at 50
            (1, "alpha beta gamma x y"),
            # repeated bigram counted once (distinct): 2 grams, 0 matched
            (2, "x y x y"),
            # 1 distinct gram, matched -> 100%
            (3, "gamma delta"),
            # shorter than n -> absent
            (4, "solo"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curation.ngram_decontaminate(
        corpus, bench, n=2, max_overlap_pct=50
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["total_ngrams"], out[1]["matched_ngrams"], out[1]["flagged"]) \
        == (4, 2, True)  # 2*100 >= 50*4 boundary inclusive
    assert (out[2]["total_ngrams"], out[2]["matched_ngrams"], out[2]["flagged"]) \
        == (2, 0, False)
    assert (out[3]["total_ngrams"], out[3]["matched_ngrams"], out[3]["flagged"]) \
        == (1, 1, True)
    with pytest.raises(ValueError):
        curation.ngram_decontaminate(corpus, bench, n=0)


def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    from olive_spark.ops import curation

    df = spark.createDataFrame(
        [
            (1, "b\na\nb\nc\na"),
            (2, "only"),
            (3, "x\nx\nx"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curation.dedup_lines(df).collect()}
    assert (out[1]["n_lines"], out[1]["n_unique"], out[1]["cleaned"]) \
        == (5, 3, "b\na\nc")
    assert (out[2]["n_lines"], out[2]["n_unique"], out[2]["cleaned"]) \
        == (1, 1, "only")
    assert (out[3]["n_lines"], out[3]["n_unique"], out[3]["cleaned"]) \
        == (3, 1, "x")


def test_remove_boilerplate_lines_distinct_doc_threshold(spark):
    """Frequency counts DISTINCT docs (a line twice in one doc counts
    once); survivors keep order; all-boilerplate docs drop out."""
    from olive_spark.ops import curation

    rows = [
        (1, "footer\ncontent one\nfooter"),   # footer x2 = 1 distinct doc
        (2, "footer\ncontent two"),
        (3, "content three\nfooter"),
        (4, "footer"),                        # all-boilerplate -> drops out
        (5, "rare\nrare"),                    # rare line: only 1 doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curation.remove_boilerplate_lines(
        df, min_docs=3
    ).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1]["n_kept"], out[1]["cleaned"]) == (1, "content one")
    assert (out[3]["n_kept"], out[3]["cleaned"]) == (1, "content three")
    assert (out[5]["n_kept"], out[5]["cleaned"]) == (2, "rare\nrare")
    with pytest.raises(ValueError):
        curation.remove_boilerplate_lines(df, min_docs=1)


def test_token_budget_mix_matches_bruteforce_on_random_corpora(spark):
    """Seeded random corpora across budgets must reproduce the direct
    sequential definition (sort by tokens desc then id, running sum,
    cut at budget) exactly — pins the two-phase histogram-prune +
    bucket-rank rewrite, including heavy length ties, zero-token docs,
    and budgets straddling bucket boundaries."""
    import random

    from olive_spark.ops import curation

    rng = random.Random(99)
    rows = []
    for i in range(300):
        src = rng.choice(["a", "b", "c"])
        # heavy ties: lengths drawn from a tiny set, plus empties
        n = rng.choice([0, 1, 3, 3, 3, 7, 7, 20])
        rows.append((i, " ".join(f"w{j}" for j in range(n)), src))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    for budget in (0, 5, 21, 100, 10_000):
        expect = set()
        by_src: dict[str, list] = {}
        for i, text, src in rows:
            by_src.setdefault(src, []).append((len(text.split()), i))
        for src, docs in by_src.items():
            cum = 0
            for n, i in sorted(docs, key=lambda d: (-d[0], d[1])):
                cum += n
                if cum <= budget:
                    expect.add((src, i, n, cum))
        got = {(r["source"], r["doc_id"], r["n_tokens"], r["cum_tokens"])
               for r in curation.token_budget_mix(df, budget).collect()}
        assert got == expect, budget


def test_ngram_decontaminate_matches_bruteforce_on_random_docs(spark):
    import random

    from olive_spark.ops import curation

    rng = random.Random(5)
    vocab = [f"v{k}" for k in range(8)]  # tiny vocab -> real collisions
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
            for i in range(120)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    bench_df = df.filter((df.doc_id % 4) == 0)
    corpus_df = df.filter((df.doc_id % 4) != 0)

    for n, pct in [(2, 50), (3, 10)]:
        bench_grams = set()
        for i, t in docs:
            w = t.split()
            if i % 4 == 0 and len(w) >= n:
                bench_grams |= {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
        expect = {}
        for i, t in docs:
            w = t.split()
            if i % 4 == 0 or len(w) < n:
                continue
            gs = {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
            m = len(gs & bench_grams)
            expect[i] = (len(gs), m, m * 100 >= pct * len(gs))
        got = {r["doc_id"]: (r["total_ngrams"], r["matched_ngrams"], r["flagged"])
               for r in curation.ngram_decontaminate(
                   corpus_df, bench_df, n=n, max_overlap_pct=pct
               ).collect()}
        assert got == expect, (n, pct)


def test_remove_boilerplate_matches_bruteforce_on_random_docs(spark):
    import random

    from olive_spark.ops import curation

    rng = random.Random(21)
    pool = [f"line {k}" for k in range(12)]
    docs = []
    for i in range(150):
        n = rng.randrange(1, 6)
        docs.append((i, "\n".join(rng.choice(pool) for _ in range(n))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    for min_docs in (2, 20, 1000):
        counts: dict[str, set] = {}
        for i, t in docs:
            for ln in t.split("\n"):
                counts.setdefault(ln, set()).add(i)
        frequent = {ln for ln, s in counts.items() if len(s) >= min_docs}
        expect = {}
        for i, t in docs:
            kept = [ln for ln in t.split("\n") if ln not in frequent]
            if kept:
                expect[i] = (len(kept), "\n".join(kept))
        got = {r["doc_id"]: (r["n_kept"], r["cleaned"])
               for r in curation.remove_boilerplate_lines(
                   df, min_docs=min_docs
               ).collect()}
        assert got == expect, min_docs


def test_token_budget_mix_hot_bucket_path_is_exact(spark):
    """Hot-bucket auto-mitigation (r7 audit): force the hot branch by
    setting hot_bucket_rows below a fixed-length bucket's row count.
    The id-range-grouped two-pass ranking must reproduce the cold
    single-task window's output EXACTLY (same kept set, same
    cum_tokens), including a budget boundary that falls mid-bucket,
    and the plan's hot-branch ranking window must partition by the
    deterministic __grp column (never by physical partition id — see
    the r8 review: spark_partition_id disagrees across re-evaluations)."""
    from olive_spark.ops import curation

    # one degenerate 400-row bucket (crawl, 5 tokens each) + a small
    # varied source that stays on the cold path next to it
    rows = [(i, "w x y z q", "crawl") for i in range(400)]
    rows += [(1000 + i, " ".join(["x"] * (3 * i + 1)), "books")
             for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    cold = curation.token_budget_mix(df, 1000)  # default: nothing hot
    hot = curation.token_budget_mix(df, 1000, hot_bucket_rows=50)
    cold_rows = sorted(map(tuple, cold.collect()))
    hot_rows = sorted(map(tuple, hot.collect()))
    assert hot_rows == cold_rows
    # budget boundary mid-bucket: exactly 200 of the 400 crawl docs
    assert sum(1 for r in hot_rows if r[0] == "crawl") == 200
    # lowest-id docs win the tiebreak, with exact running sums
    crawl = [r for r in hot_rows if r[0] == "crawl"]
    assert {r[1] for r in crawl} == set(range(200))
    assert {r[3] for r in crawl} == {5 * k for k in range(1, 201)}
    plan = hot._jdf.queryExecution().executedPlan().toString()
    assert "__grp" in plan, "hot branch lost its id-range grouping"
    assert "SparkPartitionID" not in plan, "nondeterministic partition id in ranking"


def test_cap_per_group_matches_naive_window(spark):
    """Two-phase salted cap must be EXACT: identical kept set to the
    naive single window, including order-column ties."""
    from pyspark.sql import Window, functions as F

    from olive_spark.ops.curation import cap_per_group

    df = spark.range(2000).selectExpr(
        "id", "concat('d', id % 7) AS dom", "cast(id % 13 AS int) AS score"
    )
    got = cap_per_group(df, "dom", 5, "score", tiebreak_col="id")
    w = Window.partitionBy("dom").orderBy(F.col("score").desc(), F.col("id"))
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).drop("rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # groups smaller than the cap survive whole
    tiny = spark.range(3).selectExpr("id", "'x' AS dom", "cast(1 as int) AS score")
    assert cap_per_group(tiny, "dom", 10, "score", tiebreak_col="id").count() == 3


class TestHashSplit:
    def test_matches_python_reference_and_proportions(self, spark):
        import hashlib

        from olive_spark.ops.curation import hash_split

        df = spark.range(5000).selectExpr("id AS k")
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
        got = {
            r["k"]: r["split"]
            for r in hash_split(df, "k", weights, seed=7).collect()
        }
        cuts = []
        acc = 0.0
        names = list(weights)
        for n in names[:-1]:
            acc += weights[n]
            cuts.append((n, format(int(acc * (1 << 32)), "08x")))
        def ref(k):
            h = hashlib.md5(f"{k}:7".encode()).hexdigest()[:8]
            for n, c in cuts:
                if h < c:
                    return n
            return names[-1]
        assert got == {k: ref(k) for k in range(5000)}
        from collections import Counter

        frac = Counter(got.values())
        assert abs(frac["train"] / 5000 - 0.8) < 0.02
        assert abs(frac["val"] / 5000 - 0.1) < 0.01

    def test_seed_changes_assignment_weights_validated(self, spark):
        import pytest as _pytest

        from olive_spark.ops.curation import hash_split

        df = spark.range(500).selectExpr("id AS k")
        w = {"a": 0.5, "b": 0.5}
        s0 = {r["k"]: r["split"] for r in hash_split(df, "k", w, 0).collect()}
        s1 = {r["k"]: r["split"] for r in hash_split(df, "k", w, 1).collect()}
        assert s0 != s1, "a new seed must re-deal"
        # determinism: same call twice -> identical
        again = {r["k"]: r["split"] for r in hash_split(df, "k", w, 0).collect()}
        assert again == s0
        with _pytest.raises(ValueError, match="sum to 1"):
            hash_split(df, "k", {"a": 0.5, "b": 0.6})
        with _pytest.raises(ValueError, match="two splits"):
            hash_split(df, "k", {"a": 1.0})
        with _pytest.raises(ValueError, match="already exists"):
            hash_split(df.selectExpr("k", "'x' AS split"), "k", w)


def test_unigram_lm_score_orders_common_vs_rare(spark):
    """A doc made of corpus-frequent words must score (NLL) lower than
    one made of corpus-rare words; Laplace smoothing keeps every score
    finite."""
    from olive_spark.ops.textstats import unigram_lm_score

    rows = [(0, "the the the the the the")]          # very common
    rows += [(i, "the cat sat on the mat") for i in range(1, 40)]
    rows += [(99, "zyx qwv jkl")]                    # singletons
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["nll"] for r in unigram_lm_score(df).collect()}
    assert got[0] < got[1] < got[99]
    assert all(v == v and v > 0 for v in got.values())  # finite, positive


def test_dsir_importance_separates_domains(spark):
    """DSIR (arXiv:2302.03169) semantics on a planted two-domain
    corpus: docs written in the TARGET vocabulary must score strictly
    higher logw than docs in the off-domain vocabulary, a mixed doc
    sits between, and n_feats = n_tokens - 1 (bigram count).  Exact
    bucket parity with the md5 replay is pinned by the driver oracle;
    this pins the direction and the feature accounting."""
    from pyspark.sql import functions as F

    from olive_spark.ops.curation import dsir_importance

    tgt_text = "alpha beta gamma delta alpha beta gamma delta"
    raw_text = "zeta eta theta iota zeta eta theta iota"
    mixed = "alpha beta zeta eta alpha beta zeta eta"
    rows = (
        [(i, tgt_text) for i in range(0, 8)]          # target-flagged
        + [(i, raw_text) for i in range(100, 130)]    # off-domain bulk
        + [(200, mixed)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dsir_importance(
            df, F.col("doc_id") < 8, n_buckets=512
        ).collect()
    }
    assert all(out[i]["n_feats"] == 7 for i in out)   # 8 tokens → 7 bigrams
    t, r, m = out[0]["logw"], out[100]["logw"], out[200]["logw"]
    assert t > m > r, (t, m, r)
    # every target-vocab doc scores identically (same text, same hash)
    assert len({out[i]["logw"] for i in range(0, 8)}) == 1
