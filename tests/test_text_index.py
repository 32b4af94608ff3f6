"""Keyword inverted index (ops.text_index): search parity with a
Python reference, AND/OR semantics, token-range file pruning on the
clustered postings layout, idempotent appends."""

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


def _tokens_of(i: int) -> "list[str]":
    # deterministic 12-token docs over a 100-term vocabulary
    return [f"w{((i * 37 + j * 11) % 100):02d}" for j in range(12)]


@pytest.fixture(scope="module")
def docs_rows():
    return [(i, " ".join(_tokens_of(i))) for i in range(200)]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_search(rows, terms, mode):
    out = []
    for i, text in rows:
        toks = set(text.split())
        hit = (
            all(t in toks for t in terms)
            if mode == "all" else any(t in toks for t in terms)
        )
        if hit:
            out.append(i)
    return sorted(out)


def test_search_parity_and_or(spark, tmp_path, docs_rows):
    from olive_spark.ops.text_index import build_text_index, search_tokens

    idx = str(tmp_path / "idx")
    meta = build_text_index(spark, _frame(spark, docs_rows), idx, n_files=4)
    assert meta["n_docs"] == 200
    for terms, mode in [
        (["w00"], "all"),
        (["w13", "w57"], "all"),
        (["w13", "w57"], "any"),
        (["w01", "w02", "w03"], "all"),
        (["w01", "w02", "w03"], "any"),
        (["nosuchtoken"], "all"),
    ]:
        got = sorted(
            r["doc_id"]
            for r in search_tokens(spark, idx, terms, mode).collect()
        )
        assert got == _ref_search(docs_rows, terms, mode), (terms, mode)


def test_search_docs_hydration(spark, tmp_path, docs_rows):
    from olive_spark.ops.text_index import build_text_index, search_docs

    idx = str(tmp_path / "idx")
    docs = _frame(spark, docs_rows)
    build_text_index(spark, docs, idx, n_files=4)
    out = search_docs(spark, docs, idx, ["w13", "w57"], "all").collect()
    want = set(_ref_search(docs_rows, ["w13", "w57"], "all"))
    assert {r["doc_id"] for r in out} == want
    assert all(r["text"] == dict(docs_rows)[r["doc_id"]] for r in out)


def test_token_range_pruning(spark, tmp_path, docs_rows):
    """The clustered postings layout must let a single-term lookup skip
    most files on token min/max stats + Bloom — the property that makes
    the index cheaper than a corpus scan at 100 TB."""
    from olive_spark.ops.text_index import build_text_index
    from tests.test_datasource import _surviving

    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, docs_rows), idx, n_files=8)
    postings = f"{idx}/postings"
    import os

    n_files = sum(1 for f in os.listdir(postings) if f.endswith(".olive"))
    assert n_files >= 4
    lo = _surviving(spark, postings, [("token", "in", ["w03"])])
    hi = _surviving(spark, postings, [("token", "in", ["w97"])])
    none = _surviving(spark, postings, [("token", "in", ["zzz_absent"])])
    assert lo <= max(1, n_files // 4), (lo, n_files)
    assert hi <= max(1, n_files // 4), (hi, n_files)
    assert none == 0


def test_append_idempotent(spark, tmp_path, docs_rows):
    from olive_spark.ops.text_index import (
        append_text_index,
        build_text_index,
        search_tokens,
    )

    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, docs_rows), idx, n_files=4)
    extra = [(1000 + i, f"zebra{i:02d} w00 shared") for i in range(5)]
    st = append_text_index(spark, _frame(spark, extra), idx)
    assert st["appended"] == 5
    st = append_text_index(spark, _frame(spark, extra), idx)
    assert st["appended"] == 0
    got = {
        r["doc_id"]
        for r in search_tokens(spark, idx, ["shared"], "all").collect()
    }
    assert got == {1000 + i for i in range(5)}
    # appended docs join the existing term space too
    got = {
        r["doc_id"]
        for r in search_tokens(spark, idx, ["w00"], "all").collect()
    }
    assert {1000 + i for i in range(5)} <= got


def _ref_bm25(rows, terms, k1=1.2, b=0.75, k=10, round_to=4):
    import math
    from collections import Counter

    docs = {i: text.split() for i, text in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfs = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    out = []
    for i, toks in docs.items():
        tfc = Counter(toks)
        s, hit = 0.0, 0
        for t in terms:
            tf = tfc.get(t, 0)
            if not tf or not dfs[t]:
                continue
            hit += 1
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            dl = len(toks)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        if hit:
            out.append((i, round(s, round_to), hit))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_bm25_matches_reference(spark, tmp_path):
    from olive_spark.ops.text_index import build_text_index, search_bm25

    # skewed term frequencies: doc i repeats "hot" i%5 times
    rows = [
        (i, " ".join(
            _tokens_of(i) + ["hot"] * (i % 5) + ["warm"] * (i % 3)
        ))
        for i in range(60)
    ]
    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, rows), idx, n_files=4)
    got = [
        (r["doc_id"], r["score"], r["n_terms_hit"])
        for r in search_bm25(spark, idx, ["hot", "warm"], k=15).collect()
    ]
    assert got == _ref_bm25(rows, ["hot", "warm"], k=15)
    # absent term contributes nothing but present terms still rank
    got = [
        (r["doc_id"], r["score"], r["n_terms_hit"])
        for r in search_bm25(spark, idx, ["hot", "zz_absent"], k=5).collect()
    ]
    assert got == _ref_bm25(rows, ["hot", "zz_absent"], k=5)


def test_bm25_after_append_uses_updated_stats(spark, tmp_path, docs_rows):
    from olive_spark.ops.text_index import (
        append_text_index,
        build_text_index,
        search_bm25,
    )

    rows = [(i, t + " rare" * (i == 7)) for i, t in docs_rows[:50]]
    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, rows), idx, n_files=4)
    extra = [(900, "rare rare rare filler pad")]
    append_text_index(spark, _frame(spark, extra), idx)
    got = [
        (r["doc_id"], r["score"], r["n_terms_hit"])
        for r in search_bm25(spark, idx, ["rare"], k=5).collect()
    ]
    assert got == _ref_bm25(rows + extra, ["rare"], k=5)


def test_term_validation(spark, tmp_path, docs_rows):
    from olive_spark.ops.text_index import build_text_index, search_tokens

    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, docs_rows[:10]), idx, n_files=2)
    with pytest.raises(ValueError, match="non-empty"):
        search_tokens(spark, idx, [], "all")
    with pytest.raises(ValueError, match="single non-empty tokens"):
        search_tokens(spark, idx, ["two words"], "all")
    with pytest.raises(ValueError, match="mode"):
        search_tokens(spark, idx, ["w00"], "phrase")


def test_compact_text_index_restores_clustering_and_blooms(
    spark, tmp_path, docs_rows
):
    """r12 verdict task #5: appends land token-clustered only among
    themselves; after several appends a term lookup touches extra
    files.  compact_text_index must restore ONE global clustering AND
    refresh the per-file token Blooms (a plain maintenance.compact
    re-sorts but drops them), swapping the rewritten postings in
    atomically through the meta — same results, bumped build_id, old
    dir gone, orphan rewrite dirs GC'd."""
    import os

    from olive_spark.ops.text_index import (
        _pdir,
        append_text_index,
        build_text_index,
        compact_text_index,
        load_meta,
        search_tokens,
    )
    from tests.test_datasource import _surviving

    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, docs_rows[:100]), idx, n_files=8)
    # three appends, each spanning the full token range
    for b in range(3):
        extra = [(2000 + b * 100 + i, t) for i, t in docs_rows[100 + b * 30: 130 + b * 30]]
        append_text_index(spark, _frame(spark, extra), idx)
    old_meta = load_meta(idx)
    postings = _pdir(idx, old_meta)
    before = _surviving(spark, postings, [("token", "in", ["w03"])])
    assert before >= 3, "appends should have degraded pruning"
    want = sorted(
        r["doc_id"]
        for r in search_tokens(spark, idx, ["w03"], "all").collect()
    )
    # plant an orphan rewrite dir from a "crashed" prior compact
    os.makedirs(os.path.join(idx, "postings-deadbeefcafe"), exist_ok=True)
    out = compact_text_index(spark, idx)
    assert out["files_after"] <= out["files_before"]
    meta = load_meta(idx)
    assert meta["build_id"] != old_meta["build_id"]
    assert meta["postings_dir"] != old_meta.get("postings_dir", "postings")
    assert not os.path.isdir(postings), "old postings dir must be removed"
    assert not os.path.isdir(os.path.join(idx, "postings-deadbeefcafe"))
    new_postings = _pdir(idx, meta)
    after = _surviving(spark, new_postings, [("token", "in", ["w03"])])
    assert after <= 2, (before, after)
    # Blooms refreshed: a token that does not exist but falls INSIDE a
    # file's [min, max] token range survives stats pruning and only the
    # per-file Bloom can kill it — zero survivors proves the rewrite
    # went through the bloomColumns writer (maintenance.compact loses
    # this and would leave >= 1 survivor)
    ghost = _surviving(spark, new_postings, [("token", "in", ["w03x"])])
    assert ghost == 0, ghost
    got = sorted(
        r["doc_id"]
        for r in search_tokens(spark, idx, ["w03"], "all").collect()
    )
    assert got == want, "compaction must not change search results"
    # a fresh-build equivalent opens the same file count for the term
    ref = str(tmp_path / "ref")
    all_rows = docs_rows[:100] + [
        (2000 + b * 100 + i, t)
        for b in range(3)
        for i, t in docs_rows[100 + b * 30: 130 + b * 30]
    ]
    build_text_index(spark, _frame(spark, all_rows), ref, n_files=8)
    fresh = _surviving(
        spark, _pdir(ref, load_meta(ref)), [("token", "in", ["w03"])]
    )
    assert after == fresh, (after, fresh)


def test_build_crash_before_meta_rebuilds_clean(spark, tmp_path, docs_rows):
    """A build that crashed between the postings commit and the meta
    write must be REBUILT from scratch — appending over the half-landed
    copy would double every posting and zero out all AND searches."""
    import os
    import shutil

    from olive_spark.ops.text_index import build_text_index, search_tokens

    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, docs_rows[:50]), idx, n_files=2)
    # simulate the crash: meta gone, postings left behind
    os.remove(os.path.join(idx, "_text_meta.json"))
    build_text_index(spark, _frame(spark, docs_rows[:50]), idx, n_files=2)
    got = sorted(
        r["doc_id"]
        for r in search_tokens(spark, idx, ["w13", "w57"], "all").collect()
    )
    assert got == _ref_search(docs_rows[:50], ["w13", "w57"], "all")
    shutil.rmtree(idx)


def test_append_crash_meta_drift_self_heals(spark, tmp_path, docs_rows):
    """Meta stats recompute from the stored postings at every append,
    so a crash between a prior append's data commit and meta write
    cannot skew BM25's N/avgdl forever."""
    import json
    import os

    from olive_spark.ops.text_index import (
        append_text_index,
        build_text_index,
        load_meta,
    )

    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, docs_rows[:40]), idx, n_files=2)
    true_meta = load_meta(idx)
    # simulate stale-meta drift from a crashed append
    bad = dict(true_meta)
    bad["n_docs"], bad["n_tokens"] = 1, 1
    json.dump(bad, open(os.path.join(idx, "_text_meta.json"), "w"))
    st = append_text_index(
        spark, _frame(spark, [(5000, "w00 w01 w02")]), idx
    )
    assert st["n_docs"] == 41
    assert st["n_tokens"] == true_meta["n_tokens"] + 3


def _ref_phrase(rows, phrase):
    """Python reference: per-doc count of (possibly overlapping)
    occurrences of the token sequence."""
    want = phrase.lower().split()
    k = len(want)
    out = {}
    for i, text in rows:
        toks = text.lower().split()
        n = sum(
            1 for s in range(len(toks) - k + 1) if toks[s:s + k] == want
        )
        if n:
            out[i] = n
    return out


def test_phrase_search_parity_and_overlap(spark, tmp_path):
    """Positional phrase search matches a Python reference on a corpus
    with adjacency traps: tokens present but not adjacent, adjacent in
    the wrong order, repeated-token phrases, and overlapping
    occurrences ('a a a' contains 'a a' twice)."""
    from olive_spark.ops.text_index import build_text_index, search_phrase

    rows = [
        (1, "the quick brown fox"),          # phrase present once
        (2, "quick the brown fox"),          # tokens present, wrong order
        (3, "the slow brown quick fox"),     # both tokens, not adjacent
        (4, "x the quick y the quick z"),    # twice, non-overlapping
        (5, "a a a b"),                      # overlap: 'a a' twice
        (6, "b a a"),                        # once at the tail
        (7, "unrelated words only"),
    ]
    idx = str(tmp_path / "pidx")
    build_text_index(spark, _frame(spark, rows), idx, positions=True)
    for phrase in ("the quick", "a a", "brown fox", "quick the"):
        got = {
            r["doc_id"]: r["n_hits"]
            for r in search_phrase(spark, idx, phrase).collect()
        }
        assert got == _ref_phrase(rows, phrase), phrase
    # 3-token phrase with a repeated token
    got = {
        r["doc_id"]: r["n_hits"]
        for r in search_phrase(spark, idx, "a a a").collect()
    }
    assert got == {5: 1}
    # single-token phrase degenerates to tf
    got = {
        r["doc_id"]: r["n_hits"]
        for r in search_phrase(spark, idx, "the").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2}


def test_phrase_search_requires_positional_index(spark, tmp_path):
    from olive_spark.ops.text_index import build_text_index, search_phrase

    idx = str(tmp_path / "noposidx")
    build_text_index(spark, _frame(spark, [(1, "a b c")]), idx)
    with pytest.raises(ValueError, match="positional"):
        search_phrase(spark, idx, "a b")
    with pytest.raises(ValueError, match="at least one token"):
        build_text_index(
            spark, _frame(spark, [(2, "a b")]), str(tmp_path / "p2"),
            positions=True,
        )
        search_phrase(spark, str(tmp_path / "p2"), "   ")


def test_phrase_search_after_append_keeps_positions(spark, tmp_path):
    """Appends to a positional index must carry positions: a phrase in
    an appended-only document is findable, and BM25/search_tokens stay
    correct on the mixed postings."""
    from olive_spark.ops.text_index import (
        append_text_index,
        build_text_index,
        search_phrase,
        search_tokens,
    )

    rows = [(1, "alpha beta gamma"), (2, "beta gamma alpha")]
    idx = str(tmp_path / "pappend")
    build_text_index(spark, _frame(spark, rows), idx, positions=True)
    append_text_index(
        spark, _frame(spark, [(3, "delta alpha beta")]), idx
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in search_phrase(spark, idx, "alpha beta").collect()
    }
    assert got == {1: 1, 3: 1}
    hit_ids = sorted(
        r["doc_id"]
        for r in search_tokens(spark, idx, ["delta"], "all").collect()
    )
    assert hit_ids == [3]


def test_compact_text_index_if_needed_threshold(spark, tmp_path, docs_rows):
    """r13 (VERDICT r12 task #6): the schedulable trigger — no-op
    below the file-growth threshold (one dir listing, no Spark job),
    compacts above it, idempotent afterwards, search unchanged."""
    from olive_spark.ops.text_index import (
        append_text_index,
        build_text_index,
        compact_text_index_if_needed,
        load_meta,
        search_tokens,
    )

    idx = str(tmp_path / "idx")
    build_text_index(spark, _frame(spark, docs_rows[:100]), idx, n_files=4)
    out = compact_text_index_if_needed(spark, idx, max_file_ratio=1.5)
    assert out["compacted"] is False
    before_build = load_meta(idx)["build_id"]
    for b in range(3):
        extra = [(3000 + b * 100 + i, t)
                 for i, t in docs_rows[100 + b * 30: 130 + b * 30]]
        append_text_index(spark, _frame(spark, extra), idx)
    want = sorted(
        r["doc_id"]
        for r in search_tokens(spark, idx, ["w03"], "all").collect()
    )
    out = compact_text_index_if_needed(spark, idx, max_file_ratio=1.5)
    assert out["compacted"] is True
    assert out["files_after"] <= out["files_live"]
    assert load_meta(idx)["build_id"] != before_build
    # idempotent: freshly compacted index is back under threshold
    out2 = compact_text_index_if_needed(spark, idx, max_file_ratio=1.5)
    assert out2["compacted"] is False
    got = sorted(
        r["doc_id"]
        for r in search_tokens(spark, idx, ["w03"], "all").collect()
    )
    assert got == want
