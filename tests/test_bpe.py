"""BPE tokenizer: distributed training vs an independent reference.

The trainer is iterative (non-SQL-expressible), so instead of a DuckDB
oracle the attestation is an INDEPENDENT in-test reimplementation of
canonical BPE (collections.Counter over the word-frequency dict) that
must produce the identical ranked merge list and identical token
counts on the real documents table.
"""

import re
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from pypeman_spark.functions import bpe
from pypeman_spark.sources.tables import load_table


def _reference_train(word_freq: dict, num_merges: int):
    """Canonical BPE on a word-frequency dict — written independently
    of functions/bpe.py (Counter-based, tuple symbols, no regex)."""
    vocab = {
        tuple(list(w) + [bpe._EOW]): n for w, n in word_freq.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        top_cnt = max(pairs.values())
        if top_cnt < 2:
            break
        # deterministic tie-break: count desc, then pair-string asc
        pair = min(
            (p for p, c in pairs.items() if c == top_cnt),
            key=lambda p: f"{p[0]} {p[1]}",
        )
        merges.append(pair)
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == pair
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _word_freq_py(texts):
    wf = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wf[w] += 1
    return dict(wf)


def test_bpe_matches_independent_reference(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 120")
    texts = [r["text"] for r in d.select("text").collect()]
    want = _reference_train(_word_freq_py(texts), 25)
    got = bpe.train_bpe(d, num_merges=25)
    assert got == want

    # token counts agree with a direct reference encode
    ranks = {p: i for i, p in enumerate(got)}
    ref_counts = {}
    for r in d.select("doc_id", "text").collect():
        n = 0
        for w in re.split(r"\s+", r["text"].lower()):
            if w:
                n += len(bpe.apply_merges(w, ranks))
        ref_counts[r["doc_id"]] = n
    spark_counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_count(d, got).collect()
    }
    assert spark_counts == ref_counts
    # merging strictly reduces counts vs characters and is bounded
    # below by whitespace tokens
    for r in d.select("doc_id", "text").collect():
        ws = len([w for w in re.split(r"\s+", r["text"].lower()) if w])
        chars = sum(
            len(w) + 1
            for w in re.split(r"\s+", r["text"].lower())
            if w
        )
        assert ws <= spark_counts[r["doc_id"]] <= chars


def test_bpe_training_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 40")
    a = bpe.train_bpe(d, num_merges=12)
    b = bpe.train_bpe(d, num_merges=12)
    assert a == b and len(a) == 12


@given(
    words=st.lists(
        st.text(
            alphabet="abcde", min_size=1, max_size=6
        ),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=30, deadline=None)
def test_bpe_roundtrip_identity_property(words, k):
    # encode then strip markers restores the exact (lowercased) text
    # for ANY merge list learned from the same data
    wf = Counter(words)
    merges = _reference_train(dict(wf), k)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        toks = bpe.apply_merges(w, ranks)
        assert "".join(toks) == w + bpe._EOW


def test_bpe_stops_when_dry(spark):
    # every word unique: no pair ever reaches count 2 -> no merges
    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    assert bpe.train_bpe(df, num_merges=10) == []


def test_bpe_local_trainer_matches_distributed(spark, sf_dir):
    """train_bpe_local (driver-local merge loop over the collected
    vocabulary) must produce the IDENTICAL ranked merge list as the
    distributed trainer and the independent reference."""
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 120")
    texts = [r["text"] for r in d.select("text").collect()]
    want = _reference_train(_word_freq_py(texts), 40)
    got = bpe.train_bpe_local(d, num_merges=40)
    assert got == want
    # and identical to the distributed formulation on a shorter run
    assert got[:15] == bpe.train_bpe(d, num_merges=15)


def test_bpe_local_trainer_exhausts_like_reference(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab cd cd xyz")], "doc_id long, text string"
    )
    texts = ["ab ab ab cd cd xyz"]
    want = _reference_train(_word_freq_py(texts), 50)
    assert bpe.train_bpe_local(df, num_merges=50) == want


def test_bpe_batched_trainer_valid_and_consistent(spark, sf_dir):
    """batch>1 (top-k disjoint merges per round) may deviate from
    canonical RANK order but every merge must still be a real pair
    (applying the learned vocab round-trips), and batch=1 must stay
    exactly canonical."""
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 80")
    canonical = bpe.train_bpe_local(d, num_merges=16)
    assert bpe.train_bpe(d, num_merges=16, batch=1) == canonical

    batched = bpe.train_bpe(d, num_merges=16, batch=4)
    assert len(batched) == 16
    assert len(set(batched)) == 16  # no duplicate merges
    # within each selection round, operands/outputs are disjoint by
    # construction; globally the list must still encode losslessly
    ranks = {p: i for i, p in enumerate(batched)}
    for r in d.select("text").limit(20).collect():
        for w in re.split(r"\s+", r["text"].lower()):
            if w:
                assert "".join(bpe.apply_merges(w, ranks)) == w + bpe._EOW


def test_bpe_encode_keep_cols_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "aa bb", "s1"), (2, "aa", "s2")],
        "doc_id long, text string, source string",
    )
    out = bpe.bpe_token_count(df, [("a", "a")], keep_cols=("source",))
    rows = {r["doc_id"]: (r["source"], r["n_bpe_tokens"]) for r in out.collect()}
    # "aa" -> [aa, </w>] = 2 tokens; "bb" -> [b, b, </w>] = 3
    assert rows == {1: ("s1", 5), 2: ("s2", 2)}


# --------------------------------------------- byte-level alphabet --


def _sym_bytes(w):
    tbl = bpe._bytes_to_unicode()
    return [tbl[b] for b in w.encode("utf-8")]


def _reference_train_alpha(word_freq: dict, num_merges: int, sym):
    """Same independent canonical BPE as _reference_train, with a
    pluggable base decomposition (chars vs UTF-8 bytes)."""
    vocab = {tuple(sym(w) + [bpe._EOW]): n for w, n in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        top_cnt = max(pairs.values())
        if top_cnt < 2:
            break
        pair = min(
            (p for p, c in pairs.items() if c == top_cnt),
            key=lambda p: f"{p[0]} {p[1]}",
        )
        merges.append(pair)
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_bytes_matches_independent_reference(spark, sf_dir):
    """alphabet='bytes': distributed trainer, driver-local trainer and
    the independent byte-level reference all agree merge-for-merge,
    and token counts match a direct reference encode — on a corpus
    salted with real multi-byte UTF-8."""
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 80")
    extra = spark.createDataFrame(
        [(9001, "héllo wörld héllo naïve héllo wörld"),
         (9002, "日本語 テスト 日本語 テスト wörld naïve"),
         (9003, "héllo 日本語 emoji 😀 emoji 😀 emoji")],
        "doc_id long, text string",
    )
    d = d.select("doc_id", "text").unionByName(extra)
    texts = [r["text"] for r in d.select("text").collect()]
    want = _reference_train_alpha(_word_freq_py(texts), 30, _sym_bytes)
    got = bpe.train_bpe(d, num_merges=30, alphabet="bytes")
    assert got == want
    assert bpe.train_bpe_local(d, num_merges=30, alphabet="bytes") == want

    ranks = {p: i for i, p in enumerate(got)}
    ref_counts = {}
    for r in d.select("doc_id", "text").collect():
        n = 0
        for w in re.split(r"\s+", r["text"].lower()):
            if w:
                n += len(bpe.apply_merges(w, ranks, "bytes"))
        ref_counts[r["doc_id"]] = n
    spark_counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_count(d, got, alphabet="bytes").collect()
    }
    assert spark_counts == ref_counts


@given(
    words=st.lists(
        st.text(min_size=1, max_size=6).filter(
            lambda w: not re.search(r"\s", w)
        ),
        min_size=1,
        max_size=20,
    ),
    k=st.integers(min_value=0, max_value=10),
)
@settings(max_examples=40, deadline=None)
def test_bpe_bytes_roundtrip_any_utf8_property(words, k):
    """Byte-level encode of ARBITRARY UTF-8 (multi-byte, emoji,
    combining marks — whatever hypothesis throws) is lossless: join a
    word's tokens, strip the EOW, invert the byte table, decode."""
    wf = Counter(w.lower() for w in words)
    merges = _reference_train_alpha(dict(wf), k, _sym_bytes)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(w.lower() for w in words):
        toks = bpe.apply_merges(w, ranks, "bytes")
        joined = "".join(toks)
        assert joined.endswith(bpe._EOW)
        assert bpe.bpe_decode_token(
            joined[: -len(bpe._EOW)], "bytes"
        ) == w


def test_bpe_bytes_vs_chars_ascii_agree(spark):
    """On pure-ASCII input the byte table is the identity, so both
    alphabets must learn the identical merge list."""
    df = spark.createDataFrame(
        [(1, "low lower lowest low low newer newest new")],
        "doc_id long, text string",
    )
    assert bpe.train_bpe_local(df, num_merges=12) == bpe.train_bpe_local(
        df, num_merges=12, alphabet="bytes"
    )


def test_bpe_rejects_unknown_alphabet(spark):
    df = spark.createDataFrame([(1, "a a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="alphabet"):
        bpe.train_bpe_local(df, alphabet="words")
