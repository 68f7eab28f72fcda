"""BPE training/encoding parity against an independent pure-Python
reference implementation of Sennrich et al.'s algorithm."""

from __future__ import annotations

import collections

import pytest

from nspc_etl_basic_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_encode,
    train_bpe,
)


def ref_train(texts, num_merges, min_pair_count=2):
    """Independent reference BPE trainer (dict-based, single process)."""
    import re

    freq = collections.Counter()
    for t in texts:
        freq.update(re.findall(r"[a-z0-9']+", t.lower()))
    words = {w: list(w) + [EOW] for w in freq}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq[w]
        eligible = [(p, n) for p, n in pairs.items() if n >= min_pair_count]
        if not eligible:
            break
        # max count, lexicographically smallest pair on ties
        a, b = min(eligible, key=lambda pn: (-pn[1], pn[0]))[0]
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "quick quick brown brown lazy lazy the the the",
    "a fox and a dog walk into a bar",
    "lowering lower lowest low low low slower slow",
]


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    got = train_bpe(df, "text", num_merges=15)
    want = ref_train(TEXTS, 15)
    assert got == want
    assert len(got) == 15


def test_train_bpe_early_stop(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    got = train_bpe(df, "text", num_merges=50, min_pair_count=2)
    # every pair occurs once -> nothing reaches min_pair_count
    assert got == []


def test_encode_word_greedy_rank_order():
    # ranks: ('l','o')->0, ('lo','w')->1 ; "low" -> ["low", EOW]
    ranks = {("l", "o"): 0, ("lo", "w"): 1}
    assert _encode_word("low", ranks) == ["low", EOW]
    # unknown word falls back to chars + EOW
    assert _encode_word("xyz", {}) == ["x", "y", "z", EOW]


def test_bpe_encode_dataframe_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    merges = train_bpe(df, "text", num_merges=10)
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    for i, t in enumerate(TEXTS):
        words = re.findall(r"[a-z0-9']+", t.lower())
        toks = [s for w in words for s in _encode_word(w, ranks)]
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_bpe_tokens"] == len(toks)
        # preview strips EOW markers and drops tokens that were pure EOW
        assert out[i]["bpe_preview"] == " ".join(
            s for s in (t.replace(EOW, "") for t in toks[:8]) if s
        )
    # merges compress: fewer BPE tokens than raw chars
    raw_chars = sum(len(w) + 1 for w in re.findall(r"[a-z0-9']+", TEXTS[0].lower()))
    assert out[0]["n_bpe_tokens"] < raw_chars
