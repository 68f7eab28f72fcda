"""Unit tests for per-document repetition features and benchmark
decontamination — hand-sized inputs with hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.decontaminate import (
    contaminated_ids,
    decontaminate,
    ngram_array,
)
from nspc_etl_basic_spark.operators.text import repetition_features


def test_repetition_features_hand_computed(spark):
    rows = [
        (1, "a a a a"),     # one token dominates; bigrams all "a a"
        (2, "a b c d"),     # no repetition at all
        (3, "x"),           # single token: no bigrams
        (4, "!!!"),         # zero word tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in repetition_features(df).collect()}

    assert got[1].n_tokens == 4
    assert got[1].top_token_frac == 1.0
    assert got[1].distinct_token_frac == 0.25
    assert got[1].dup_bigram_frac == pytest.approx(1 - 1 / 3, abs=1e-6)

    assert got[2].top_token_frac == 0.25
    assert got[2].distinct_token_frac == 1.0
    assert got[2].dup_bigram_frac == 0.0

    assert got[3].n_tokens == 1
    assert got[3].dup_bigram_frac == 0.0

    assert got[4].n_tokens == 0
    assert got[4].top_token_frac == 0.0
    assert got[4].distinct_token_frac == 0.0
    assert got[4].dup_bigram_frac == 0.0


def test_ngram_array_short_docs_yield_empty(spark):
    df = spark.createDataFrame([("a b c",)], ["text"])
    two, four = df.select(
        ngram_array(F.col("text"), 2).alias("two"),
        ngram_array(F.col("text"), 4).alias("four"),
    ).collect()[0]
    assert two == ["a b", "b c"]
    assert four == []  # sequence(1, 0) counts DOWN; guard must kick in


def test_ngram_array_rejects_nonpositive_n(spark):
    with pytest.raises(ValueError):
        ngram_array(F.col("text"), 0)


def test_decontaminate_drops_only_overlapping_docs(spark):
    eval_df = spark.createDataFrame(
        [(100, "q w e r t")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "z z w e r z"),  # contains eval 3-gram "w e r"
            (2, "m n o p"),      # disjoint vocabulary
            (3, "w e"),          # shares words but too short for a 3-gram
        ],
        ["doc_id", "text"],
    )
    bad = {r.doc_id for r in contaminated_ids(corpus, eval_df, n=3).collect()}
    assert bad == {1}
    kept = {r.doc_id for r in decontaminate(corpus, eval_df, n=3).collect()}
    assert kept == {2, 3}


def test_redact_pii_counts_and_placeholders(spark):
    from nspc_etl_basic_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.co or 1.2.3.4 tel 555-123-4567 done")],
        ["doc_id", "text"],
    )
    r = redact_pii(df).collect()[0]
    assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 1, 1)
    assert r.redacted == "mail <EMAIL> or <IP> tel <PHONE> done"


def test_redact_pii_sequential_stages_do_not_double_count(spark):
    """An ip-shaped domain inside an email is consumed by the email stage
    and must NOT also count as an ip."""
    from nspc_etl_basic_spark.operators.text import redact_pii

    df = spark.createDataFrame([(1, "ping a@10.0.0.2.com now")], ["doc_id", "text"])
    r = redact_pii(df).collect()[0]
    assert r.n_email == 1
    assert r.n_ipv4 == 0
    assert r.redacted == "ping <EMAIL> now"


def test_chunk_tokens_overlap_and_tail(spark):
    from nspc_etl_basic_spark.operators.text import chunk_tokens

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "")], ["doc_id", "text"]
    )
    rows = chunk_tokens(df, chunk_size=8, overlap=4).collect()
    got = {(r.doc_id, r.chunk_id): (r.chunk, r.n_tokens) for r in rows}
    # doc 1: starts at tokens 0 and 4; a third start at token 8 would sit
    # inside chunk 1's span and add nothing — must not be emitted
    assert got[(1, 0)] == (" ".join(f"w{i}" for i in range(8)), 8)
    assert got[(1, 1)] == (" ".join(f"w{i}" for i in range(4, 10)), 6)
    assert (1, 2) not in got
    # short doc: one whole-doc chunk; empty doc: no chunks
    assert got[(2, 0)] == ("a b", 2)
    assert {k[0] for k in got} == {1, 2}


def test_chunk_tokens_no_overlap_covers_exactly(spark):
    from nspc_etl_basic_spark.operators.text import chunk_tokens

    text = " ".join(f"w{i}" for i in range(7))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_tokens(df, chunk_size=3).collect(), key=lambda r: r.chunk_id
    )
    assert [r.chunk for r in rows] == ["w0 w1 w2", "w3 w4 w5", "w6"]
    # zero overlap: concatenation reconstructs the token stream exactly
    assert " ".join(r.chunk for r in rows) == text


def test_chunk_tokens_rejects_bad_params(spark):
    from nspc_etl_basic_spark.operators.text import chunk_tokens

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_size=4, overlap=4)


def test_bigram_lm_logprob_matches_independent_recomputation(spark):
    """avg_logprob (excluded from the DuckDB oracle — transcendental) is
    checked against a from-scratch Python recomputation of the add-k
    bigram LM on a small corpus."""
    import math
    import re
    from collections import Counter

    from nspc_etl_basic_spark.operators.text import bigram_lm_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a dog sat on a log"),
        (4, "единственный"),  # 1 token -> no bigrams
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_lm_scores(df, add_k=0.5).collect()}

    tok = lambda t: re.findall(r"[a-z0-9']+", t.lower())  # noqa: E731
    docs = {i: tok(t) for i, t in rows if t}
    uni = Counter(w for ws in docs.values() for w in ws)
    bi = Counter(
        (ws[i], ws[i + 1]) for ws in docs.values() for i in range(len(ws) - 1)
    )
    v = len(uni)
    for i, ws in docs.items():
        pairs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        if not pairs:
            assert got[i].n_bigrams == 0 and got[i].avg_logprob is None
            continue
        exp = sum(
            math.log2((bi[p] + 0.5) / (uni[p[0]] + 0.5 * v)) for p in pairs
        ) / len(pairs)
        assert got[i].n_bigrams == len(pairs)
        assert abs(got[i].avg_logprob - exp) < 1e-9, (i, got[i].avg_logprob, exp)
    assert got[5].n_bigrams == 0 and got[5].avg_logprob is None


def test_tfidf_topk_hand_computed(spark):
    """TF-IDF ranks corpus-rare terms above ubiquitous ones; ties on the
    rounded score break token-ascending."""
    import math

    from nspc_etl_basic_spark.operators.text import tfidf_topk

    rows = [
        (1, "common rare common"),   # 'common' tf=2 but appears everywhere
        (2, "common zebra"),
        (3, "common apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.rk): r for r in tfidf_topk(df, k=2).collect()
    }

    n = 3
    w = lambda tf, dfreq: round(tf * (math.log((n + 1) / (dfreq + 1)) + 1), 6)  # noqa: E731
    # doc 1: common tf=2 df=3 -> 2*1.0 = 2.0 ; rare tf=1 df=1 -> ln(2)+1
    assert got[(1, 1)].token == "common"
    assert got[(1, 1)].tfidf == pytest.approx(w(2, 3), abs=1e-9)
    assert got[(1, 2)].token == "rare"
    assert got[(1, 2)].tfidf == pytest.approx(w(1, 1), abs=1e-9)
    # docs 2/3: the unique word (higher idf) outranks 'common'
    assert got[(2, 1)].token == "zebra" and got[(3, 1)].token == "apple"
    assert got[(2, 2)].token == "common" and got[(3, 2)].token == "common"


def test_tfidf_topk_tie_breaks_token_ascending(spark):
    from nspc_etl_basic_spark.operators.text import tfidf_topk

    # both tokens unique to the doc with tf=1 -> identical rounded score
    df = spark.createDataFrame([(1, "beta alpha")], "doc_id long, text string")
    got = tfidf_topk(df, k=2).orderBy("rk").collect()
    assert [r.token for r in got] == ["alpha", "beta"]


def test_normalize_text_stages(spark):
    from nspc_etl_basic_spark.operators.text import normalize_text

    rows = [
        (1, "café"),            # NFC composes to café (5 -> 4 chars)
        (2, "a​b­c"),       # zero-width + soft hyphen stripped
        (3, "  x \t y  "),            # collapse + trim
        (4, "line1\r\nline2\rline3"),  # CRLF/CR -> LF (kept, not collapsed)
        (5, None),                    # null -> empty, changed=False
        (6, "clean"),                 # untouched
        (7, "bell\x07\x00end"),       # C0 controls stripped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(df).collect()}

    assert got[1].text_norm == "café"
    assert (got[1].n_chars_raw, got[1].n_chars_norm) == (5, 4)
    assert got[1].changed is True
    assert got[2].text_norm == "abc"
    assert got[3].text_norm == "x y"
    assert got[4].text_norm == "line1\nline2\nline3"
    assert got[5].text_norm == "" and got[5].changed is False
    assert got[6].text_norm == "clean" and got[6].changed is False
    assert got[7].text_norm == "bellend" and got[7].n_chars_norm == 7


def test_normalize_text_string_id_passthrough(spark):
    # the id schema is derived from the input, not pinned to long —
    # string document keys must survive the Arrow kernel untouched
    from nspc_etl_basic_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [("doc-a", "café"), ("doc-b", "  x  ")],
        "doc_id string, text string",
    )
    out = normalize_text(df)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r.doc_id: r.text_norm for r in out.collect()}
    assert got == {"doc-a": "café", "doc-b": "x"}


def test_inverted_index_hand_computed(spark):
    from nspc_etl_basic_spark.operators.text import inverted_index

    rows = [
        (10, "apple banana apple"),
        (20, "banana cherry"),
        (30, "banana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token: r for r in inverted_index(df, min_df=1, head=2).collect()}

    assert got["banana"].df == 3
    assert got["banana"].total_tf == 3
    assert got["banana"].postings_head == "10,20"  # head-capped at 2, sorted
    assert got["apple"].df == 1 and got["apple"].total_tf == 2
    assert got["apple"].postings_head == "10"
    assert got["cherry"].postings_head == "20"

    # min_df prunes hapax tokens
    pruned = {r.token for r in inverted_index(df, min_df=2).collect()}
    assert pruned == {"banana"}
