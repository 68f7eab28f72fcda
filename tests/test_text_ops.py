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
