"""Retirement (takedown) legs for the persisted text-tier stores
(operators/retire.py): surviving state must equal a from-scratch build
over the survivors — the same contract the streaming semantic store's
retire_ids pins in tests/test_semdedup.py."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.dedup import (
    build_band_store,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_components,
)
from nspc_etl_basic_spark.operators.retire import (
    retire_from_band_store,
    retire_from_gram_store,
)
from nspc_etl_basic_spark.operators.spandedup import (
    build_gram_store,
    incremental_dedup_spans,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _labels(df):
    return {(r.doc_id, r.component_id) for r in df.collect()}


def _store_rows(df):
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _dup_family(base_id, text, k):
    # k near-identical docs (one-token tail variants) — a connected blob
    return [(base_id + i, f"{text} variant token {i % 2}") for i in range(k)]


def _band_corpus(spark):
    rows = (
        _dup_family(0, "alpha beta gamma delta epsilon zeta eta theta", 4)
        + _dup_family(100, "one two three four five six seven eight nine", 3)
        + [(200, "completely unrelated text about maritime navigation charts"),
           (201, "another singleton concerning volcanic ash dispersal models")]
    )
    return _corpus(spark, rows)


def _from_scratch(spark, docs, cap=None):
    sigs = minhash_signatures(docs)
    store = build_band_store(sigs)
    pairs = lsh_candidate_pairs(sigs, max_bucket_size=cap)
    comp = neardup_components(docs.select("doc_id"), pairs)
    return store, comp


def test_band_store_retire_equals_from_scratch_of_survivors(spark):
    docs = _band_corpus(spark)
    store, labels = _from_scratch(spark, docs)

    # retire one member of each family (incl. doc 0 — a min-id
    # departure that renames its component) and one singleton
    retired = spark.createDataFrame([(0,), (101,), (200,)], "doc_id long")
    new_store, new_labels = retire_from_band_store(store, labels, retired)

    survivors = docs.join(retired, "doc_id", "left_anti")
    want_store, want_labels = _from_scratch(spark, survivors)

    assert _labels(new_labels) == _labels(want_labels)
    assert _store_rows(new_store) == _store_rows(want_store)


def test_band_store_retire_is_idempotent_and_unknown_id_noop(spark):
    docs = _band_corpus(spark)
    store, labels = _from_scratch(spark, docs)
    retired = spark.createDataFrame([(102,), (999_999,)], "doc_id long")

    s1, l1 = retire_from_band_store(store, labels, retired)
    s2, l2 = retire_from_band_store(s1, l1, retired)
    assert _labels(l1) == _labels(l2)
    assert _store_rows(s1) == _store_rows(s2)


def test_band_store_retire_splits_bridged_component(spark):
    # doc 50 shares bands with BOTH families (it holds phrases from
    # each), bridging them into one component; retiring it must split
    # the component back into the two blobs, from the stored rows only.
    fam_a = _dup_family(0, "alpha beta gamma delta epsilon zeta eta theta", 3)
    fam_b = _dup_family(100, "one two three four five six seven eight nine", 3)
    bridge = [(
        50,
        "alpha beta gamma delta epsilon zeta eta theta "
        "one two three four five six seven eight nine",
    )]
    docs = _corpus(spark, fam_a + fam_b + bridge)
    store, labels = _from_scratch(spark, docs)
    # sanity: the bridge really merged them
    assert len({c for _, c in _labels(labels)}) < 3

    retired = spark.createDataFrame([(50,)], "doc_id long")
    _, new_labels = retire_from_band_store(store, labels, retired)
    survivors = docs.filter(F.col("doc_id") != 50)
    _, want = _from_scratch(spark, survivors)
    assert _labels(new_labels) == _labels(want)


def test_band_store_retire_reexposes_uncapped_bucket(spark):
    # 12 identical docs form a mega-bucket; with cap=10 the from-scratch
    # build skips it entirely (all singletons). Retiring 3 members pulls
    # the bucket to 9 <= cap, so from-scratch over survivors CONNECTS
    # the remaining 9 — the cap-reappearance phase must find those edges.
    boiler = [(i, "lorem ipsum dolor sit amet consectetur " * 2) for i in range(12)]
    docs = _corpus(spark, boiler)
    sigs = minhash_signatures(docs)
    store = build_band_store(sigs)
    pairs = lsh_candidate_pairs(sigs, max_bucket_size=10)
    labels = neardup_components(docs.select("doc_id"), pairs)
    # sanity: capped build is all singletons
    assert len({c for _, c in _labels(labels)}) == 12

    retired = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    _, new_labels = retire_from_band_store(
        store, labels, retired, max_bucket_size=10
    )
    survivors = docs.filter(F.col("doc_id") >= 3)
    want = neardup_components(
        survivors.select("doc_id"),
        lsh_candidate_pairs(minhash_signatures(survivors), max_bucket_size=10),
    )
    assert _labels(new_labels) == _labels(want)


def test_band_store_retire_randomized_equivalence(spark):
    rng = random.Random(412)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(40):
        base = rng.randrange(4)
        words = [vocab[(base * 2 + j) % len(vocab)] for j in range(8)]
        if rng.random() < 0.3:
            words[rng.randrange(8)] = rng.choice(vocab)
        rows.append((i, " ".join(words)))
    docs = _corpus(spark, rows)
    store, labels = _from_scratch(spark, docs)

    retired_ids = rng.sample(range(40), 9)
    retired = spark.createDataFrame([(i,) for i in retired_ids], "doc_id long")
    new_store, new_labels = retire_from_band_store(store, labels, retired)

    survivors = docs.join(retired, "doc_id", "left_anti")
    want_store, want_labels = _from_scratch(spark, survivors)
    assert _labels(new_labels) == _labels(want_labels)
    assert _store_rows(new_store) == _store_rows(want_store)


# ---------------------------------------------------------------------------
# gram store
# ---------------------------------------------------------------------------


def test_gram_store_retire_equals_from_scratch_of_survivors(spark):
    rows = [
        (1, "the license header text appears here followed by real content one"),
        (2, "the license header text appears here followed by real content two"),
        (3, "unique document about entirely different subject matter stands alone"),
    ]
    docs = _corpus(spark, rows)
    store = build_gram_store(docs)

    retired = docs.filter(F.col("doc_id") == 2)
    got = retire_from_gram_store(store, retired)
    want = build_gram_store(docs.filter(F.col("doc_id") != 2))
    assert _store_rows(got) == _store_rows(want)
    # zero-count grams are dropped, not kept at 0
    assert got.filter(F.col("count") <= 0).isEmpty()


def test_gram_store_retire_unflags_spans(spark):
    boiler = "this boilerplate sentence repeats across many documents exactly"
    rows = [(1, f"{boiler} plus first unique tail"),
            (2, f"{boiler} plus second unique tail")]
    docs = _corpus(spark, rows)
    store = build_gram_store(docs)

    batch = _corpus(spark, [(10, f"{boiler} plus a third unique tail")])
    cleaned_before, _ = incremental_dedup_spans(batch, store)
    assert cleaned_before.collect()[0].n_removed > 0

    # retire BOTH store docs: the boilerplate's duplicates left the
    # corpus, so the same batch must no longer be cut
    store_after = retire_from_gram_store(store, docs)
    cleaned_after, _ = incremental_dedup_spans(batch, store_after)
    assert cleaned_after.collect()[0].n_removed == 0
    assert store_after.isEmpty()


def test_gram_store_retire_floors_at_zero(spark):
    rows = [(1, "some shared phrase in the corpus here with extra words")]
    docs = _corpus(spark, rows)
    store = build_gram_store(docs)
    # double retirement: the guard floors at zero — no negative counts
    once = retire_from_gram_store(store, docs)
    twice = retire_from_gram_store(once, docs)
    assert twice.filter(F.col("count") < 0).isEmpty()
    assert once.isEmpty() and twice.isEmpty()


def test_gram_store_retire_randomized_equivalence(spark):
    rng = random.Random(1207)
    vocab = ["the", "license", "header", "block", "alpha", "beta",
             "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 18))))
        for i in range(30)
    ]
    docs = _corpus(spark, rows)
    store = build_gram_store(docs)
    retired_ids = set(rng.sample(range(30), 11))
    retired = docs.filter(F.col("doc_id").isin(list(retired_ids)))
    survivors = docs.filter(~F.col("doc_id").isin(list(retired_ids)))

    got = retire_from_gram_store(store, retired)
    want = build_gram_store(survivors)
    assert _store_rows(got) == _store_rows(want)

    # and retirement commutes with incremental ingest: retiring after a
    # merge equals building from (survivors + batch)
    from nspc_etl_basic_spark.operators.spandedup import merge_gram_store

    batch = _corpus(
        spark,
        [(100 + i,
          " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 15))))
         for i in range(5)],
    )
    merged = merge_gram_store(store, build_gram_store(batch))
    got2 = retire_from_gram_store(merged, retired)
    want2 = build_gram_store(survivors.unionByName(batch))
    assert _store_rows(got2) == _store_rows(want2)


def test_band_store_retire_capped_is_idempotent(spark):
    # re-running the same capped retirement is a no-op even after the
    # cap-reappearance phase ran (the retired rows are gone, so no
    # bucket crosses the cap a second time)
    boiler = [(i, "lorem ipsum dolor sit amet consectetur " * 2) for i in range(12)]
    docs = _corpus(spark, boiler)
    sigs = minhash_signatures(docs)
    store = build_band_store(sigs)
    labels = neardup_components(
        docs.select("doc_id"), lsh_candidate_pairs(sigs, max_bucket_size=10)
    )
    retired = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    s1, l1 = retire_from_band_store(store, labels, retired, max_bucket_size=10)
    s2, l2 = retire_from_band_store(s1, l1, retired, max_bucket_size=10)
    assert _labels(l1) == _labels(l2)
    assert _store_rows(s1) == _store_rows(s2)


def test_bucket_pairs_matches_lsh_candidate_pairs(spark):
    # the retire module's within-bucket pair helper must agree with the
    # production LSH pair path on the same band table (ignoring the
    # shared-band counts components never read)
    from nspc_etl_basic_spark.operators.dedup import band_table
    from nspc_etl_basic_spark.operators.retire import _bucket_pairs

    docs = _band_corpus(spark)
    sigs = minhash_signatures(docs)
    want = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs).select("id_a", "id_b").collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in _bucket_pairs(band_table(sigs), "doc_id").collect()
    }
    assert got == want
