"""End-to-end training-corpus pipeline: the LLM-data operators composed
the way a real pipeline chains them —

    quality filter -> near-dup clustering -> keep one canonical doc per
    cluster -> reproducible train/val/test split -> sequence packing

Each stage is oracled individually by the driver contract; this test
pins that they COMPOSE (schemas line up, dedup keeps exactly one doc per
cluster, split survives dedup, packing sees only surviving docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.dedup import (
    jaccard_on_candidates,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_components,
)
from nspc_etl_basic_spark.operators.sampling import assign_split, pack_sequences
from nspc_etl_basic_spark.operators.text import quality_filter


def _corpus(spark):
    """60 docs: 40 good English, 10 exact-duplicate pairs of them (near
    dups by construction), 10 junk (too short)."""
    def doc(i):
        # doc-specific vocabulary (distinct docs share almost no shingles)
        # interleaved with English stopwords for the lang/quality gates
        return " ".join(
            f"the wordset{i}tok{j} and item{i}part{j} of thing{i}bit{j} is here"
            for j in range(12)
        )

    rows = []
    for i in range(40):
        rows.append((i, doc(i)))
    for i in range(40, 50):
        rows.append((i, doc(i - 40)))  # exact duplicate of doc i-40
    for i in range(50, 60):
        rows.append((i, "too short"))
    return spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "n_chars", F.length("text")
    )


def test_corpus_pipeline_composes(spark):
    docs = _corpus(spark)

    survivors = quality_filter(
        docs, min_chars=50, max_chars=10_000, min_tokens=10,
        max_punct_ratio=0.2, min_stopword_ratio=0.05, lang="en",
    ).select("doc_id")
    survived = docs.join(survivors, "doc_id", "left_semi")
    assert survived.count() == 50  # junk gone, dups still present

    sigs = minhash_signatures(survived).cache()
    cand = lsh_candidate_pairs(sigs)
    # verify candidates before clustering — LSH pairs are recall-oriented
    # candidates, not verdicts
    pairs = jaccard_on_candidates(survived, cand).filter(
        F.col("jaccard") >= 0.9
    ).select("id_a", "id_b")
    comp = neardup_components(survived, pairs)
    canonical = (
        survived.join(comp, "doc_id")
        .withColumn(
            "keep", F.col("doc_id") == F.col("component_id")
        )
        .filter("keep")
    )
    kept_ids = {r.doc_id for r in canonical.select("doc_id").collect()}
    # every dup pair (i, i+40) collapses to its canonical min id i
    assert kept_ids == set(range(40))

    split = assign_split(
        canonical, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 40

    packed = pack_sequences(
        split.filter(F.col("split") == "train"),
        order_key="doc_id", weight_col="n_chars", seq_len=256,
    )
    rows = packed.orderBy("doc_id").collect()
    assert rows, "train split must be non-empty"
    # packing invariants: cum strictly increasing, seq ranges contiguous
    prev_cum = 0
    for r in rows:
        assert r.cum_weight == prev_cum + r.n_chars
        assert r.seq_start <= r.seq_end
        prev_cum = r.cum_weight
    total_seqs = rows[-1].cum_weight // 256 + 1
    assert rows[-1].seq_end == total_seqs - 1 or rows[-1].seq_end == total_seqs


def test_quality_filter_carry_threads_columns_unchanged(spark):
    docs = _corpus(spark).withColumn(
        "extra", F.concat(F.lit("x"), F.col("doc_id").cast("string"))
    )
    out = quality_filter(
        docs, min_chars=50, max_chars=10_000, min_tokens=10,
        max_punct_ratio=0.2, min_stopword_ratio=0.05, lang="en",
        carry=("text", "extra"),
    )
    assert "text" in out.columns and "extra" in out.columns
    # carried values are byte-identical to the input rows
    src = {r.doc_id: (r.text, r.extra) for r in docs.collect()}
    for r in out.collect():
        assert (r.text, r.extra) == src[r.doc_id]


def test_quality_filter_carry_rejects_collisions(spark):
    import pytest

    docs = _corpus(spark)
    kw = dict(
        min_chars=50, max_chars=10_000, min_tokens=10,
        max_punct_ratio=0.2, min_stopword_ratio=0.05, lang="en",
    )
    # feature-output name, internal staging names, and duplicates all
    # fail fast with ValueError (not a downstream AnalysisException)
    for bad in (("n_chars",), ("__t",), ("__w",), ("__s_en",),
                ("text", "text")):
        with pytest.raises(ValueError):
            quality_filter(docs, carry=bad, **kw)
