"""Deterministic sampling/split/budget operators (operators/sampling.py):
membership must be a pure function of the key (partitioning-invariant),
splits disjoint+exhaustive, and the bucketed prefix sum must equal the
naive single-window result while planning no unpartitioned window."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.sampling import (
    assign_split,
    hash_sample,
    stratified_sample,
    take_until_budget,
)


def _corpus(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang_"), F.col("id") % 3).alias("lang"),
        (F.col("id") * 37 % 400 + 10).alias("n_chars"),
    )


def test_hash_sample_is_partitioning_invariant(spark):
    df = _corpus(spark)
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in hash_sample(df.repartition(17), "doc_id", 0.3).collect()
    }
    assert a == b and len(a) > 0


def test_hash_sample_fraction_approximate(spark):
    df = _corpus(spark, 2000)
    kept = hash_sample(df, "doc_id", 0.3).count()
    assert 0.25 * 2000 < kept < 0.35 * 2000


def test_hash_sample_rejects_bad_fraction(spark):
    with pytest.raises(ValueError):
        hash_sample(_corpus(spark), "doc_id", 1.5)


def test_disjoint_salts_give_independent_samples(spark):
    df = _corpus(spark)
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.5, salt="a").collect()}
    b = {r.doc_id for r in hash_sample(df, "doc_id", 0.5, salt="b").collect()}
    assert a != b  # same fraction, different membership


def test_stratified_sample_respects_per_stratum_fractions(spark):
    df = _corpus(spark, 3000)
    out = stratified_sample(
        df, "doc_id", "lang", {"lang_0": 0.8, "lang_1": 0.1}
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "lang_2" not in counts  # unlisted stratum keeps nothing
    assert counts["lang_0"] > counts.get("lang_1", 0) * 4


def test_split_disjoint_exhaustive_and_stable_under_growth(spark):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = assign_split(_corpus(spark, 500), "doc_id", w)
    big = assign_split(_corpus(spark, 1000), "doc_id", w)
    assert small.count() == 500 and big.count() == 1000  # exhaustive
    small_map = {r.doc_id: r.split for r in small.collect()}
    big_map = {r.doc_id: r.split for r in big.collect()}
    # growing the corpus never migrates an existing document's split
    assert all(big_map[k] == v for k, v in small_map.items())


def test_split_weights_must_sum_to_one(spark):
    with pytest.raises(ValueError):
        assign_split(_corpus(spark), "doc_id", {"train": 0.5, "val": 0.1})


def test_take_until_budget_matches_naive_window(spark):
    df = _corpus(spark, 500)
    budget = 40_000
    got = take_until_budget(df, "doc_id", "n_chars", budget, n_buckets=8)
    naive = []
    acc = 0
    for r in sorted(df.collect(), key=lambda r: r.doc_id):
        acc += r.n_chars
        if acc > budget:
            break
        naive.append((r.doc_id, acc))
    assert sorted((r.doc_id, r.cum_weight) for r in got.collect()) == naive


def test_take_until_budget_no_unpartitioned_window(spark):
    df = _corpus(spark, 500)
    out = take_until_budget(df, "doc_id", "n_chars", 40_000, n_buckets=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    # an empty partitionBy plans as a single-partition window:
    # 'Window [...], [order...]' with no partition spec
    for line in plan.splitlines():
        if "Window" in line:
            assert "windowspecdefinition" not in line or "__bucket" in line, line


def test_take_until_budget_empty_input(spark):
    df = _corpus(spark).filter(F.lit(False))
    assert take_until_budget(df, "doc_id", "n_chars", 100).count() == 0


def test_hash_bucket_matches_python_md5_spec(spark):
    """The Spark column (md5 -> conv base16 -> mod) must equal the pure
    Python spec int(md5(salt+key)[:8], 16) % 10000 — the same arithmetic
    the DuckDB oracles replay."""
    import hashlib

    from nspc_etl_basic_spark.operators.sampling import hash_bucket

    df = _corpus(spark, 300).withColumn(
        "b", hash_bucket(F.col("doc_id"), salt="s3")
    )
    for r in df.select("doc_id", "b").collect():
        expect = (
            int(hashlib.md5(f"s3{r.doc_id}".encode()).hexdigest()[:8], 16)
            % 10_000
        )
        assert r.b == expect, (r.doc_id, r.b, expect)


def test_pack_sequences_matches_naive_layout(spark):
    from nspc_etl_basic_spark.operators.sampling import pack_sequences

    df = _corpus(spark, 400)
    seq_len = 512
    got = {
        r.doc_id: (r.cum_weight, r.seq_start, r.seq_end, r.n_seqs)
        for r in pack_sequences(df, "doc_id", "n_chars", seq_len, n_buckets=8).collect()
    }
    acc = 0
    for r in sorted(df.collect(), key=lambda r: r.doc_id):
        start = acc // seq_len
        acc += r.n_chars
        end = (acc - 1) // seq_len
        assert got[r.doc_id] == (acc, start, end, end - start + 1), r.doc_id
    assert len(got) == 400


def test_pack_sequences_long_doc_spans_multiple(spark):
    from nspc_etl_basic_spark.operators.sampling import pack_sequences

    rows = [(0, 10), (1, 5000), (2, 10)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = {r.doc_id: r.n_seqs for r in pack_sequences(df, "doc_id", "n_chars", 1024).collect()}
    assert got[1] >= 4  # 5000 chars span ceil-ish 1024-chunks
    assert got[0] == 1 and got[2] == 1


def test_pack_sequences_rejects_bad_seq_len(spark):
    from nspc_etl_basic_spark.operators.sampling import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(_corpus(spark), "doc_id", "n_chars", 0)


def test_mixture_order_prefix_proportions(spark):
    from nspc_etl_basic_spark.operators.sampling import mixture_order

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.col("id") % 3).alias("source"),
    )
    out = mixture_order(
        df, "source", "doc_id", {"s0": 0.6, "s1": 0.3, "s2": 0.1}
    )
    ordered = sorted(out.collect(), key=lambda r: r.mix_priority)
    prefix = [r.source for r in ordered[:500]]
    from collections import Counter

    c = Counter(prefix)
    # stride scheduling: every prefix tracks the weight proportions
    assert abs(c["s0"] / 500 - 0.6) < 0.05
    assert abs(c["s1"] / 500 - 0.3) < 0.05
    assert abs(c["s2"] / 500 - 0.1) < 0.05


def test_mixture_order_deterministic_and_drops_unlisted(spark):
    from nspc_etl_basic_spark.operators.sampling import mixture_order

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.col("id") % 4).alias("source"),
    )
    w = {"s0": 0.5, "s1": 0.5}
    a = sorted(map(tuple, mixture_order(df, "source", "doc_id", w).collect()))
    b = sorted(map(tuple, mixture_order(df.repartition(13), "source", "doc_id", w).collect()))
    assert a == b
    assert {t[1] for t in a} == {"s0", "s1"}  # s2/s3 dropped


def test_mixture_order_rejects_nonpositive_weight(spark):
    from nspc_etl_basic_spark.operators.sampling import mixture_order

    with pytest.raises(ValueError):
        mixture_order(_corpus(spark), "lang", "doc_id", {"lang_0": 0.0})


def test_hash_sample_threshold_rounds_not_truncates(spark):
    """0.57 * 10000 is 5699.999... in IEEE double; the threshold must
    round to 5700, not silently drop bucket 5699."""
    import hashlib

    # replay hash_bucket's md5 arithmetic driver-side to find keys that
    # deterministically land in the boundary bucket (and its neighbor)
    def bucket(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 10_000

    boundary_key = next(f"k{i}" for i in range(100_000) if bucket(f"k{i}") == 5699)
    dropped_key = next(f"k{i}" for i in range(100_000) if bucket(f"k{i}") == 5700)
    df = spark.createDataFrame(
        [(boundary_key,), (dropped_key,)], "doc_id string"
    )
    kept = {r.doc_id for r in hash_sample(df, "doc_id", 0.57).collect()}
    assert boundary_key in kept  # int() truncation would drop bucket 5699
    assert dropped_key not in kept


def test_take_until_budget_handles_null_weights(spark):
    rows = [(0, 10), (1, None), (2, 10), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = take_until_budget(df, "doc_id", "n_chars", budget=10, n_buckets=2)
    # null weights contribute nothing; doc 0 fits, doc 2 would exceed
    kept = {r.doc_id: r.cum_weight for r in got.collect()}
    assert kept[0] == 10
    assert 2 not in kept


def test_temperature_sample_rebalances(spark):
    from nspc_etl_basic_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "g"])
    out = temperature_sample(df, "id", "g", alpha=0.5, target_rows=500)
    got = {r["g"]: r["n"] for r in out.groupBy("g").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # sqrt weighting: big keeps ~500*0.75/900=0.42, small ~500*0.25/100=1.25->all
    assert got["small"] == 100  # fraction clamped at 1
    assert 300 < got["big"] < 450  # ~0.416 of 900 with hash-bucket noise
    # deterministic: re-run identical
    out2 = temperature_sample(df, "id", "g", alpha=0.5, target_rows=500)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_temperature_sample_alpha_extremes(spark):
    from nspc_etl_basic_spark.operators.sampling import temperature_sample

    rows = [(i, "a") for i in range(400)] + [(1000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "g"])
    # alpha=1: natural proportions -> keep everything at target=total
    all_kept = temperature_sample(df, "id", "g", alpha=1.0)
    assert all_kept.count() == 500
    # alpha=0: uniform weights -> equal per-stratum targets
    uni = temperature_sample(df, "id", "g", alpha=0.0, target_rows=200)
    got = {r["g"]: r["n"] for r in uni.groupBy("g").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert got["b"] == 100  # clamped (target 100 >= stratum size 100)
    assert 70 < got["a"] < 130  # ~100/400 of 400


def test_cap_per_group_deterministic_and_bounded(spark):
    from nspc_etl_basic_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = cap_per_group(df, "k", "g", 10)
    sizes = {r["g"]: r["cnt"] for r in out.groupBy("g").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(v == 10 for v in sizes.values())
    # stable under repartition: identical survivor set
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in cap_per_group(df.repartition(13), "k", "g", 10).collect()}
    assert a == b
    # under-cap groups pass through whole
    small = cap_per_group(df.where(F.col("k") < 6), "k", "g", 10)
    assert small.count() == 6
    import pytest as _pt
    with _pt.raises(ValueError):
        cap_per_group(df, "k", "g", 0)


def test_leakage_safe_split_keeps_clusters_together(spark):
    from nspc_etl_basic_spark.operators.sampling import leakage_safe_split

    comp = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], ["doc_id", "component_id"]
    )
    docs = spark.createDataFrame([(i,) for i in range(70)], ["doc_id"])
    out = leakage_safe_split(
        docs, comp, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    # every member of a component shares its split
    per = out.groupBy("component_id").agg(
        F.count_distinct("split").alias("n")
    ).collect()
    assert all(r["n"] == 1 for r in per)
    assert out.count() == 70


def test_hash_ring_negatives_properties(spark):
    from nspc_etl_basic_spark.operators.sampling import hash_ring_negatives

    docs = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    out = hash_ring_negatives(docs, "doc_id", k=3, n_buckets=32)
    rows = out.collect()
    # no self-negatives; ranks in 1..3; at most k per anchor
    assert all(r["doc_id"] != r["neg_doc_id"] for r in rows)
    assert {r["neg_rank"] for r in rows} <= {1, 2, 3}
    per = out.groupBy("doc_id").count().collect()
    assert max(r["count"] for r in per) <= 3
    # deterministic and repartition-stable
    a = sorted(tuple(r) for r in rows)
    b = sorted(
        tuple(r)
        for r in hash_ring_negatives(
            docs.repartition(7), "doc_id", k=3, n_buckets=32
        ).collect()
    )
    assert a == b
    # near-complete coverage: nearly every anchor got all 3 negatives
    assert sum(r["count"] for r in per) >= 3 * 200 * 0.9
