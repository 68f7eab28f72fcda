"""Tests for the round-4 operators: data-quality checks, SCD2 history,
span dedup, group-wise anomaly detection, and embedding covariance/PCA."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.anomaly import zscore_outliers
from nspc_etl_basic_spark.operators.quality import (
    Check,
    completeness,
    compliance,
    maximum,
    mean_of,
    minimum,
    run_checks,
    uniqueness,
)
from nspc_etl_basic_spark.operators.scd import scd2_apply_changes, scd2_from_feed
from nspc_etl_basic_spark.operators.similarity import (
    embedding_covariance,
    pca_components,
    pca_project,
)
from nspc_etl_basic_spark.operators.spandedup import dedup_spans


# ---------------------------------------------------------------- quality

def test_run_checks_passes_and_fails(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "b", 40.0)],
        ["id", "cat", "val"],
    )
    out = run_checks(
        df,
        [
            Check("id_unique", uniqueness("id"), lo=1.0),
            Check("cat_complete", completeness("cat"), lo=1.0),
            Check("val_min", minimum("val"), lo=0.0),
            Check("val_max", maximum("val"), hi=35.0),
            Check("val_mean", mean_of("val"), lo=20.0, hi=30.0),
            Check("cat_pattern", compliance("cat", "[ab]"), lo=1.0),
        ],
    ).collect()
    res = {r["check_name"]: r for r in out}
    assert res["id_unique"]["passed"] is True
    assert res["cat_complete"]["passed"] is False  # one null
    assert res["cat_complete"]["value"] == 0.75
    assert res["val_min"]["passed"] is True
    assert res["val_max"]["passed"] is False  # 40 > 35
    assert res["val_mean"]["value"] == 25.0 and res["val_mean"]["passed"] is True
    assert res["cat_pattern"]["passed"] is True  # nulls excluded


def test_uniqueness_multi_column_and_approx(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 1)], ["a", "b"]
    )
    out = run_checks(
        df,
        [
            Check("pair", uniqueness("a", "b")),
            Check("a_only", uniqueness("a")),
        ],
    ).collect()
    res = {r["check_name"]: r["value"] for r in out}
    assert res["pair"] == 0.75  # 3 distinct pairs / 4 rows
    assert res["a_only"] == 0.5
    # approx path runs and lands near the exact value
    approx = run_checks(df, [Check("p", uniqueness("a", "b", exact=False))]).collect()
    assert 0.5 <= approx[0]["value"] <= 1.0


def test_single_pass_plan(spark):
    df = spark.createDataFrame([(1, 2.0)], ["id", "v"])
    out = run_checks(
        df, [Check("c", completeness("v")), Check("m", mean_of("v"))]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one aggregate over the scan — no join, no window
    assert "Join" not in plan and "Window" not in plan


# ---------------------------------------------------------------- scd2

def _feed(spark):
    d = datetime.date
    return spark.createDataFrame(
        [
            (1, d(2024, 1, 1), "NEW", 10),
            (1, d(2024, 2, 1), "NEW", 10),   # no attr change -> compressed
            (1, d(2024, 3, 1), "SHIP", 10),
            (1, d(2024, 4, 1), "DONE", 12),
            (2, d(2024, 1, 15), "NEW", 5),
        ],
        ["k", "ts", "status", "qty"],
    )


def test_scd2_from_feed(spark):
    out = scd2_from_feed(_feed(spark), ["k"], "ts", ["status", "qty"]).collect()
    k1 = sorted([r for r in out if r["k"] == 1], key=lambda r: r["valid_from"])
    assert [r["status"] for r in k1] == ["NEW", "SHIP", "DONE"]
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    assert k1[2]["valid_to"] is None and k1[2]["is_current"] is True
    assert sum(1 for r in k1 if r["is_current"]) == 1
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["is_current"] is True


def test_scd2_apply_changes_matches_full_rebuild(spark):
    d = datetime.date
    feed = _feed(spark)
    existing = scd2_from_feed(feed, ["k"], "ts", ["status", "qty"])
    batch = spark.createDataFrame(
        [(1, d(2024, 5, 1), "RETURN", 12), (3, d(2024, 5, 2), "NEW", 1)],
        ["k", "ts", "status", "qty"],
    )
    incr = scd2_apply_changes(existing, batch, ["k"], "ts", ["status", "qty"])
    full = scd2_from_feed(
        feed.unionByName(batch), ["k"], "ts", ["status", "qty"]
    )
    a = sorted(map(tuple, incr.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b
    # untouched key 2 passed through; key 1 extended; key 3 new
    assert {r[0] for r in a} == {1, 2, 3}


def test_scd2_apply_changes_idempotent(spark):
    d = datetime.date
    feed = _feed(spark)
    existing = scd2_from_feed(feed, ["k"], "ts", ["status", "qty"])
    batch = spark.createDataFrame(
        [(1, d(2024, 4, 1), "DONE", 12)], ["k", "ts", "status", "qty"]
    )  # re-delivery of an already-applied change
    incr = scd2_apply_changes(existing, batch, ["k"], "ts", ["status", "qty"])
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, existing.collect())
    )


# ---------------------------------------------------------------- span dedup

def test_dedup_spans_removes_shared_boilerplate(spark):
    boiler = "all rights reserved see license file for details"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha text here {boiler}"),
            (2, f"{boiler} totally different body words"),
            (3, "nothing shared with anyone at all in this one"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_spans(docs, n=5, min_count=2).collect()}
    # the 8-token boilerplate is fully covered by flagged 5-grams in both docs
    assert "rights" not in out[1]["clean_text"]
    assert "rights" not in out[2]["clean_text"]
    assert out[1]["clean_text"].startswith("unique alpha text here")
    assert out[2]["clean_text"].endswith("totally different body words")
    assert out[1]["n_removed"] == 8 and out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "nothing shared with anyone at all in this one"


def test_dedup_spans_short_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], ["doc_id", "text"]
    )
    out = dedup_spans(docs, n=5, min_count=2).collect()
    assert all(r["n_removed"] == 0 for r in out)
    assert all(r["clean_text"] == "tiny doc" for r in out)


def test_dedup_spans_overlapping_spans_union(spark):
    # 6 duplicated tokens -> two overlapping flagged 5-grams, union = 6
    shared = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, f"{shared} tailone"), (2, f"headtwo {shared}")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_spans(docs, n=5, min_count=2).collect()}
    assert out[1]["n_removed"] == 6 and out[1]["clean_text"] == "tailone"
    assert out[2]["n_removed"] == 6 and out[2]["clean_text"] == "headtwo"


# ---------------------------------------------------------------- anomaly

def test_zscore_outliers_flags_spike(spark):
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 10, 11, 9, 10, 100]]
    rows += [("b", float(v)) for v in [5, 5, 5]]  # zero variance -> no outliers
    df = spark.createDataFrame(rows, ["g", "v"])
    out = zscore_outliers(df, "g", "v", threshold=2.0).collect()
    assert len(out) == 1
    assert out[0]["g"] == "a" and out[0]["v"] == 100.0
    assert out[0]["z"] > 2.0


def test_zscore_outliers_no_window_in_plan(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "v"])
    plan = zscore_outliers(df, "g", "v")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Broadcast" in plan  # stats re-attach by broadcast, not shuffle


# ------------------------------------------------------- covariance / pca

def test_embedding_covariance_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(50, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in X[i]]) for i in range(50)]
    )
    out = embedding_covariance(df, "embedding").collect()
    C = np.cov(X.astype(np.float64), rowvar=False, ddof=1)
    for r in out:
        assert abs(r["cov"] - C[r["i"], r["j"]]) < 1e-6
    assert len(out) == 6 * 7 // 2


def test_pca_roundtrip_variance(spark):
    rng = np.random.default_rng(11)
    # anisotropic data: one dominant direction
    base = rng.normal(size=(200, 1)) @ np.array([[3.0, 1.0, 0.0, 0.0]])
    X = (base + 0.1 * rng.normal(size=(200, 4))).astype(np.float32)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in X[i]]) for i in range(200)]
    )
    comps = pca_components(df, "embedding", k=2)
    assert len(comps) == 2 and len(comps[0]) == 4
    # top component aligns with the dominant direction
    c0 = np.array(comps[0])
    direction = np.array([3.0, 1.0, 0.0, 0.0])
    cosine = abs(c0 @ direction) / (np.linalg.norm(c0) * np.linalg.norm(direction))
    assert cosine > 0.99
    proj = pca_project(df, comps, "embedding").collect()
    assert len(proj) == 200 and set(proj[0].asDict()) == {"vec_id", "pc0", "pc1"}
    # projection onto PC0 carries more variance than PC1
    p0 = np.array([r["pc0"] for r in proj])
    p1 = np.array([r["pc1"] for r in proj])
    assert p0.var() > p1.var()


def test_pca_project_no_shuffle(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0]), Row(vec_id=1, embedding=[0.0, 1.0])]
    )
    out = pca_project(df, [[1.0, 0.0], [0.0, 1.0]], "embedding")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------- incremental span dedup

def test_incremental_span_dedup_flags_cross_batch_boilerplate(spark):
    from nspc_etl_basic_spark.operators.spandedup import (
        build_gram_store,
        incremental_dedup_spans,
        merge_gram_store,
    )

    boiler = "all rights reserved see license file for details"
    corpus = spark.createDataFrame(
        [(1, f"first ingested doc {boiler}")], ["doc_id", "text"]
    )
    store = build_gram_store(corpus, n=5)

    batch = spark.createDataFrame(
        [(10, f"{boiler} fresh unique content here"),
         (11, "nothing shared at all with anything else")],
        ["doc_id", "text"],
    )
    cleaned, batch_counts = incremental_dedup_spans(batch, store, n=5)
    got = {r["doc_id"]: r for r in cleaned.collect()}
    # boilerplate shared with the ALREADY-INGESTED corpus is cut from the
    # batch without rescanning corpus text
    assert got[10]["clean_text"] == "fresh unique content here"
    assert got[10]["n_removed"] == 8
    assert got[11]["n_removed"] == 0

    # store advances additively: boiler grams now count 2
    store2 = merge_gram_store(store, batch_counts)
    boiler_grams = 8 - 5 + 1
    assert store2.where("count >= 2").count() == boiler_grams

    # a third batch with the boiler is cut against the advanced store
    batch3 = spark.createDataFrame(
        [(20, f"tail words {boiler}")], ["doc_id", "text"]
    )
    cleaned3, _ = incremental_dedup_spans(batch3, store2, n=5)
    assert cleaned3.collect()[0]["clean_text"] == "tail words"


def test_incremental_span_dedup_within_batch(spark):
    from nspc_etl_basic_spark.operators.spandedup import (
        incremental_dedup_spans,
    )

    shared = "one two three four five six"
    batch = spark.createDataFrame(
        [(1, f"{shared} alpha"), (2, f"beta {shared}")], ["doc_id", "text"]
    )
    empty_store = spark.createDataFrame([], "gh LONG, count LONG")
    cleaned, counts = incremental_dedup_spans(batch, empty_store, n=5)
    got = {r["doc_id"]: r["clean_text"] for r in cleaned.collect()}
    assert got == {1: "alpha", 2: "beta"}
    # batch counts ready for the store merge
    assert counts.where("count >= 2").count() == 2  # the two shared 5-grams


def test_pca_power_orthonormal_and_deterministic(spark):
    """pca_components_power: bit-identical across partitionings,
    orthonormal to machine precision, Rayleigh close to eigh's
    eigenvalues on a spectrally well-separated fixture."""
    import numpy as np

    from nspc_etl_basic_spark.operators.similarity import (
        embedding_covariance,
        pca_components_power,
    )

    rng = np.random.RandomState(7)
    # strong planted directions -> clear spectral gaps
    base = rng.randn(400, 6) * np.array([8.0, 4.0, 2.0, 0.5, 0.3, 0.1])
    q, _ = np.linalg.qr(rng.randn(6, 6))
    data = (base @ q.T).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    comps = pca_components_power(df, "embedding", k=3, dims=6)
    comps2 = pca_components_power(
        df.repartition(13), "embedding", k=3, dims=6
    )
    assert comps == comps2  # bit-identical across partitionings

    A = np.array(comps)
    assert np.abs(A @ A.T - np.eye(3)).max() < 1e-9

    rows = embedding_covariance(df, "embedding", dims=6).collect()
    C = np.zeros((6, 6))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    vals = np.sort(np.linalg.eigvalsh(C))[::-1]
    for c in range(3):
        ray = float(A[c] @ C @ A[c])
        assert abs(ray - vals[c]) / vals[c] < 1e-6
