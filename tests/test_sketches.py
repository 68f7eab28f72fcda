"""Sketch-tier aggregates: the 100 TB swaps for exact operators.

The driver oracles pin the EXACT tiers (count distinct, percentile);
these tests pin the approximate tiers' error contracts — the versions a
100 TB deployment actually runs (HLL++ and t-digest are mergeable
map-side, so they aggregate in one pass with bounded memory, where exact
distinct shuffles every key and exact percentile sorts every group)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    # events.parquet stores ts as TIMESTAMP(NANOS); these tests don't use
    # ts, but the reader still validates the schema — read nanos as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = _events(spark, sf_dir)
    exact = ev.select(F.count_distinct("user_id")).collect()[0][0]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.05)
    ).collect()[0][0]
    assert abs(approx - exact) <= max(3 * 0.05 * exact, 3)


def test_approx_percentile_within_accuracy(spark, sf_dir):
    ev = _events(spark, sf_dir)
    exact, approx = ev.select(
        F.percentile(F.col("value"), F.lit(0.5)),
        F.percentile_approx("value", 0.5, accuracy=10000),
    ).collect()[0]
    # percentile_approx guarantees rank error <= n/accuracy; translate to
    # a loose value bound via the observed spread
    lo, hi = ev.select(F.min("value"), F.max("value")).collect()[0]
    assert abs(approx - exact) <= (hi - lo) * 0.05


def test_sketches_are_mergeable_across_partitions(spark, sf_dir):
    """The scale property that makes sketches the right tier: the same
    answer regardless of partitioning (merge is associative)."""
    ev = _events(spark, sf_dir)
    a = ev.coalesce(1).select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).collect()[0][0]
    b = ev.repartition(32).select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).collect()[0][0]
    assert a == b


def test_kmv_distinct_exact_passthrough(spark, sf_dir):
    """Groups at or below k distinct keys: the sketch IS the distinct
    set, so the estimate equals the exact count with rel_error 0."""
    from nspc_etl_basic_spark.operators.sketches import kmv_distinct

    ev = _events(spark, sf_dir)
    rows = kmv_distinct(ev, "user_id", ["event_type"], k=1024).collect()
    assert rows
    for r in rows:
        assert r.n_exact <= 1024  # premise of this test at small sf
        assert r.kmv_estimate == float(r.n_exact)
        assert r.rel_error == 0.0


def test_kmv_estimator_accuracy_above_k(spark):
    """High-cardinality group (5000 keys, k=64): the (k-1)/u_k estimator
    actually runs and lands within 4 standard errors (~1/sqrt(k-2)) of
    truth. Deterministic — the md5 hashes are fixed."""
    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.sketches import kmv_distinct

    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.col("id").alias("user_id")
    )
    r = kmv_distinct(df, "user_id", ["grp"], k=64).collect()[0]
    assert r.n_exact == 5000
    assert r.kmv_estimate != 5000.0  # estimator path, not passthrough
    assert r.rel_error <= 4.0 / (62 ** 0.5), r


def test_kmv_prefilter_is_transparent(spark):
    """A prefilter sized for the group's cardinality must not change the
    estimate: it only drops hashes that were never among the k smallest
    (P(u < t) = t, so t = 50*k/n keeps ~50x the needed survivors)."""
    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.sketches import kmv_distinct

    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.col("id").alias("user_id")
    )
    base = kmv_distinct(df, "user_id", ["grp"], k=64).collect()[0]
    filt = kmv_distinct(
        df, "user_id", ["grp"], k=64, prefilter=50 * 64 / 5000
    ).collect()[0]
    assert base.kmv_estimate == filt.kmv_estimate
    # and the filtered path still reports the same kept-k tail
    assert base.rel_error == filt.rel_error


def test_kmv_rejects_bad_k(spark):
    import pytest

    from nspc_etl_basic_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([(1, "a")], "user_id long, event_type string")
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "user_id", ["event_type"], k=1)


def test_histogram_quantiles_interpolation_and_degenerate(spark):
    from nspc_etl_basic_spark.operators.sketches import histogram_quantiles

    # group "a": uniform 0..99 -> histogram estimate within one bin width
    rows = [("a", float(v)) for v in range(100)]
    rows += [("flat", 7.0)] * 5  # degenerate: zero variance
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        (r["g"], r["q"]): r["est"]
        for r in histogram_quantiles(df, "v", "g", qs=(0.5, 0.9), bins=10).collect()
    }
    # bin width = 9.9; estimates must land within one bin of the truth
    assert abs(out[("a", 0.5)] - 49.5) <= 9.9
    assert abs(out[("a", 0.9)] - 89.1) <= 9.9
    assert out[("flat", 0.5)] == 7.0 and out[("flat", 0.9)] == 7.0


def test_histogram_quantiles_no_window_over_rows(spark):
    from nspc_etl_basic_spark.operators.sketches import histogram_quantiles

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "v"])
    plan = histogram_quantiles(df, "v", "g")._jdf.queryExecution() \
        .executedPlan().toString()
    # cumulative walk is in-row over the <=bins histogram array — the
    # plan must not contain a Window (or a global Sort) over data rows
    assert "Window" not in plan


def test_heavy_hitters_matches_exact_group_by(spark, sf_dir):
    """Two-phase frequent-items output == plain groupBy/HAVING (the
    superset-then-exact-count construction is exact by design)."""
    from nspc_etl_basic_spark.operators.sketches import heavy_hitters

    ev = _events(spark, sf_dir)
    frac = 0.005
    got = {
        (r["user_id"], r["cnt"])
        for r in heavy_hitters(ev, "user_id", frac).collect()
    }
    import math

    n = ev.count()
    want = {
        (r["user_id"], r["cnt"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= max(1, math.ceil(frac * n)))
        .collect()
    }
    assert got == want and want  # non-vacuous


def test_heavy_hitters_skewed_key(spark):
    """A Zipf-ish synthetic: one dominant key, a long uniform tail —
    only the head survives the threshold."""
    from nspc_etl_basic_spark.operators.sketches import heavy_hitters

    rows = [("hot",)] * 500 + [("warm",)] * 60 + [
        (f"cold{i}",) for i in range(440)
    ]
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    out = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 0.05).collect()}
    assert out == {"hot": 500, "warm": 60}
    # share is floor(cnt*1e6/N)/1e6
    shares = {
        r["k"]: r["share"] for r in heavy_hitters(df, "k", 0.05).collect()
    }
    assert shares["hot"] == 0.5


def test_heavy_hitters_empty_and_validation(spark):
    from nspc_etl_basic_spark.operators.sketches import heavy_hitters
    import pytest as _pt

    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    # all keys unique, threshold 10%: nothing qualifies, schema intact
    out = heavy_hitters(df, "k", 0.1)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "cnt", "share"]
    with _pt.raises(ValueError):
        heavy_hitters(df, "k", 0.0)
    with _pt.raises(ValueError):
        heavy_hitters(df, "k", 0.01, support=0.5)


def test_heavy_hitters_tiny_threshold_handling(spark):
    from nspc_etl_basic_spark.operators.sketches import heavy_hitters
    import pytest as _pt

    df = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, ["k"])
    # threshold below freqItems' 2e-4 default-support floor still works
    # (support clamps to 1e-4, superset guarantee intact)
    out = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 2e-4).collect()}
    assert out == {"a": 50, "b": 50}
    # explicit sub-floor support: clear error, not a JVM exception
    with _pt.raises(ValueError, match="1e-4"):
        heavy_hitters(df, "k", 0.5, support=1e-5)
