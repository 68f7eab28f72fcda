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
