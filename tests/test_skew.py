"""Skew-mitigation operators (operators/skew.py): salting must be a pure
physical rewrite — identical results to the unsalted plan — and must
actually spread a hot key across salt values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.skew import (
    _SALT,
    _row_salt,
    salted_count_by_key,
    salted_join,
)


def _skewed_fact(spark, n=2000, hot_fraction=0.7):
    """A fact table where one key owns ``hot_fraction`` of all rows."""
    n_hot = int(n * hot_fraction)
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < n_hot, F.lit(7))
        .otherwise(F.pmod(F.col("id"), 50))
        .alias("k"),
        (F.col("id") * 3 % 101).alias("payload"),
    )


def _dim(spark):
    return spark.range(50).select(
        F.col("id").alias("dk"), F.concat(F.lit("seg_"), F.col("id") % 5).alias("seg")
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_matches_plain(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, fact.k == dim.dk)
    salted = salted_join(fact, dim, on=[("k", "dk")], n_salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_matches_plain(spark):
    # dim covers only half the key space -> unmatched fact rows must
    # null-extend exactly ONCE, not once per salt replica
    fact = _skewed_fact(spark)
    dim = _dim(spark).filter(F.col("dk") < 25)
    plain = fact.join(dim, fact.k == dim.dk, "left")
    salted = salted_join(fact, dim, on=[("k", "dk")], n_salt=8, how="left")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_rejects_outer_modes(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, on=[("k", "dk")], how="full")


def test_hot_key_spreads_over_salts(spark):
    # the point of salting: the hot key's rows land on many salt values
    fact = _skewed_fact(spark)
    salts = (
        fact.withColumn(_SALT, _row_salt(fact, 8))
        .filter(F.col("k") == 7)
        .select(_SALT)
        .distinct()
        .count()
    )
    assert salts >= 6  # 1400 rows over 8 buckets: all 8 expected, allow 6


def test_salt_is_deterministic(spark):
    fact = _skewed_fact(spark)
    a = fact.withColumn(_SALT, _row_salt(fact, 8)).collect()
    b = fact.withColumn(_SALT, _row_salt(fact, 8)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_count_matches_plain_groupby(spark):
    fact = _skewed_fact(spark)
    plain = {
        r.k: r.n
        for r in fact.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {r.k: r.n for r in salted_count_by_key(fact, ["k"], n_salt=8).collect()}
    assert salted == plain


def test_join_cardinality_report_hand_computed(spark):
    from nspc_etl_basic_spark.operators.skew import join_cardinality_report

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (3,), (4,), (4,)], "k long"
    )
    rows = join_cardinality_report(left, right, "k", top_n=10).collect()
    by_key = {r.key: r for r in rows}

    # est total = 3*2 (k=1) + 1*1 (k=3) = 7; k=2 left-only, k=4 right-only
    assert set(by_key) == {1, 3}
    assert by_key[1].out_rows == 6 and by_key[3].out_rows == 1
    assert by_key[1].rows_left == 3 and by_key[1].rows_right == 2
    assert rows[0].key == 1  # ordered by contribution desc
    for r in rows:
        assert r.est_total_rows == 7
        assert r.matched_keys == 2
        assert r.left_only_keys == 1
        assert r.right_only_keys == 1
    assert by_key[1].share_ppm == (1_000_000 * 6) // 7


def test_join_cardinality_report_exactly_predicts_join(spark):
    from nspc_etl_basic_spark.operators.skew import join_cardinality_report

    left = spark.range(0, 200).selectExpr("id % 7 AS k")
    right = spark.range(0, 90).selectExpr("id % 5 AS k")
    est = join_cardinality_report(left, right, "k").collect()[0].est_total_rows
    actual = left.join(right, "k").count()
    assert est == actual
