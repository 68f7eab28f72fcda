"""fastlit.nested_lit: value parity with F.lit and the constant-folding
guarantee the perf win depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from nspc_etl_basic_spark.functions.fastlit import nested_lit


def test_nested_lit_matches_f_lit_values(spark):
    data = [[1.5, -2.25, 0.0], [3.0, 4.5, 1e-7]]
    df = spark.range(1).select(
        nested_lit(data, "array<array<double>>").alias("fast"),
        F.lit(data).alias("slow"),
    )
    row = df.collect()[0]
    assert row.fast == row.slow == data


def test_nested_lit_is_constant_folded(spark):
    """The optimized plan must contain a plain Literal, not a runtime
    from_json — otherwise every row would re-parse the JSON payload."""
    data = [[[float(i + j) for i in range(4)] for j in range(4)]]
    df = spark.range(3).select(
        F.element_at(
            nested_lit(data, "array<array<array<double>>>"), 1
        ).alias("t")
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "from_json" not in optimized.lower()


def test_nested_lit_three_levels_and_element_at(spark):
    data = [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]
    got = (
        spark.range(1)
        .select(
            F.element_at(
                F.element_at(
                    F.element_at(
                        nested_lit(data, "array<array<array<double>>>"), 2
                    ),
                    1,
                ),
                2,
            ).alias("x")
        )
        .collect()[0]
        .x
    )
    assert got == 6.0


def test_nested_lit_int_arrays(spark):
    data = [[1, 2], [3, 4]]
    got = spark.range(1).select(
        nested_lit(data, "array<array<bigint>>").alias("a")
    ).collect()[0].a
    assert got == data
