"""bootstrap_mean_ci: the interval brackets the true mean at sane
widths, is layout-independent, and weight generation matches the
Poisson(1) distribution roughly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.bootstrap import (
    POISSON1_CDF,
    bootstrap_mean_ci,
)


def _df(spark, n=400):
    # deterministic pseudo-noise around mean 10
    rows = [("g", i, 10.0 + ((i * 37) % 21 - 10) / 10.0) for i in range(n)]
    return spark.createDataFrame(rows, "k string, id long, v double")


def test_ci_brackets_mean_and_orders(spark):
    (row,) = bootstrap_mean_ci(
        _df(spark), "k", "v", "id", n_replicates=20
    ).collect()
    assert row["n"] == 400
    assert row["boot_lo"] <= row["mean"] <= row["boot_hi"]
    # CI width for n=400, sd~0.6: a loose sanity band
    assert 0 < row["boot_hi"] - row["boot_lo"] < 1.0


def test_layout_independent(spark):
    df = _df(spark)
    a = bootstrap_mean_ci(df, "k", "v", "id").collect()[0]
    b = bootstrap_mean_ci(df.repartition(13), "k", "v", "id").collect()[0]
    assert tuple(a) == tuple(b)


def test_cdf_ladder_is_poisson1(spark):
    import math

    cum = 0.0
    for k, c in enumerate(POISSON1_CDF):
        cum += math.exp(-1) / math.factorial(k)
        assert c == pytest.approx(cum, abs=5e-10)


def test_validation(spark):
    df = _df(spark, 10)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "k", "v", "id", n_replicates=2)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "k", "v", "id", alpha=1.5)
