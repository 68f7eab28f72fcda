"""Deterministic corpus mixture sampling — the "data mixing" step of a
training-data pipeline: given target mixture proportions over a stratum
column (language, source, domain) and a total token budget, compute the
per-stratum keep rate and draw the sample, reproducibly.

Published pipelines (Pile/ROOTS/LLaMA-style mixture tables) express the
recipe as "X% of the budget from stratum S". The operator turns that
into per-stratum hash-threshold sampling:

    rate_s = min(1, budget * parts_s / (total_parts * tokens_s))

computed entirely in INTEGER arithmetic (parts are integer weights, the
threshold is a floor division onto the shared 10k md5-bucket ring from
``sampling.hash_bucket``), so the draw is a pure function of the key —
stable under repartitioning, corpus growth, and retries — and a DuckDB
oracle replays membership bit-for-bit. A stratum whose corpus is
smaller than its budget share keeps everything (rate capped at 1);
redistribution of the shortfall is a policy choice left to the caller
(re-run with re-normalized parts over the capped-out strata).

Scale: one aggregate over (stratum, weight) for the totals — map-side
combined, |strata| rows — broadcast-joined back onto the corpus as a
filter. No corpus shuffle; the sample is a scan + filter, and the
filter arrives with the scan under whole-stage codegen.

Reference parity: no counterpart in /root/reference — extension surface
(LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.sampling import _BUCKETS, hash_bucket

__all__ = ["mix_rates", "mix_sources"]


def mix_rates(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    parts: dict[str, int],
    budget: int,
) -> DataFrame:
    """Per-stratum mixture plan: ``(strata_col, stratum_tokens,
    target_tokens, threshold, quantized_to_zero)`` where ``threshold``
    is the integer hash-bucket cut (0..10000) implementing
    ``min(1, budget*parts_s/(total_parts*tokens_s))``. ``parts`` are
    INTEGER mixture weights (e.g. {"en": 5, "de": 2, ...}); strata
    absent from ``parts`` get threshold 0 (explicitly dropped, same
    contract as ``stratified_sample``). All arithmetic is BIGINT floor
    division — replayable exactly.

    Recipe-audit completeness (round 8): a ``parts`` key absent from
    the data still gets a row (stratum_tokens 0, its target_tokens
    share, threshold 0) — a silently-missing stratum previously
    vanished from the plan with its budget share unspent.
    ``quantized_to_zero`` flags the other silent drop: a stratum WITH
    data and positive target_tokens whose effective rate floors below
    1/10000 on the ring, so the draw keeps NOTHING of it despite a
    positive share (missing strata are already visible via
    stratum_tokens = 0 and stay unflagged). Both conditions are the recipe owner's signal to
    re-normalize, not something this operator should paper over."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    total_parts = sum(parts.values())
    if total_parts <= 0 or any(p < 0 for p in parts.values()):
        raise ValueError(f"parts must be non-negative with a positive sum: {parts}")

    strata_type = df.schema[strata_col].dataType.simpleString()
    parts_raw = df.sparkSession.createDataFrame(
        [(str(k), int(p)) for k, p in sorted(parts.items())],
        "__k string, __p_in long",
    )
    # fail fast if a key does not survive the cast to the strata
    # column's type: an un-castable key becomes NULL (never joins — a
    # confusing null-stratum row instead of an error) and distinct keys
    # that collapse under the cast ('1' and '01' to int 1) would
    # double-count a stratum's rows and budget. parts is recipe-sized,
    # so this is a bounded driver-side check.
    cast_rows = parts_raw.select(
        "__k",
        F.expr(f"try_cast(__k AS {strata_type})").alias("__c"),
    ).collect()
    null_keys = [r["__k"] for r in cast_rows if r["__c"] is None]
    if null_keys:
        raise ValueError(
            f"parts keys {null_keys} do not cast to {strata_col}'s "
            f"type {strata_type}"
        )
    seen: dict = {}
    for r in cast_rows:
        if r["__c"] in seen:
            raise ValueError(
                f"parts keys {seen[r['__c']]!r} and {r['__k']!r} "
                f"collapse to the same {strata_type} value {r['__c']!r}"
            )
        seen[r["__c"]] = r["__k"]
    parts_df = parts_raw.select(
        F.col("__k").cast(strata_type).alias(strata_col),
        F.col("__p_in"),
    )

    totals = df.groupBy(strata_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("stratum_tokens")
    )
    # integer plan: target = budget*parts_s div total_parts;
    # threshold = min(10000, target*10000 div stratum_tokens). `div` is
    # exact BIGINT floor division (a double `/` would drift from the
    # DuckDB `//` replay at large budgets). Full-outer with the parts
    # table: data-only strata keep __p = 0, parts-only strata keep
    # stratum_tokens = 0.
    return totals.join(parts_df, strata_col, "full_outer").select(
        strata_col,
        F.coalesce("stratum_tokens", F.lit(0).cast("long")).alias(
            "stratum_tokens"
        ),
        F.coalesce("__p_in", F.lit(0).cast("long")).alias("__p"),
    ).select(
        strata_col,
        "stratum_tokens",
        F.expr(
            f"CAST({int(budget)} AS BIGINT) * __p div "
            f"CAST({int(total_parts)} AS BIGINT)"
        ).alias("target_tokens"),
        F.when(F.col("stratum_tokens") > 0, F.least(
            F.lit(_BUCKETS).cast("long"),
            F.expr(
                f"(CAST({int(budget)} AS BIGINT) * __p div "
                f"CAST({int(total_parts)} AS BIGINT)) * {_BUCKETS} "
                f"div stratum_tokens"
            ),
        )).otherwise(F.lit(0).cast("long")).alias("threshold"),
    ).withColumn(
        "quantized_to_zero",
        (F.col("stratum_tokens") > 0)
        & (F.col("target_tokens") > 0)
        & (F.col("threshold") == 0),
    )


def mix_sources(
    df: DataFrame,
    key: str,
    strata_col: str,
    weight_col: str,
    parts: dict[str, int],
    budget: int,
    salt: str = "mix",
) -> DataFrame:
    """Draw the mixture: keep rows whose hash bucket falls under their
    stratum's threshold from ``mix_rates``. Membership is a pure
    function of (key, salt) — disjoint salts give independent draws.
    Plan: scan + broadcast semi-structure filter, no corpus shuffle."""
    rates = mix_rates(df, strata_col, weight_col, parts, budget)
    bucket = hash_bucket(F.col(key), salt)
    return (
        df.join(
            F.broadcast(rates.select(strata_col, "threshold")), strata_col
        )
        .where(bucket < F.col("threshold"))
        .drop("threshold")
    )
