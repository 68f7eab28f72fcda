"""Pseudonymization: salted-hash tokenization of identifier columns.

The governance step a training-data pipeline runs before identifiers
leave the trust boundary: replace each id with ``sha256(salt || '|' ||
id)``. Properties that make this the standard pattern:

  - REFERENTIAL INTEGRITY survives — the same (salt, id) tokenizes
    identically in every table, so joins keyed on the token still work
    (the driver query joins orders to customer entirely on tokens).
  - Crypto-shredding: rotate/destroy the salt and every token becomes
    unlinkable — deletion by key destruction, the practical GDPR answer
    for immutable data lakes.
  - Pure projection: no shuffle, no state, engine-replayable (Spark
    ``sha2(x, 256)`` == DuckDB ``sha256(x)``, both lowercase hex).

This is pseudonymization, not anonymization: with the salt, tokens
invert by brute force over the id space. Treat the salt as a secret
with the same blast radius as the raw ids. Complements
``operators/text.redact_pii`` (free-text PII) — this handles STRUCTURED
identifiers.

Nulls stay null (concat-with-null is null in both engines) — a null id
must not collapse to a shared token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k_thresholds: tuple = (2, 5, 10),
) -> DataFrame:
    """Re-identification risk audit: group rows by the quasi-identifier
    tuple and report, per threshold k, how exposed the table is —
    ``(k, k_anonymity, n_classes, n_classes_below, rows_below,
    rows_below_ppm)``. ``k_anonymity`` (the min class size — the
    table's actual k) repeats on every row for convenience; a release
    gate reads ``rows_below == 0`` for its chosen k.

    Scale: one groupBy on the quasi tuple (map-side combined — the
    shuffle carries one row per equivalence class), then a constant-
    size aggregate per threshold over the class table. The ppm
    fraction is the repo's floor(x*1e6)/1e6-style exact arithmetic
    (here an integer floor over BIGINT products), so the report is
    oracle-replayable."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    ks = sorted(set(int(k) for k in k_thresholds))
    if not ks or ks[0] < 2:
        raise ValueError("thresholds must be >= 2")
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__cn")
    )
    aggs = [
        F.min("__cn").alias("k_anonymity"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("__cn").alias("__total"),
    ]
    for k in ks:
        below = F.when(F.col("__cn") < k, 1).otherwise(0)
        aggs.append(F.sum(below).cast("long").alias(f"__cb_{k}"))
        aggs.append(
            F.sum(F.when(F.col("__cn") < k, F.col("__cn")).otherwise(0))
            .cast("long")
            .alias(f"__rb_{k}")
        )
    one = classes.agg(*aggs)
    per_k = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"),
                    F.col(f"__cb_{k}").alias("n_classes_below"),
                    F.col(f"__rb_{k}").alias("rows_below"),
                )
                for k in ks
            ]
        )
    ).alias("__e")
    return one.select(
        "k_anonymity", "n_classes", "__total", per_k
    ).select(
        F.col("__e.k").alias("k"),
        "k_anonymity",
        "n_classes",
        F.col("__e.n_classes_below").alias("n_classes_below"),
        F.col("__e.rows_below").alias("rows_below"),
        F.floor(
            F.col("__e.rows_below") * F.lit(1000000) / F.col("__total")
        ).cast("long").alias("rows_below_ppm"),
    )


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    token_hex_len: int | None = None,
) -> DataFrame:
    """Replace each column in ``cols`` with its salted sha256 token
    (full 64 hex chars, or a ``token_hex_len`` prefix when storage
    matters — 16 hex = 64 bits keeps collisions below ~1e-9 up to tens
    of millions of distinct ids; shorter is refused)."""
    if token_hex_len is not None and token_hex_len < 16:
        raise ValueError(
            "token_hex_len < 16 (64 bits) invites collisions that MERGE "
            "unrelated identities; use >= 16 or the full hash"
        )
    out = df
    for c in cols:
        tok = F.sha2(
            F.concat(F.lit(salt), F.lit("|"), F.col(c).cast("string")), 256
        )
        if token_hex_len is not None:
            tok = F.substring(tok, 1, int(token_hex_len))
        out = out.withColumn(c, tok)
    return out
