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
