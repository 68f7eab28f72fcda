"""Z-order write layout: multi-column data skipping for parquet scans.

Parquet row-group min/max statistics prune a scan only when the file
layout CLUSTERS the filtered columns. A plain sort clusters one column
perfectly and leaves every other column's min/max spanning the whole
domain; Z-ordering (bit-interleaving the columns' normalized values —
the Morton curve) trades a little locality on each column for locality
on ALL of them, so selective predicates on ANY of the z-ordered columns
(or combinations) skip most row groups. This is the standard lake-table
layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`), built here from
DataFrame primitives:

  1. per-column min/max (one tiny aggregate) -> linear normalization to
     ``bits``-bit integer ranks — plan literals, so the z-value is a
     pure JVM-side projection (shiftleft/or bit algebra, codegen'd; no
     UDF, no shuffle);
  2. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` — ONE
     range shuffle, the same price as any global sort;
  3. plain parquet write; readers need zero cooperation — the benefit
     materializes as ordinary row-group stats pruning.

Normalization uses min/max rather than quantile ranks: two scalar
aggregates instead of a sketch pass. Heavily skewed columns get skewed
z-cells, which costs *evenness* of pruning, never correctness; pass
pre-transformed columns (e.g. log buckets) when skew matters.

``tests/test_layout.py`` measures actual row-group pruning on a
two-column predicate vs single-column sorts with pyarrow footer stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear map [lo, hi] -> integer [0, 2^bits - 1] as a projection."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(span))
    return F.least(
        F.greatest(
            F.floor(scaled * F.lit(float((1 << bits) - 1))).cast("long"),
            F.lit(0),
        ),
        F.lit((1 << bits) - 1),
    )


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Append the Morton z-value column for ``cols``; returns
    ``(df_with_z, z_col_name)``. Min/max are collected once (a 2-value
    scalar aggregate per column) and baked into the projection as
    literals; the interleave is ``2 * bits * len(cols)`` shift/or terms
    of pure column algebra."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-order needs 2-4 columns")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a long")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    ranks = [
        _normalize(
            F.col(c),
            # empty input / all-null column: min and max come back as
            # None — degrade that column's rank to the constant 0
            # (plain insertion order) instead of crashing on None - None
            stats[f"__lo_{c}"] if stats[f"__lo_{c}"] is not None else 0.0,
            stats[f"__hi_{c}"] if stats[f"__hi_{c}"] is not None else 0.0,
            bits,
        )
        for c in cols
    ]
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for ci, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, b).bitwiseAND(F.lit(1)),
                    b * n + ci,
                )
            )
    name = "__z"
    return df.withColumn(name, z), name


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` to ``path`` Z-ordered on ``cols``: one range shuffle
    on the z-value, in-partition sort, z column dropped before write.
    ``n_files`` sizes the output files (range partitions); at scale pick
    it so files land at 128-512 MB like any parquet sink."""
    zdf, zc = zorder_value(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, F.col(zc))
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode("overwrite")
        .parquet(path)
    )
