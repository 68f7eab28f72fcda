"""Bucketed table layout — co-located joins without a shuffle.

At 100 TB the dominant recurring cost of a fact-fact equi-join is
re-shuffling both sides on the join key EVERY query. Spark's bucketing
fixes the layout once at write time: ``bucketBy(n, key)`` hash-splits
each write task's output into ``n`` bucket files, and the scan reports
``HashPartitioning(key, n)`` — so a join (or groupBy) on the bucket key
of two tables bucketed the same way plans with ZERO Exchange nodes.
``sortBy`` additionally pre-sorts within buckets, letting sort-merge
join skip its Sort nodes.

This is the batch analogue of the reference's single-table upsert
target: the tables a pipeline joins repeatedly (fact ↔ fact, fact ↔
big dim too large to broadcast) should be written bucketed on the join
key. Trade-offs the caller owns: ``n_buckets`` is fixed at write time
(re-bucketing is a rewrite), and each write task emits up to
``n_buckets`` files — write with a sensible task count to avoid a
small-file explosion.

Bucketed tables must live in the session catalog (the bucket metadata is
catalog state, not parquet metadata), so this module uses
``saveAsTable``/``spark.table`` rather than path reads; the in-memory
catalog works — no Hive metastore needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "write_partitioned"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table registered in the session
    catalog. With ``path`` set the data lands there (external table);
    otherwise under ``spark.sql.warehouse.dir``."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    writer = (
        df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (a plain
    ``spark.read.parquet(path)`` would DISCARD the bucket spec and
    re-shuffle on the next join)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning (``path/col=value/...``) — the
    standard layout for time-partitioned fact tables. A reader filtering
    on a partition column prunes at PLANNING time (``PartitionFilters``
    in the scan, untouched directories never listed or opened) — at
    100 TB the difference between scanning a day and scanning a decade.
    Orthogonal to bucketing: partition on the coarse time/tenant axis,
    bucket within partitions on the join key. Callers own cardinality
    discipline: partition columns must be low-cardinality (days, not
    user ids) or the layout degrades into millions of directories."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
