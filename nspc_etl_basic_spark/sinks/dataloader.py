"""Dataloader-shard sink: write materialized packed sequences as the
file layout a training job actually reads.

The last hop of the packing family
(``operators/packing``: seqlen_plan -> pack_greedy/pack_incremental ->
pack_materialize -> here): every packed sequence hashes to one of
``n_shards`` output shards on the shared md5 ring (sequence identity
``bucket:bin`` — the same assignment ``shard_assign`` produces for the
un-materialized rows), and the dataset lands as parquet partitioned by
``shard``, so a data-parallel trainer maps shard directories to ranks
with no further shuffling and no cross-rank file overlap.

Scale: the shard id is a pure projection on the materialized rows —
zero extra shuffle; ``partitionBy`` writes each task's rows into its
shard subdirectories directly. Shards are balanced in expectation
(sequences are i.i.d. on the ring); verify with
``packing.shard_report`` before writing if the balance matters. The
write is atomic per Spark's file-commit protocol; re-running with
``mode="overwrite"`` replaces the dataset.

Reference parity: extends H2's table-mode dispatcher idea
(`file-to-sql-loader.py` save-path selection) to the training-data
surface — no direct counterpart in /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_packed_dataset", "write_packed_dataset"]


def write_packed_dataset(
    materialized: DataFrame,
    path: str,
    n_shards: int,
    salt: str = "shard",
    mode: str = "overwrite",
) -> None:
    """Write a ``pack_materialize`` result as shard-partitioned parquet.

    Expects the materialized schema ``(bucket, bin, n_segments, fill,
    input_ids, segment_ids)``; adds ``shard`` (md5 ring of bucket:bin —
    identical to ``packing.shard_assign``'s assignment, so a report run
    on the assignment describes exactly these files) and writes
    ``path/shard=K/...``."""
    # the ONE shard definition: packing.shard_assign — reusing it (not
    # re-deriving the hash) is what makes the docstring's identity claim
    # hold by construction. Materialized rows always carry a non-null
    # bin, so every row gets a shard.
    from nspc_etl_basic_spark.operators.packing import shard_assign

    (
        shard_assign(materialized, n_shards, salt=salt)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def read_packed_dataset(
    spark: SparkSession, path: str, shard: int | None = None
) -> DataFrame:
    """Read a packed dataset back; ``shard`` restricts to one shard via
    partition pruning (the scan lists only that directory — this is the
    per-rank read path)."""
    df = spark.read.parquet(path)
    if shard is not None:
        df = df.where(F.col("shard") == int(shard))
    return df
