"""Table sinks + table-mode semantics (SURVEY.md §2 H1-H7).

Primary store is a Parquet warehouse directory (one subdir per table) —
matches the driver's parquet testdata and the DuckDB oracle. A JDBC writer
with ``createTableColumnTypes`` DDL parity hangs off the same interface for
reference-compatible SQL Server targets.

Mode mapping (reference ``handle_existing_table``, loader.py:895-932):
  drop_recreate -> overwrite | append -> append | fail -> error |
  upsert -> snapshot rewrite via operators.merge.

Upsert atomicity: Spark cannot overwrite a path it is reading, and the
reference's transaction rollback must become "never expose a half-written
snapshot" (SURVEY.md §7.2 item 1). We write the merged snapshot to a
staging dir, then swap directories via rename — single-driver atomic enough,
mirroring a transactional table format's commit without the dependency.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableExistsError(RuntimeError):
    pass


class ParquetWarehouse:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def table_path(self, name: str) -> str:
        return os.path.join(self.path, name)

    def exists(self, name: str) -> bool:
        p = self.table_path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(name))

    def write(self, df: DataFrame, name: str, mode: str = "drop_recreate") -> None:
        """H2 dispatcher for the non-merge modes."""
        drop_engine_cols = [c for c in df.columns if c.startswith("__")]
        if drop_engine_cols:
            df = df.drop(*drop_engine_cols)
        if mode == "drop_recreate":
            df.write.mode("overwrite").parquet(self.table_path(name))
        elif mode == "append":
            df.write.mode("append").parquet(self.table_path(name))
        elif mode == "fail":
            if self.exists(name):
                raise TableExistsError(f"table '{name}' exists and table_mode is 'fail'")
            df.write.mode("error").parquet(self.table_path(name))
        else:
            raise ValueError(f"unknown table mode: {mode}")

    def overwrite_snapshot(self, df: DataFrame, name: str) -> None:
        """All-or-nothing snapshot replacement for the upsert path: stage,
        then swap. ``df`` may read from the table's current files — the
        staging write materializes it before the old dir is touched."""
        drop_engine_cols = [c for c in df.columns if c.startswith("__")]
        if drop_engine_cols:
            df = df.drop(*drop_engine_cols)
        final = self.table_path(name)
        staging = f"{final}.__staging__{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(staging)
        old = f"{final}.__old__{uuid.uuid4().hex[:8]}"
        if os.path.isdir(final):
            os.rename(final, old)
        try:
            os.rename(staging, final)
        except OSError:
            if os.path.isdir(old):  # restore on failed swap
                os.rename(old, final)
            raise
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    def drop(self, name: str) -> None:
        shutil.rmtree(self.table_path(name), ignore_errors=True)


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str,
    sql_types: dict[str, str] | None = None,
    options: dict | None = None,
    batch_size: int = 1000,
) -> None:
    """Optional JDBC sink with reference DDL parity: the inferred NVARCHAR
    length buckets / DATETIME2 / DECIMAL(18,4) types (H1) are forwarded via
    ``createTableColumnTypes`` so the created table matches the reference's
    generated DDL (loader.py:868-893). ``batchsize`` mirrors
    ``loader.batch_size`` (src/loader_config.yaml:14)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batch_size))
    if sql_types:
        writer = writer.option(
            "createTableColumnTypes",
            ", ".join(f"{c} {t}" for c, t in sql_types.items()),
        )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    spark_mode = {"drop_recreate": "overwrite", "append": "append", "fail": "error"}[mode]
    writer.mode(spark_mode).save()
