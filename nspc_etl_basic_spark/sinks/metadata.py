"""Job/batch/error metadata sinks (SURVEY.md §2 H8-H10, D3-D4 support).

Append-only Parquet tables with the reference's exact column sets:
  - EtlJobStatistics  (loader.py:511-525, 12 cols + BatchJobID)
  - EtlJobError       (loader.py:548-557)
  - EtlBatchJobStatistics (loader.py:574-587 + enhanced cols :253-291)

Batch resume needs "latest state per BatchJobID"; with an append-only
store that is a last-write-wins read (window on EventSeq) rather than SQL
UPDATE — the Spark-native equivalent of the reference's in-place updates.
"""

from __future__ import annotations

import datetime as _dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse

JOB_STATS_SCHEMA = T.StructType(
    [
        T.StructField("JobRunID", T.StringType(), False),
        T.StructField("JobStartTime", T.TimestampType(), True),
        T.StructField("JobEndTime", T.TimestampType(), True),
        T.StructField("JobDurationSeconds", T.LongType(), True),
        T.StructField("JobStatus", T.StringType(), True),
        T.StructField("SourceFile", T.StringType(), True),
        T.StructField("TargetTable", T.StringType(), True),
        T.StructField("RowsRead", T.LongType(), True),
        T.StructField("RowsInserted", T.LongType(), True),
        T.StructField("RowsUpdated", T.LongType(), True),
        T.StructField("RowsFailed", T.LongType(), True),
        T.StructField("ErrorMessage", T.StringType(), True),
        T.StructField("BatchJobID", T.StringType(), True),
    ]
)

ERROR_LOG_SCHEMA = T.StructType(
    [
        T.StructField("ErrorID", T.StringType(), False),
        T.StructField("JobRunID", T.StringType(), True),
        T.StructField("TableName", T.StringType(), True),
        T.StructField("ColumnName", T.StringType(), True),
        T.StructField("ErrorType", T.StringType(), True),
        T.StructField("ErrorMessage", T.StringType(), True),
        T.StructField("ErrorTimestamp", T.TimestampType(), True),
    ]
)

BATCH_STATS_SCHEMA = T.StructType(
    [
        T.StructField("BatchJobID", T.StringType(), False),
        T.StructField("DirectoryPath", T.StringType(), True),
        T.StructField("TotalFiles", T.LongType(), True),
        T.StructField("FilesProcessed", T.LongType(), True),
        T.StructField("FilesFailed", T.LongType(), True),
        T.StructField("BatchStartTime", T.TimestampType(), True),
        T.StructField("BatchEndTime", T.TimestampType(), True),
        T.StructField("BatchStatus", T.StringType(), True),
        T.StructField("IsResumed", T.BooleanType(), True),
        T.StructField("OriginalBatchJobID", T.StringType(), True),
        # append-only versioning: highest EventSeq per BatchJobID is current
        T.StructField("EventSeq", T.LongType(), False),
    ]
)


QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("JobRunID", T.StringType(), False),
        T.StructField("TableName", T.StringType(), True),
        T.StructField("CheckName", T.StringType(), False),
        T.StructField("Value", T.DoubleType(), True),
        T.StructField("Lo", T.DoubleType(), True),
        T.StructField("Hi", T.DoubleType(), True),
        T.StructField("Passed", T.BooleanType(), True),
        T.StructField("CheckTimestamp", T.TimestampType(), True),
    ]
)


class MetadataStore:
    def __init__(self, warehouse: ParquetWarehouse, config: dict | None = None):
        self.wh = warehouse
        cfg = config or {}
        self.stats_table = cfg.get("job_statistics", {}).get("table_name", "EtlJobStatistics")
        self.error_table = cfg.get("error_logging", {}).get("table_name", "EtlJobError")
        self.batch_table = cfg.get("batch_processing", {}).get(
            "batch_table_name", "EtlBatchJobStatistics"
        )
        self.quality_table = (cfg.get("quality") or {}).get(
            "table_name", "EtlQualityCheck"
        )

    # ---- H8: job statistics
    def write_statistics(self, stats: dict) -> None:
        spark = self.wh.spark
        row = {f.name: stats.get(f.name) for f in JOB_STATS_SCHEMA.fields}
        df = spark.createDataFrame([row], schema=JOB_STATS_SCHEMA)
        df.write.mode("append").parquet(self.wh.table_path(self.stats_table))

    def read_statistics(self) -> DataFrame:
        if not self.wh.exists(self.stats_table):
            return self.wh.spark.createDataFrame([], schema=JOB_STATS_SCHEMA)
        return self.wh.read(self.stats_table)

    # ---- H9: error log
    def write_error_log(
        self,
        job_run_id: str,
        table_name: str,
        column_name: str,
        error_type: str,
        error_message: str,
    ) -> None:
        row = {
            "ErrorID": str(uuid.uuid4()),
            "JobRunID": job_run_id,
            "TableName": table_name,
            "ColumnName": column_name,
            "ErrorType": error_type,
            "ErrorMessage": error_message,
            "ErrorTimestamp": _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
        }
        df = self.wh.spark.createDataFrame([row], schema=ERROR_LOG_SCHEMA)
        df.write.mode("append").parquet(self.wh.table_path(self.error_table))

    def write_invalid_rows(self, invalid: DataFrame, job_run_id: str, table_name: str) -> int:
        """Distributed error sink: one EtlJobError row per invalid source
        row (G2's failed-row log), written as a single Spark job — no
        driver-side iteration."""
        from nspc_etl_basic_spark.operators.cast import ERROR_COL

        n = invalid.count()
        if n == 0:
            return 0
        rows = invalid.select(
            F.expr("uuid()").alias("ErrorID"),
            F.lit(job_run_id).alias("JobRunID"),
            F.lit(table_name).alias("TableName"),
            F.array_join(F.col(ERROR_COL), "; ").alias("ColumnName"),
            F.lit("CAST_VALIDATION").alias("ErrorType"),
            F.to_json(F.struct(*[c for c in invalid.columns if c != ERROR_COL])).alias(
                "ErrorMessage"
            ),
            F.current_timestamp().alias("ErrorTimestamp"),
        )
        rows.write.mode("append").parquet(self.wh.table_path(self.error_table))
        return n

    def read_error_log(self) -> DataFrame:
        if not self.wh.exists(self.error_table):
            return self.wh.spark.createDataFrame([], schema=ERROR_LOG_SCHEMA)
        return self.wh.read(self.error_table)

    # ---- quality-check results (round-4 extension; same append-only shape)
    def write_quality_results(
        self, results: list[dict], job_run_id: str, table_name: str
    ) -> None:
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        rows = [
            {
                "JobRunID": job_run_id,
                "TableName": table_name,
                "CheckName": r["check_name"],
                "Value": r["value"],
                "Lo": r["lo"],
                "Hi": r["hi"],
                "Passed": r["passed"],
                "CheckTimestamp": now,
            }
            for r in results
        ]
        df = self.wh.spark.createDataFrame(rows, schema=QUALITY_SCHEMA)
        df.write.mode("append").parquet(self.wh.table_path(self.quality_table))

    def read_quality_results(self) -> DataFrame:
        if not self.wh.exists(self.quality_table):
            return self.wh.spark.createDataFrame([], schema=QUALITY_SCHEMA)
        return self.wh.read(self.quality_table)

    # ---- H10: batch statistics (append-only, last EventSeq wins)
    def append_batch_event(self, event: dict) -> None:
        row = {f.name: event.get(f.name) for f in BATCH_STATS_SCHEMA.fields}
        df = self.wh.spark.createDataFrame([row], schema=BATCH_STATS_SCHEMA)
        df.write.mode("append").parquet(self.wh.table_path(self.batch_table))

    def current_batches(self) -> DataFrame:
        """Latest event per BatchJobID (reference's UPDATE-in-place read
        model, loader.py:1601-1638, expressed as last-write-wins)."""
        if not self.wh.exists(self.batch_table):
            return self.wh.spark.createDataFrame([], schema=BATCH_STATS_SCHEMA)
        df = self.wh.read(self.batch_table)
        w = Window.partitionBy("BatchJobID").orderBy(F.col("EventSeq").desc())
        return df.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")

    # ---- D3: completed-file set for checkpoint anti-join
    def completed_files(self, batch_job_id: str) -> set[str]:
        stats = self.read_statistics()
        rows = (
            stats.filter(
                (F.col("BatchJobID") == batch_job_id)
                & (F.col("JobStatus") == "Completed")
            )
            .select("SourceFile")
            .distinct()
            .collect()
        )
        return {r["SourceFile"] for r in rows}
