"""Multi-format scan operators (SURVEY.md §2 A1-A6).

``read_any`` reads CSV/PSV/JSON *as all-string columns* on purpose: type
resolution belongs to this engine's inference pass (operators/schema
inference), not to Spark's ``inferSchema``, so the reference's inference
semantics (priority order, sampling, fallback) stay ours.

Scale notes: csv/json reads are splittable line-format scans; Spark
parallelizes by ``spark.sql.files.maxPartitionBytes``. Column pruning and
filter pushdown happen downstream via Catalyst. An empty or header-only file
yields a 0-row DataFrame (reference treats EmptyDataError as a valid no-op in
upsert mode, loader.py:1420-1432).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nspc_etl_basic_spark.sources.sniffer import detect_file_type

#: ordinal column carrying input row order within a file — the one place
#: input order is semantic (last-wins dedup, SURVEY.md §2 E1). Assigned at
#: read time, before any shuffle can reorder rows.
SEQ_COL = "__seq"


def read_any(
    spark: SparkSession,
    path: str,
    file_type: str | None = None,
    with_seq: bool = False,
) -> DataFrame:
    """Read csv|psv|json into an all-string DataFrame.

    When ``with_seq`` is set, a monotonically increasing ``__seq`` column
    pins input row order for order-sensitive operators (E1 last-wins).
    """
    kind = file_type or detect_file_type(path)
    if kind == "csv":
        df = _read_delim(spark, path, ",")
    elif kind == "psv":
        df = _read_delim(spark, path, "|")
    elif kind == "tsv":
        df = _read_delim(spark, path, "\t")
    elif kind == "json":
        df = _read_json_flat(spark, path)
    elif kind == "jsonl":
        df = _read_jsonl_flat(spark, path)
    elif kind in ("parquet", "orc"):
        df = _read_columnar_as_strings(spark, path, kind)
    else:
        raise ValueError(f"Unsupported file type: {kind}")

    if with_seq:
        df = df.withColumn(SEQ_COL, F.monotonically_increasing_id())
    return df


def _read_delim(spark: SparkSession, path: str, sep: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("inferSchema", False)
        # empty strings become NULL at cast/validation (B9), not read, so
        # max-length stats still see the raw value
        .option("nullValue", None)
        .option("mode", "PERMISSIVE")
        # quoted fields may contain embedded newlines (RFC 4180; the
        # reference's pandas reader accepts them) — without multiLine,
        # Spark splits such a record into corrupted rows. Trade: the file
        # is parsed as one split. That matches this path's contract — the
        # per-FILE load pipeline (reference processes file-sized drops;
        # parallelism comes from the batch of files, and post-read
        # transforms repartition anyway). Bulk ingest of one huge CSV
        # should go through spark.read directly with escaping disabled.
        .option("multiLine", True)
        .csv(path)
    )


def _read_json_flat(spark: SparkSession, path: str) -> DataFrame:
    # array-of-flat-objects (reference reads with pd.read_json); multiLine
    # handles the pretty-printed array form of the reference fixtures
    df = spark.read.option("multiLine", True).json(path)
    # normalize every column to string so inference semantics match the
    # delimited path (inference decides the real types)
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


def _read_jsonl_flat(spark: SparkSession, path: str) -> DataFrame:
    # newline-delimited JSON — Spark's native splittable json format (one
    # record per line parallelizes by byte range, unlike the multiLine
    # whole-document parse)
    df = spark.read.json(path)
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


def _read_columnar_as_strings(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    # parquet/orc land with real types; the load pipeline's contract is
    # all-string input (type authority = our inference / the existing
    # table's DDL, exactly as for delimited files), so render values to
    # strings the same way the cast stage parses them back
    df = spark.read.format(fmt).load(path)
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.dataType.simpleString().startswith("timestamp"):
            # default string render drops subseconds inconsistently across
            # writers; pin the B3-parseable form
            c = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        cols.append(c.cast("string").alias(f.name))
    return df.select(*cols)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest a directory of opaque media files (images/audio/any blob)
    via Spark's ``binaryFile`` source: one row per file with ``(path,
    modificationTime, length, content: binary)``, ready for the
    ``operators/multimodal.py`` Arrow kernels (decode / features /
    resize run downstream on the ``content`` column).

    ``glob`` filters by filename pattern (e.g. ``*.png``); ``max_bytes``
    sets ``pathGlobFilter``-independent size guard: files larger than the
    limit are *filtered by metadata before content is read* — the filter
    is on the file-status ``length`` column, which the binaryFile source
    prunes without loading payloads.

    Scale: each file is one task input; Spark packs small files into
    partitions up to ``spark.sql.files.maxPartitionBytes``. Payloads
    stay columnar binary end-to-end — never grouped, never shuffled by
    the downstream kernels.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= int(max_bytes))
    return df
