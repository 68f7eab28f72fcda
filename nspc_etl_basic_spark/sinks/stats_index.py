"""File-level min/max statistics index: driver-side scan pruning.

Parquet row-group stats (see sinks/layout.py Z-ordering) prune WITHIN a
file, but Spark still has to list, schedule, and open the footer of
every file in the table. At 100 TB a snapshot is tens of thousands of
files; for a selective predicate the dominant cost becomes per-file
scheduling, not bytes read. Delta and Iceberg solve this with per-file
min/max recorded in the commit manifest so the driver can drop files
from the scan BEFORE the plan is built. This module is that mechanism
for the ParquetWarehouse snapshot layout:

  build: ONE distributed column-pruned pass groups by
  ``input_file_name()`` and aggregates min/max (+ null/row counts) per
  tracked column — the same price as any narrow aggregate over the
  table, run once per commit (or lazily on first pruned read). The
  result is a tiny JSON sidecar INSIDE the version dir, so it is
  immutable with the data, GC'd with the data, and consistent under
  time travel.

  prune: a range/equality predicate intersects against each file's
  [min, max] interval on the driver (microseconds over an in-memory
  list), and only surviving files reach ``spark.read.parquet``. The
  predicate is ALSO applied to the resulting DataFrame — pruning is an
  optimization, never the correctness carrier — so a missing or stale
  index degrades to a full scan, silently correct.

Interval semantics: a file with min/max both NULL for the column holds
no non-null values and is dropped for any range predicate (SQL range
predicates never match NULL). Ordering is numeric for numeric types and
lexicographic for strings; dates/timestamps are recorded as ISO-8601
strings, whose lexicographic order IS chronological order.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_NAME = "_stats_index.json"

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double")


def _jsonable(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    return v


def _key(v):
    """Comparison key: floats for numbers, the value itself for strings
    (ISO date/timestamp strings compare chronologically)."""
    if isinstance(v, bool):
        return float(v)
    if isinstance(v, (int, float)):
        return float(v)
    return v


def build_stats_index(
    spark: SparkSession, data_dir: str, cols: list[str]
) -> dict:
    """One column-pruned scan -> per-file stats; writes ``INDEX_NAME``
    into ``data_dir`` and returns the index dict."""
    df = spark.read.parquet(data_dir)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"stats columns not in table: {missing}")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
        ]
    rows = (
        df.groupBy(F.input_file_name().alias("__file"))
        .agg(*aggs)
        .collect()
    )
    files = {}
    for r in rows:
        # input_file_name is a URI; key by basename (version-dir relative)
        base = os.path.basename(r["__file"])
        files[base] = {
            "rows": r["__rows"],
            "stats": {
                c: {
                    "min": _jsonable(r[f"__mn_{c}"]),
                    "max": _jsonable(r[f"__mx_{c}"]),
                    "nulls": r[f"__nn_{c}"],
                }
                for c in cols
            },
        }
    index = {"columns": list(cols), "files": files}
    tmp = os.path.join(data_dir, f".{INDEX_NAME}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(index, fh)
    os.replace(tmp, os.path.join(data_dir, INDEX_NAME))
    return index


def load_stats_index(data_dir: str) -> dict | None:
    try:
        with open(os.path.join(data_dir, INDEX_NAME), encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def prune_files(
    index: dict, data_dir: str, col: str, lo=None, hi=None
) -> list[str] | None:
    """Files whose [min, max] interval intersects [lo, hi] (None = open
    end). Returns None — "cannot prune, scan everything" — when the
    column is not indexed."""
    if index is None or col not in index.get("columns", []):
        return None
    if lo is None and hi is None:
        # No bound: nothing to prune on. Returning a file list here would
        # silently drop all-null files while pruned_scan applies no
        # predicate — pruning must never be the correctness carrier.
        return None
    lo_k = _key(_jsonable(lo)) if lo is not None else None
    hi_k = _key(_jsonable(hi)) if hi is not None else None
    keep = []
    for base, meta in index["files"].items():
        st = meta["stats"][col]
        mn, mx = st["min"], st["max"]
        if mn is None and mx is None:
            continue  # all-null: no range predicate can match
        if lo_k is not None and _key(mx) < lo_k:
            continue
        if hi_k is not None and _key(mn) > hi_k:
            continue
        keep.append(os.path.join(data_dir, base))
    return keep


def pruned_scan(
    spark: SparkSession,
    data_dir: str,
    col: str,
    lo=None,
    hi=None,
    build_if_missing: bool = False,
    cols: list[str] | None = None,
) -> DataFrame:
    """Range scan ``lo <= col <= hi`` reading only files the index says
    can match. The predicate is re-applied to the result (pruning is
    never the correctness carrier). Falls back to a full scan when no
    index covers ``col`` — or builds one first if ``build_if_missing``.
    """
    index = load_stats_index(data_dir)
    if (index is None or col not in index.get("columns", [])) and build_if_missing:
        index = build_stats_index(spark, data_dir, cols or [col])
    files = prune_files(index, data_dir, col, lo, hi)
    if files is None:
        df = spark.read.parquet(data_dir)
    elif not files:
        df = spark.read.parquet(data_dir).where(F.lit(False))
    else:
        df = spark.read.parquet(*files)
    pred = None
    if lo is not None:
        pred = F.col(col) >= F.lit(lo)
    if hi is not None:
        p2 = F.col(col) <= F.lit(hi)
        pred = p2 if pred is None else (pred & p2)
    return df.where(pred) if pred is not None else df
