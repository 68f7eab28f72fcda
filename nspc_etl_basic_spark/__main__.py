"""CLI entry point: ``python -m nspc_etl_basic_spark <path> [flags]``.

Mirrors the reference's invocation shape and exit-code contract
(``main()``, loader.py:1503-1659, shipped as run-file-to-sql-loader.sh):

  - positional input path; ``--config <yaml>`` (loader.py:1505-1509)
  - isfile -> single-file load; exit 0 on Completed, 1 otherwise
    (loader.py:1661-1687)
  - isdir  -> checkpointed batch with resume; exit 0 even when some files
    fail (the batch itself completed — per-file failures live in the
    statistics table, reference behavior), 1 only if the batch machinery
    itself errors
  - missing path -> exit 1 (loader.py:1686-1687)

Flags beyond the reference's two arguments surface config keys users
otherwise need a YAML for (--table-mode, --override-table-name,
--max-retries, --no-move); precedence is flags > YAML > defaults.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from nspc_etl_basic_spark.config import load_config
from nspc_etl_basic_spark.session import get_spark

logger = logging.getLogger("nspc_etl_basic_spark.cli")

TABLE_MODES = ("drop_recreate", "append", "upsert", "fail")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m nspc_etl_basic_spark",
        description="File/directory to Spark-warehouse loader",
    )
    p.add_argument("input_path", help="file or directory to process")
    p.add_argument(
        "--config",
        default=None,
        metavar="YAML",
        help="configuration file (defaults applied when omitted)",
    )
    p.add_argument("--table-mode", choices=TABLE_MODES, default=None)
    p.add_argument(
        "--override-table-name",
        default=None,
        help="load into this table instead of the filename-derived one",
    )
    p.add_argument("--max-retries", type=int, default=None, metavar="N")
    p.add_argument(
        "--warehouse",
        default=None,
        metavar="DIR",
        help="warehouse directory (overrides database.warehouse_path)",
    )
    p.add_argument(
        "--no-move",
        action="store_true",
        help="leave source files in place (skip processed/error moves)",
    )
    p.add_argument(
        "--dry-run",
        action="store_true",
        help="validate only (read, infer/authority, cast, quality gate) "
        "— no writes, no metadata, no file moves; exit 0 on Validated",
    )
    p.add_argument(
        "--master",
        default=None,
        help="Spark master (default: local[*] or $SPARK_GRAFT_CPUS)",
    )
    return p


def _config_from_args(args: argparse.Namespace) -> dict:
    loader_over: dict = {}
    if args.table_mode:
        loader_over["table_mode"] = args.table_mode
    if args.override_table_name:
        loader_over["override_table_name"] = args.override_table_name
    if args.max_retries is not None:
        loader_over["max_retries"] = args.max_retries
    overrides: dict = {}
    if loader_over:
        overrides["loader"] = loader_over
    if args.warehouse:
        overrides["database"] = {"warehouse_path": args.warehouse}
    return load_config(args.config, overrides=overrides or None)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
    )

    if not os.path.exists(args.input_path):
        logger.error("Input path does not exist: %s", args.input_path)
        return 1
    if args.dry_run and os.path.isdir(args.input_path):
        # fail before paying SparkSession startup for an argument error
        logger.error("--dry-run is per-file: pass a file path")
        return 1

    config = _config_from_args(args)
    spark = get_spark(master=args.master)
    move_files = not args.no_move

    if os.path.isdir(args.input_path):
        from nspc_etl_basic_spark.plans.batch import process_directory

        res = process_directory(spark, args.input_path, config, move_files=move_files)
        logger.info(
            "batch %s: %s (%d processed, %d failed of %d)",
            res.batch_job_id,
            res.status,
            res.files_processed,
            res.files_failed,
            res.total_files,
        )
        return 0

    from nspc_etl_basic_spark.plans.pipeline import process_file

    res = process_file(
        spark, args.input_path, config, move_files=move_files,
        dry_run=args.dry_run,
    )
    logger.info(
        "%s -> table %s: %s (%d read, %d inserted, %d updated, %d failed)",
        args.input_path,
        res.table_name,
        res.status,
        res.rows_read,
        res.rows_inserted,
        res.rows_updated,
        res.rows_failed,
    )
    ok_status = "Validated" if args.dry_run else "Completed"
    if res.status != ok_status:
        if res.error_message:
            logger.error("error: %s", res.error_message)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
