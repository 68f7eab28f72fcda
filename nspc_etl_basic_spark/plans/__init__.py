from nspc_etl_basic_spark.plans.pipeline import FileLoadResult, process_file

__all__ = ["FileLoadResult", "process_file"]
