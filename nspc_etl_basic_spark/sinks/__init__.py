from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse

__all__ = ["ParquetWarehouse"]
