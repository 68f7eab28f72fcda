from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse
from nspc_etl_basic_spark.sinks.bucketed import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "ParquetWarehouse",
    "read_bucketed",
    "write_bucketed",
    "write_partitioned",
]
