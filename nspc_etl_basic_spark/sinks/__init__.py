from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse
from nspc_etl_basic_spark.sinks.bucketed import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)
from nspc_etl_basic_spark.sinks.bucketed_merge import BucketedTable
from nspc_etl_basic_spark.sinks.jdbc_merge import jdbc_upsert, render_merge_sql

__all__ = [
    "ParquetWarehouse",
    "BucketedTable",
    "jdbc_upsert",
    "render_merge_sql",
    "read_bucketed",
    "write_bucketed",
    "write_partitioned",
]

from nspc_etl_basic_spark.sinks.stats_index import (
    build_stats_index,
    load_stats_index,
    pruned_scan,
)

__all__ += ["build_stats_index", "load_stats_index", "pruned_scan"]

from nspc_etl_basic_spark.sinks.dataloader import (
    read_packed_dataset,
    write_packed_dataset,
)

__all__ += ["read_packed_dataset", "write_packed_dataset"]
