from nspc_etl_basic_spark.operators.schema_inference import (
    ColumnStats,
    InferredSchema,
    infer_schema,
)
from nspc_etl_basic_spark.operators.cast import cast_and_split
from nspc_etl_basic_spark.operators.sampling import (
    assign_split,
    hash_sample,
    mixture_order,
    pack_sequences,
    stratified_sample,
    take_until_budget,
)
from nspc_etl_basic_spark.operators.skew import salted_count_by_key, salted_join

__all__ = [
    "ColumnStats",
    "InferredSchema",
    "infer_schema",
    "cast_and_split",
    "assign_split",
    "hash_sample",
    "mixture_order",
    "pack_sequences",
    "stratified_sample",
    "take_until_budget",
    "salted_count_by_key",
    "salted_join",
]
