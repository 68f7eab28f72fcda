from nspc_etl_basic_spark.operators.schema_inference import (
    ColumnStats,
    InferredSchema,
    infer_schema,
)
from nspc_etl_basic_spark.operators.cast import cast_and_split

__all__ = ["ColumnStats", "InferredSchema", "infer_schema", "cast_and_split"]
