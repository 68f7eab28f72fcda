"""nspc_etl_basic_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference
``tan-res-space/nspc-etl-basic`` (a schema-inferring file->SQL loader) as an
idiomatic Spark DataFrame engine, extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing).

Design stance (SURVEY.md §7.0): DataFrame + Spark SQL only; no RDDs, no
custom Catalyst rules. Storage is Parquet-backed tables; JDBC is an optional
sink behind the same interface. The public seams mirror the reference's
de-facto API (SURVEY.md §3.3): ``infer_schema``, ``cast_and_split``,
``write_table``, composed by ``process_file``.
"""

from nspc_etl_basic_spark.config import load_config
from nspc_etl_basic_spark.naming import generate_table_name
from nspc_etl_basic_spark.session import get_spark


def process_file(*args, **kwargs):
    """Lazy re-export of plans.pipeline.process_file (avoids importing
    pyspark at package-import time)."""
    from nspc_etl_basic_spark.plans.pipeline import process_file as fn

    return fn(*args, **kwargs)


def process_directory(*args, **kwargs):
    """Lazy re-export of plans.batch.process_directory."""
    from nspc_etl_basic_spark.plans.batch import process_directory as fn

    return fn(*args, **kwargs)


def run_curation(*args, **kwargs):
    """Lazy re-export of plans.curation.run_curation."""
    from nspc_etl_basic_spark.plans.curation import run_curation as fn

    return fn(*args, **kwargs)


__all__ = [
    "load_config",
    "generate_table_name",
    "get_spark",
    "process_file",
    "run_curation",
    "process_directory",
]

__version__ = "0.1.0"
