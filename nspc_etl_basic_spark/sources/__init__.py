from nspc_etl_basic_spark.sources.sniffer import detect_file_type
from nspc_etl_basic_spark.sources.reader import read_any, read_binary_dir

__all__ = ["detect_file_type", "read_any", "read_binary_dir"]
