from duckdb_hdfs_spark.sources.catalog import TABLES, load_tables
from duckdb_hdfs_spark.sources.fs import HadoopFs

__all__ = ["TABLES", "load_tables", "HadoopFs"]
