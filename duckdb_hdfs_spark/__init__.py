"""duckdb_hdfs_spark — a PySpark-native analytics engine with the
capabilities of the DuckDB ``hadoopfs`` extension (OLAP SQL over
HDFS-resident files), plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Reference parity target: vincent-chang/duckdb-hdfs
(``src/hadoopfs.cpp``, ``src/include/hadoopfs.hpp``) — a DuckDB
virtual-filesystem extension whose point is "full OLAP SQL over
``hdfs://`` paths".  Here the filesystem layer is Spark's native
Hadoop integration (configured via :mod:`duckdb_hdfs_spark.conf`),
and the query surface is Spark SQL / DataFrame so Catalyst plans it.
"""

from duckdb_hdfs_spark.session import get_spark, stop_spark
from duckdb_hdfs_spark.sources.catalog import TABLES, load_tables

__all__ = ["get_spark", "stop_spark", "TABLES", "load_tables"]

__version__ = "0.1.0"
