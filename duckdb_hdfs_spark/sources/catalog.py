"""Table catalog: register the test-data parquet files as temp views.

The reference's usage pattern is ``SELECT * FROM
'hdfs://nn/path/file'`` — a path *is* a table.  Spark equivalent:
``spark.read.parquet(path)`` + temp view, or direct-path SQL
(``SELECT … FROM parquet.`path```, see :func:`sql_path`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: small dimension tables safe to broadcast at ANY scale factor —
#: their cardinality is fixed (region=5, nation=25) or grows far
#: slower than the fact tables.
BROADCAST_DIMS = ("region", "nation")


#: tables with parquet TIMESTAMP(NANOS) columns — Spark's reader has
#: no nanosecond timestamp type, so these are read as raw int64 ns
#: (``spark.sql.legacy.parquet.nanosAsLong``) and converted to
#: microsecond timestamps (matching DuckDB's ``epoch_us`` floor).
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

#: Naive (isAdjustedToUTC=false) parquet timestamps read as
#: TIMESTAMP_NTZ under Spark 4's default NTZ inference, which the
#: timestamp function surface (``unix_micros``, ``window`` …) rejects.
#: DuckDB reads the same columns as plain TIMESTAMP, so for oracle
#: parity we pin the pre-3.4 behavior: naive parquet micros ==
#: session-local TIMESTAMP (session tz is UTC — value-identity).
_NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table with deterministic timestamp semantics.

    Session-conf contract (round-7 review made this explicit): this
    PERMANENTLY sets ``spark.sql.parquet.inferTimestampNTZ.enabled=
    false`` and, for nano-timestamp tables, ``spark.sql.legacy.
    parquet.nanosAsLong=true`` on the session.  A scoped
    set-and-restore is NOT safe here: parquet scans consult these
    confs when an ACTION plans, not when ``spark.read`` builds the
    frame, so restoring after this call would race every downstream
    job of the returned (lazy) DataFrame.  Sessions from
    :func:`duckdb_hdfs_spark.session.get_spark` already run with the
    NTZ conf at this value; an externally built session that needs
    different parquet semantics for its own reads should use a
    separate session for those.  The NTZ-cast fallback below keeps
    THIS loader correct even when the session captured the default
    confs before the call (there is no per-read option for either
    knob — verified against Spark 4.1)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    nano_cols = _NANO_TS_COLUMNS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(_NTZ_CONF, "false")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in nano_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    # belt-and-braces for externally built sessions where the conf
    # was captured before this call: NTZ → session-tz timestamp is a
    # wall-clock identity ONLY under a UTC session timezone.  The tz
    # conf is set just for the cast ANALYSIS (Spark resolves the
    # cast's timeZoneId eagerly, at withColumn time) and restored —
    # an externally built session deliberately running in another
    # timezone keeps its semantics for every other query.
    # Top-level fields only — the test tables are flat; nested NTZ
    # inside struct/array would need a recursive rewrite.
    if any(isinstance(f.dataType, TimestampNTZType) for f in df.schema.fields):
        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            for field in df.schema.fields:
                if isinstance(field.dataType, TimestampNTZType):
                    df = df.withColumn(
                        field.name, F.col(field.name).cast("timestamp")
                    )
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load + register temp views so both DataFrame code and
    ``spark.sql`` queries see the same tables."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def sql_path(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Direct-path SQL — parity with DuckDB's ``FROM 'hdfs://…'``."""
    return spark.sql(f"SELECT * FROM {fmt}.`{path}`")
