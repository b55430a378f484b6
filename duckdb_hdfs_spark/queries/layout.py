"""Z-order layout registry entry (SURVEY.md §2.11).

Registered after ``llmextra`` in ``_QUERY_MODULES`` — past the
driver's 50-entry window this round (the window is allocated to the
§2.5-2.10 surface); oracle-checked by the local sf0.001/sf0.01
sweeps, rotating into the driver window next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.operators.layout import zorder_key, zorder_key_sql
from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t

_ZBITS = 8
_ZSQL = zorder_key_sql(["user_id", "floor(value)"], bits=_ZBITS)


# --------------------------------------------------------------------------
@query(
    "layout_zorder_tiles",
    oracle=f"""
WITH z AS (
    SELECT (user_id & 255) AS a,
           (CAST(floor(value) AS BIGINT) & 255) AS b,
           {_ZSQL} AS zkey
    FROM events
)
SELECT (zkey >> 8) AS tile,
       count(*) AS n_events,
       min(a) AS min_a, max(a) AS max_a,
       min(b) AS min_b, max(b) AS max_b
FROM z GROUP BY tile
""",
)
def layout_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-tile audit of the events table: interleave (user_id,
    floor(value)) into a 16-bit Z-key (operators/layout.py:zorder_key
    — pure shift/and/or arithmetic, codegen-inlined) and aggregate
    per 256-key tile.  Each tile's (min,max) bounds in BOTH
    dimensions stay within a 16x16 square — the property that lets
    parquet min/max statistics skip files on either predicate once
    data is written in Z-order (cluster_by_zorder).

    Scale: one map-side key computation + one partial-aggregated
    group-by on a 256-value key — no joins, no windows, one scan."""
    ev = _t(spark, sf_dir, "events")
    a = F.col("user_id").bitwiseAND(F.lit(255))
    b = F.floor(F.col("value")).cast("long").bitwiseAND(F.lit(255))
    z = ev.select(
        a.alias("a"),
        b.alias("b"),
        zorder_key([F.col("user_id"), F.floor(F.col("value"))], bits=_ZBITS).alias(
            "zkey"
        ),
    )
    return (
        z.groupBy(F.shiftright(F.col("zkey"), 8).alias("tile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
    )
