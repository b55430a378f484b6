"""Streaming registry entry (SURVEY.md §2.4): runs the Structured
Streaming windowed-count pipeline over the events table with an
availableNow trigger and returns the drained result — the same
incremental plan a live ingest would run, exposed through the batch
driver contract (rows-only: the streaming runtime is the thing under
test; its batch twin ``ev_tumbling_counts`` is the oracle-checked
computation)."""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.sources.catalog import load_table

_run_counter = itertools.count()


@query(
    "streaming_windowed_counts",
    # complete-mode + availableNow drains EVERY row into epoch-aligned
    # 1-day windows, so the streaming result equals the batch tumbling
    # aggregation — which IS SQL-expressible; the decimal-accumulated
    # sum makes the value deterministic across engines.
    oracle="""
SELECT date_trunc('day', ts) AS win_start,
       date_trunc('day', ts) + INTERVAL 1 DAY AS win_end,
       event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
           AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream → 1-day watermarked tumbling windows →
    complete-mode memory sink, drained with availableNow.  The events
    file is re-written through the nano-timestamp-normalizing loader
    first (the raw parquet uses TIMESTAMP(NANOS), which the stream
    schema reads as proper timestamps after the rewrite)."""
    from duckdb_hdfs_spark.streaming.pipelines import (
        read_event_stream,
        run_available_now_to_memory,
        windowed_counts,
    )

    src = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream_src", os.path.basename(sf_dir)
    )
    shutil.rmtree(src, ignore_errors=True)
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(src)

    name = f"t_streaming_windowed_counts_{next(_run_counter)}"
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    run_available_now_to_memory(
        windowed_counts(stream), name, output_mode="complete"
    )
    return spark.table(name)
