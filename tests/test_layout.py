"""Z-order layout tests: the Morton key must place both dimensions'
bits correctly, and a cluster_by_zorder write must produce files
whose parquet min/max footprint is a small fraction of the global
domain in BOTH dimensions — the property file-skipping relies on."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from duckdb_hdfs_spark.operators.layout import (
    cluster_by_zorder,
    zorder_key,
    zorder_key_sql,
)


def test_zorder_key_known_values(spark):
    """Hand-computed Morton codes for 2 dims x 8 bits: dimension 0
    owns the odd (higher) bit of each pair."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (255, 255), (3, 5)],
        "x long, y long",
    )
    got = [
        r.z
        for r in df.select(
            zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
        ).collect()
    ]

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    want = [morton(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (1, 1), (255, 255), (3, 5)]]
    assert got == want
    assert morton(255, 255) == 65535


def test_zorder_sql_mirror_matches(spark):
    """The generated DuckDB SQL and the Spark column must agree on
    every (x, y) in a 32x32 grid — same loop, same bit placement."""
    import duckdb

    grid = [(x, y) for x in range(0, 256, 8) for y in range(0, 256, 8)]
    df = spark.createDataFrame(grid, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
        ).collect()
    }
    sql = zorder_key_sql(["x", "y"], bits=8)
    want = {
        (x, y): duckdb.sql(f"SELECT {sql} AS z FROM (SELECT {x} AS x, {y} AS y)")
        .fetchone()[0]
        for (x, y) in grid[:64]
    }
    for k, v in want.items():
        assert got[k] == v, f"mismatch at {k}"


def test_cluster_by_zorder_tightens_file_bounds(spark, sf_dir, tmp_path):
    """Write events z-ordered by (user_id, floor(value)) into 8 files;
    every file's parquet min/max bounding box must cover a small slice
    of the global (user_id x value) domain on BOTH axes.  A single-
    column sort would leave the other axis' per-file range at ~100%
    of the domain; the Z-curve bounds both."""
    from duckdb_hdfs_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    out = str(tmp_path / "zorder")
    cluster_by_zorder(
        ev, [F.col("user_id"), F.floor(F.col("value"))], n_files=8
    ).write.parquet(out)

    ds = pq.ParquetDataset(out)
    boxes = []
    for frag in ds.fragments:
        md = frag.metadata
        mins = {"user_id": None, "value": None}
        maxs = {"user_id": None, "value": None}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if name in mins and st is not None:
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        if mins["user_id"] is not None:
            boxes.append((mins, maxs))
    assert len(boxes) >= 4, "expected several data files"

    glob_u = max(b[1]["user_id"] for b in boxes) - min(b[0]["user_id"] for b in boxes)
    glob_v = max(b[1]["value"] for b in boxes) - min(b[0]["value"] for b in boxes)
    # mean per-file fractional area: must be far below 1 file's worth
    # of a one-dim sort (which pins ONE axis but spans ~100% of the other)
    areas = [
        ((mx["user_id"] - mn["user_id"]) / glob_u)
        * ((mx["value"] - mn["value"]) / glob_v)
        for mn, mx in boxes
    ]
    mean_area = sum(areas) / len(areas)
    assert mean_area < 0.35, f"files not clustered: mean frac area {mean_area:.2f}"


def test_cluster_by_zorder_balanced(spark, sf_dir):
    """Range partitioning on the sampled Z-key must keep partitions
    balanced — no partition may hold more than 3x its fair share."""
    from duckdb_hdfs_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    parts = (
        cluster_by_zorder(ev, [F.col("user_id"), F.floor(F.col("value"))], n_files=8)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in parts]
    assert max(counts) <= 3 * (sum(counts) / len(counts)), counts


def test_zorder_key_rejects_sign_bit_overflow(spark):
    """bits*ndims > 63 would interleave into the sign bit and break
    range ordering — both the Spark and SQL builders must refuse
    (round-7 review)."""
    import pytest
    from pyspark.sql import functions as F

    from duckdb_hdfs_spark.operators.layout import zorder_key, zorder_key_sql

    cols = [F.col(f"c{i}") for i in range(8)]
    with pytest.raises(ValueError):
        zorder_key(cols, bits=8)
    with pytest.raises(ValueError):
        zorder_key_sql([f"c{i}" for i in range(8)], bits=8)
    # 8 dims at 7 bits (56 positions) is fine
    zorder_key(cols, bits=7)
