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


# --------------------------------------------------------------------------
def _hilbert_ref(order: int, x: int, y: int) -> int:
    """Classic rotation-based xy2d (the published reference algorithm)
    — the ground truth the quadrant-automaton tables are pinned to."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_tables_match_reference_exhaustively():
    """Walk the 4-state automaton tables in pure Python over EVERY
    cell of the 2^8 grid (65,536 points) and every smaller order:
    forward == the rotation algorithm, decode(forward) round-trips.
    The Spark and DuckDB implementations both read these tables, so
    this pins the curve itself; oracle parity pins the engines."""
    from duckdb_hdfs_spark.operators.layout import (
        HILBERT_DIGIT,
        HILBERT_INV_BX,
        HILBERT_INV_BY,
        HILBERT_INV_NEXT,
        HILBERT_NEXT,
    )

    def walk(order, x, y):
        st = d = 0
        for i in range(order):
            sh = order - 1 - i
            q = ((x >> sh) & 1) * 2 + ((y >> sh) & 1)
            idx = st * 4 + q
            d = d * 4 + HILBERT_DIGIT[idx]
            st = HILBERT_NEXT[idx]
        return d

    def unwalk(order, d):
        st = x = y = 0
        for i in range(order):
            dig = (d >> (2 * (order - 1 - i))) & 3
            idx = st * 4 + dig
            x = x * 2 + HILBERT_INV_BX[idx]
            y = y * 2 + HILBERT_INV_BY[idx]
            st = HILBERT_INV_NEXT[idx]
        return x, y

    for order in (1, 2, 4, 8):
        n = 1 << order
        for x in range(n):
            for y in range(n):
                d = walk(order, x, y)
                assert d == _hilbert_ref(order, x, y), (order, x, y)
                assert unwalk(order, d) == (x, y), (order, x, y)


def test_hilbert_spark_key_matches_tables(spark):
    """The Spark column expression must equal the pure-Python table
    walk on a full 32×32 grid (and the decode must round-trip)."""
    from duckdb_hdfs_spark.operators.layout import (
        HILBERT_DIGIT,
        HILBERT_NEXT,
        hilbert_decode,
        hilbert_key,
    )

    def walk(order, x, y):
        st = d = 0
        for i in range(order):
            sh = order - 1 - i
            q = ((x >> sh) & 1) * 2 + ((y >> sh) & 1)
            idx = st * 4 + q
            d = d * 4 + HILBERT_DIGIT[idx]
            st = HILBERT_NEXT[idx]
        return d

    grid = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    dx, dy = hilbert_decode(hilbert_key(F.col("x"), F.col("y"), bits=5), 5)
    rows = grid.select(
        "x",
        "y",
        hilbert_key(F.col("x"), F.col("y"), bits=5).alias("d"),
        dx.alias("rx"),
        dy.alias("ry"),
    ).collect()
    assert len(rows) == 1024
    for r in rows:
        assert r["d"] == walk(5, r["x"], r["y"]), (r["x"], r["y"])
        assert (r["rx"], r["ry"]) == (r["x"], r["y"])


def test_hilbert_adjacency_beats_morton(spark):
    """The claim the operator exists for: consecutive Hilbert
    positions are ALWAYS edge-adjacent cells (total step distance ==
    n-1 over the full 16×16 traversal), while Morton order jumps
    (strictly larger total Chebyshev travel)."""
    from duckdb_hdfs_spark.operators.layout import hilbert_decode

    n = 256
    d = spark.range(n).select(F.col("id").alias("d"))
    hx, hy = hilbert_decode(F.col("d"), 4)
    pts = {r["d"]: (r["x"], r["y"]) for r in d.select("d", hx.alias("x"), hy.alias("y")).collect()}
    h_travel = sum(
        max(abs(pts[i + 1][0] - pts[i][0]), abs(pts[i + 1][1] - pts[i][1]))
        for i in range(n - 1)
    )

    def morton_decode(z):
        x = y = 0
        for i in range(4):
            x |= ((z >> (2 * i + 1)) & 1) << i
            y |= ((z >> (2 * i)) & 1) << i
        return x, y

    m = {z: morton_decode(z) for z in range(n)}
    m_travel = sum(
        max(abs(m[i + 1][0] - m[i][0]), abs(m[i + 1][1] - m[i][1]))
        for i in range(n - 1)
    )
    assert h_travel == n - 1, h_travel
    assert m_travel > h_travel, (m_travel, h_travel)
