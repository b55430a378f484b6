"""Per-query DuckDB-oracle parity at sf0.001 — the same gate the
driver runs at sf0.01 (row count + schema + order-insensitive value
compare)."""

from __future__ import annotations

import pytest

from duckdb_hdfs_spark.oracle import compare
from duckdb_hdfs_spark.queries import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    qd = REGISTRY[name]
    result = compare(name, qd.spark(spark, sf_dir), oracle_con, qd.oracle)
    assert result.ok, str(result)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    """Rows-only ops must execute, yield a stable schema, and return
    actual rows — an ANN/dedup op that finds nothing on its own test
    data is broken even if it 'runs'."""
    qd = REGISTRY[name]
    df = qd.spark(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() > 0, f"{name}: returned no rows"


# --------------------------------------------------------------------------
def test_gopher_rules_adversarial_branches_match(spark, tmp_path):
    """The sf documents contain no '#'/'...'/bullet lines, so the
    driver compare never exercises the symbol/bullet/ellipsis/alpha
    branches — feed adversarial docs through BOTH engines and require
    identical rule panels (round-9: pins the substring-at-end and
    replace-count semantics where the dialects plausibly diverge)."""
    import duckdb
    import pandas as pd

    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.queries.text import _gopher_oracle

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "# ## ### hash " + "the be to of and that have with ok " * 10,
                "line one...\nline two...\nplain "
                + "the of and with be to that have " * 8,
                "- bullet one\n- bullet two\n- three\n* star\n  - indented",
                "12345 67890 11111 22222 " * 20,  # no alphabetic words
                "short doc",
                "x" * 30 + " " + "the of and to be that have with " * 9,
                "",  # empty text → single '' token
                "... \n...\n...",  # ellipsis-only lines, len<3 after rtrim
            ],
            "lang": ["en"] * 8,
            "source": ["sA", "sA", "sB", "sB", "sC", "sC", "sD", "sD"],
            "n_chars": [0] * 8,
        }
    )
    p = tmp_path / "documents.parquet"
    docs.to_parquet(p)
    got = (
        load_all()["text_gopher_rules"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    want = (
        con.execute(_gopher_oracle())
        .df()
        .sort_values("source")
        .reset_index(drop=True)
    )
    got, want = got[sorted(got.columns)], want[sorted(want.columns)]
    assert got.astype(str).equals(want.astype(str)), (got, want)
    # the branches actually fired: every rule column is nonzero somewhere
    for col in [c for c in got.columns if c.startswith("n_f_")]:
        assert got[col].sum() > 0, f"rule {col} never fired in the fixture"


def test_cusum_zero_variance_type_matches(spark, tmp_path):
    """A type with CONSTANT daily counts zeroes the variance — z must
    be NULL on both engines (the nullif pair) and the window sums
    must skip the NULLs identically (round-9 guard-parity probe;
    unreachable with the sf event stream)."""
    import duckdb
    import pandas as pd

    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.queries.events import _cusum_oracle

    rows = []
    eid = 0
    for day in range(1, 7):
        for i in range(3):  # 'flat': exactly 3 events every day
            rows.append((eid, pd.Timestamp(2024, 1, day, 10, i), 1, "flat", 1.0, "{}"))
            eid += 1
        for i in range(day):  # 'ramp': growing counts
            rows.append((eid, pd.Timestamp(2024, 1, day, 11, i), 2, "ramp", 1.0, "{}"))
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # Spark cannot read pandas' default TIMESTAMP(NANOS) parquet type
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    p = tmp_path / "events.parquet"
    ev.to_parquet(p)
    got = (
        load_all()["ev_cusum_changepoint"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{p}'")
    want = (
        con.execute(_cusum_oracle())
        .df()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    import numpy as np

    # Spark surfaces boolean NULL as None, DuckDB as NaN — normalize
    # missing values before the string compare
    got = got[sorted(got.columns)].astype(object).where(lambda d: d.notna(), np.nan)
    want = want[sorted(want.columns)].astype(object).where(lambda d: d.notna(), np.nan)
    assert got.astype(str).equals(want.astype(str)), (got, want)
    flat = got[got["event_type"] == "flat"]
    assert len(flat) == 6 and flat["z_day"].isna().all()  # NULL z, no inf


def test_theil_sen_odd_pair_count_matches(spark, tmp_path):
    """3 months → 3 pairwise slopes (ODD): both engines must take the
    same single middle value (the sf panels always produce an even
    pair count, leaving the odd-median branch unexercised)."""
    import duckdb
    import pandas as pd

    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.queries.advanced import _theil_sen_oracle

    od = pd.DataFrame(
        {
            "o_orderkey": range(6),
            "o_custkey": [1] * 6,
            "o_orderstatus": ["O"] * 6,
            "o_totalprice": [100.0, 50.0, 400.0, 100.0, 90.0, 800.0],
            "o_orderdate": pd.Series(
                pd.to_datetime(
                    ["1995-01-05", "1995-01-20", "1995-02-10",
                     "1995-02-11", "1995-03-01", "1995-03-30"]
                )
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 6,
        }
    )
    p = tmp_path / "orders.parquet"
    od.to_parquet(p)
    got = (
        load_all()["stats_theil_sen_slope"].spark(spark, str(tmp_path)).toPandas()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{p}'")
    want = con.execute(_theil_sen_oracle()).df()
    got, want = got[sorted(got.columns)], want[sorted(want.columns)]
    assert int(got["n_pairs"].iloc[0]) == 3
    assert got.astype(str).equals(want.astype(str)), (got, want)
