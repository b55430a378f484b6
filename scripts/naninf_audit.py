"""NaN/Inf adversarial audit (round 11, verdict task #5) — the
extreme-values audit's deliberate exclusion, given the dup_audit
KEY_GRAIN / ragged_audit FIXED_DIM treatment: a named ingest rule, a
sweep against the rule-filtered copy, and the raw hazard measured.

The hazard (measured, ``--demo``): Spark and DuckDB handle
non-finite doubles under genuinely different ENGINE CONTRACTS —
Spark normalizes NaN to one canonical NaN that groups/joins as equal
to itself and sorts LARGEST (after +Inf); DuckDB treats NaN as
IEEE-larger-than-everything in ORDER BY but its aggregate kernels,
histogram bucketing and round() propagate NaN/Inf differently
(``round(NaN, 4)`` stays NaN on both, but ``CAST(NaN AS
DECIMAL)`` raises on DuckDB while Spark yields NULL, sum() over a
group containing ±Inf can be ±Inf or NaN depending on fold order,
and every rounded-double hash compare poisons).  No operator-level
formulation reconciles them — the same class of engine-contract gap
as identical-twin tie-breaks (KEY_GRAIN) and mixed-dim vectors
(FIXED_DIM).

The ingest rule — FINITE_MEASURES: non-finite scalars are NULLed at
ingest (they join the NULL lane the round-9 NULL-injection audit
proved is handled identically by every operator: NULL-excluded
aggregates, nullif guards, mirrored filters); vectors carrying ANY
non-finite component are quarantined (row routed out — one NaN
component poisons every inner product, and a NULL vector would be a
new degenerate rather than a proven lane).  Both rules are pure
map-side expressions at ingest — one isfinite() per measure, one
bounded list scan per vector; no shuffle, no state, trivially
100 TB-safe.

Protocol: inject md5-gated 2% NaN/+Inf/-Inf into EVERY double
measure column (customer/supplier acctbal, p_retailprice,
o_totalprice, all four lineitem measures, events.value) and into 2%
of embedding vectors (first component), then apply FINITE_MEASURES
and sweep the FULL registry against the rule-filtered copy — green
required.  ``--demo`` additionally runs a handful of measure-heavy
keys against the RAW copy to record the divergence the rule
prevents.

    python scripts/naninf_audit.py [--sf /root/testdata/sf0.001] [--demo] [keys...]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: per-table (gate key, [measure columns]) for scalar injection
MEASURES = {
    "customer": ("c_custkey", ["c_acctbal"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_retailprice"]),
    "orders": ("o_orderkey", ["o_totalprice"]),
    "lineitem": (
        "l_orderkey * 8 + l_linenumber",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ),
    "events": ("event_id", ["value"]),
}

NONFINITE = (
    "CASE {key} % 3 WHEN 0 THEN 'NaN'::DOUBLE "
    "WHEN 1 THEN 'Infinity'::DOUBLE ELSE '-Infinity'::DOUBLE END"
)


def _inject(col: str, key: str) -> str:
    gate = (
        f"('0x' || substr(md5('nf{col}' || CAST({key} AS VARCHAR)), 1, 4))"
        f"::BIGINT % 100 < 2"
    )
    return (
        f"CASE WHEN {gate} THEN {NONFINITE.format(key=key)} "
        f"ELSE {col} END AS {col}"
    )


def build_naninf_dir(sf_dir: str, dst: str) -> str:
    """RAW copy: 2% non-finite injected into every double measure and
    2% of embedding vectors (first component)."""
    con = duckdb.connect()
    for t in TABLES:
        if t in MEASURES:
            key, cols = MEASURES[t]
            desc = con.execute(
                f"DESCRIBE SELECT * FROM '{sf_dir}/{t}.parquet'"
            ).fetchall()
            sel = ", ".join(
                _inject(c, key) if c in cols else c for c, *_ in desc
            )
        elif t == "embeddings":
            gate = (
                "('0x' || substr(md5('nfvec' || CAST(vec_id AS VARCHAR)), 1, 4))"
                "::BIGINT % 100 < 2"
            )
            sel = (
                "vec_id, label, "
                f"CASE WHEN {gate} THEN "
                "list_prepend(CASE vec_id % 3 WHEN 0 THEN 'NaN'::FLOAT "
                "WHEN 1 THEN 'Infinity'::FLOAT ELSE '-Infinity'::FLOAT END, "
                "embedding[2:]) ELSE embedding END AS embedding"
            )
        else:
            sel = "*"
        con.execute(
            f"COPY (SELECT {sel} FROM '{sf_dir}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst


def build_finite_dir(raw_dir: str, dst: str) -> str:
    """Apply FINITE_MEASURES to the raw copy: scalar non-finites →
    NULL; vectors with any non-finite component → quarantined."""
    con = duckdb.connect()
    for t in TABLES:
        sel, where = "*", ""
        if t in MEASURES:
            _key, cols = MEASURES[t]
            desc = con.execute(
                f"DESCRIBE SELECT * FROM '{raw_dir}/{t}.parquet'"
            ).fetchall()
            sel = ", ".join(
                (f"CASE WHEN isfinite({c}) THEN {c} ELSE NULL END AS {c}"
                 if c in cols else c)
                for c, *_ in desc
            )
        elif t == "embeddings":
            where = (
                " WHERE embedding IS NULL OR "
                "len(list_filter(embedding, x -> NOT isfinite(x))) = 0"
            )
        con.execute(
            f"COPY (SELECT {sel} FROM '{raw_dir}/{t}.parquet'{where}) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst


#: measure-heavy keys for the --demo hazard run against the RAW copy
DEMO_KEYS = [
    "q1_pricing_summary",
    "ev_value_histogram",
    "stats_quantiles",
    "sim_norm_outliers",
    "orders_rfm_scores",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from duckdb_hdfs_spark.oracle import run_all
    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    raw = tempfile.mkdtemp(prefix="testdata_naninf_raw_")
    build_naninf_dir(args.sf, raw)
    fin = tempfile.mkdtemp(prefix="testdata_naninf_fin_")
    build_finite_dir(raw, fin)
    print(f"raw copy at {raw}; FINITE_MEASURES copy at {fin}", flush=True)

    spark = get_spark("naninf-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]

    if args.demo:
        print("-- hazard demo: RAW non-finite copy (divergence EXPECTED) --")
        for r in run_all(spark, raw, names=[k for k in DEMO_KEYS if k in keys]):
            tag = "agree" if r.ok else "DIVERGE"
            print(f"  {tag} {getattr(r, 'name', r)}"
                  + ("" if r.ok else f" :: {str(r)[:200]}"))

    results = run_all(spark, fin, names=keys)
    bad = [r for r in results if not r.ok]
    print(f"{len(results) - len(bad)}/{len(results)} green under FINITE_MEASURES")
    for r in bad:
        print(f"FAIL {getattr(r, 'name', r)} :: {str(r)[:400]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
