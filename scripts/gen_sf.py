"""Synthesize a scale-factor-N copy of the test schema (round 12,
r11-verdict task #2: one whole-headline-set 10x scale datapoint).

The driver's own generator is not in this repo and /root/testdata is
read-only, so this script regenerates the SAME schema with the same
distribution SHAPES, measured off the driver's sf0.1 tables
(value ranges, category mixes, rows-per-parent rates, the events
30-day window, the 31-word document vocabulary pulled verbatim from
the real documents table, the ~9% near-dup / ~0.2% exact-dup document
structure that drives the dedup keys, and label-centroid embedding
clusters).  Row counts scale linearly from the driver's own ladder
(sf0.1 = customer 15k / orders 150k / lineitem 600k / events 100k /
documents 5k / embeddings 2k).

It does NOT reproduce the driver's data byte-for-byte — it doesn't
need to: the sf1 run measures WALL-TIME SLOPE (Spark and DuckDB over
the identical sf1 files, same-session pair), so what matters is that
sf1 is a faithful 10x of sf0.1 in volume and structure, which the
rate parameters below pin.

    python scripts/gen_sf.py --sf 1.0 --out /tmp/sf1.0 [--seed 42]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"  # distribution source (read-only)

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "small", "cold", "dim", "bright", "plain", "fine"]
PNOUN = ["ring", "bolt", "screw", "nut", "washer", "pin", "rod", "cap"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "fr", "es", "de", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]

T0_US = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
SPAN_US = 30 * 86_400 * 1_000_000  # the events window is 30 days at every sf


def _ts(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"wrote {name}: {table.num_rows} rows", flush=True)


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation: constant dimension tables — copied verbatim
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"copied {t}", flush=True)

    k = np.arange(n_cust, dtype="int64")
    _write(out, "customer", pa.table({
        "c_custkey": k,
        "c_name": [f"Customer#{i:09d}" for i in k],
        "c_nationkey": rng.integers(0, 25, n_cust).astype("int32"),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    k = np.arange(n_supp, dtype="int64")
    _write(out, "supplier", pa.table({
        "s_suppkey": k,
        "s_name": [f"Supplier#{i:09d}" for i in k],
        "s_nationkey": rng.integers(0, 25, n_supp).astype("int32"),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    k = np.arange(n_part, dtype="int64")
    _write(out, "part", pa.table({
        "p_partkey": k,
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part),
                            rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype("int32"),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    k = np.arange(n_ord, dtype="int64")
    date0 = np.datetime64("1995-01-01", "us").astype("int64")
    date_span = int((np.datetime64("2001-08-02", "us").astype("int64") - date0)
                    // 86_400_000_000)
    _write(out, "orders", pa.table({
        "o_orderkey": k,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts(
            date0 + rng.integers(0, date_span, n_ord) * 86_400_000_000
        ),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem rows draw an orderkey independently (the sf0.1 table's
    # 4.07 lines/order is Poisson-like with linenumbers 1-7 repeating)
    ship0 = np.datetime64("1995-01-02", "us").astype("int64")
    ship_span = int((np.datetime64("2001-11-05", "us").astype("int64") - ship0)
                    // 86_400_000_000)
    qty = rng.integers(1, 51, n_li).astype("float64")
    eprice = np.round(qty * rng.uniform(900, 2100, n_li), 2)
    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype("int32"),
        "l_quantity": qty,
        "l_extendedprice": eprice,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts(
            ship0 + rng.integers(0, ship_span, n_li) * 86_400_000_000
        ),
    }))

    ev_us = np.sort(T0_US + rng.integers(0, SPAN_US, n_ev))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": _ts(ev_us),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        # exponential-like positive values, mean ~50 (sf0.1 shape)
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)],
    }))

    # documents: the REAL 31-word vocabulary, uniform word draws,
    # ~9% near-dup copies (a few words mutated past the 5-word
    # prefix) and ~0.2% exact dups — the dedup keys' work profile
    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '{SRC}/documents.parquet' ORDER BY w"
    ).fetchall()]
    vocab = np.array([w for w in vocab if w])
    texts: list[str] = []
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.09:
            words = texts[rng.integers(0, i)].split(" ")
            n_mut = max(1, len(words) // 12)
            for _ in range(n_mut):
                j = rng.integers(5, len(words)) if len(words) > 5 else 0
                words[j] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
        else:
            n_w = rng.integers(8, 100)
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_w)]))
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype="int64"),
        "text": texts,
        "lang": langs,
        "source": [f"src{s}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))

    # embeddings: unit-norm 64-dim float32 around 10 label centroids
    cent = rng.normal(size=(10, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = cent[labels] * 2.0 + rng.normal(size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype("float32")
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype="int64"),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": labels.astype("int32"),
    }))
    con.close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/sf1.0")
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    generate(a.sf, a.out, a.seed)
