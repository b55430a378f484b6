"""Misra-Gries sketch property tests: the per-partition summary must
hold the n/m error bound and keep every heavy item UNDER FORCED
EVICTIONS (tiny capacity on skewed data) — the regime the sf0.001
registry run never enters because its key cardinality fits the
production capacity."""

from __future__ import annotations

import pandas as pd

from duckdb_hdfs_spark.queries.sketches import _mg_partial_factory


def _run_mg(values, capacity, batch_size=997):
    batches = (
        pd.DataFrame({"user_id": values[i : i + batch_size]})
        for i in range(0, len(values), batch_size)
    )
    (out,) = list(_mg_partial_factory(capacity)(batches))
    return dict(zip(out["user_id"], out["w"]))


def test_mg_error_bound_under_eviction():
    """Zipf-ish stream, capacity 8 (evictions every batch): every
    estimate must satisfy  f(x) - n/m <= est(x) <= f(x)."""
    values = []
    for i in range(1, 101):  # item i appears ~1000/i times
        values.extend([i] * (1000 // i))
    # deterministic interleave so batches mix heavy and light items
    values.sort(key=lambda v: (hash((v, values.count(v))) % 7919, v))
    n, m = len(values), 8
    exact = pd.Series(values).value_counts().to_dict()
    est = _run_mg(values, m)
    assert len(est) <= m
    for item, w in est.items():
        assert w <= exact[item], f"overestimate for {item}"
        assert w >= exact[item] - n / m, f"bound broken for {item}"
    # every true heavy hitter (f > n/m) must survive
    for item, f in exact.items():
        if f > n / m:
            assert item in est, f"heavy item {item} evicted"


def test_mg_exact_when_under_capacity():
    """With cardinality <= capacity the summary is exact counts."""
    values = [1] * 10 + [2] * 5 + [3] * 1
    est = _run_mg(values, capacity=8)
    assert est == {1: 10, 2: 5, 3: 1}
