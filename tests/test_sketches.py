"""Misra-Gries sketch property tests: the per-partition summary must
hold the n/m error bound and keep every heavy item UNDER FORCED
EVICTIONS (tiny capacity on skewed data) — the regime the sf0.001
registry run never enters because its key cardinality fits the
production capacity."""

from __future__ import annotations

import pandas as pd

from duckdb_hdfs_spark.queries.sketches import _mg_partial_factory


def _run_mg(values, capacity, batch_size=997):
    """Returns (estimates, sentinel_mass): the summary rows keyed by
    item, and the NULL-keyed sentinel row carrying the partition's
    exact input row count."""
    batches = (
        pd.DataFrame({"user_id": values[i : i + batch_size]})
        for i in range(0, len(values), batch_size)
    )
    (out,) = list(_mg_partial_factory(capacity)(batches))
    sentinel = out[out["user_id"].isna()]
    assert len(sentinel) == 1, "exactly one sentinel row per partition"
    items = out[out["user_id"].notna()]
    return dict(zip(items["user_id"], items["w"])), int(sentinel["w"].iloc[0])


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
    est, mass = _run_mg(values, m)
    assert mass == n, "sentinel must carry the exact partition count"
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
    est, mass = _run_mg(values, capacity=8)
    assert est == {1: 10, 2: 5, 3: 1}
    assert mass == 16


# --------------------------------------------------------------------------
def test_kmv_sketches_are_mergeable():
    """The property the KMV op exists for: merge-and-truncate of two
    shards' bottom-k sets == the bottom-k of the union, and the
    estimator from the merged sketch tracks the union's distinct
    count — verified in pure Python on the same md5 hash the
    engines use."""
    import hashlib

    def h(v: str) -> int:
        return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)

    k = 256
    shard_a = {h(str(i)) for i in range(4000)}
    shard_b = {h(str(i)) for i in range(2000, 7000)}  # overlapping
    bk = lambda s: sorted(s)[:k]
    merged = bk(set(bk(shard_a)) | set(bk(shard_b)))
    union_bk = bk(shard_a | shard_b)
    assert merged == union_bk
    est = (k - 1) * float(1 << 60) / union_bk[-1]
    true = len(shard_a | shard_b)
    assert abs(est - true) / true < 0.25  # 4 standard errors at k=256
