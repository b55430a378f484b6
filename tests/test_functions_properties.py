"""Hypothesis property tests for the hashing/text column expressions
(SURVEY.md §5): the JVM-side expressions must agree with a direct
Python reference implementation on arbitrary inputs — each example
set is evaluated in ONE Spark job over a generated DataFrame."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from duckdb_hdfs_spark.functions.hashing import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    NUM_PERM,
    md5_int60,
    minhash_perm,
    shingle_hash,
    word_kgrams,
)

_token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789#|'\"\\~é中", min_size=1, max_size=8
)
_tokens = st.lists(_token, min_size=0, max_size=12)


def _ref_kgrams(toks: list[str], k: int) -> list[str]:
    n = max(len(toks) - (k - 1), 1)
    padded = list(toks) + [""] * (k - 1)
    return [" ".join(padded[i : i + k]) for i in range(n)]


def _ref_md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@settings(max_examples=12, deadline=None)
@given(st.lists(_tokens, min_size=1, max_size=8), st.integers(min_value=2, max_value=5))
def test_word_kgrams_matches_reference(spark, docs, k):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "id long, toks array<string>")
    got = {
        r.id: r.grams
        for r in df.select("id", word_kgrams(F.col("toks"), k).alias("grams")).collect()
    }
    want = {i: _ref_kgrams(t, k) for i, t in enumerate(docs)}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(max_size=24), min_size=1, max_size=16))
def test_md5_int60_matches_reference(spark, strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "id long, s string")
    got = {r.id: r.h for r in df.select("id", md5_int60(F.col("s")).alias("h")).collect()}
    for i, s in enumerate(strings):
        assert got[i] == _ref_md5_int60(s)
        assert 0 <= got[i] < 1 << 60


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=16), min_size=1, max_size=8))
def test_minhash_perms_match_reference_and_range(spark, strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "id long, s string")
    h = shingle_hash(F.col("s"))
    cols = [minhash_perm(h, p).alias(f"m{p}") for p in range(NUM_PERM)]
    rows = {r.id: r for r in df.select("id", *cols).collect()}
    for i, s in enumerate(strings):
        base = _ref_md5_int60(s) % MINHASH_PRIME
        for p in range(NUM_PERM):
            want = (MINHASH_A[p] * base + MINHASH_B[p]) % MINHASH_PRIME
            got = rows[i][f"m{p}"]
            assert got == want and 0 <= got < MINHASH_PRIME


def test_pca_projection_variance_contract(spark, sf_dir):
    """emb_pca_project's algebraic contract: projections onto distinct
    eigenvectors of the Gram matrix are exactly G-orthogonal
    (Σ pc1·pc2 = v1ᵀ G v2 = 0) and component energy is ordered
    (Σ pc1² = λ1 ≥ Σ pc2² = λ2 > 0) — catches wrong eigenvector
    ordering, non-canonical signs flipping per run, and projection /
    Gram drift."""
    from duckdb_hdfs_spark.queries.llmextra import pca_projection

    df, _comps = pca_projection(spark, sf_dir)
    row = df.select(
        F.sum(F.col("pc1") * F.col("pc1")).alias("e1"),
        F.sum(F.col("pc2") * F.col("pc2")).alias("e2"),
        F.sum(F.col("pc1") * F.col("pc2")).alias("x12"),
    ).collect()[0]
    assert row.e1 >= row.e2 > 0
    assert abs(row.x12) < 1e-3 * (row.e1 * row.e2) ** 0.5


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # bucket id
            st.integers(min_value=0, max_value=60),  # member id
        ),
        min_size=1,
        max_size=80,
    ),
    st.integers(min_value=1, max_value=9),  # chunk size
)
def test_bucketed_pairs_property_matches_bruteforce(spark, rows, chunk):
    """Property version of the fixed-size bucketed_pairs equivalence
    tests (round 7 — the operator's cell stage was refactored):
    random bucket populations and chunk sizes, including chunk=1
    (every member its own chunk — all-cross-cells) and duplicate
    member draws (dropped: ids must be unique per bucket), must
    reproduce the exact per-bucket unordered pair set."""
    from collections import defaultdict
    from itertools import combinations

    from duckdb_hdfs_spark.operators.dedup import bucketed_pairs

    uniq = sorted({(f"b{b}", f"d{m:02d}") for b, m in rows})
    df = spark.createDataFrame(uniq, "f string, doc_id string")
    got = sorted(
        (r.f, r.id_a, r.id_b)
        for r in bucketed_pairs(df, ["f"], "doc_id", chunk=chunk).collect()
    )
    by_bucket = defaultdict(list)
    for b, did in uniq:
        by_bucket[b].append(did)
    want = sorted(
        (b, a, c)
        for b, ids in by_bucket.items()
        for a, c in combinations(sorted(ids), 2)
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=-9, max_value=0),   # lo (PRECEDING)
    st.integers(min_value=0, max_value=9),    # hi (FOLLOWING)
    st.sampled_from([2, 5, 16, 1000]),        # bucket width
    st.lists(
        st.tuples(
            st.sampled_from(["p", "q"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    ),
)
def test_halo_range_frame_random_frames(spark, lo, hi, width, rows):
    """halo_range_frame over random asymmetric frames, bucket widths
    (including widths smaller than the frame span), duplicate values
    (RANGE peers), and multi-partition inputs must equal the naive
    global-partition window."""
    from pyspark.sql import Window

    from duckdb_hdfs_spark.operators.ranks import halo_range_frame

    df = spark.createDataFrame(
        [(p, float(v), i) for i, (p, v) in enumerate(rows)],
        "part string, value double, rid long",
    )
    naive_w = Window.partitionBy("part").orderBy("value").rangeBetween(lo, hi)
    want = sorted(
        map(
            tuple,
            df.select(
                "rid",
                F.count(F.lit(1)).over(naive_w).alias("n"),
                F.sum("rid").over(naive_w).alias("s"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            halo_range_frame(
                df,
                ["part"],
                "value",
                lo,
                hi,
                lambda w: [
                    F.count(F.lit(1)).over(w).alias("n"),
                    F.sum("rid").over(w).alias("s"),
                ],
                bucket_width=width,
            )
            .select("rid", "n", "s")
            .collect(),
        )
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4.0, max_value=4.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=20,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_assign_nearest_matches_reference(spark, vecs, n_cells):
    """The shared broadcast-codebook argmax (round-8 extraction —
    the assignment core of IVF / k-means / purity / cell stats) must
    agree with a direct Python argmax on arbitrary vectors: for each
    vector, the chosen centroid maximizes cosine with ties on the
    smaller cent_id, using the SAME md5-ordered codebook sample."""
    import hashlib as _hl
    import math

    from duckdb_hdfs_spark.functions.vectors import norm
    from duckdb_hdfs_spark.operators.similarity import (
        assign_nearest,
        centroid_codebook,
    )

    # vectors must be non-degenerate for cosine
    vecs = [v if any(x != 0 for x in v) else [1.0, 0.0, 0.0, 0.0] for v in vecs]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = assign_nearest(
        df.withColumn("_n", norm(F.col("embedding"))),
        centroid_codebook(df, n_cells),
        "embedding",
        "_n",
        top=1,
    )
    got = {r.vec_id: r.cent_id for r in out.collect()}

    # reference: same md5-order sample, float32-cast dot/cosine argmax
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    cast = {i: [f32(x) for x in v] for i, v in enumerate(vecs)}
    order = sorted(cast, key=lambda i: _hl.md5(str(i).encode()).hexdigest())
    cents = order[: n_cells]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for i, v in cast.items():
        best = min(cents, key=lambda c: (-cos(v, cast[c]), c))
        assert got[i] == best, (i, got[i], best)
