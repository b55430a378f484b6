"""Graph analytics over the near-dup candidate graph (SURVEY.md
§2.5 extension): iterative PageRank with FIXED-POINT integer
arithmetic so the distributed iteration is bit-deterministic and
DuckDB-oracle-checkable — float PageRank sums contributions in
reducer order and can never hash-match across engines.

Reference parity note: the reference serves DuckDB SQL over HDFS;
recursive/iterative graph analytics there run as recursive CTEs.
Here the iteration is a driver-side loop over DataFrame
transformations with per-iteration localCheckpoint (lineage
truncation — the same pattern operators/dedup.py uses for connected
components), which is the scalable Spark formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t
from duckdb_hdfs_spark.queries.dedup import _BANDED_SQL

#: total probability mass in fixed-point micro-units and damping
#: numerator/denominator — integers so every engine computes the
#: identical floor-division result.
_MASS = 1_000_000_000_000
_ITERS = 5


def _pagerank_oracle() -> str:
    """Unrolled integer-PageRank oracle (_ITERS iterations),
    mirroring the Spark loop term for term (same floor divisions,
    same order)."""
    base = f"""
WITH {_BANDED_SQL},
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
it0 AS (
    SELECT node, deg, CAST({_MASS} // n AS BIGINT) AS pr
    FROM deg CROSS JOIN nn
)"""
    arms = []
    for k in range(1, _ITERS + 1):
        arms.append(f""",
it{k} AS (
    SELECT d.node, d.deg,
           CAST((15 * ({_MASS} // nn.n)) // 100
                + (85 * coalesce(s.inflow, 0)) // 100 AS BIGINT) AS pr
    FROM deg d CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.pr // p.deg) AS BIGINT) AS inflow
        FROM edges e JOIN it{k - 1} p ON e.src = p.node
        GROUP BY e.dst
    ) s ON d.node = s.node
)""")
    return (
        base
        + "".join(arms)
        + f"""
SELECT node AS doc_id, CAST(deg AS BIGINT) AS degree, pr
FROM it{_ITERS}
"""
    )


# --------------------------------------------------------------------------
@query("dedup_graph_pagerank", oracle=_pagerank_oracle())
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the LSH near-dup candidate graph (5 iterations,
    damping 0.85) — centrality-based KEEPER selection:
    in a boilerplate family, the highest-PageRank document is the
    template everything else derives from, a better canonical pick
    than 'longest doc' (dedup_keep_best) when near-dup clusters chain.

    Determinism (the reason this is oracle-checkable at all): the
    rank lives in fixed-point micro-units (total mass 10^12) and
    every update is integer arithmetic — contribution = pr DIV deg,
    damped inflow = (85·Σ) DIV 100 — so reducer ordering cannot
    perturb a single bit, unlike float PageRank.  The floor-division
    leakage (mass not exactly conserved) is a documented property,
    not a bug; rankings are unaffected.

    Scale shape: the candidate edge list comes from the band-bucket
    explode (bounded pairs, no self-join) and is localCheckpoint-ed;
    each iteration is one edge-keyed shuffle join + one node-keyed
    aggregate, re-checkpointed so lineage stays CONSTANT depth across
    iterations (the CC pointer-jumping pattern).  The 1-row node
    count broadcasts; nothing driver-side except the loop counter."""
    from duckdb_hdfs_spark.operators.dedup import minhash_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    cur = (
        deg.join(F.broadcast(nn))
        .withColumn("pr", F.expr(f"CAST({_MASS} div n AS BIGINT)"))
        .select("node", "deg", "pr")
        .localCheckpoint(eager=True)
    )
    for _ in range(_ITERS):
        contrib = cur.select(
            F.col("node").alias("src"), F.expr("pr div deg").alias("c")
        )
        inflow = (
            edges.join(contrib, "src")
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("inflow"))
            .withColumnRenamed("dst", "node")
        )
        cur = (
            deg.join(F.broadcast(nn))
            .join(inflow, "node", "left")
            .withColumn(
                "pr",
                F.expr(
                    f"CAST((15 * ({_MASS} div n)) div 100"
                    " + (85 * coalesce(inflow, 0)) div 100 AS BIGINT)"
                ),
            )
            .select("node", "deg", "pr")
            .localCheckpoint(eager=True)
        )
    return cur.select(
        F.col("node").alias("doc_id"),
        F.col("deg").cast("long").alias("degree"),
        "pr",
    )


# --------------------------------------------------------------------------
#: k-core threshold and bounded peeling rounds.  Peeling is monotone
#: (the alive set only shrinks), and BOTH engines run the identical
#: fixed round count, so parity holds even before convergence; at the
#: candidate graph's densities the set is stationary well within the
#: bound (asserted by the convergence check in tests).
_KCORE_K = 2
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    base = f"""
WITH {_BANDED_SQL},
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
alive0 AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM alive0 GROUP BY src)"""
    arms = []
    for r in range(_KCORE_ROUNDS):
        arms.append(f""",
keep{r} AS (
    SELECT src AS node FROM alive{r} GROUP BY src
    HAVING count(*) >= {_KCORE_K}
),
alive{r + 1} AS (
    SELECT e.src, e.dst FROM alive{r} e
    JOIN keep{r} a ON e.src = a.node
    JOIN keep{r} b ON e.dst = b.node
)""")
    return (
        base
        + "".join(arms)
        + f""",
core AS (
    SELECT src AS node FROM alive{_KCORE_ROUNDS} GROUP BY src
    HAVING count(*) >= {_KCORE_K}
)
SELECT d.node AS doc_id, CAST(d.deg AS BIGINT) AS degree,
       c.node IS NOT NULL AS in_2core
FROM deg d LEFT JOIN core c ON d.node = c.node
"""
    )


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core membership over the LSH near-dup candidate graph —
    iterative degree peeling (remove degree<k nodes until stable):
    a document OUTSIDE the 2-core pairs with at most one chain
    neighbor (an incidental near-dup), while 2-core members sit in
    densely cross-linked boilerplate families — the degeneracy signal
    spam/template detectors rank on, complementing PageRank's
    centrality and CC's reachability.

    Determinism: pure integer set arithmetic — membership and degree
    counts cannot drift across engines; both sides run the identical
    FIXED peeling-round count (parity holds even before convergence;
    convergence itself is asserted in tests).

    Scale shape: the edge list is the bounded band-bucket candidate
    set, checkpointed once; each peel is one partial-aggregated
    degree count + two semi-join-shaped prunes, re-checkpointed so
    lineage depth stays constant (the PageRank/CC pattern).  Rounds
    are a fixed constant, not data-dependent."""
    from duckdb_hdfs_spark.operators.dedup import minhash_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs)
    alive = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    deg = (
        alive.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        keep = (
            alive.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
        alive = (
            alive.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    core = (
        alive.groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _KCORE_K)
        .select(F.col("src").alias("cnode"))
    )
    return deg.join(core, deg["node"] == core["cnode"], "left").select(
        F.col("node").alias("doc_id"),
        F.col("deg").cast("long").alias("degree"),
        F.col("cnode").isNotNull().alias("in_2core"),
    )


# --------------------------------------------------------------------------
def _assortativity_oracle() -> str:
    return f"""
WITH {_BANDED_SQL},
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
ed AS (
    SELECT ds.deg AS x, dd.deg AS y
    FROM edges e
    JOIN deg ds ON e.src = ds.node
    JOIN deg dd ON e.dst = dd.node
),
s AS (
    SELECT count(*) AS m,
           sum(CAST(x AS DECIMAL(38,0))) AS sx,
           sum(CAST(y AS DECIMAL(38,0))) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
           sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
           sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
           (SELECT count(*) FROM deg) AS n_nodes
    FROM ed
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(m / 2 AS BIGINT) AS n_edges,
       round(CAST(sx AS DOUBLE) / m, 6) AS mean_degree,
       round((CAST(sxy AS DOUBLE) / m
              - (CAST(sx AS DOUBLE) / m) * (CAST(sy AS DOUBLE) / m))
             / nullif(sqrt((CAST(sxx AS DOUBLE) / m
                            - (CAST(sx AS DOUBLE) / m)
                              * (CAST(sx AS DOUBLE) / m))
                           * (CAST(syy AS DOUBLE) / m
                              - (CAST(sy AS DOUBLE) / m)
                                * (CAST(sy AS DOUBLE) / m))), 0), 6)
           AS assortativity
FROM s
"""


@query("graph_degree_assortativity", oracle=_assortativity_oracle())
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the LSH near-dup candidate graph
    (round 9; Newman 2002): the Pearson correlation of endpoint
    degrees over all directed edge instances.  Positive ⇒ hub-hub
    wiring (boilerplate families cross-linking into one mass — CC
    components will be few and huge); negative ⇒ hub-leaf star
    wiring (one template with many one-off copies — keep-best
    collapses stars cheaply).  The single scalar that tells a dedup
    pipeline which of its two failure shapes the candidate graph is
    drifting toward, read beside graph_kcore's density and
    PageRank's centrality.

    Determinism: degrees and all five power sums are exact integers
    in DECIMAL(38,0) accumulators; the correlation assembles in one
    fixed-order double expression (IEEE sqrt, mirrored zero-variance
    nullif).

    Scale shape: the edge list is the bounded band-bucket candidate
    set, checkpointed once; degrees are one partial-aggregated
    count; attaching endpoint degrees is two node-keyed shuffle
    joins (AQE-splittable — no single-reducer stage); the panel
    collapses to ONE row via partial aggregation."""
    from duckdb_hdfs_spark.operators.dedup import minhash_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )
    ed = (
        edges.join(
            deg.select(F.col("node").alias("src"), F.col("deg").alias("x")),
            "src",
        )
        .join(
            deg.select(F.col("node").alias("dst"), F.col("deg").alias("y")),
            "dst",
        )
        .select("x", "y")
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = ed.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(yd * F.col("y")).alias("syy"),
        F.sum(xd * F.col("y")).alias("sxy"),
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    j = s.join(F.broadcast(nn))
    m = F.col("m")
    mx = F.col("sx").cast("double") / m
    my = F.col("sy").cast("double") / m
    cov = F.col("sxy").cast("double") / m - mx * my
    vx = F.col("sxx").cast("double") / m - mx * mx
    vy = F.col("syy").cast("double") / m - my * my
    return j.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        (m / 2).cast("bigint").alias("n_edges"),
        F.round(mx, 6).alias("mean_degree"),
        F.round(
            cov / F.nullif(F.sqrt(vx * vy), F.lit(0.0)), 6
        ).alias("assortativity"),
    )


# --------------------------------------------------------------------------
def _clustering_oracle() -> str:
    return f"""
WITH {_BANDED_SQL},
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
tri AS (
    SELECT count(*) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e1.doc_b = e2.doc_a
    JOIN pairs e3 ON e1.doc_a = e3.doc_a AND e2.doc_b = e3.doc_b
),
deg AS (
    SELECT node, count(*) AS d FROM (
        SELECT doc_a AS node FROM pairs
        UNION ALL SELECT doc_b AS node FROM pairs
    ) GROUP BY node
),
wed AS (
    SELECT sum(CAST(d AS DECIMAL(38,0)) * (d - 1) / 2) AS n_wedges,
           count(*) AS n_nodes,
           sum(CAST(d AS DECIMAL(38,0))) / 2 AS n_edges
    FROM deg
)
SELECT CAST(wed.n_nodes AS BIGINT) AS n_nodes,
       CAST(wed.n_edges AS BIGINT) AS n_edges,
       CAST(tri.n_triangles AS BIGINT) AS n_triangles,
       CAST(wed.n_wedges AS BIGINT) AS n_wedges,
       round(3.0 * tri.n_triangles
             / nullif(CAST(wed.n_wedges AS DOUBLE), 0), 6)
           AS global_clustering
FROM tri CROSS JOIN wed
"""


@query("graph_clustering_coeff", oracle=_clustering_oracle())
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the LSH
    candidate graph (round 9): C = 3·triangles / wedges — the
    probability that two documents sharing a common near-dup
    neighbor are themselves near-dups.  C→1 says candidate edges
    form closed boilerplate FAMILIES (collapse whole components);
    C→0 says chains of incidental pairs (verify each edge before
    trusting transitive closure).  The one-number companion to
    dedup_pair_triangles' per-node counts and assortativity's
    wiring direction.

    Determinism: triangle and wedge counts are exact integers
    (DECIMAL(38,0) wedge fold — deg² safe at any scale); the
    coefficient is one rounded division with a mirrored
    wedge-free-graph guard.

    Scale shape: the canonical two-equi-join triangle enumeration
    over the id-ordered checkpointed edge list (cost Σ deg²,
    bucket-bounded, never cartesian — dedup_pair_triangles' shape)
    collapsed to ONE row; wedges are one partial-aggregated degree
    pass over the same checkpoint."""
    from duckdb_hdfs_spark.operators.dedup import minhash_candidate_pairs

    edges = minhash_candidate_pairs(
        _t(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("doc_a").alias("node"))
        .unionAll(edges.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dd = F.col("d").cast("decimal(38,0)")
    wed = deg.agg(
        F.sum(dd * (F.col("d") - 1) / 2).alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(dd) / 2).alias("n_edges"),
    )
    return tri.join(F.broadcast(wed)).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.col("n_wedges").cast("bigint").alias("n_wedges"),
        F.round(
            3.0
            * F.col("n_triangles")
            / F.nullif(F.col("n_wedges").cast("double"), F.lit(0.0)),
            6,
        ).alias("global_clustering"),
    )
