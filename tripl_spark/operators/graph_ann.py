"""Graph-based ANN (HNSW-lite): a navigable-small-world index expressed
as DataFrame joins.

The reference has no similarity search at all (SURVEY.md §2.9 — the
category is driver-mandated); IVF/PQ/LSH variants live in
``operators/similarity.py``. This module adds the remaining major ANN
family — graph search (HNSW/NSW/NN-descent lineage) — in a shape Spark
can execute at scale:

1. **k-NN graph build** (`knn_graph`): candidate edges come from
   multi-probe sign-LSH buckets (every node probes its own bucket plus
   all Hamming-1 flips — the same probe set ``sim_ann_multiprobe``
   uses), scored JVM-side, top-``m`` kept per node. A round of
   **NN-descent** then proposes each node's neighbors-of-neighbors
   (the classic graph-quality fix: two joins, no all-pairs) and re-ranks
   back down to ``m``. Edges are symmetrized so greedy search can enter
   from either endpoint.
2. **Beam search** (`beam_search`): per query, seed the beam with the
   query's own probe-bucket mates, then repeatedly (a) hop the frontier
   through the adjacency list (shuffle equi-join keyed on the node id —
   partition-balanced at any corpus size), (b) score only NEW nodes
   against the broadcast query vectors, (c) keep the best ``beam`` per
   query as the next frontier. Visited-best state is capped per query,
   so memory is O(queries · beam), independent of corpus size.

Scale notes: the corpus is never self-joined all-pairs — bucket joins
bound the build, adjacency joins bound the search. The graph (n·m
edges) is the only materialized index; at 100 TB you'd persist it
partitioned by ``src`` (bucketed layout, see ``sources/bucketing.py``)
so every search hop is a co-located join. All arithmetic is Catalyst
higher-order functions (no Python in the row path); iteration uses
``localCheckpoint`` to cut lineage exactly like ``plans/graph.py``.

Correctness gating: the SEED graph stage (multiprobe candidates +
exact cosine + top-m) is hash-gated via the ``sim_ann_knn_graph``
oracle, and since r6 the FULL pipeline — seed graph, one NN-descent
round, symmetrize, 2-hop beam search — is hash-gated too:
``sim_ann_hnsw`` scores every site with the JVM cosine at 4 dp
(``_jvm_cos4``) and its oracle unrolls the fixed-round iteration into
CTEs, the same replay pattern as the 2-iter k-means. The production
build keeps the Arrow-batched numpy ``_cosine_batch`` (6 dp) as
``knn_graph``'s default scorer; the two scorers are pinned equivalent
on the real embeddings by
``tests/test_graph_ann.py::test_cosine_udf_matches_jvm_cosine``, and
recall ≥0.8 of exact top-k stays pinned there as well.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from tripl_spark.operators.similarity import (
    N_PLANES,
    N_QUERIES,
    TOP_K,
    bucket_key,
    cosine,
)


from tripl_spark.queries.registry import query
from tripl_spark.session import eager_checkpoint, load_table

M_NEIGHBORS = 12  # graph degree: ≥ 2·TOP_K so exact neighbors survive re-ranks
BEAM = 12
HOPS = 2
# Degenerate-bucket cap for the graph BUILD's candidate join (the
# sign-LSH analog of clustering.SEM_MAX_CLUSTER): a halfspace-heavy
# embedding distribution can funnel the corpus into one bucket, whose
# candidate stage expands quadratically. Candidates are drawn only
# from buckets at most this large; every node still probes, so no node
# is orphaned — it just contributes no candidate edges from degenerate
# buckets. Replicated in the sim_ann_knn_graph / sim_ann_hnsw oracles.
# At scale, ALSO grow the plane count with the corpus
# (similarity.n_planes_for) so expected occupancy stays ~constant.
MAX_LSH_BUCKET = 1000


@pandas_udf(T.DoubleType())
def _cosine_batch(x: pd.Series, y: pd.Series) -> pd.Series:
    """Arrow-batched cosine for the graph BUILD, which scores millions
    of candidate edges: Catalyst's higher-order functions run
    interpreted per element at that volume — numpy over Arrow batches
    is the sanctioned fast path (ArrowEvalPython, allowed by the plan
    gates). Search scoring stays on the JVM ``cosine`` (small,
    broadcast-joined)."""
    import numpy as np

    xv = np.stack(x.to_numpy())
    yv = np.stack(y.to_numpy())
    num = (xv * yv).sum(axis=1)
    den = np.sqrt((xv * xv).sum(axis=1)) * np.sqrt((yv * yv).sum(axis=1))
    return pd.Series(np.round(num / den, 6))


def _multiprobe(
    df: DataFrame, bucket_col: str = "bucket", n_planes: int = N_PLANES
) -> DataFrame:
    """Explode each row into its own bucket + every Hamming-1 flip
    (``n_planes`` flips — pass the actual plane count when the bucket
    ids came from a corpus-sized ``lsh_planes`` set)."""
    probe_cols = [F.col(bucket_col)] + [
        F.col(bucket_col).bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
    ]
    return df.withColumn("pb", F.explode(F.array(*probe_cols)))


def _top_m(edges: DataFrame, m: int) -> DataFrame:
    """Keep the m best-scoring dst per src, deterministic tie-break."""
    w = Window.partitionBy("src").orderBy(F.desc("cos"), "dst")
    return (
        edges.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= m)
        .drop("_rk")
    )


def _jvm_cos4(a: F.Column, b: F.Column) -> F.Column:
    """JVM cosine at 4 dp — the deterministic scorer the SQL oracle can
    replay exactly (list_cosine_similarity + round on the DuckDB side)."""
    return F.round(cosine(a, b), 4)


def knn_graph(
    emb: DataFrame,
    m: int = M_NEIGHBORS,
    refine_rounds: int = 1,
    score_fn=None,
    max_bucket: int | None = MAX_LSH_BUCKET,
) -> DataFrame:
    """(src, dst, cos) approximate k-NN graph.

    Build: multi-probe LSH bucket join proposes candidate pairs (each
    node meets ~(1+planes)/2^planes of the corpus, never all of it),
    exact cosine ranks them, top-m survive. Refinement: NN-descent
    rounds propose neighbors-of-neighbors through a self-join of the
    adjacency list, re-ranked with the originals back down to m.

    ``score_fn`` (default: the Arrow-batched numpy ``_cosine_batch``,
    6 dp — the production fast path) scores candidate edges; the
    hash-gated ``sim_ann_hnsw`` passes ``_jvm_cos4`` so every edge is
    SQL-replayable at 4 dp.
    """
    if score_fn is None:
        score_fn = _cosine_batch
    e = emb.select("vec_id", "v").withColumn("bucket", bucket_key("v"))
    # multiprobe candidates are load-bearing for UNIFORM corpora: with
    # own-bucket-only candidates the initial graph is too disconnected
    # for NN-descent to repair (measured recall 0.48 vs 0.84 on the
    # uniform sf0.001 embeddings), so the build pays the (1+planes)
    # probe factor deliberately
    probes = _multiprobe(e).select(
        F.col("vec_id").alias("src"), F.col("v").alias("sv"), "pb"
    )
    # candidates come only from non-degenerate buckets (the build-side
    # max_bucket cap — default MAX_LSH_BUCKET, None to uncap)
    cand_side = e
    if max_bucket is not None:
        ok = (
            e.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("bucket")
        )
        cand_side = e.join(F.broadcast(ok), "bucket")
    cand = probes.join(
        cand_side.select(F.col("vec_id").alias("dst"), F.col("v").alias("dv"), "bucket"),
        (F.col("pb") == F.col("bucket")) & (F.col("src") != F.col("dst")),
    ).select("src", "dst", score_fn(F.col("sv"), F.col("dv")).alias("cos"))
    adj = _top_m(cand, m).transform(eager_checkpoint)

    vecs = emb.select("vec_id", "v")
    for _ in range(refine_rounds):
        twohop = (
            adj.select("src", F.col("dst").alias("mid"))
            .join(adj.select(F.col("src").alias("mid"), F.col("dst").alias("nd")), "mid")
            .select("src", F.col("nd").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        proposals = (
            twohop.join(adj.select("src", "dst"), ["src", "dst"], "left_anti")
            .distinct()
            .join(vecs.select(F.col("vec_id").alias("src"), F.col("v").alias("sv")), "src")
            .join(vecs.select(F.col("vec_id").alias("dst"), F.col("v").alias("dv")), "dst")
            .select("src", "dst", score_fn(F.col("sv"), F.col("dv")).alias("cos"))
        )
        adj = _top_m(adj.unionByName(proposals), m).transform(eager_checkpoint)

    # symmetrize (entry from either endpoint), bounded at 2m per node
    sym = adj.unionByName(
        adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "cos")
    ).distinct()
    return _top_m(sym, 2 * m).transform(eager_checkpoint)


def beam_search(
    emb: DataFrame,
    adj: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    beam: int = BEAM,
    hops: int = HOPS,
    round_dp: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk) top-k via NSW beam search.

    ``queries`` is (query_id, qv) and is broadcast at every scoring
    join — the corpus-sized frames are only ever joined on node keys.
    Visited state is capped to 4·beam rows per query each round.
    ``round_dp`` sets the scoring precision (default 6; the hash-gated
    ``sim_ann_hnsw`` uses 4 so beam membership is SQL-replayable —
    ties at the coarser precision break on the node id on both
    engines).
    """
    vecs = emb.select("vec_id", "v")
    e = vecs.withColumn("bucket", bucket_key("v"))
    qb = queries.withColumn("bucket", bucket_key("qv"))
    seeds = (
        _multiprobe(qb)
        .select("query_id", "qv", "pb")
        .join(e, F.col("pb") == F.col("bucket"))
        .select(
            "query_id",
            F.col("vec_id").alias("node"),
            F.round(cosine(F.col("qv"), F.col("v")), round_dp).alias("cos"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), "node")
    cap = F.row_number().over(wq)
    best = seeds.withColumn("_rk", cap).filter(F.col("_rk") <= 4 * beam).drop("_rk")
    frontier = best.withColumn("_rk", cap).filter(F.col("_rk") <= beam).drop("_rk")
    best = best.transform(eager_checkpoint)
    frontier = frontier.transform(eager_checkpoint)

    for _ in range(hops):
        hop = (
            frontier.select("query_id", F.col("node").alias("src"))
            .join(adj.select("src", "dst"), "src")
            .select("query_id", F.col("dst").alias("node"))
            .join(best.select("query_id", "node"), ["query_id", "node"], "left_anti")
            .distinct()
        )
        scored = (
            hop.join(vecs.withColumnRenamed("vec_id", "node"), "node")
            .join(F.broadcast(queries), "query_id")
            .select(
                "query_id",
                "node",
                F.round(cosine(F.col("qv"), F.col("v")), round_dp).alias("cos"),
            )
        )
        frontier = (
            scored.withColumn("_rk", cap).filter(F.col("_rk") <= beam).drop("_rk")
        ).transform(eager_checkpoint)
        best = (
            best.unionByName(scored)
            .withColumn("_rk", cap)
            .filter(F.col("_rk") <= 4 * beam)
            .drop("_rk")
        ).transform(eager_checkpoint)

    # every best row descends from a join with queries, so query_id is
    # already a subset of the query set — no re-join needed
    out = best.select(
        "query_id", F.col("node").alias("neighbor_id"), F.col("cos")
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        out.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos"), 4).alias("cosine"),
            "rk",
        )
    )


def _seed_graph_oracle() -> str:
    from tripl_spark.operators.similarity import _bucket_sql

    bucket = _bucket_sql("embedding::DOUBLE[]")
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(N_PLANES)]
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket
      FROM embeddings
    ),
    okb AS (SELECT bucket FROM e GROUP BY bucket
            HAVING count(*) <= {MAX_LSH_BUCKET}),
    probes AS (
      SELECT vec_id AS src, v AS sv,
             unnest(list_value({probe_list})) AS pb
      FROM e
    ),
    cand AS (
      SELECT p.src, e.vec_id AS dst,
             round(list_cosine_similarity(p.sv, e.v), 4) AS cosine
      FROM probes p
      JOIN e ON p.pb = e.bucket AND p.src <> e.vec_id
      JOIN okb ON okb.bucket = e.bucket
    )
    SELECT src, dst, cosine, CAST(rk AS INT) AS rk FROM (
      SELECT src, dst, cosine,
             row_number() OVER (PARTITION BY src
                                ORDER BY cosine DESC, dst) AS rk
      FROM cand
    ) WHERE rk <= {M_NEIGHBORS}
    """


@query(
    "sim_ann_knn_graph",
    oracle=_seed_graph_oracle(),
    doc="the graph-ANN family's hash-gated building block: the "
    "multiprobe-LSH seed k-NN graph (candidate generation + exact "
    "cosine ranking + top-m) replayed edge-for-edge in SQL; the "
    "NN-descent refinement and beam search on top stay recall-tested "
    "in sim_ann_hnsw",
)
def sim_ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, cosine, rk) — the seed k-NN graph ``knn_graph``
    starts from: every node meets its multiprobe bucket mates, exact
    cosine ranks them, top-m survive. Same candidate bound as the
    production build (~(1+planes)/2^planes of the corpus per node,
    never all-pairs); scored with the JVM cosine so the SQL oracle
    reproduces every edge."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    e = emb.withColumn("bucket", bucket_key("v"))
    ok = (
        e.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= MAX_LSH_BUCKET)
        .select("bucket")
    )
    probes = _multiprobe(e).select(
        F.col("vec_id").alias("src"), F.col("v").alias("sv"), "pb"
    )
    cand = probes.join(
        e.join(F.broadcast(ok), "bucket").select(
            F.col("vec_id").alias("dst"), F.col("v").alias("dv"), "bucket"
        ),
        (F.col("pb") == F.col("bucket")) & (F.col("src") != F.col("dst")),
    ).select(
        "src", "dst", F.round(cosine(F.col("sv"), F.col("dv")), 4).alias("cosine")
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= M_NEIGHBORS)
    )


def _topq(src: str, cols: str, limit: int) -> str:
    """SQL fragment: top-``limit`` rows of ``src`` per query_id by
    (cos DESC, node) — the beam/visited cap both engines share."""
    return f"""(
      SELECT {cols} FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, node) AS _rk
        FROM {src}
      ) WHERE _rk <= {limit}
    )"""


def _hnsw_oracle() -> str:
    """Full build+search replay: seed graph (the sim_ann_knn_graph
    oracle's relations), ONE unrolled NN-descent round, symmetrize,
    then the 2-hop beam search unrolled CTE-per-round — the same
    fixed-iteration-replay pattern the 2-iter k-means oracle uses.
    Every scoring site is round(list_cosine_similarity, 4) with node-id
    tie-breaks, matching the Spark side's _jvm_cos4 scorer exactly."""
    from tripl_spark.operators.similarity import _bucket_sql

    bucket = _bucket_sql("embedding::DOUBLE[]")
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(N_PLANES)]
    )
    m, beam = M_NEIGHBORS, BEAM

    def hop(frontier: str, best: str, n: int) -> str:
        return f"""
    hop{n} AS (
      SELECT DISTINCT f.query_id, adj.dst AS node
      FROM {frontier} f JOIN adj ON f.node = adj.src
      WHERE NOT EXISTS (SELECT 1 FROM {best} b
                        WHERE b.query_id = f.query_id AND b.node = adj.dst)
    ),
    sc{n} AS (
      SELECT h.query_id, h.node,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
      FROM hop{n} h
      JOIN e ON e.vec_id = h.node
      JOIN q ON q.query_id = h.query_id
    ),
    front{n} AS {_topq(f"sc{n}", "query_id, node, cos", beam)},
    best{n} AS {_topq(f"(SELECT * FROM {best} UNION ALL SELECT * FROM sc{n})",
                      "query_id, node, cos", 4 * beam)}"""

    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket
      FROM embeddings
    ),
    okb AS (SELECT bucket FROM e GROUP BY bucket
            HAVING count(*) <= {MAX_LSH_BUCKET}),
    probes AS (
      SELECT vec_id AS src, v AS sv, unnest(list_value({probe_list})) AS pb
      FROM e
    ),
    cand AS (
      SELECT p.src, e.vec_id AS dst,
             round(list_cosine_similarity(p.sv, e.v), 4) AS cos
      FROM probes p
      JOIN e ON p.pb = e.bucket AND p.src <> e.vec_id
      JOIN okb ON okb.bucket = e.bucket
    ),
    adj0 AS (
      SELECT src, dst, cos FROM (
        SELECT src, dst, cos,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk
        FROM cand
      ) WHERE rk <= {m}
    ),
    prop AS (
      SELECT DISTINCT a.src, b.dst
      FROM adj0 a JOIN adj0 b ON a.dst = b.src
      WHERE a.src <> b.dst
        AND NOT EXISTS (SELECT 1 FROM adj0 x
                        WHERE x.src = a.src AND x.dst = b.dst)
    ),
    propsc AS (
      SELECT p.src, p.dst,
             round(list_cosine_similarity(es.v, ed.v), 4) AS cos
      FROM prop p
      JOIN e es ON es.vec_id = p.src
      JOIN e ed ON ed.vec_id = p.dst
    ),
    adj1 AS (
      SELECT src, dst, cos FROM (
        SELECT src, dst, cos,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk
        FROM (SELECT * FROM adj0 UNION ALL SELECT * FROM propsc)
      ) WHERE rk <= {m}
    ),
    sym AS (
      SELECT src, dst, cos FROM adj1
      UNION
      SELECT dst AS src, src AS dst, cos FROM adj1
    ),
    adj AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk
        FROM sym
      ) WHERE rk <= {2 * m}
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket
          FROM e WHERE vec_id < {N_QUERIES}),
    qprobes AS (
      SELECT query_id, qv, unnest(list_value({probe_list})) AS pb FROM q
    ),
    seeds AS (
      SELECT qp.query_id, e.vec_id AS node,
             round(list_cosine_similarity(qp.qv, e.v), 4) AS cos
      FROM qprobes qp JOIN e ON qp.pb = e.bucket
    ),
    best0 AS {_topq("seeds", "query_id, node, cos", 4 * beam)},
    front0 AS {_topq("seeds", "query_id, node, cos", beam)},
{hop("front0", "best0", 1)},
{hop("front1", "best1", 2)}
    SELECT query_id, node AS neighbor_id, cos AS cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT query_id, node, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, node) AS rk
      FROM best2 WHERE query_id <> node
    ) WHERE rk <= {TOP_K}
    """


@query(
    "sim_ann_hnsw",
    oracle=_hnsw_oracle(),
    doc="Graph ANN (HNSW-lite): LSH-seeded k-NN graph + one NN-descent "
    "round + symmetrize + 2-hop beam search, HASH-GATED end-to-end — "
    "the whole fixed-round pipeline unrolled into SQL the way the "
    "2-iter k-means was; recall ≥0.8 vs brute force additionally "
    "pinned in tests/test_graph_ann.py",
)
def sim_ann_hnsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k neighbors for the standard query set via the navigable
    small-world graph — the fourth ANN family next to LSH/IVF/PQ.

    This registered path scores every site with the JVM cosine at 4 dp
    (``_jvm_cos4``) so build and search are SQL-replayable; the
    production build keeps the Arrow-batched numpy scorer (6 dp) via
    ``knn_graph``'s default ``score_fn`` — the two scorers are pinned
    equivalent on the real embeddings in tests/test_graph_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    adj = knn_graph(emb, score_fn=_jvm_cos4)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return beam_search(emb, adj, queries, round_dp=4)
