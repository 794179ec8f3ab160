"""Similarity search over the ``embeddings`` table (array<float> column).

* ``sim_knn_bruteforce`` — exact top-k cosine: broadcast the (small)
  query set against the corpus, JVM-side dot products via
  ``zip_with``/``aggregate``, per-query top-k via window. At 100 TB the
  corpus side stays partitioned and is read once; the broadcast side is
  k rows. This is the ground-truth baseline.
* ``sim_ann_lsh`` — the scale path: random-hyperplane sign LSH. Each
  vector gets a compact bucket key (sign bits of dot products with
  fixed seeded planes); queries only score vectors in matching buckets,
  turning all-pairs into per-bucket joins. The planes are literal
  constants, so the DuckDB oracle replicates bucketing exactly —
  the approximation is *deterministically* reproducible.
* ``sim_embedding_stats`` — per-label norm/centroid statistics.

No Python UDFs anywhere: vector math is Catalyst higher-order
functions, codegen'd per batch.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

DIM = 64
# 4 planes → 16 buckets: each query scores ~1/16 of the corpus. More
# planes shrink cost but gut recall once buckets drop below ~top-k·10
# candidates — tune with corpus size (at 100 TB you'd also multi-probe
# neighboring buckets).
N_PLANES = 4
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors

_rng = random.Random(20240813)
PLANES: list[list[float]] = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(DIM)] for _ in range(N_PLANES)
]


def dot(x: F.Column, y: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, z: s + z)


def norm(x: F.Column) -> F.Column:
    return F.sqrt(dot(x, x))


def cosine(x: F.Column, y: F.Column) -> F.Column:
    return dot(x, y) / (norm(x) * norm(y))


def _plane_col(plane: list[float]) -> F.Column:
    return F.array(*[F.lit(c) for c in plane])


def bucket_key(v: F.Column) -> F.Column:
    """Sign-bit bucket id from N_PLANES hyperplane dot products."""
    bits = [
        F.when(dot(v, _plane_col(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(PLANES)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _bucket_sql(vec_expr: str) -> str:
    """DuckDB replica of bucket_key over a DOUBLE[] expression."""
    terms = []
    for i, p in enumerate(PLANES):
        lit = "[" + ", ".join(repr(c) for c in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "sim_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings)
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(qv, cv), 4) AS cosine,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                                         c.vec_id) AS rk
      FROM q JOIN c ON q.query_id <> c.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the query set (ground truth)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "sim_ann_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql("embedding::DOUBLE[]")} AS bucket
               FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {N_QUERIES})
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(qv, v), 4) AS cosine,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                                         e.vec_id) AS rk
      FROM q JOIN e ON q.bucket = e.bucket AND q.query_id <> e.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's LSH
    bucket — the join is keyed on the bucket id, so the candidate set
    per query is ~corpus/2^planes instead of the whole corpus."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = emb.withColumn("bucket", bucket_key(F.col("v")))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("qbucket") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "sim_embedding_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm,
           round(min(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS min_norm,
           round(max(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def sim_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm statistics (sanity profile of the corpus)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", norm(F.col("embedding").cast("array<double>")).alias("n")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("n"), 4).alias("avg_norm"),
        F.round(F.min("n"), 4).alias("min_norm"),
        F.round(F.max("n"), 4).alias("max_norm"),
    )


N_PROBES_HAMMING = 1  # probe the home bucket + all Hamming-1 neighbors
IVF_CENTROIDS = 16
IVF_NPROBE = 4


@query(
    "sim_ann_multiprobe",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql("embedding::DOUBLE[]")} AS bucket
               FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket
               FROM e WHERE vec_id < {N_QUERIES}),
         probes AS (
           SELECT query_id, qv,
                  unnest([bucket, {", ".join(f"xor(bucket, {1 << i})" for i in range(N_PLANES))}]) AS pb
           FROM q)
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT probes.query_id, e.vec_id,
             round(list_cosine_similarity(qv, v), 4) AS cosine,
             row_number() OVER (PARTITION BY probes.query_id
                                ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                                         e.vec_id) AS rk
      FROM probes JOIN e ON probes.pb = e.bucket AND probes.query_id <> e.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign LSH: each query also probes every bucket at
    Hamming distance 1 from its own (flip one sign bit) — the classic
    recall fix for hyperplane LSH. Candidates/query ≈ (1+planes)/2^planes
    of the corpus (5/16 here) instead of 1/16, recovering neighbors that
    fall just across one hyperplane. Buckets partition the corpus, so
    probes never produce duplicate candidates."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = emb.withColumn("bucket", bucket_key(F.col("v")))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    probe_cols = [F.col("qbucket")] + [
        F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(N_PLANES)
    ]
    probes = q.select(
        "query_id", "qv", F.explode(F.array(*probe_cols)).alias("pb")
    )
    scored = (
        bucketed.join(
            F.broadcast(probes),
            (F.col("pb") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


@query(
    "sim_ann_ivf",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {IVF_CENTROIDS}),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, cent.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round(list_cosine_similarity(v, cv), 4) DESC,
                                           cent.cid) AS arn
        FROM e CROSS JOIN cent
      ) WHERE arn = 1
    ),
    qprobe AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, cent.cid,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(list_cosine_similarity(q.v, cv), 4) DESC,
                                           cent.cid) AS prn
        FROM e q CROSS JOIN cent WHERE q.vec_id < {N_QUERIES}
      ) WHERE prn <= {IVF_NPROBE}
    )
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT qprobe.query_id, e.vec_id,
             round(list_cosine_similarity(qe.v, e.v), 4) AS cosine,
             row_number() OVER (PARTITION BY qprobe.query_id
                                ORDER BY round(list_cosine_similarity(qe.v, e.v), 4) DESC,
                                         e.vec_id) AS rk
      FROM qprobe
      JOIN assign ON assign.cid = qprobe.cid
      JOIN e ON e.vec_id = assign.vec_id AND e.vec_id <> qprobe.query_id
      JOIN e qe ON qe.vec_id = qprobe.query_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN with deterministic coarse centroids (the
    first {IVF_CENTROIDS} corpus vectors — swap for k-means cluster
    centers in production; the index/search mechanics are identical and
    this choice keeps the whole structure SQL-replicable):

      build: every vector is assigned to its nearest centroid's list
      search: a query scores only the lists of its nprobe nearest
      centroids — candidates/query ≈ nprobe/centroids of the corpus.

    At 100 TB the assignment is one broadcast-join pass, lists are the
    natural partitioning key, and queries touch nprobe partitions."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    sim_to_cent = F.round(cosine(F.col("v"), F.col("cv")), 4)
    arn = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cid")
    assign = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "v", "cid", sim_to_cent.alias("sim"))
        .withColumn("arn", F.row_number().over(arn))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", "cid")
    )
    qprobe = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                "cid", sim_to_cent.alias("sim"))
        .withColumn("prn", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", "qv", "cid")
    )
    scored = (
        assign.join(F.broadcast(qprobe),
                    (assign.cid == qprobe.cid) & (F.col("query_id") != F.col("vec_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)
