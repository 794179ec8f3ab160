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
