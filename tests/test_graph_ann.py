"""Graph-ANN (HNSW-lite) recall: beam search over the LSH-seeded k-NN
graph must recover ≥0.8 of the exact top-k — on the driver's own
(uniform) sf0.001 embeddings AND on clustered vectors."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.graph_ann import beam_search, knn_graph
from tripl_spark.operators.similarity import N_QUERIES, TOP_K
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_hnsw_recall_on_driver_embeddings(spark, sf_small):
    exact = _pairs(REGISTRY["sim_knn_bruteforce"].fn(spark, sf_small))
    approx = _pairs(REGISTRY["sim_ann_hnsw"].fn(spark, sf_small))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"graph-ANN recall vs brute force too low: {recall}"


def test_hnsw_recall_on_clustered_vectors(spark):
    rng = random.Random(41)
    centers = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(8)]
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, [x + rng.gauss(0, 0.25) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # exact ground truth
    from pyspark.sql import Window

    from tripl_spark.operators.similarity import cosine

    scored = emb.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .collect()
    }
    approx = _pairs(beam_search(emb, knn_graph(emb), queries))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"graph-ANN recall on clustered data too low: {recall}"


def test_hnsw_graph_degree_bounded(spark, sf_small):
    from tripl_spark.operators.graph_ann import M_NEIGHBORS
    from tripl_spark.session import load_table

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    adj = knn_graph(emb)
    deg = adj.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert deg <= 2 * M_NEIGHBORS


def test_pagerank_empty_edges(spark):
    from tripl_spark.plans.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges)
    assert out.count() == 0 and set(out.columns) == {"node", "rank"}


def test_cosine_udf_matches_jvm_cosine(spark, sf_small):
    """The Arrow-batched numpy cosine (the production build's scorer)
    must agree with the JVM expression cosine (the oracle gate's
    scorer) on the real embeddings — this is the check that covers the
    numpy arithmetic the sim_ann_knn_graph oracle cannot see."""
    from pyspark.sql import functions as F

    from tripl_spark.operators.graph_ann import _cosine_batch
    from tripl_spark.operators.similarity import cosine
    from tripl_spark.session import load_table

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va")
    )
    b = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 80)).select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb")
    )
    both = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select(
            _cosine_batch(F.col("va"), F.col("vb")).alias("np_cos"),
            cosine(F.col("va"), F.col("vb")).alias("jvm_cos"),
        )
        .collect()
    )
    assert len(both) > 1000
    # _cosine_batch rounds to 6 dp internally, so agreement with the
    # raw JVM value is bounded by half the rounding quantum (plus ulp
    # noise) — still far below anything a real arithmetic bug produces
    for r in both:
        assert abs(r.np_cos - r.jvm_cos) < 1e-6, (r.np_cos, r.jvm_cos)


def test_knn_graph_default_bucket_cap_is_bounded(spark):
    """Scale gate (the sign-LSH analog of the semantic-dedup cap): the
    graph BUILD draws candidates only from buckets at most
    MAX_LSH_BUCKET by default, so a halfspace-degenerate embedding
    distribution cannot make the candidate join quadratic."""
    import inspect

    from tripl_spark.operators.graph_ann import MAX_LSH_BUCKET, knn_graph

    default = inspect.signature(knn_graph).parameters["max_bucket"].default
    assert default == MAX_LSH_BUCKET

    # all-positive vectors -> every sign bit 1 -> ONE bucket holding
    # everything; with a tiny cap the build yields no candidate edges
    rows = [(i, [1.0 + 0.001 * i] * 16) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    assert knn_graph(emb, max_bucket=5).count() == 0
    assert knn_graph(emb, max_bucket=None).count() > 0


def test_n_planes_rule_keeps_buckets_constant():
    """planes ~ log2(n/per_bucket): expected occupancy n / 2^planes
    stays within [per_bucket/2, per_bucket] once n is large enough."""
    from tripl_spark.operators.similarity import N_PLANES, n_planes_for

    assert n_planes_for(500) == N_PLANES  # test scales pin N_PLANES
    for n in (10**6, 10**8, 10**10):
        k = n_planes_for(n)
        assert n / (1 << k) <= 1000, (n, k)
        assert n / (1 << k) > 250, (n, k)


def test_lsh_planes_reproduces_module_constant():
    from tripl_spark.operators.similarity import N_PLANES, PLANES, lsh_planes

    assert lsh_planes(N_PLANES) == PLANES
