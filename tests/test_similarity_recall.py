"""ANN recall on clustered vectors: sign-LSH bucketing must recover most
exact top-k neighbors when the corpus has angular structure (the driver
tables' embeddings are uniform random, where low recall is expected —
this test supplies the structured case)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tripl_spark.operators.similarity import TOP_K, bucket_key, cosine


@pytest.fixture(scope="module")
def clustered(spark):
    rng = random.Random(99)
    centers = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(8)]
    rows = []
    for i in range(400):
        c = centers[i % 8]
        v = [x + rng.gauss(0, 0.25) for x in c]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _topk(df, scored_filter=None):
    q = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        *( [F.col("bucket").alias("qbucket")] if "bucket" in df.columns else [] ),
    )
    joined = df.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    if scored_filter is not None:
        joined = joined.filter(scored_filter)
    scored = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    top = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)
    return {(r.query_id, r.neighbor_id) for r in top.collect()}


def test_ann_lsh_recall_on_clustered_data(clustered):
    exact = _topk(clustered)
    bucketed = clustered.withColumn("bucket", bucket_key(F.col("v")))
    approx = _topk(bucketed, scored_filter=F.col("qbucket") == F.col("bucket"))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"ANN recall on clustered data too low: {recall}"
