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


def test_multiprobe_recall_beats_single_bucket(clustered):
    from tripl_spark.operators.similarity import N_PLANES

    exact = _topk(clustered)
    bucketed = clustered.withColumn("bucket", bucket_key(F.col("v")))
    single = _topk(bucketed, scored_filter=F.col("qbucket") == F.col("bucket"))
    cond = F.col("qbucket") == F.col("bucket")
    for i in range(N_PLANES):
        cond = cond | (F.col("qbucket").bitwiseXOR(F.lit(1 << i)) == F.col("bucket"))
    multi = _topk(bucketed, scored_filter=cond)
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single, (r_single, r_multi)
    assert r_multi >= 0.8, f"multiprobe recall too low: {r_multi}"


def test_ivf_recall_on_clustered_data(clustered, spark):
    from tripl_spark.operators.similarity import IVF_NPROBE

    exact = _topk(clustered)
    # centroids = the 8 true cluster seeds' first members (vec_id < 8)
    cent = clustered.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    sim = F.round(cosine(F.col("v"), F.col("cv")), 6)
    assign = (
        clustered.join(F.broadcast(cent))
        .select("vec_id", "v", "cid", sim.alias("s"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.desc("s"), "cid")))
        .filter(F.col("rn") == 1).select("vec_id", "v", "cid")
    )
    qp = (
        clustered.filter(F.col("vec_id") < 8)
        .join(F.broadcast(cent))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                "cid", sim.alias("s"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("s"), "cid")))
        .filter(F.col("rn") <= IVF_NPROBE).select("query_id", "qv", "cid")
    )
    scored = (
        assign.join(F.broadcast(qp),
                    (assign.cid == qp.cid) & (F.col("query_id") != F.col("vec_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    top = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)
    found = {(r.query_id, r.neighbor_id) for r in top.collect()}
    recall = len(exact & found) / len(exact)
    assert recall >= 0.9, f"IVF recall on clustered data too low: {recall}"


def test_pq_recall_on_clustered_data(clustered):
    from tripl_spark.operators.similarity import _ssq, pq_rank

    # PQ approximates L2 — measure recall against the exact-L2 top-k
    # (the cosine baseline used for LSH/IVF ranks differently when
    # norms vary, which would charge PQ for a metric mismatch)
    q = clustered.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = clustered.join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _ssq(F.col("qv"), F.col("v")).alias("d2"),
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K).collect()
    }
    pq = pq_rank(clustered, n_queries=8, top_k=TOP_K)
    approx = {(r.query_id, r.vec_id) for r in pq.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall on clustered data too low: {recall}"


def test_knn_bruteforce_arrow_twin_matches_expression_path(spark, sf_small):
    """The mapInPandas GEMM twin returns the identical ranked top-k
    (neighbor ids, 4-dp cosines, ranks) as the oracled expression path."""
    from pyspark.sql import functions as F

    from tripl_spark.operators.similarity import knn_bruteforce_arrow
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tripl_spark.session import load_table

    _ensure_loaded()
    expr = {
        (r.query_id, r.rk): (r.neighbor_id, r.cosine)
        for r in REGISTRY["sim_knn_bruteforce"].fn(spark, sf_small).collect()
    }
    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    arrow = {
        (r.query_id, r.rk): (r.neighbor_id, r.cosine)
        for r in knn_bruteforce_arrow(emb).collect()
    }
    assert set(expr) == set(arrow)
    for k in expr:
        assert expr[k][0] == arrow[k][0], k
        assert abs(expr[k][1] - arrow[k][1]) < 1e-9, k


def test_filtered_knn_respects_predicate_and_differs_from_unfiltered(spark, sf_small):
    from pyspark.sql import functions as F

    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tripl_spark.session import load_table

    _ensure_loaded()
    res = REGISTRY["sim_knn_filtered"].fn(spark, sf_small).collect()
    allowed = {
        r["doc_id"]
        for r in load_table(spark, sf_small, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id")
        .collect()
    }
    assert res, "filtered search returned nothing"
    for r in res:
        assert r["neighbor_id"] in allowed, r
    # the filter must actually bite: the unfiltered top lists contain
    # non-en neighbors somewhere (else the predicate is vacuous here)
    unfiltered = REGISTRY["sim_knn_bruteforce"].fn(spark, sf_small).collect()
    assert any(r["neighbor_id"] not in allowed for r in unfiltered)


def test_lsh_filtered_results_allowed_and_match_composed_semantics(spark, sf_small):
    from pyspark.sql import functions as F

    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tripl_spark.session import load_table

    _ensure_loaded()
    res = REGISTRY["sim_ann_lsh_filtered"].fn(spark, sf_small).collect()
    allowed = {
        r["doc_id"]
        for r in load_table(spark, sf_small, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id")
        .collect()
    }
    assert res, "filtered LSH search returned nothing"
    for r in res:
        assert r["neighbor_id"] in allowed, r
    # indexed results are a subset of the exact filtered search's
    # CANDIDATE universe: every (query, neighbor) the index returns
    # scores identically in the brute-force path (same cosine at 4dp)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in REGISTRY["sim_knn_filtered"].fn(spark, sf_small).collect()
    }
    for r in res:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(exact[key] - r["cosine"]) < 1e-9, key


def test_lsh_filtered_recall_on_clustered_data(clustered):
    # composed predicate + bucket probe: recall vs the exact FILTERED
    # top-k must match the single-bucket LSH bound on clustered data
    allowed = F.col("vec_id") % 3 != 0  # a ~2/3-selectivity predicate
    exact = _topk(clustered, scored_filter=allowed)
    bucketed = clustered.withColumn("bucket", bucket_key(F.col("v")))
    approx = _topk(
        bucketed,
        scored_filter=allowed & (F.col("qbucket") == F.col("bucket")),
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"filtered LSH recall too low: {recall}"


def test_mmr_skips_the_near_duplicate_second_hit(spark):
    # a query whose two most-relevant candidates are near-duplicates of
    # each other: plain top-3 returns both; MMR must pick the duplicate
    # LAST (diversity discount), promoting the distinct third vector
    import math

    from tripl_spark.operators.similarity import MMR_LAMBDA, cosine

    # query sits between two orthogonal directions; the two most
    # relevant candidates (base, dup) point the same way
    base = [1.0, 0.0, 0.0, 0.0]
    dup = [0.999, 0.01, 0.0, 0.0]       # ~same direction as base
    other = [0.0, 1.0, 0.0, 0.0]        # equally relevant, orthogonal
    far = [0.0, 0.0, 1.0, 0.0]
    rows = [(0, [0.71, 0.7, 0.0, 0.0]), (1, base), (2, dup), (3, other), (4, far)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "vec_id")
    cand = (
        emb.filter(F.col("vec_id") > 0)
        .crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", "v",
                F.round(cosine(F.col("qv"), F.col("v")), 4).alias("rel"))
    )
    # plain relevance puts the near-duplicate PAIR in the top 2
    rel_order = [r.vec_id for r in cand.orderBy(F.desc("rel"), "vec_id").collect()]
    assert set(rel_order[:2]) == {1, 2}
    # greedy MMR by the same formula, driver-side reference
    pool = {r.vec_id: (r.rel, r.v) for r in cand.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

    picked = [rel_order[0]]
    for _ in range(2):
        best = max(
            ((MMR_LAMBDA * rel - (1 - MMR_LAMBDA)
              * max(round(cos(v, pool[p][1]), 6) for p in picked), -vid, vid)
             for vid, (rel, v) in pool.items() if vid not in picked),
        )
        picked.append(best[2])
    # MMR demotes the duplicate below the orthogonal candidate: the
    # top-2 MMR picks are one of the pair plus 'other', never both
    assert picked[1] == 3, picked
    assert set(picked) == {rel_order[0], 3, (2 if rel_order[0] == 1 else 1)}, picked
