"""k-means invariants: monotone improvement, convergence fixpoint, and
planted-center recovery on clustered synthetic vectors."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.clustering import (
    _assign_round,
    kmeans_2iter_centroids,
    kmeans_assign,
    kmeans_fit,
)
from tripl_spark.session import load_table


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(4)]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [x + rng.gauss(0, 0.1) for x in c]))
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), centers


def test_inertia_improves_with_iterations(planted):
    emb, _ = planted
    _, inertia1 = kmeans_fit(emb, k=4, max_iters=1)
    _, inertia5 = kmeans_fit(emb, k=4, max_iters=5)
    assert inertia5 <= inertia1 + 1e-9


def test_converged_fit_is_a_fixpoint(planted):
    emb, _ = planted
    centroids, inertia = kmeans_fit(emb, k=4, max_iters=10)
    again, inertia2 = kmeans_fit(emb, k=4, max_iters=20)
    assert abs(inertia - inertia2) < 1e-6 * max(inertia, 1.0)


def test_recovers_planted_clusters(planted):
    emb, _ = planted
    centroids, _ = kmeans_fit(emb, k=4, max_iters=10)
    assigned = kmeans_assign(emb, centroids).select("vec_id", "cid").collect()
    # purity: within each fitted cluster, the dominant true label
    # (vec_id % 4) should own nearly every member
    by_cid: dict[int, list[int]] = {}
    for r in assigned:
        by_cid.setdefault(r.cid, []).append(r.vec_id % 4)
    total = sum(len(v) for v in by_cid.values())
    dominant = sum(max(v.count(lbl) for lbl in set(v)) for v in by_cid.values())
    assert dominant / total >= 0.95, f"purity {dominant / total}"


def test_registered_query_runs(spark, sf_small):
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out = REGISTRY["cluster_kmeans_embeddings"].fn(spark, sf_small).collect()
    assert len(out) >= 1
    assert sum(r.n_vectors for r in out) > 0


def test_semantic_dedup_matches_within_cluster_bruteforce(spark, sf_small):
    """Every emitted pair is same-cluster with cosine >= threshold, and
    no qualifying same-cluster pair is missed (exact within clusters)."""
    import itertools
    import math

    from tripl_spark.operators.clustering import SEM_THRESHOLD
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    got = {
        (r.id_a, r.id_b): (r.cid, r.cosine)
        for r in REGISTRY["dedup_semantic_clusters"].fn(spark, sf_small).collect()
    }
    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = kmeans_2iter_centroids(emb)
    assigned = {
        r.vec_id: (r.cid, r.v) for r in _assign_round(emb, cent).collect()
    }
    expect = {}
    for (ia, (ca, va)), (ib, (cb, vb)) in itertools.combinations(
        sorted(assigned.items()), 2
    ):
        if ca != cb:
            continue
        dot = sum(x * y for x, y in zip(va, vb))
        cos = round(dot / math.sqrt(sum(x * x for x in va) * sum(y * y for y in vb)), 4)
        if cos >= SEM_THRESHOLD:
            expect[(ia, ib)] = ca
    assert set(got) == set(expect)
    for pair, (cid, cos) in got.items():
        assert cid == expect[pair]
        assert cos >= SEM_THRESHOLD


def test_semantic_dedup_max_cluster_cap(spark):
    """Clusters above the cap are dropped from the pair stage; capped
    output is exactly the uncapped output minus the fat cluster."""
    from tripl_spark.operators.clustering import semantic_dedup_pairs

    # cid 0: 6 identical vectors (a degenerate blob), cid 1: 2 identical
    rows = [(i, [1.0, 0.0], 0) for i in range(6)] + [(10, [0.0, 1.0], 1), (11, [0.0, 1.0], 1)]
    assigned = spark.createDataFrame(rows, "vec_id long, v array<double>, cid int")
    uncapped = semantic_dedup_pairs(assigned, threshold=0.9)
    capped = semantic_dedup_pairs(assigned, threshold=0.9, max_cluster=5)
    assert uncapped.count() == 15 + 1  # C(6,2) + C(2,2)
    got = [(r.id_a, r.id_b) for r in capped.collect()]
    assert got == [(10, 11)]


def test_semantic_dedup_arrow_twin_matches_expression_path(spark, sf_small):
    """The numpy-GEMM production twin emits the same pairs (and 4-dp
    cosines) as the oracled expression path on the real embeddings."""
    from tripl_spark.operators.clustering import (
        semantic_dedup_pairs,
        semantic_dedup_pairs_arrow,
    )

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = _assign_round(emb, kmeans_2iter_centroids(emb)).select(
        "vec_id", "v", "cid"
    )
    expr = {
        (r.id_a, r.id_b): (r.cid, r.cosine)
        for r in semantic_dedup_pairs(assigned).collect()
    }
    arrow = {
        (r.id_a, r.id_b): (r.cid, r.cosine)
        for r in semantic_dedup_pairs_arrow(assigned).collect()
    }
    assert set(expr) == set(arrow)
    for k in expr:
        assert expr[k][0] == arrow[k][0], k
        assert abs(expr[k][1] - arrow[k][1]) < 1e-9, k


def test_semantic_pipeline_handles_tiny_corpora(spark):
    """Fewer vectors than K2 seeds: training, assignment, pair stages
    and the arrow twin must all degrade gracefully, not crash."""
    from tripl_spark.operators.clustering import (
        semantic_dedup_pairs,
        semantic_dedup_pairs_arrow,
        semantic_index,
        semantic_match_new,
    )

    emb = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [1.0] * 64), (2, [-1.0] * 64)],
        "vec_id long, v array<double>",
    )
    cent = kmeans_2iter_centroids(emb)
    assert cent.count() <= 3
    assigned = _assign_round(emb, cent).select("vec_id", "v", "cid")
    assert assigned.count() == 3
    pairs = semantic_dedup_pairs(assigned, threshold=0.9).collect()
    arrow = semantic_dedup_pairs_arrow(assigned, threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(r.id_a, r.id_b) for r in arrow}
    # identical vectors 0/1 match; the opposite vector never does
    assert (0, 1) in {(r.id_a, r.id_b) for r in pairs}
    # incremental path over the tiny index
    idx = semantic_index(emb.filter(F.col("vec_id") < 2), cent)
    m = semantic_match_new(emb.filter(F.col("vec_id") >= 2), idx, cent, threshold=0.9)
    assert m.count() == 0


# ---------------------------------------------------------------------------
# Scale gates: the registered semantic-dedup paths are bounded BY DEFAULT
# (VERDICT r5 §What's-wrong #1) — no within-cluster join runs uncapped
# unless a caller explicitly passes max_cluster=None.
# ---------------------------------------------------------------------------


def test_semantic_default_max_cluster_is_bounded():
    """Introspection gate: every semantic pair/index entry point caps
    at SEM_MAX_CLUSTER by default. A regression to None here silently
    reintroduces the Σ|cluster|² quadratic blowup at scale."""
    import inspect

    from tripl_spark.operators.clustering import (
        SEM_MAX_CLUSTER,
        semantic_dedup_pairs,
        semantic_dedup_pairs_arrow,
        semantic_index,
    )

    for fn in (semantic_dedup_pairs, semantic_dedup_pairs_arrow, semantic_index):
        default = inspect.signature(fn).parameters["max_cluster"].default
        assert default == SEM_MAX_CLUSTER, fn.__name__


@pytest.fixture(scope="module")
def fat_cluster(spark):
    """cid 0: SEM_MAX_CLUSTER+1 members (degenerate), cid 1: 2 members."""
    from tripl_spark.operators.clustering import SEM_MAX_CLUSTER

    rows = [(i, [1.0, 0.0], 0) for i in range(SEM_MAX_CLUSTER + 1)]
    rows += [(100_000, [0.0, 1.0], 1), (100_001, [0.0, 1.0], 1)]
    return spark.createDataFrame(rows, "vec_id long, v array<double>, cid int")


def test_semantic_pairs_default_drops_degenerate_cluster(fat_cluster):
    from tripl_spark.operators.clustering import (
        semantic_dedup_pairs,
        semantic_dedup_pairs_arrow,
    )

    got = [(r.id_a, r.id_b) for r in semantic_dedup_pairs(fat_cluster, threshold=0.9).collect()]
    assert got == [(100_000, 100_001)]
    got_arrow = [
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs_arrow(fat_cluster, threshold=0.9).collect()
    ]
    assert got_arrow == [(100_000, 100_001)]


def test_semantic_index_default_excludes_degenerate_cluster(spark, fat_cluster):
    """The materialized index is the capped artifact: a degenerate
    cluster never enters it, so every consumer inherits the bound."""
    from tripl_spark.operators.clustering import semantic_index

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cv array<double>"
    )
    idx = semantic_index(fat_cluster.select("vec_id", "v"), cent)
    assert sorted(r.vec_id for r in idx.collect()) == [100_000, 100_001]


def test_semantic_oracles_replicate_the_cap():
    """Every registered semantic-dedup oracle carries the
    HAVING count(*) <= SEM_MAX_CLUSTER replica of the Spark-side cap,
    so the driver hash gate pins the BOUNDED shape."""
    from tripl_spark.operators.clustering import SEM_MAX_CLUSTER
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    for name in (
        "dedup_semantic_clusters",
        "dedup_semantic_groups",
        "dedup_incremental_semantic",
        "pipeline_semantic_curation",
    ):
        oracle = REGISTRY[name].oracle
        assert oracle is not None, name
        assert f"count(*) <= {SEM_MAX_CLUSTER}" in oracle, name
