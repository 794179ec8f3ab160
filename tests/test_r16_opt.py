"""Round-16 optimization pins: every change ships with a bit-exactness
or behavior test vs the verbatim old composition (the r15 discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF_DIR


def test_eager_checkpoint_local_path(spark):
    """Without a configured checkpoint dir (the local default), the
    helper must behave exactly like localCheckpoint: same rows, lineage
    truncated (the physical plan bottoms out in an RDD scan, no
    parquet scan left)."""
    from tripl_spark.session import eager_checkpoint, load_table

    assert spark.sparkContext.getCheckpointDir() is None
    df = load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    out = eager_checkpoint(df)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan and "parquet" not in plan.lower()


def test_eager_checkpoint_dispatches_to_reliable(spark, monkeypatch, tmp_path):
    """With a checkpoint dir configured, the helper must take the
    RELIABLE checkpoint() path (cluster contract: survives executor
    loss), not localCheckpoint. Dispatch is pinned by intercepting both
    methods; the real reliable write is exercised end-to-end below."""
    from tripl_spark.session import eager_checkpoint, load_table

    calls = []
    df = load_table(spark, SF_DIR, "nation")
    monkeypatch.setattr(
        type(df), "checkpoint", lambda self, eager=True: calls.append("reliable") or self
    )
    monkeypatch.setattr(
        type(df), "localCheckpoint", lambda self, eager=True: calls.append("local") or self
    )
    monkeypatch.setattr(
        type(spark.sparkContext), "getCheckpointDir", lambda self: str(tmp_path)
    )
    eager_checkpoint(df)
    monkeypatch.setattr(type(spark.sparkContext), "getCheckpointDir", lambda self: None)
    eager_checkpoint(df)
    assert calls == ["reliable", "local"]


def test_load_table_memo_is_lazy_and_exact(spark):
    """The per-session load_table memo must hand back a LAZY,
    unpersisted plan reference (no result caching — every action still
    scans parquet) whose rows equal a fresh uncached read; distinct
    (dir, table) keys stay distinct."""
    from pyspark import StorageLevel

    from tripl_spark.session import _load_table_uncached, load_table

    a = load_table(spark, SF_DIR, "nation")
    assert load_table(spark, SF_DIR, "nation") is a          # memo hit
    assert a.storageLevel == StorageLevel.NONE               # nothing persisted
    fresh = _load_table_uncached(spark, SF_DIR, "nation")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, fresh.collect()))
    b = load_table(spark, SF_DIR, "region")
    assert b is not a


def test_fused_codebook_matches_two_job_build(spark):
    """The r16 one-job codebook build (in-plan broadcast seed array,
    map-only transform/array_min assignment) must reproduce the r15
    two-job composition (k-row seed collect + literal-rendered
    assignment) bit-for-bit on the real embeddings."""
    from tripl_spark.operators.clustering import (
        EMB_DIM,
        K2,
        _assign_literal,
        kmeans_2iter_centroid_rows,
    )
    from tripl_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # verbatim old composition
    seeds = sorted(
        (int(r["vec_id"]), list(r["v"]))
        for r in emb.filter(F.col("vec_id") < K2).select("vec_id", "v").collect()
    )
    a1 = _assign_literal(emb, seeds)
    c1 = a1.groupBy("cid").agg(
        F.expr(
            "array("
            + ", ".join(f"round(avg(v[{i}]), 6)" for i in range(EMB_DIM))
            + ") AS cv"
        )
    )
    old = sorted((int(r["cid"]), list(r["cv"])) for r in c1.collect())
    assert kmeans_2iter_centroid_rows(emb) == old


def test_semantic_arrow_twin_plan_is_arrow_batched(spark):
    """The production GEMM twin (semantic_dedup_pairs_arrow) must plan
    as an Arrow-batched grouped-map stage (FlatMapGroupsInPandas) with
    NO row-at-a-time BatchEvalPython anywhere — the 100 TB path's
    Python boundary is batch-vectorized by construction. Results must
    match the oracle-gated expression kernel row-for-row (the r15
    equivalence test pins values; this pins the plan shape)."""
    from tripl_spark.operators.clustering import (
        _assign_literal,
        kmeans_2iter_centroid_rows,
        semantic_dedup_pairs,
        semantic_dedup_pairs_arrow,
    )
    from tripl_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = _assign_literal(emb, kmeans_2iter_centroid_rows(emb)).select(
        "vec_id", "v", "cid"
    )
    arrow = semantic_dedup_pairs_arrow(assigned)
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    exact = {
        (r.id_a, r.id_b, r.cid, r.cosine)
        for r in semantic_dedup_pairs(assigned).collect()
    }
    assert {(r.id_a, r.id_b, r.cid, r.cosine) for r in arrow.collect()} == exact


def test_eager_checkpoint_reliable_end_to_end(spark, tmp_path):
    """Real reliable checkpoint: set a checkpoint dir, run an iterative
    consumer (graph reachability — one of the swept call sites), check
    rows match the local-mode result, then restore the no-dir state."""
    from tripl_spark.plans.graph import connected_components
    from tripl_spark.session import local_df

    edges = local_df(
        spark,
        [(1, 2), (2, 3), (10, 11)],
        "src long, dst long",
    )
    local_rows = sorted(map(tuple, connected_components(edges).collect()))
    sc = spark.sparkContext
    try:
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        reliable_rows = sorted(map(tuple, connected_components(edges).collect()))
    finally:
        # reset so the rest of the (session-scoped) suite keeps the
        # cheap localCheckpoint path
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.apply(None))
    assert reliable_rows == local_rows
    assert sc.getCheckpointDir() is None
