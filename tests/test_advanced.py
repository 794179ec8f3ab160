"""Error-bound tests for the approximate operators and a hand-checkable
as-of join case."""

from __future__ import annotations

from tripl_spark.operators.asof import asof_join
from tripl_spark.queries.registry import all_queries


def test_approx_distinct_error_bound(spark, sf_medium):
    rows = all_queries()["approx_distinct_users"](spark, sf_medium).collect()
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.1, f"{r.event_type}: HLL rel err {rel_err}"


def test_approx_quantile_error_bound(spark, sf_medium):
    rows = all_queries()["approx_quantiles_value"](spark, sf_medium).collect()
    for r in rows:
        denom = max(abs(r.exact_median), 1e-9)
        assert abs(r.approx_median - r.exact_median) / denom < 0.05


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 200), (3, "u2", 50)],
        "event_id long, user_id string, ts long",
    )
    right = spark.createDataFrame(
        [(10, "u1", 100, 1.0), (11, "u1", 150, 2.0), (12, "u2", 60, 3.0)],
        "event_id long, user_id string, ts long, value double",
    )
    out = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_join(
            left, right, ts="ts", by="user_id",
            right_cols=["event_id", "value"], tiebreak="event_id",
        ).collect()
    }
    assert out[1] == (10, 1.0)   # equal ts matches (>= semantics)
    assert out[2] == (11, 2.0)   # most recent prior
    assert out[3] == (None, None)  # no purchase at-or-before ts=50


def test_k_core_fixpoint_on_crafted_graph(spark):
    """k=2 core of a triangle with two pendant chains: the triangle
    survives, every pendant node peels — including the chain node
    whose degree only drops below k AFTER its neighbor peels (the case
    a single pass gets wrong)."""
    from tripl_spark.queries.graph_queries import k_core

    # triangle 1-2-3; chain 3-4-5 (4 and 5 must peel in successive
    # rounds); isolated-ish pendant 1-6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (1, 6)],
        "lo long, hi long",
    )
    core = {(r.node, r.degree) for r in k_core(edges, k=2).collect()}
    assert core == {(1, 2), (2, 2), (3, 2)}


def test_k_core_is_subset_of_2peel(spark, sf_small):
    """The true fixpoint core is contained in the fixed-2-round peel
    (each extra round only removes nodes)."""
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tripl_spark.queries.graph_queries import KCORE_K, k_core
    from pyspark.sql import functions as F
    from tripl_spark.session import load_table

    _ensure_loaded()
    two_peel = {
        r.node for r in REGISTRY["graph_kcore_2peel"].fn(spark, sf_small).collect()
    }
    users = load_table(spark, sf_small, "events").select(
        F.col("user_id").alias("u")
    ).distinct()
    raw = (
        users.filter(F.col("u") > 1)
        .select("u", F.floor(F.col("u") / 2).cast("long").alias("b"))
        .union(
            users.filter(F.col("u") > 2)
            .select("u", F.floor(F.col("u") / 3).cast("long").alias("b"))
        )
    )
    member = users.select(F.col("u").alias("__m"))
    edges = (
        raw.join(member, raw.b == F.col("__m"), "left_semi")
        .select(
            F.least(F.col("u"), F.col("b")).alias("lo"),
            F.greatest(F.col("u"), F.col("b")).alias("hi"),
        )
        .distinct()
    )
    full = {r.node for r in k_core(edges, k=KCORE_K).collect()}
    assert full <= two_peel
