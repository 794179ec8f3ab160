"""Error-bound tests for the approximate operators and a hand-checkable
as-of join case."""

from __future__ import annotations

from tripl_spark.operators.asof import asof_join
from tripl_spark.queries.registry import all_queries


def test_approx_distinct_error_bound(spark, sf_medium):
    # the registered query uses the repo's 64-register SQL-replicable
    # HLL (rsd ~ 1.04/sqrt(64) ~ 13%) — bound at ~2.7 sigma
    rows = all_queries()["approx_distinct_users"](spark, sf_medium).collect()
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.35, f"{r.event_type}: HLL rel err {rel_err}"

    # Spark's native HLL++ path (opaque sketch state, so not driver-
    # gated) keeps its tighter bound here
    from pyspark.sql import functions as F

    from tripl_spark.session import load_table

    native = (
        load_table(spark, sf_medium, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    )
    for r in native:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.1, f"{r.event_type}: native HLL rel err {rel_err}"


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


def test_lpa_separates_planted_communities(spark):
    """Two 4-cliques joined by a single bridge edge: synchronous LPA
    with smallest-label tie-break must converge each clique to its own
    label and NOT merge across the bridge (where connected components
    would return one label for all 8 nodes)."""
    from pyspark.sql import functions as F

    from tripl_spark.queries.graph_queries import lpa_round

    edges = []
    for base in (0, 10):
        nodes = [base + i for i in range(4)]
        edges += [(a, b) for a in nodes for b in nodes if a < b]
    edges.append((3, 10))  # the bridge
    e = spark.createDataFrame(edges, "src long, dst long")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes_df = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes_df.select("node", F.col("node").alias("label"))
    for _ in range(3):
        labels = lpa_round(sym, labels)
    got = {r["node"]: r["label"] for r in labels.collect()}
    left = {got[n] for n in (0, 1, 2, 3)}
    right = {got[n] for n in (10, 11, 12, 13)}
    assert left == {0}, got      # clique A converges to min label 0
    assert right == {10}, got    # clique B keeps ITS min label
    assert left != right


def test_lpa_round_is_synchronous_and_isolated_nodes_keep_labels(spark):
    from pyspark.sql import functions as F

    from tripl_spark.queries.graph_queries import lpa_round

    # path graph 1-2-3 plus isolated node 9
    sym = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (9, 9)], "node long, label long"
    )
    got = {r["node"]: r["label"] for r in lpa_round(sym, labels).collect()}
    # synchronous: everyone votes on the OLD labels — 1 sees {2},
    # 2 sees {1,3} (tie -> 1), 3 sees {2}; 9 has no neighbors
    assert got == {1: 2, 2: 1, 3: 2, 9: 9}


def test_label_propagation_fixpoint_and_oscillation_guard(spark):
    from pyspark.sql import functions as F

    from tripl_spark.queries.graph_queries import label_propagation

    # planted cliques with a bridge: converges to two communities well
    # before max_iters
    edges = []
    for base in (0, 10):
        ns = [base + i for i in range(4)]
        edges += [(a, b) for a in ns for b in ns if a < b]
    edges.append((3, 10))
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(e).collect()}
    assert {got[n] for n in (0, 1, 2, 3)} == {0}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}

    # single edge: synchronous LPA 2-cycles (1<->2 swap labels every
    # round) — the oscillation guard must terminate the loop anyway
    pair = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = label_propagation(pair, max_iters=50).collect()
    assert len(out) == 2
    assert {r["label"] for r in out} <= {1, 2}


def test_label_propagation_strict_raises_on_exhausted_cap(spark):
    """A 'converged' run must never mislabel an intermediate state: a
    long path graph mixes slower than a 2-round cap, so strict mode
    raises; strict=False returns the bounded prefix explicitly."""
    import pytest

    from tripl_spark.queries.graph_queries import label_propagation

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint or 2-cycle"):
        label_propagation(path, max_iters=2)
    assert label_propagation(path, max_iters=2, strict=False).count() == 31
