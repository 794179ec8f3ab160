"""Invariants for the iterative (rows-only) graph queries — the
discipline `cluster_kmeans_embeddings` set: the hash-gated prefix query
(`graph_lpa_2round`) pins the per-round algebra against DuckDB, and the
converged run is pinned by structural invariants instead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.queries.graph_queries import (
    lpa_round,
    purchase_ancestry_graph,
)
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


@pytest.fixture(scope="module")
def lpa_state(spark, sf_small):
    from tripl_spark.queries.graph_queries import lpa_converged_labels

    nodes, edges = purchase_ancestry_graph(spark, sf_small)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    converged = lpa_converged_labels(spark, sf_small)
    return nodes, sym, {(r.node, r.community) for r in converged.collect()}


def test_lpa_conservation_projection_matches_the_run(spark, sf_small, lpa_state):
    """The registered hash-gated projection must summarize the SAME
    run: node universe, all labels within-component (recomputed here
    from scratch), and isolated nodes self-labeled."""
    nodes, sym, state = lpa_state
    gate = REGISTRY["graph_lpa_converged"].fn(spark, sf_small).collect()
    assert len(gate) == 1
    g = gate[0]
    assert g["n_nodes"] == len(state)
    assert g["labels_within_component"] == g["n_nodes"]
    assert g["n_isolated_selflabeled"] == g["n_isolated"]
    touched = {r.src for r in sym.collect()}
    iso = {n for n, _ in state} - touched
    assert g["n_isolated"] == len(iso)
    full = dict(state)
    assert all(full[n] == n for n in iso)


def test_lpa_converged_one_label_per_node_and_labels_are_node_ids(lpa_state):
    nodes, _sym, state = lpa_state
    node_ids = {r.node for r in nodes.collect()}
    assert {n for n, _ in state} == node_ids          # exactly the node set
    assert len(state) == len(node_ids)                # one label per node
    assert {c for _, c in state} <= node_ids          # labels are node ids


def test_lpa_converged_state_is_round_squared_stable(spark, lpa_state):
    # terminal for synchronous LPA means fixpoint OR 2-cycle; both
    # satisfy round(round(s)) == s (a fixpoint trivially, a 2-cycle by
    # definition) — one more double-step must reproduce the state
    _nodes, sym, state = lpa_state
    labels = spark.createDataFrame(
        [(n, c) for n, c in state], "node long, label long"
    )
    stepped = lpa_round(sym, lpa_round(sym, labels))
    assert {(r.node, r.label) for r in stepped.collect()} == state


def test_lpa_converged_agrees_with_earliest_terminal_prefix(
    spark, sf_small, lpa_state
):
    # per-component terminality: once a component's labels satisfy
    # l_k == l_{k+2} the component is in its terminal fixpoint-or-
    # 2-cycle (labels depend only on within-component neighbors, and
    # the ancestry tree is bipartite, so 2-cycles are the NORM here,
    # not the exception). The converged run must land on one COHERENT
    # phase of that terminal orbit for the whole component — l_k or
    # l_{k+1} exactly, never a mix of phases
    from tripl_spark.plans.graph import connected_components
    from tripl_spark.session import eager_checkpoint

    nodes, sym, state = lpa_state
    comp = {
        r.node: r.comp
        for r in connected_components(
            sym.filter(F.col("src") < F.col("dst")), nodes=nodes
        ).collect()
    }
    full = dict(state)
    labels = nodes.select("node", F.col("node").alias("label"))
    hist = [{r.node: r.label for r in labels.collect()}]
    for _k in range(1, 9):
        # cut lineage between rounds: without the checkpoint, round k's
        # collect replays rounds 1..k-1 (quadratic re-execution — this
        # single test was 65 s of the suite); rows are identical
        labels = eager_checkpoint(lpa_round(sym, labels))
        hist.append({r.node: r.label for r in labels.collect()})
    by_comp: dict = {}
    for n, c in comp.items():
        by_comp.setdefault(c, []).append(n)
    checked = 0
    for c, members in by_comp.items():
        for k in range(len(hist) - 2):
            lk, lk1, lk2 = hist[k], hist[k + 1], hist[k + 2]
            if all(lk[n] == lk2[n] for n in members):  # terminal at k
                phase_a = all(full[n] == lk[n] for n in members)
                phase_b = all(full[n] == lk1[n] for n in members)
                assert phase_a or phase_b, (
                    c, {n: (full[n], lk[n], lk1[n]) for n in members},
                )
                checked += 1
                break
    assert checked > 0, "no component reached its terminal orbit in 8 rounds"


# -- personalized PageRank fixpoint invariants --------------------------------


@pytest.fixture(scope="module")
def ppr_state(spark, sf_small):
    from pyspark.sql import functions as F

    from tripl_spark.queries.graph_queries import ppr_graph, ppr_step

    pn, seed = ppr_graph(spark, sf_small)
    r = spark.range(1).select(F.lit(seed).alias("node"), F.lit(1.0).alias("v"))
    for _ in range(40):
        nxt = ppr_step(spark, pn, seed, r).localCheckpoint(eager=True)
        resid = (
            nxt.join(r.withColumnRenamed("v", "pv"), "node", "full")
            .select(
                F.abs(
                    F.coalesce(F.col("v"), F.lit(0.0))
                    - F.coalesce(F.col("pv"), F.lit(0.0))
                ).alias("d")
            )
            .agg(F.max("d"))
            .collect()[0][0]
        )
        r = nxt
        if resid is not None and resid < 1e-12:
            break
    return pn, seed, r


def test_ppr_mass_is_conserved(ppr_state):
    from pyspark.sql import functions as F

    _pn, _seed, r = ppr_state
    total = r.agg(F.sum("v")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_ppr_converged_vector_satisfies_fixpoint_equation(spark, ppr_state):
    from pyspark.sql import functions as F

    from tripl_spark.queries.graph_queries import ppr_step

    pn, seed, r = ppr_state
    again = ppr_step(spark, pn, seed, r)
    resid = (
        again.join(r.withColumnRenamed("v", "pv"), "node", "full")
        .select(
            F.abs(
                F.coalesce(F.col("v"), F.lit(0.0))
                - F.coalesce(F.col("pv"), F.lit(0.0))
            ).alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert resid < 1e-10


def test_ppr_converged_agrees_with_gated_two_step_on_the_seed(spark, sf_small, ppr_state):
    """The seed dominates its own PPR (rank 1 in both the converged
    vector and the hash-gated 2-step), every score is in (0, 1], and
    the registered conservation projection matches the vector it
    summarizes (seed, support size, unit mass)."""
    from pyspark.sql import functions as F

    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    _pn, seed, r = ppr_state
    two = REGISTRY["graph_ppr_related_parts"].fn(spark, sf_small).collect()
    conv_vec = sorted(r.collect(), key=lambda x: (-x["v"], x["node"]))
    assert two[0]["part"] == seed == conv_vec[0]["node"]
    assert all(0 < row["ppr"] <= 1 for row in two)
    assert all(0 < row["v"] <= 1 for row in conv_vec)
    gate = REGISTRY["graph_ppr_converged"].fn(spark, sf_small).collect()
    assert len(gate) == 1
    assert gate[0]["seed_part"] == seed
    assert gate[0]["n_parts"] == len(conv_vec)
    assert gate[0]["total_mass"] == 1.0


def test_lpa_keeps_isolated_nodes_self_labeled(spark):
    """The isolated-node law the registered projection gates is
    vacuous on the ancestry graph (no isolated purchasers at test SFs)
    — plant one: a node with no edges must survive the vote join with
    its own id as its label, at every round and at convergence."""
    from tripl_spark.queries.graph_queries import label_propagation

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (3,), (99,)], "node long")
    got = {
        r.node: r.label
        for r in label_propagation(edges, nodes=nodes, max_iters=10).collect()
    }
    assert 99 in got and got[99] == 99
    assert set(got) == {1, 2, 3, 99}
    assert all(lbl in {1, 2, 3} for n, lbl in got.items() if n != 99)
