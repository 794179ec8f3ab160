"""Iterative graph analytics over the facts frame — the PySpark-native
replacement for "GraphX triple analytics" (GraphX has no Python API;
the idiomatic equivalent is iterative DataFrame joins with checkpointing,
exactly what the pull compiler's '...' recursion does level-wise).

``reachability`` computes the transitive closure from a root frontier
over one ref attribute: repeated (frontier ⋈ edges) with a visited-set
anti-join, ``localCheckpoint`` every few rounds to cut lineage (without
it, iteration N replays joins 1..N-1 — the classic iterative-Spark
trap). Each iteration is one shuffle keyed by the join column; AQE
sizes it per-round as frontiers shrink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from tripl_spark.session import eager_checkpoint


def edges_df(facts: DataFrame, attr: str) -> DataFrame:
    """(src, dst) edge list of one ref attribute."""
    return (
        facts.filter((F.col("a") == attr) & F.col("v_str").isNotNull())
        .select(F.col("e").alias("src"), F.col("v_str").alias("dst"))
    )


def reachability(
    edges: DataFrame,
    roots: DataFrame,
    max_iters: int = 30,
    checkpoint_every: int = 4,
) -> DataFrame:
    """All (root, node, depth) pairs reachable from ``roots`` (column
    ``root``), following edges src→dst. depth 0 = the root itself;
    first visit wins (BFS layering)."""
    # materialize edges once: every round probes this frame, and an
    # un-checkpointed edge list re-runs its upstream plan (scans,
    # distincts) per round
    edges = edges.transform(eager_checkpoint)
    visited = roots.select(
        F.col("root"), F.col("root").alias("node"), F.lit(0).alias("depth")
    )
    frontier = visited
    for i in range(1, max_iters + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select("root", F.col("dst").alias("node"), F.lit(i).alias("depth"))
            .distinct()
        )
        nxt = nxt.join(
            visited.select(F.col("root").alias("__vr"), F.col("node").alias("__vn")),
            (nxt.root == F.col("__vr")) & (nxt.node == F.col("__vn")),
            "left_anti",
        )
        # materialize every round; the emptiness check rides the eager
        # checkpoint's job as an observed metric (one action per round),
        # and lineage stays flat (without the checkpoint, round N
        # replays joins 1..N-1)
        obs = Observation(f"reach_round_{i}")
        nxt = nxt.observe(obs, F.count(F.lit(1)).alias("n")).transform(eager_checkpoint)
        if obs.get["n"] == 0:
            break
        if checkpoint_every and i % checkpoint_every == 0:
            visited = visited.unionByName(nxt).transform(eager_checkpoint)
        else:
            visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iters: int = 30,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, component) labeling of the undirected graph — component
    id is the minimum node id in the component. Hash-min label
    propagation with POINTER JUMPING: each round a node takes the min
    over its neighbors' labels AND its label's own label (path
    doubling), so convergence needs O(log diameter) rounds, not
    O(diameter) — on a cluster, rounds are the dominant cost (a shuffle
    each), and halving-the-halving matters more than per-round work.
    Convergence detection is free: labels only ever DECREASE, so the
    labeling is a fixpoint exactly when sum(comp) stops changing — and
    that sum rides the per-round checkpoint materialization as an
    ``observe()`` metric (the same in-plan treatment pagerank's
    dangling mass got), so each round runs exactly ONE job: no separate
    convergence-check action, no comparison join. Used by dedup
    pipelines to cluster candidate pairs into duplicate groups."""
    # materialize the symmetrized edge list ONCE — every round joins
    # against it, and without the checkpoint each round re-runs the
    # union+distinct from the source scan
    sym = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .transform(eager_checkpoint)
    )
    # the ITERATION runs over edge-incident nodes only — in the dedup
    # use the pair graph is dup-rate-sized while `nodes` is the whole
    # corpus, and labeling the corpus per round would drag it through
    # every shuffle of every round (measured: the video group resolver
    # spent most of its 7.7 s there at sf0.1). Isolated nodes can never
    # change their own-min label, so they join AFTER convergence as
    # one membership join (comp = own id).
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .transform(eager_checkpoint)
    )
    prev_sum = None
    for _i in range(1, max_iters + 1):
        neigh = sym.join(labels, sym.dst == labels.node).select(
            F.col("src").alias("node"), "comp"
        )
        # pointer jump: node → comp → comp's comp (labels are node ids,
        # so the label table joins onto itself)
        jump = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.comp") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.comp").alias("comp"))
        )
        # the convergence scalar is an observed metric of the eager
        # checkpoint's own job — one action per round, no extra collect.
        # Summing xxhash64(comp) is TYPE-AGNOSTIC: node ids (and hence
        # labels) are frequently strings (edges_df emits uuid eids),
        # where sum("comp") would crash under ANSI or null out and
        # falsely converge under non-ANSI. Labels only ever decrease
        # (min-combining), so an unchanged hash sum across rounds means
        # an unchanged labeling up to a vanishing collision-cancel
        # probability (~2^-64 per pair of changed labels).
        obs = Observation(f"cc_round_{_i}")
        labels = (
            neigh.unionByName(jump)
            .unionByName(labels.select("node", "comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .observe(
                obs,
                # decimal(38,0) accumulator: random 64-bit hashes overflow
                # a LONG sum (ANSI arithmetic) after a handful of rows
                F.sum(F.xxhash64("comp").cast("decimal(38,0)")).alias("comp_sum"),
            )
            .transform(eager_checkpoint)
        )
        cur_sum = obs.get["comp_sum"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if nodes is not None:
        # isolated nodes (degree 0) get a singleton component; a FULL
        # join keeps edge nodes even when the caller's universe misses
        # them (the pre-r9 union semantics)
        uni = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        labels = uni.join(labels, "node", "full").select(
            "node", F.coalesce("comp", F.col("node")).alias("comp")
        )
    return labels


def pagerank(
    edges: DataFrame,
    iters: int = 6,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous power iterations with
    uniform initialization — the standard formulation with dangling-mass
    redistribution:

        rank'(n) = (1-d)/N + d * (Σ_{src→n} rank(src)/outdeg(src) + D/N)

    where D is the summed rank of dangling (no-out-edge) nodes. Fixed
    iteration count keeps the computation deterministic and oracle-
    replicable (an unrolled-CTE SQL computes the same arithmetic).

    Scale shape: per iteration one shuffle keyed by dst for the
    contribution aggregation plus a broadcast of two scalars (N, D);
    the edge list with precomputed out-degrees is checkpointed once and
    re-probed every round. Ranks only — no per-node state beyond one
    double — so the iteration frame stays narrow at any node count.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(eager_checkpoint)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty edge set: no nodes, no ranks (1/N below would divide by 0)
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # edges with the source's out-degree attached: the per-round probe side
    ed = edges.join(outdeg, "src").transform(eager_checkpoint)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # dangling mass stays IN-PLAN as a broadcast 1-row frame (a
        # scalar-subquery shape) instead of a per-round .collect() —
        # halves the job count per iteration; the arithmetic (and the
        # oracle hash) is unchanged
        dangling_df = (
            ranks.join(outdeg, ranks.node == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dangling") / n_nodes
                    )
                ).alias("rank"),
            )
            .transform(eager_checkpoint)
        )
    return ranks
