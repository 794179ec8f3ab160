"""Distributed k-means (Lloyd's) over embedding columns — the
iterative-ML counterpart of the graph ops, and the trained-codebook
companion to the deterministic IVF/PQ indexes (their docstrings say
"swap for k-means centroids in production"; this is that k-means).

Scale shape per iteration: assignment is a broadcast join of k
centroids onto the vectors (k ≪ n, so the corpus never shuffles for
assignment) followed by one argmin window per vector, and the update
is ONE aggregation computing all d per-dimension means as codegen'd
``avg`` columns — no explode, no per-dimension shuffle. Centroids
(k×d doubles) round-trip through the driver between rounds, which is
the textbook design: they are the only global state and they are tiny.
Initialization is deterministic (first k vectors), so runs reproduce.

Iterative algorithms are not SQL-expressible, so the registered query
is rows-only; correctness is proven by ``tests/test_clustering.py``:
monotone inertia, a fixpoint under convergence, and planted-center
recovery on clustered synthetic data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.operators.similarity import DIM, N_QUERIES, TOP_K, _ssq, cosine
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table


def _centroid_frame(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    from tripl_spark.session import local_df

    return local_df(
        spark,
        [(i, list(map(float, c))) for i, c in enumerate(centroids)],
        "cid int, cv array<double>",
    )


def kmeans_assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, v, cid, dist2): each vector's nearest centroid."""
    cent = _centroid_frame(emb.sparkSession, centroids)
    w = Window.partitionBy("vec_id").orderBy("dist2", "cid")
    return (
        emb.join(F.broadcast(cent))
        .select("vec_id", "v", "cid", _ssq(F.col("v"), F.col("cv")).alias("dist2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    max_iters: int = 10,
    tol: float = 1e-6,
) -> tuple[list[list[float]], float]:
    """Lloyd's iterations from deterministic seeds (the first k vectors
    by vec_id). Returns (centroids, inertia). Stops when the total
    squared centroid shift falls below tol."""
    dim = len(emb.select("v").first()["v"])
    centroids = [
        r["v"]
        for r in emb.orderBy("vec_id").limit(k).select("v").collect()
    ]
    inertia = float("inf")
    for _ in range(max_iters):
        assigned = kmeans_assign(emb, centroids)
        stats = (
            assigned.groupBy("cid")
            .agg(
                *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)],
                F.sum("dist2").alias("sse"),
            )
            .collect()
        )
        new_centroids = list(centroids)
        inertia = float(sum(r["sse"] for r in stats))
        for r in stats:  # empty clusters keep their previous centroid
            new_centroids[r["cid"]] = [r[f"m{i}"] for i in range(dim)]
        shift = sum(
            (a - b) * (a - b)
            for old, new in zip(centroids, new_centroids)
            for a, b in zip(old, new)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, inertia


K2 = 8
# the embeddings table dimensionality — one definition (similarity.DIM),
# re-exported under the name the SQL CTEs were written against
EMB_DIM = DIM


def _assign_round(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Assignment with 4-dp-rounded distances and cid tie-break —
    deterministic across engines (same rounding + tie rule as the IVF
    oracle). Returns (vec_id, v, cid, d2).

    argmin is a ``min_by`` over the (d2, cid) struct (lexicographic =
    the oracle's row_number ORDER BY d2, cid), not a ranking window:
    the aggregate partial-combines map-side, so the one shuffle moves
    at most one candidate row per (vector, partition) instead of all
    k scored rows, and there is no per-vector sort. ``v`` rides in the
    payload struct (constant per vec_id, any winner carries it).

    This is the DataFrame-codebook variant (streaming keeps it: its
    codebook is a checkpointed frame reused across micro-batches).
    Batch query paths use ``_assign_literal`` — same argmin over a
    DRIVER-RESIDENT codebook, zero Exchange."""
    scored = emb.join(F.broadcast(cent)).select(
        "vec_id", "v", "cid",
        F.round(_ssq(F.col("v"), F.col("cv")), 4).alias("d2"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min_by(
            F.struct("v", "cid", "d2"), F.struct("d2", "cid")
        ).alias("b")
    )
    return best.select("vec_id", "b.v", "b.cid", "b.d2")


CentroidRows = list[tuple[int, list[float]]]


def _score_array(cents: CentroidRows) -> F.Column:
    """array<struct<d2,cid>>: the rounded squared distance from ``v``
    to every centroid of a driver-resident codebook, cid-ordered.
    Struct field order (d2 first, cid second) makes the array's
    lexicographic element ordering exactly the oracle's
    ``ORDER BY d2, cid`` — so ``array_min`` IS the assignment argmin
    and ``array_sort`` IS the probe ranking.

    Rendered as ONE SQL expression string (single ``F.expr`` py4j
    call): the per-``F.lit`` builder issued k×d+ round trips — 1.4 s
    of measured driver latency per assignment site at k=8, d=64 —
    for the same expression tree (centroid doubles re-enter bit-exact
    via ``repr``'s shortest round-trip decimal through a string cast;
    the zip_with/aggregate arithmetic is the identical index-order
    summation ``_ssq`` builds)."""
    structs = []
    for cid, cv in cents:
        arr = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in cv)
        d2 = (
            f"round(aggregate(zip_with(v, array({arr}), "
            f"(p, q) -> (p - q) * (p - q)), "
            f"CAST(0.0 AS DOUBLE), (s, z) -> s + z), 4)"
        )
        structs.append(
            f"named_struct('d2', {d2}, 'cid', CAST({int(cid)} AS BIGINT))"
        )
    return F.expr(f"array({', '.join(structs)})")


def _assign_literal(emb: DataFrame, cents: CentroidRows) -> DataFrame:
    """Map-only twin of ``_assign_round``: the codebook (k×d doubles —
    the only global state, and tiny) is embedded as literal arrays, so
    assignment is a per-row expression with ZERO Exchange. Distances,
    rounding, and the (d2, cid) tie-break are the identical expressions
    — the collected centroid doubles re-enter bit-exact via ``lit``.

    The join+min_by shape shuffled the full corpus once per
    consumption (and the semantic pair stage consumes its assignment
    three times); at 100 TB this is the difference between a map stage
    and three corpus shuffles. Returns (vec_id, v, cid, d2)."""
    best = F.array_min(_score_array(cents))
    return emb.select(
        "vec_id", "v", best["cid"].alias("cid"), best["d2"].alias("d2")
    )


def _probe_literal(emb: DataFrame, cents: CentroidRows, nprobe: int) -> DataFrame:
    """Map-only twin of the ``_assign_all_ranked``/``rn <= nprobe``
    probe: rank all k rounded distances in-row (``array_sort`` over the
    (d2, cid) structs = the oracle's row_number ordering) and explode
    only the first ``nprobe``. Returns (vec_id, v, cid)."""
    ranked = F.slice(F.array_sort(_score_array(cents)), 1, nprobe)
    return emb.select(
        "vec_id", "v", F.explode(ranked).alias("_s")
    ).select("vec_id", "v", F.col("_s.cid").alias("cid"))


# SQL CTEs replaying the seeded iteration-1 Lloyd step (shared by the
# cluster_kmeans_2iter oracle and the trained-codebook IVF oracle in
# operators/similarity.py): e = typed vectors, c0 = deterministic
# seeds, a1 = rounded-argmin assignment, c1 = 6-dp-rounded per-dim
# mean centroids.
KMEANS2_CTES = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {K2}),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c0.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_sum([ (e.v[i]-c0.cv[i])*(e.v[i]-c0.cv[i])
                                           for i in range(1, {EMB_DIM} + 1) ]), 4),
                          c0.cid) AS rn
        FROM e CROSS JOIN c0
      ) WHERE rn = 1
    ),
    c1 AS (
      SELECT cid, list(m ORDER BY dim) AS cv FROM (
        SELECT a1.cid, dim.i AS dim, round(avg(e.v[dim.i]), 6) AS m
        FROM a1 JOIN e USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, {EMB_DIM} + 1)) AS i) dim
        GROUP BY a1.cid, dim.i
      ) GROUP BY cid
    )"""


# Shared SQL relation: every vector's nearest TRAINED (c1) centroid —
# the rounded-argmin assignment each trained-codebook oracle reuses.
# {d2} optionally carries the rounded distance into the output.
def _lists_cte(with_d2: bool = False) -> str:
    d2_col = ", d2" if with_d2 else ""
    d2_sel = (
        f"round(list_sum([ (e.v[i]-c1.cv[i])*(e.v[i]-c1.cv[i])"
        f" for i in range(1, {EMB_DIM} + 1) ]), 4) AS d2," if with_d2 else ""
    )
    return f"""
    lists AS (
      SELECT vec_id, cid{d2_col} FROM (
        SELECT e.vec_id, c1.cid,
               {d2_sel}
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_sum([ (e.v[i]-c1.cv[i])*(e.v[i]-c1.cv[i])
                                           for i in range(1, {EMB_DIM} + 1) ]), 4),
                          c1.cid) AS rn
        FROM e CROSS JOIN c1
      ) WHERE rn = 1
    )"""


def kmeans_2iter_centroid_rows(emb: DataFrame) -> CentroidRows:
    """[(cid, cv)] — the iteration-1 updated centroids from
    deterministic seeds (first K2 vectors), 6-dp-rounded, materialized
    on the DRIVER (k×d doubles — the textbook k-means round trip; the
    module docstring's 'only global state, and tiny').

    ONE bounded job (r16; was two): the seeds enter the update plan as
    an in-plan broadcast 1-row array (``collect_list`` over the pushed
    ``vec_id < k`` filter — the same pruned scan the old separate
    k-row seed collect paid, now overlapped as a broadcast build), and
    assignment stays MAP-ONLY: per row, ``array_min`` over
    ``transform(cents, ...)`` scores the k seed structs with the
    identical zip_with/aggregate fold, 4-dp rounding and (d2, cid)
    tie-break the literal path uses — zero corpus Exchange, exactly as
    before (a join+min_by fusion was REJECTED: it would add a
    full-corpus vec_id shuffle the literal path never pays). Per-dim
    means are 6-dp-rounded in one ``F.expr`` parse (the r15 single-
    parse fix). Bit-exact vs the old seed-collect + literal-assign
    composition on the real embeddings at sf0.001/0.01/0.1
    (tests/test_r16_opt.py::test_fused_codebook_matches_two_job_build)."""
    seeds_arr = (
        emb.filter(F.col("vec_id") < K2)
        .select(F.col("vec_id").cast("long").alias("cid"), F.col("v").alias("cv"))
        .agg(F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cents"))
    )
    a1 = emb.crossJoin(F.broadcast(seeds_arr)).select(
        "v",
        F.array_min(
            F.expr(
                "transform(cents, c -> named_struct("
                "'d2', round(aggregate(zip_with(v, c.cv, (p, q) -> (p - q) * (p - q)), "
                "CAST(0.0 AS DOUBLE), (s, z) -> s + z), 4), "
                "'cid', c.cid))"
            )
        )["cid"].alias("cid"),
    )
    c1 = a1.groupBy("cid").agg(
        F.expr(
            "array("
            + ", ".join(f"round(avg(v[{i}]), 6)" for i in range(EMB_DIM))
            + ") AS cv"
        )
    )
    return sorted((int(r["cid"]), list(r["cv"])) for r in c1.collect())


def kmeans_2iter_centroids(emb: DataFrame) -> DataFrame:
    """(cid, cv) — the iteration-1 updated centroids from deterministic
    seeds (first K2 vectors), 6-dp-rounded: the Spark twin of the
    ``KMEANS2_CTES`` c1 relation. Materializes the rows on the driver
    (``kmeans_2iter_centroid_rows``) and returns them as a JVM-literal
    local relation — consumers that keep the DataFrame contract (the
    streaming class) get a broadcast-ready constant-folded frame with
    no training subtree left in their plans."""
    from tripl_spark.session import local_df

    rows = kmeans_2iter_centroid_rows(emb)
    return local_df(
        emb.sparkSession,
        [(cid, cv) for cid, cv in rows],
        "cid long, cv array<double>",
    )


@query(
    "cluster_kmeans_2iter",
    # Two Lloyd iterations from deterministic seeds are pure
    # arithmetic: assignment = argmin over k centroid distances
    # (4-dp-rounded, cid tie-break), update = per-cluster per-dimension
    # mean rounded to 6 dp (absorbs summation-order FP noise across
    # engines). Clusters left empty after iteration 1 drop out of the
    # centroid set on both sides (with data-seeded centroids this is
    # a theoretical edge, but the contract is explicit).
    oracle=f"""
    WITH {KMEANS2_CTES},
    a2 AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT e.vec_id, c1.cid,
               round(list_sum([ (e.v[i]-c1.cv[i])*(e.v[i]-c1.cv[i])
                                for i in range(1, {EMB_DIM} + 1) ]), 4) AS d2,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_sum([ (e.v[i]-c1.cv[i])*(e.v[i]-c1.cv[i])
                                           for i in range(1, {EMB_DIM} + 1) ]), 4),
                          c1.cid) AS rn
        FROM e CROSS JOIN c1
      ) WHERE rn = 1
    )
    SELECT cid, count(*) AS n_vectors, round(avg(d2), 4) AS mean_dist2
    FROM a2 GROUP BY cid
    """,
    doc="fixed-2-iteration deterministically-seeded k-means, hash-gated "
    "vs a DuckDB replay of both Lloyd steps (the convergence path "
    "stays in cluster_kmeans_embeddings)",
)
def cluster_kmeans_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly two Lloyd iterations (k=8, seeds = first k vectors by
    vec_id) over the embeddings table: cluster sizes and mean
    within-cluster squared distance after the second assignment.

    Same broadcast-assignment / single-agg-update shape as
    ``kmeans_fit`` (the 100 TB design is identical), but with rounded
    centroid updates and a fixed iteration count so the whole
    computation is SQL-replicable and hash-gated by the driver."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a2 = _assign_literal(emb, kmeans_2iter_centroid_rows(emb))
    return a2.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("d2"), 4).alias("mean_dist2"),
    )


KM_IVF_NPROBE = 2


@query(
    "sim_ann_ivf_kmeans",
    # IVF with TRAINED coarse centroids: the codebook is the 2-iter
    # k-means c1 relation (SQL-replicable), so the whole trained-index
    # build + search is hash-gated — the production upgrade the
    # deterministic-centroid sim_ann_ivf docstring promises ("swap for
    # k-means cluster centers"), with identical index/search mechanics.
    oracle=f"""
    WITH {KMEANS2_CTES},
{_lists_cte()},
    qprobe AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, c1.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_sum([ (q.v[i]-c1.cv[i])*(q.v[i]-c1.cv[i])
                                           for i in range(1, {EMB_DIM} + 1) ]), 4),
                          c1.cid) AS prn
        FROM e q CROSS JOIN c1 WHERE q.vec_id < {N_QUERIES}
      ) WHERE prn <= {KM_IVF_NPROBE}
    )
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT qprobe.query_id, ev.vec_id,
             round(list_cosine_similarity(qe.v, ev.v), 4) AS cosine,
             row_number() OVER (PARTITION BY qprobe.query_id
                                ORDER BY round(list_cosine_similarity(qe.v, ev.v), 4) DESC,
                                         ev.vec_id) AS rk
      FROM qprobe
      JOIN lists ON lists.cid = qprobe.cid
      JOIN e ev ON ev.vec_id = lists.vec_id AND ev.vec_id <> qprobe.query_id
      JOIN e qe ON qe.vec_id = qprobe.query_id
    )
    WHERE rk <= {TOP_K}
    """,
    doc="IVF ANN with a TRAINED coarse codebook (2-iter k-means "
    "centroids), fully hash-gated end-to-end: train + assign + "
    "probe + score all replayed in SQL",
)
def sim_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over k-means-trained coarse centroids: every vector
    joins its nearest trained centroid's inverted list; each query
    scores only its nprobe nearest lists.

    Same 100 TB shape as ``sim_ann_ivf`` — the codebook (k×d doubles)
    broadcasts, list assignment is one broadcast-join pass, lists are
    the partitioning key — but the centroids come from the Lloyd
    update instead of being the first k corpus vectors, which is what
    a production IVF index actually does."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # the trained codebook (k×d doubles) feeds BOTH the list assignment
    # and the query probe; it lives on the driver (one bounded collect)
    # so both consumers are map-only literal expressions — no training
    # subtree, no broadcast Exchange, no assignment shuffle in the plan
    cents = kmeans_2iter_centroid_rows(emb)
    lists = _assign_literal(emb, cents).select("vec_id", "v", "cid")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    qprobe = _probe_literal(queries, cents, KM_IVF_NPROBE).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        lists.join(F.broadcast(qprobe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rk")
    )


def _assign_all_ranked(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, v, cid, d2, rn): every vector × centroid scored and
    ranked (rounded d2, cid tie-break) — rn=1 is the assignment,
    rn<=nprobe is the probe set."""
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        emb.join(F.broadcast(cent))
        .select(
            "vec_id", "v", "cid",
            F.round(_ssq(F.col("v"), F.col("cv")), 4).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(w))
    )


@query("cluster_kmeans_embeddings",
       doc="distributed Lloyd's k-means over the embeddings table "
           "(iterative — rows-only; invariants in tests/test_clustering.py)")
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means over the embeddings table: cluster sizes and mean
    within-cluster distance per cluster. k comes from the production
    ``codebook_k`` rule (k ≈ n/1000, floor K2) — at test scales it
    resolves to K2, at 100 TB it keeps clusters ~10³ vectors so every
    downstream within-cluster stage stays linear in n."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    centroids, _ = kmeans_fit(emb, k=codebook_k(emb.count()), max_iters=5)
    return (
        kmeans_assign(emb, centroids)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("dist2"), 4).alias("mean_dist2"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): cluster, then near-dup only within
# clusters
# ---------------------------------------------------------------------------

SEM_THRESHOLD = 0.4
# Default within-cluster pair-join cap: clusters above this size are
# dropped (with the production k ≈ n/1000 rule below, clusters are ~10³
# vectors, so at the default nothing degenerate survives to the pair
# stage and Σ|cluster|² stays ~linear in n). Mirrors the MinHash path's
# DEFAULT_MAX_BUCKET and is replicated in every registered oracle as
# ``HAVING count(*) <= SEM_MAX_CLUSTER`` so the gate pins the BOUNDED
# shape, not an uncapped test-only variant.
SEM_MAX_CLUSTER = 1000


def codebook_k(n: int, per_cluster: int = 1000, k_min: int = K2) -> int:
    """Production codebook-size rule: k ≈ n / per_cluster, never below
    ``k_min`` — clusters stay ~10³ vectors so the SemDeDup pair stage
    is linear in corpus size. The driver-gated queries pin k = K2
    because the KMEANS2 oracle CTEs replay training with literal seeds;
    at the driver's test scales n // per_cluster < K2, so this rule
    resolves to K2 there anyway (same constant, now derived)."""
    return max(k_min, n // per_cluster)


def _capped_cte(src: str = "lists", name: str = "cl", cap: int = SEM_MAX_CLUSTER) -> str:
    """SQL fragment: ``name`` = the rows of ``src`` whose cluster has at
    most ``cap`` members — the oracle-side replica of the
    ``max_cluster`` guard every registered semantic-dedup path applies,
    so the driver hash gate pins the BOUNDED production shape."""
    return f"""
    {name} AS (
      SELECT {src}.* FROM {src}
      JOIN (SELECT cid FROM {src} GROUP BY cid
            HAVING count(*) <= {cap}) _ok_{name} USING (cid)
    )"""


def semantic_dedup_pairs(
    assigned: DataFrame,
    threshold: float = SEM_THRESHOLD,
    max_cluster: int | None = SEM_MAX_CLUSTER,
) -> DataFrame:
    """(id_a, id_b, cid, cosine) — within-cluster cosine pairs above
    ``threshold`` from an ``assigned`` frame of (vec_id, v, cid).

    ``max_cluster`` (DEFAULT ``SEM_MAX_CLUSTER`` — pass ``None`` to
    uncap, test-only) drops clusters bigger than the cap before the
    pair join — the same degenerate-bucket guard the MinHash LSH path
    applies (a near-duplicate blob or an under-trained codebook can
    funnel a corpus slice into one cid, whose pair stage would expand
    quadratically). Norms are computed once per vector before the
    join; each pair then does a single dot product.

    Shuffle shape: the lists repartition ONCE on cid — the single
    corpus exchange of the whole pair stage. Both self-join sides and
    the cluster-size guard (a count window over the cid partition —
    no separate aggregate job, no broadcast) reuse that one exchange,
    so the plan is map-only scoring → one Exchange → in-place
    cap/join. The pre-r15 shape paid a broadcast build plus cid
    exchanges per join side on top of the assignment shuffle."""
    from tripl_spark.operators.similarity import dot, norm

    lists = assigned.select(
        "vec_id", "v", "cid", norm(F.col("v")).alias("nrm")
    ).repartition("cid")
    if max_cluster is not None:
        lists = (
            lists.withColumn(
                "_n", F.count(F.lit(1)).over(Window.partitionBy("cid"))
            )
            .filter(F.col("_n") <= max_cluster)
            .drop("_n")
        )
    a = lists.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "cid"
    )
    b = lists.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "cid"
    )
    # deliberate join strategy: BOTH sides are corpus-sized (each is the
    # capped lists), so the merge hint pins SortMergeJoin — local-scale
    # statistics would otherwise auto-broadcast the build side, a plan
    # that cannot exist at 100 TB. Both sides reuse the single cid
    # exchange above, so SMJ adds sorts but no further shuffle.
    return (
        a.hint("merge").join(b, ["cid"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cid", "cosine")
    )


@query(
    "dedup_semantic_clusters",
    # Trained-cluster assignment = the same `lists` relation the
    # IVF-kmeans oracle builds; the pair stage is a self-join on cid —
    # over the CAPPED cluster list (cl), replicating the max_cluster
    # guard the Spark path applies by default — with the rounded cosine
    # compared AFTER rounding on both engines so a boundary value can't
    # flip membership.
    oracle=f"""
    WITH {KMEANS2_CTES},
{_lists_cte()},
{_capped_cte()}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cid,
           round(list_cosine_similarity(ea.v, eb.v), 4) AS cosine
    FROM cl a
    JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
    JOIN e ea ON ea.vec_id = a.vec_id
    JOIN e eb ON eb.vec_id = b.vec_id
    WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= {SEM_THRESHOLD}
    """,
    doc="SemDeDup-style semantic dedup: k-means-trained cluster "
    "assignment bounds the candidate space; exact cosine only within "
    "clusters — fully hash-gated (train + assign + pair + score in SQL)",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs a la SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its k-means-trained
    cluster, compute exact pairwise cosine ONLY within clusters, and
    keep pairs above SEM_THRESHOLD. Emits (id_a, id_b, cid, cosine);
    the pair list feeds the same connected-components canonicalizer
    exact/MinHash dedup uses (operators/dedup_groups.py) to pick
    keepers.

    100 TB shape: the codebook (k×d) is driver-resident and assignment
    is a map-only literal expression (zero Exchange) — the corpus
    shuffles ONCE on cid for the self-join; within-cluster
    all-pairs cost is Σ|cluster|², bounded two ways: choose k by the
    ``codebook_k`` rule (k ≈ n/1000 so clusters stay ~10³ vectors;
    here k=K2 matches the oracled trainer and equals the rule's output
    at this n), AND the ``SEM_MAX_CLUSTER`` cap — applied BY DEFAULT
    in ``semantic_dedup_pairs`` and replicated in the oracle's ``cl``
    CTE — drops any degenerate cluster before the pair join, so the
    registered query carries the bounded production shape end to end.
    Norms are computed once per vector before the pair join —
    recomputing them per pair tripled the array work (measured ~2x
    wall-clock on the sf0.1 pair stage); sqrt(dot(v,v)) reused is
    bit-identical, so the oracle's list_cosine_similarity still
    hash-matches. No all-pairs over the corpus ever materializes."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = _assign_literal(emb, kmeans_2iter_centroid_rows(emb)).select(
        "vec_id", "v", "cid"
    )
    return semantic_dedup_pairs(assigned)


def semantic_dedup_pairs_arrow(
    assigned: DataFrame,
    threshold: float = SEM_THRESHOLD,
    max_cluster: int | None = SEM_MAX_CLUSTER,
) -> DataFrame:
    """Production twin of ``semantic_dedup_pairs``: per-cluster pairwise
    cosine as ONE numpy GEMM inside Arrow-batched ``applyInPandas``.

    The expression path pays ~10µs/pair for the ``zip_with`` dot (a
    per-pair array allocation + interpreted fold — unrolling the sum
    into 64 codegen terms measured WORSE: the expression tree blows
    the JIT method limit); normalized-matrix U·Uᵀ does the same math
    at memory bandwidth. Same twin pattern as xxhash64-vs-md5 MinHash:
    this path is for production scale, the expression path keeps the
    DuckDB hash gate (equivalence on real data pinned in
    tests/test_clustering.py). Cluster sizes are bounded by k (and
    ``max_cluster``), so each group's |cluster|² similarity matrix is
    small by construction — the group, not the corpus, is the unit of
    memory.

    Rounding discipline: numpy emits RAW cosines pre-filtered with a
    half-ulp-of-4dp margin; the 4-dp rounding and the exact threshold
    test run JVM-side with ``F.round`` — numpy's round-half-to-EVEN
    disagrees with Spark/DuckDB's HALF_UP on boundary values (e.g.
    0.40005), which would let twin and gated path disagree on pair
    membership."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if max_cluster is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_cluster)
            .select("cid")
        )
        assigned = assigned.join(F.broadcast(small), "cid")

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    # any raw value >= threshold - 0.5e-4 can still round UP across the
    # threshold; prune only what provably cannot survive
    prefilter = threshold - 5.1e-5

    def pairs_of(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        u = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = u @ u.T
        ia, ib = np.triu_indices(len(ids), k=1)
        cos = sims[ia, ib]
        keep = cos >= prefilter
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cid": np.full(int(keep.sum()), pdf["cid"].iloc[0], dtype=np.int64),
                "cosine": cos[keep],
            }
        )

    raw = assigned.groupBy("cid").applyInPandas(pairs_of, schema)
    return raw.withColumn("cosine", F.round("cosine", 4)).filter(
        F.col("cosine") >= threshold
    )


# ---------------------------------------------------------------------------
# Incremental semantic dedup: new vectors vs a materialized cluster index
# ---------------------------------------------------------------------------


def _assign_any(emb: DataFrame, cent: "DataFrame | CentroidRows") -> DataFrame:
    """Dispatch: a driver-resident [(cid, cv)] codebook takes the
    map-only literal path; a DataFrame codebook (the streaming class's
    checkpointed frame) keeps the broadcast-join path."""
    if isinstance(cent, list):
        return _assign_literal(emb, cent)
    return _assign_round(emb, cent)


def semantic_index(
    emb: DataFrame,
    cent: "DataFrame | CentroidRows",
    max_cluster: int | None = SEM_MAX_CLUSTER,
) -> DataFrame:
    """(vec_id, v, nrm, cid) — the materializable semantic-dedup index
    of a corpus under a FROZEN codebook: cluster assignment plus the
    precomputed norm. At 100 TB this is what you persist (bucketed by
    cid, the join key) so daily embedding increments match against it
    without re-scoring the corpus — the semantic analog of
    ``dedup.minhash_index``. The bucketed layout is plan-asserted:
    the increment join re-reads the index with zero Exchange on the
    index side (``tests/test_bucketing.py::
    test_bucketed_semantic_index_join_skips_index_shuffle``).

    ``max_cluster`` (default ``SEM_MAX_CLUSTER``) excludes degenerate
    clusters AT BUILD TIME — the materialized index is the capped
    artifact, so every consumer (incremental match, the streaming
    class) inherits the bound without its own guard."""
    from tripl_spark.operators.similarity import norm

    idx = _assign_any(emb, cent).select(
        "vec_id", "v", "cid", norm(F.col("v")).alias("nrm")
    )
    if max_cluster is not None:
        small = (
            idx.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_cluster)
            .select("cid")
        )
        idx = idx.join(F.broadcast(small), "cid").select("vec_id", "v", "cid", "nrm")
    return idx


def semantic_match_new(
    new_emb: DataFrame,
    index: DataFrame,
    cent: "DataFrame | CentroidRows",
    threshold: float = SEM_THRESHOLD,
) -> DataFrame:
    """(new_id, corpus_id, cid, cosine) — incoming vectors matched
    against the corpus index, same-cluster candidates only. Cost
    scales with the increment: the codebook broadcasts onto the new
    vectors, and the equi-join on cid touches only the index clusters
    the increment lands in — corpus vectors are never re-scored
    against each other."""
    from tripl_spark.operators.similarity import dot, norm

    nw = _assign_any(new_emb, cent).select(
        F.col("vec_id").alias("new_id"),
        F.col("v").alias("nv"),
        "cid",
        norm(F.col("v")).alias("nn"),
    )
    return (
        nw.join(index, "cid")
        .withColumn(
            "cosine",
            F.round(dot(F.col("nv"), F.col("v")) / (F.col("nn") * F.col("nrm")), 4),
        )
        .filter(F.col("cosine") >= threshold)
        .select("new_id", F.col("vec_id").alias("corpus_id"), "cid", "cosine")
    )


@query(
    "dedup_incremental_semantic",
    # The codebook is FROZEN at snapshot time (trained on the full
    # snapshot via the shared KMEANS2 CTEs — how production coarse
    # quantizers work: retrain offline, reuse across increments), so
    # the whole incremental path stays SQL-replicable. The index side
    # (idx = corpus members only) carries the max_cluster build-time
    # cap, counted over CORPUS residency — exactly what
    # ``semantic_index`` materializes.
    oracle=f"""
    WITH {KMEANS2_CTES},
{_lists_cte()},
    idx AS (SELECT * FROM lists WHERE vec_id % 7 != 0),
{_capped_cte(src="idx", name="cidx")}
    SELECT a.vec_id AS new_id, b.vec_id AS corpus_id, a.cid,
           round(list_cosine_similarity(ea.v, eb.v), 4) AS cosine
    FROM lists a
    JOIN cidx b ON a.cid = b.cid
    JOIN e ea ON ea.vec_id = a.vec_id
    JOIN e eb ON eb.vec_id = b.vec_id
    WHERE a.vec_id % 7 = 0
      AND round(list_cosine_similarity(ea.v, eb.v), 4) >= {SEM_THRESHOLD}
    """,
    doc="incremental semantic dedup: an increment (vec_id % 7 = 0) "
    "matched against the materialized cluster index of the corpus "
    "(vec_id % 7 != 0) under a frozen codebook — fully hash-gated",
)
def dedup_incremental_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup: the corpus partition (6/7 of vectors) is
    indexed once via ``semantic_index`` (which applies the
    ``SEM_MAX_CLUSTER`` build-time cap, replicated in the oracle's
    ``cidx`` CTE); the increment (1/7) assigns under the same frozen
    codebook and matches only within its clusters. Mirrors
    ``dedup_incremental_minhash``'s shape — index cost amortizes
    across increments, per-increment cost is O(increment × cluster
    residency), corpus text/vectors never rescanned pairwise."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = kmeans_2iter_centroid_rows(emb)
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    shard = emb.filter(F.col("vec_id") % 7 == 0)
    return semantic_match_new(shard, semantic_index(corpus, cents), cents)


@query(
    "dedup_semantic_groups",
    # The semantic pair graph closed transitively (recursive CTE on
    # the DuckDB side, pointer-jumping CC on the Spark side), then a
    # per-group election. Keep = the vector FARTHEST from its cluster
    # centroid (max d2, vec_id tie-break) — SemDeDup's
    # diversity-preserving rule: within a family of semantic
    # duplicates, retain the least prototypical example.
    oracle=f"""
    WITH RECURSIVE {KMEANS2_CTES},
{_lists_cte(with_d2=True)},
{_capped_cte()},
    prs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= {SEM_THRESHOLD}
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    reach AS (
      SELECT vec_id AS root, vec_id AS node FROM e
      UNION
      SELECT r.root, sym.d AS node FROM reach r JOIN sym ON r.node = sym.s
    ),
    comp AS (SELECT root AS vec_id, min(node) AS group_id FROM reach GROUP BY root)
    SELECT l.vec_id, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size,
           l.cid,
           (row_number() OVER (PARTITION BY group_id
                               ORDER BY l.d2 DESC, l.vec_id) = 1) AS keep
    FROM lists l JOIN comp ON l.vec_id = comp.vec_id
    """,
    doc="semantic duplicate families: within-cluster pairs closed "
    "transitively to groups, keeping the least prototypical member "
    "per family (SemDeDup's diversity rule) — fully hash-gated",
)
def dedup_semantic_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-level semantic dedup: semantic pairs → connected
    components (near-duplication chains transitively: A≈B, B≈C ⇒ one
    family) → one survivor per family. The survivor is the member
    FARTHEST from its cluster centroid (max d2, vec_id tie-break),
    SemDeDup's diversity-preserving election — prototypical members
    are the redundant ones.

    Scale shape mirrors ``dedup_groups_canonical``: CC iterates over
    the pair graph only (dup rate × corpus edges), the corpus is
    touched for assignment and the final labeled join, never iterated;
    the election window partitions by family (bounded by family
    size)."""
    from tripl_spark.plans.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = _assign_literal(emb, kmeans_2iter_centroid_rows(emb))  # vec_id, v, cid, d2
    pairs = semantic_dedup_pairs(assigned.select("vec_id", "v", "cid"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    nodes = emb.select(F.col("vec_id").alias("node"))
    comp = connected_components(edges, nodes=nodes).select(
        F.col("node").alias("vec_id"), F.col("comp").alias("group_id")
    )
    labeled = assigned.select("vec_id", "cid", "d2").join(comp, "vec_id")
    w = Window.partitionBy("group_id")
    elect = Window.partitionBy("group_id").orderBy(F.desc("d2"), "vec_id")
    return labeled.select(
        "vec_id",
        "group_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        "cid",
        (F.row_number().over(elect) == 1).alias("keep"),
    )
