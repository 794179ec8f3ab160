"""Similarity search over the ``embeddings`` table (array<float> column).

* ``sim_knn_bruteforce`` — exact top-k cosine: broadcast the (small)
  query set against the corpus, JVM-side dot products via
  ``zip_with``/``aggregate``, per-query top-k via window. At 100 TB the
  corpus side stays partitioned and is read once; the broadcast side is
  k rows. This is the ground-truth baseline.
* ``sim_ann_lsh`` — the scale path: random-hyperplane sign LSH. Each
  vector gets a compact bucket key (sign bits of dot products with
  fixed seeded planes); queries only score vectors in matching buckets,
  turning all-pairs into per-bucket joins. The planes are literal
  constants, so the DuckDB oracle replicates bucketing exactly —
  the approximation is *deterministically* reproducible.
* ``sim_embedding_stats`` — per-label norm/centroid statistics.

No Python UDFs anywhere: vector math is Catalyst higher-order
functions, codegen'd per batch.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import eager_checkpoint, load_table

DIM = 64
# 4 planes → 16 buckets: each query scores ~1/16 of the corpus. More
# planes shrink cost but gut recall once buckets drop below ~top-k·10
# candidates — tune with corpus size (at 100 TB you'd also multi-probe
# neighboring buckets).
N_PLANES = 4
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors

def lsh_planes(k: int, dim: int = DIM, seed: int = 20240813) -> list[list[float]]:
    """``k`` seeded gaussian hyperplanes (6-dp literals, so the SQL
    oracles can embed them verbatim). The module's ``PLANES`` is
    ``lsh_planes(N_PLANES)``; production builds at other corpus sizes
    generate ``lsh_planes(n_planes_for(n))`` instead."""
    rng = random.Random(seed)
    return [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(k)]


def n_planes_for(n: int, per_bucket: int = 1000, k_min: int = N_PLANES) -> int:
    """Production plane-count rule: enough sign bits that the expected
    bucket holds ~``per_bucket`` vectors (planes ≈ log2(n/per_bucket)),
    never below ``k_min`` — the LSH analog of ``clustering.codebook_k``.
    With FIXED planes the bucket join's Σ|bucket|² is a constant
    fraction of n² (quadratic); scaling the plane count with n keeps
    bucket occupancy constant and the join ~linear. The registered
    queries pin N_PLANES because the oracles embed the literal planes;
    at the driver's test scales this rule resolves to N_PLANES anyway."""
    import math

    if n <= per_bucket:
        return k_min
    return max(k_min, math.ceil(math.log2(n / per_bucket)))


PLANES: list[list[float]] = lsh_planes(N_PLANES)


def dot(x: F.Column, y: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, z: s + z)


def norm(x: F.Column) -> F.Column:
    return F.sqrt(dot(x, x))


def cosine(x: F.Column, y: F.Column) -> F.Column:
    return dot(x, y) / (norm(x) * norm(y))


def _plane_col(plane: list[float]) -> F.Column:
    return F.array(*[F.lit(c) for c in plane])


def _plane_sql(plane: list[float]) -> str:
    # repr's shortest round-trip decimal through a string cast is
    # bit-exact (the session._sql_lit double rendering)
    return "array(" + ", ".join(f"CAST('{float(c)!r}' AS DOUBLE)" for c in plane) + ")"


def bucket_key(
    v: F.Column | str, planes: list[list[float]] | None = None
) -> F.Column:
    """Sign-bit bucket id from hyperplane dot products (default: the
    module's N_PLANES literal planes the oracles embed; pass
    ``lsh_planes(n_planes_for(n))`` for a corpus-sized plane set).

    Pass the vector COLUMN NAME (the normal case) and the whole key —
    every plane's literal array, dot fold and sign bit — renders as ONE
    ``F.expr`` parse: the per-plane Column builder (64 ``F.lit`` calls
    per plane plus the zip_with/aggregate lambda machinery) issued
    ~0.4 s of py4j round trips per call (cProfile, fifth-session
    sweep). A Column argument keeps the original builder (identical
    expression: same zip_with/aggregate dot, same CASE/sum/cast —
    equality pinned in tests/test_r15_opt.py)."""
    ps = PLANES if planes is None else planes
    if isinstance(v, str):
        # backquoted identifiers escape embedded backticks by doubling
        name = "`" + v.replace("`", "``") + "`"
        terms = " + ".join(
            f"(CASE WHEN aggregate(zip_with({name}, {_plane_sql(p)}, "
            f"(p, q) -> p * q), CAST(0.0 AS DOUBLE), (s, z) -> s + z) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(ps)
        )
        return F.expr(f"CAST(({terms}) AS INT)")
    bits = [
        F.when(dot(v, _plane_col(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(ps)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _bucket_sql(vec_expr: str) -> str:
    """DuckDB replica of bucket_key over a DOUBLE[] expression."""
    terms = []
    for i, p in enumerate(PLANES):
        lit = "[" + ", ".join(repr(c) for c in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "sim_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings)
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(qv, cv), 4) + 0.0 AS cosine,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                                         c.vec_id) AS rk
      FROM q JOIN c ON q.query_id <> c.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the query set (ground truth)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "sim_ann_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql("embedding::DOUBLE[]")} AS bucket
               FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {N_QUERIES})
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(qv, v), 4) + 0.0 AS cosine,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                                         e.vec_id) AS rk
      FROM q JOIN e ON q.bucket = e.bucket AND q.query_id <> e.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's LSH
    bucket — the join is keyed on the bucket id, so the candidate set
    per query is ~corpus/2^planes instead of the whole corpus."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = emb.withColumn("bucket", bucket_key("v"))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("qbucket") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "sim_embedding_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm,
           round(min(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS min_norm,
           round(max(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def sim_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm statistics (sanity profile of the corpus)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", norm(F.col("embedding").cast("array<double>")).alias("n")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("n"), 4).alias("avg_norm"),
        F.round(F.min("n"), 4).alias("min_norm"),
        F.round(F.max("n"), 4).alias("max_norm"),
    )


N_PROBES_HAMMING = 1  # probe the home bucket + all Hamming-1 neighbors
IVF_CENTROIDS = 16
IVF_NPROBE = 4


@query(
    "sim_ann_multiprobe",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql("embedding::DOUBLE[]")} AS bucket
               FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket
               FROM e WHERE vec_id < {N_QUERIES}),
         probes AS (
           SELECT query_id, qv,
                  unnest([bucket, {", ".join(f"xor(bucket, {1 << i})" for i in range(N_PLANES))}]) AS pb
           FROM q)
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT probes.query_id, e.vec_id,
             round(list_cosine_similarity(qv, v), 4) + 0.0 AS cosine,
             row_number() OVER (PARTITION BY probes.query_id
                                ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                                         e.vec_id) AS rk
      FROM probes JOIN e ON probes.pb = e.bucket AND probes.query_id <> e.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign LSH: each query also probes every bucket at
    Hamming distance 1 from its own (flip one sign bit) — the classic
    recall fix for hyperplane LSH. Candidates/query ≈ (1+planes)/2^planes
    of the corpus (5/16 here) instead of 1/16, recovering neighbors that
    fall just across one hyperplane. Buckets partition the corpus, so
    probes never produce duplicate candidates."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = emb.withColumn("bucket", bucket_key("v"))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    probe_cols = [F.col("qbucket")] + [
        F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(N_PLANES)
    ]
    probes = q.select(
        "query_id", "qv", F.explode(F.array(*probe_cols)).alias("pb")
    )
    scored = (
        bucketed.join(
            F.broadcast(probes),
            (F.col("pb") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


@query(
    "sim_ann_ivf",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {IVF_CENTROIDS}),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, cent.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round(list_cosine_similarity(v, cv), 4) DESC,
                                           cent.cid) AS arn
        FROM e CROSS JOIN cent
      ) WHERE arn = 1
    ),
    qprobe AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, cent.cid,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(list_cosine_similarity(q.v, cv), 4) DESC,
                                           cent.cid) AS prn
        FROM e q CROSS JOIN cent WHERE q.vec_id < {N_QUERIES}
      ) WHERE prn <= {IVF_NPROBE}
    )
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT qprobe.query_id, e.vec_id,
             round(list_cosine_similarity(qe.v, e.v), 4) + 0.0 AS cosine,
             row_number() OVER (PARTITION BY qprobe.query_id
                                ORDER BY round(list_cosine_similarity(qe.v, e.v), 4) DESC,
                                         e.vec_id) AS rk
      FROM qprobe
      JOIN assign ON assign.cid = qprobe.cid
      JOIN e ON e.vec_id = assign.vec_id AND e.vec_id <> qprobe.query_id
      JOIN e qe ON qe.vec_id = qprobe.query_id
    )
    WHERE rk <= {TOP_K}
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN with deterministic coarse centroids (the
    first {IVF_CENTROIDS} corpus vectors — swap for k-means cluster
    centers in production; the index/search mechanics are identical and
    this choice keeps the whole structure SQL-replicable):

      build: every vector is assigned to its nearest centroid's list
      search: a query scores only the lists of its nprobe nearest
      centroids — candidates/query ≈ nprobe/centroids of the corpus.

    At 100 TB the assignment is one broadcast-join pass, lists are the
    natural partitioning key, and queries touch nprobe partitions."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    sim_to_cent = F.round(cosine(F.col("v"), F.col("cv")), 4)
    arn = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cid")
    assign = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "v", "cid", sim_to_cent.alias("sim"))
        .withColumn("arn", F.row_number().over(arn))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", "cid")
    )
    qprobe = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                "cid", sim_to_cent.alias("sim"))
        .withColumn("prn", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", "qv", "cid")
    )
    scored = (
        assign.join(F.broadcast(qprobe),
                    (assign.cid == qprobe.cid) & (F.col("query_id") != F.col("vec_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


# Product quantization: 64 dims → PQ_M subspaces of PQ_SUB dims, each
# encoded as the id of its nearest of PQ_K deterministic codebook
# entries (the first PQ_K corpus vectors' subvectors — swap for k-means
# codebooks in production; encode/ADC mechanics are identical and this
# choice keeps the whole structure SQL-replicable).
PQ_M = 4
PQ_SUB = 16
PQ_K = 64


def _ssq(x: F.Column, y: F.Column) -> F.Column:
    """Squared L2, summed in index order (matches DuckDB's
    comprehension + list_sum, so both engines produce the same double)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda s, z: s + z,
    )


def _pq_oracle() -> str:
    ssq = ("list_sum([ (s.sv[i]-cb.cv[i])*(s.sv[i]-cb.cv[i]) "
           f"for i in range(1, {PQ_SUB} + 1) ])")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT m, vec_id AS code,
                  list_slice(v, m*{PQ_SUB}+1, m*{PQ_SUB}+{PQ_SUB}) AS cv
           FROM e, ms WHERE vec_id < {PQ_K}),
    subs AS (SELECT vec_id, m,
                    list_slice(v, m*{PQ_SUB}+1, m*{PQ_SUB}+{PQ_SUB}) AS sv
             FROM e, ms),
    enc AS (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {ssq}, cb.code) AS rn
        FROM subs s JOIN cb ON s.m = cb.m)
      WHERE rn = 1),
    dtab AS (SELECT s.vec_id AS query_id, s.m, cb.code, {ssq} AS d
             FROM subs s JOIN cb ON s.m = cb.m WHERE s.vec_id < {N_QUERIES}),
    adc AS (SELECT d.query_id, c.vec_id, sum(d.d) AS dist2
            FROM enc c JOIN dtab d ON c.m = d.m AND c.code = d.code
            WHERE c.vec_id != d.query_id
            GROUP BY 1, 2),
    shortlist AS (
      SELECT query_id, vec_id
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY dist2, vec_id) AS arn
            FROM adc)
      WHERE arn <= 50),
    rr AS (
      SELECT s.query_id, s.vec_id,
             list_sum([ (eq.v[i]-ev.v[i])*(eq.v[i]-ev.v[i])
                        for i in range(1, {PQ_M} * {PQ_SUB} + 1) ]) AS d2
      FROM shortlist s
      JOIN e eq ON eq.vec_id = s.query_id
      JOIN e ev ON ev.vec_id = s.vec_id)
    SELECT query_id, vec_id, round(d2, 4) AS dist2, CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY d2, vec_id) AS rk
          FROM rr)
    WHERE rk <= 10
    """


def _pq_parts(emb: DataFrame, n_queries: int) -> tuple[DataFrame, DataFrame]:
    """Shared PQ stages: (enc, dtab) — per-vector sub-codes and the
    queries' code-distance tables. Both sim_ann_pq and sim_ann_ivfpq
    build on these."""
    from functools import reduce
    subs = reduce(
        lambda a, b: a.unionByName(b),
        [
            emb.select(
                "vec_id",
                F.lit(m).alias("m"),
                F.slice("v", m * PQ_SUB + 1, PQ_SUB).alias("sv"),
            )
            for m in range(PQ_M)
        ],
    )
    cb = (
        subs.filter(F.col("vec_id") < PQ_K)
        .select("m", F.col("vec_id").alias("code"), F.col("sv").alias("cv"))
    )
    scored = subs.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "code", _ssq(F.col("sv"), F.col("cv")).alias("d")
    )
    w_enc = Window.partitionBy("vec_id", "m").orderBy("d", "code")
    enc = (
        scored.withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code")
    )
    dtab = scored.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "m", "code", "d"
    )
    return enc, dtab


def pq_rank(emb: DataFrame, n_queries: int = N_QUERIES,
            top_k: int = 10) -> DataFrame:
    """PQ encode + ADC rank over an (vec_id, v) frame — the reusable
    core of sim_ann_pq (recall is proven on clustered vectors in
    tests/test_similarity_recall.py)."""
    enc, dtab = _pq_parts(emb, n_queries)
    adc = (
        enc.join(F.broadcast(dtab), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adist2"))
    )
    # PQ's second stage: exact re-rank of the ADC shortlist — the codes
    # shortlist cheaply (compressed scan), true distances pick the
    # final top-k. Shortlist size 5x top_k bounds the exact math to a
    # constant per query.
    w_adc = Window.partitionBy("query_id").orderBy("adist2", "vec_id")
    shortlist = (
        adc.withColumn("arn", F.row_number().over(w_adc))
        .filter(F.col("arn") <= 5 * top_k)
        .select("query_id", "vec_id")
    )
    qv = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rr = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(emb, "vec_id")
        .select("query_id", "vec_id", _ssq(F.col("qv"), F.col("v")).alias("d2"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    return (
        rr.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= top_k)
        .select(
            "query_id",
            "vec_id",
            F.round("d2", 4).alias("dist2"),
            "rk",
        )
    )


@query("sim_ann_pq", oracle=_pq_oracle())
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the compression half of IVF-PQ):
    vectors are encoded as PQ_M sub-codes; queries precompute a
    distance table against the codebooks and score the WHOLE corpus as
    a table-lookup sum (ADC) — no float vector math per candidate.

    The 100 TB shape: codes are PQ_M small ints per vector — a 256-dim
    float corpus compresses ~64x, fits scan bandwidth, and the ADC pass
    is a broadcast-join (queries' distance tables are tiny) over the
    code table with one aggregation — no per-query shuffle of the
    corpus. Every stage (encode argmin, distance tables, ADC sum,
    ranking) hash-matches the DuckDB oracle, because squared-L2 sums run
    in index order on both engines."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return pq_rank(emb)


def _ivfpq_oracle() -> str:
    ssq = ("list_sum([ (s.sv[i]-cb.cv[i])*(s.sv[i]-cb.cv[i]) "
           f"for i in range(1, {PQ_SUB} + 1) ])")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {IVF_CENTROIDS}),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, cent.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round(list_cosine_similarity(v, cv), 4) DESC,
                                           cent.cid) AS arn
        FROM e CROSS JOIN cent) WHERE arn = 1),
    qprobe AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, cent.cid,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(list_cosine_similarity(q.v, cv), 4) DESC,
                                           cent.cid) AS prn
        FROM e q CROSS JOIN cent WHERE q.vec_id < {N_QUERIES}) WHERE prn <= {IVF_NPROBE}),
    ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT m, vec_id AS code,
                  list_slice(v, m*{PQ_SUB}+1, m*{PQ_SUB}+{PQ_SUB}) AS cv
           FROM e, ms WHERE vec_id < {PQ_K}),
    subs AS (SELECT vec_id, m,
                    list_slice(v, m*{PQ_SUB}+1, m*{PQ_SUB}+{PQ_SUB}) AS sv
             FROM e, ms),
    enc AS (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {ssq}, cb.code) AS rn
        FROM subs s JOIN cb ON s.m = cb.m)
      WHERE rn = 1),
    dtab AS (SELECT s.vec_id AS query_id, s.m, cb.code, {ssq} AS d
             FROM subs s JOIN cb ON s.m = cb.m WHERE s.vec_id < {N_QUERIES}),
    adc AS (SELECT d.query_id, c.vec_id, sum(d.d) AS dist2
            FROM enc c
            JOIN assign a ON a.vec_id = c.vec_id
            JOIN qprobe p ON p.cid = a.cid
            JOIN dtab d ON d.query_id = p.query_id
                       AND c.m = d.m AND c.code = d.code
            WHERE c.vec_id != d.query_id
            GROUP BY 1, 2),
    shortlist AS (
      SELECT query_id, vec_id
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY dist2, vec_id) AS arn
            FROM adc)
      WHERE arn <= 50),
    rr AS (
      SELECT s.query_id, s.vec_id,
             list_sum([ (eq.v[i]-ev.v[i])*(eq.v[i]-ev.v[i])
                        for i in range(1, {PQ_M} * {PQ_SUB} + 1) ]) AS d2
      FROM shortlist s
      JOIN e eq ON eq.vec_id = s.query_id
      JOIN e ev ON ev.vec_id = s.vec_id)
    SELECT query_id, vec_id, round(d2, 4) AS dist2, CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY d2, vec_id) AS rk
          FROM rr)
    WHERE rk <= 10
    """


@query("sim_ann_ivfpq", oracle=_ivfpq_oracle())
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN layout (what FAISS's IVFPQ index
    does), composed from the two verified halves:

      * IVF coarse routing: every vector lives in exactly one
        centroid's list; a query probes its IVF_NPROBE nearest lists,
        bounding candidates to ~nprobe/centroids of the corpus.
      * PQ/ADC scoring: candidates are scored from their PQ_M sub-codes
        via the query's precomputed code-distance table — a lookup-sum,
        no float vector math per candidate.
      * Exact re-rank: true squared-L2 on the 5x-top-k shortlist.

    The 100 TB shape: the code table is partitioned BY LIST (cid), so a
    query's ADC pass scans only its probed lists' partitions — partition
    pruning does the routing; the distance tables and probe sets are
    broadcast; the only shuffle is the per-(query, vec) ADC aggregation
    over candidates. Production would use residual PQ (encode v minus
    its centroid) and k-means codebooks; both halves here use the
    deterministic first-K-vectors choice so every stage — assignment,
    encoding, ADC sums, ranks — hash-matches the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    sim_to_cent = F.round(cosine(F.col("v"), F.col("cv")), 4)
    assign = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "cid", sim_to_cent.alias("sim"))
        .withColumn("arn", F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cid")))
        .filter(F.col("arn") == 1)
        .select("vec_id", "cid")
    )
    qprobe = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent))
        .select(F.col("vec_id").alias("query_id"), "cid", sim_to_cent.alias("sim"))
        .withColumn("prn", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", "cid")
    )
    enc, dtab = _pq_parts(emb, N_QUERIES)
    # route: only codes whose list a query probes reach the ADC join
    adc = (
        enc.join(assign, "vec_id")
        .join(F.broadcast(qprobe), "cid")
        .join(F.broadcast(dtab), ["query_id", "m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adist2"))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adist2", "vec_id")
    shortlist = (
        adc.withColumn("arn", F.row_number().over(w_adc))
        .filter(F.col("arn") <= 50)
        .select("query_id", "vec_id")
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rr = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(emb, "vec_id")
        .select("query_id", "vec_id", _ssq(F.col("qv"), F.col("v")).alias("d2"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    return (
        rr.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= 10)
        .select("query_id", "vec_id", F.round("d2", 4).alias("dist2"), "rk")
    )


def knn_bruteforce_arrow(
    emb: DataFrame, n_queries: int = N_QUERIES, top_k: int = TOP_K
) -> DataFrame:
    """Production twin of ``sim_knn_bruteforce``: score the corpus
    against the query set as numpy GEMMs inside Arrow-batched
    ``mapInPandas``, then merge per-partition top-k candidates.

    Shape: the query matrix (n_queries×d — small by definition) ships
    to every task; each Arrow batch of corpus vectors is one
    normalized-matrix multiply; a task emits RAW-cosine candidates
    pruned to the per-batch top-k plus every value within half an ulp
    of 4 dp of the k-th (rounding is monotone, so nothing outside that
    tie window can overtake after rounding). The 4-dp rounding and the
    final (cosine desc, vec_id) ranking run JVM-side with ``F.round``
    — numpy's round-half-to-EVEN disagrees with Spark/DuckDB's HALF_UP
    on boundary values, which would let the twin's ranks diverge from
    the gated path. The global window ranks candidates only —
    partitions × queries × ~k rows, not corpus-sized. Same twin
    pattern as ``semantic_dedup_pairs_arrow``; equivalence is pinned
    in tests/test_similarity_recall.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qrows = sorted(
        (r.vec_id, r.v)
        for r in emb.filter(F.col("vec_id") < n_queries).collect()
    )
    qids = np.array([i for i, _ in qrows])
    qm = np.stack([np.asarray(v, dtype=np.float64) for _, v in qrows])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = qn @ mn.T  # n_queries x batch, RAW
            out = []
            for qi in range(len(qids)):
                mask = ids != qids[qi]
                cand_ids, cand = ids[mask], sims[qi][mask]
                if len(cand) == 0:
                    continue
                order = np.lexsort((cand_ids, -cand))
                kth = cand[order[min(top_k, len(order)) - 1]]
                # keep the raw top-k AND the 4-dp tie window below the
                # k-th — only those can still reach the top-k after
                # HALF_UP rounding
                keep = order[cand[order] >= kth - 1.01e-4]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(keep), qids[qi]),
                            "neighbor_id": cand_ids[keep],
                            "cosine": cand[keep],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    cand = emb.select("vec_id", "v").mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.withColumn("cosine", F.round("cosine", 4))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
    )


FILTER_LANG = "en"  # the metadata predicate for filtered search


@query(
    "sim_knn_filtered",
    oracle=f"""
    WITH allowed AS (SELECT doc_id FROM documents WHERE lang = '{FILTER_LANG}'),
         q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv
               FROM embeddings JOIN allowed ON vec_id = doc_id)
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(qv, cv), 4) + 0.0 AS cosine,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                                         c.vec_id) AS rk
      FROM q JOIN c ON q.query_id <> c.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
    doc="predicate-filtered vector search (PRE-filter shape): the "
    "metadata predicate pushes to the documents scan and semi-joins "
    "the candidate set BEFORE any scoring — exact top-k among "
    "qualifying vectors only; fully hash-gated",
)
def sim_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: top-k cosine neighbors among vectors
    whose DOCUMENT satisfies a metadata predicate (lang = 'en') — the
    retrieval shape every RAG / curation system actually runs, where
    naive ANN-then-filter silently returns fewer than k rows.

    This is the PRE-filter plan: the predicate pushes down to the
    documents scan (plan-gated), the qualifying ids semi-join the
    embedding side, and only survivors are scored — cost ∝ selectivity
    x corpus, correct for ANY selectivity. The alternative POST-filter
    plan (run ANN first, filter the top list, over-fetch by
    ~k/selectivity to compensate) wins only when the predicate is
    nearly-always-true AND an index (IVF/LSH — `sim_ann_ivf_kmeans`,
    `sim_ann_lsh`) makes unfiltered search cheap; at low selectivity
    it degrades to scanning the index for rows it then throws away.
    The crossover rule of thumb (e.g. Qdrant/Milvus docs): pre-filter
    below ~10% selectivity, post-filter with over-fetch above. This
    query pins the pre-filter semantics exactly; composing the same
    semi-join into the LSH bucket probe gives the indexed variant
    (the bucket join simply gains one more equi-key)."""
    docs = load_table(spark, sf_dir, "documents")
    allowed = docs.filter(F.col("lang") == FILTER_LANG).select(
        F.col("doc_id").alias("vec_id")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = emb.join(allowed, "vec_id", "left_semi")
    scored = cand.join(F.broadcast(q), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    )


@query(
    "sim_ann_lsh_filtered",
    oracle=f"""
    WITH allowed AS (SELECT doc_id FROM documents WHERE lang = '{FILTER_LANG}'),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql("embedding::DOUBLE[]")} AS bucket
               FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket
               FROM e WHERE vec_id < {N_QUERIES}),
         c AS (SELECT e.vec_id, e.v, e.bucket
               FROM e JOIN allowed ON e.vec_id = allowed.doc_id)
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rk AS INT) AS rk
    FROM (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(qv, v), 4) + 0.0 AS cosine,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                                         c.vec_id) AS rk
      FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.vec_id
    )
    WHERE rk <= {TOP_K}
    """,
    doc="INDEXED filtered vector search: the metadata predicate's "
    "semi-join composed INTO the LSH bucket probe — the production "
    "twin `sim_knn_filtered`'s docstring promises; fully hash-gated",
)
def sim_ann_lsh_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The indexed variant of `sim_knn_filtered`: the same pre-filter
    semantics (only vectors whose document has lang = 'en' are
    candidates), but candidates come from the query's LSH bucket
    instead of the whole qualifying set — the predicate semi-join
    composes into the bucket probe, so the join keys on (bucket) with
    the allowed-id semi-join applied to the candidate side first.

    When to use which (the crossover `sim_knn_filtered`'s docstring
    derives): the brute-force pre-filter scores selectivity x corpus —
    right for selective predicates; this indexed shape scores
    selectivity x corpus / 2^planes — right when the predicate is
    broad (here lang='en' keeps ~1/3 of the corpus) and the index
    already exists. Scale shape: the documents scan keeps its pushed
    `lang` filter (plan-gated), the semi-join prunes the bucketed
    side BEFORE the bucket join, bucket occupancy is governed by the
    `n_planes_for` rule exactly as in `sim_ann_lsh`, and the top-k
    window partitions by query over per-bucket candidate counts.
    Recall vs the exact filtered search is pinned on clustered data in
    tests/test_similarity_recall.py."""
    docs = load_table(spark, sf_dir, "documents")
    allowed = docs.filter(F.col("lang") == FILTER_LANG).select(
        F.col("doc_id").alias("vec_id")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = emb.withColumn("bucket", bucket_key("v"))
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = bucketed.join(allowed, "vec_id", "left_semi")
    scored = cand.join(
        F.broadcast(q),
        (F.col("qbucket") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    )


@query(
    "sim_label_separation",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
      SELECT label, list(m ORDER BY dim) AS cv FROM (
        SELECT label, dim.i AS dim, round(avg(v[dim.i]), 6) AS m
        FROM e CROSS JOIN (SELECT unnest(range(1, {DIM} + 1)) AS i) dim
        GROUP BY label, dim.i
      ) GROUP BY label
    ),
    intra AS (
      SELECT e.label,
             CAST(count(*) AS BIGINT) AS n_vectors,
             round(CAST(sum(CAST(round(list_cosine_similarity(v, cv), 6)
                                 AS DECIMAL(18,6)) ) AS DOUBLE) / count(*), 4) + 0.0
               AS intra_cos
      FROM e JOIN cent ON e.label = cent.label
      GROUP BY e.label
    ),
    cross_sep AS (
      SELECT a.label,
             round(max(list_cosine_similarity(a.cv, b.cv)), 4) + 0.0 AS max_other_cos
      FROM cent a JOIN cent b ON a.label <> b.label
      GROUP BY a.label
    )
    SELECT intra.label, n_vectors, intra_cos, max_other_cos
    FROM intra JOIN cross_sep ON intra.label = cross_sep.label
    """,
    doc="embedding-space label separation: per label, mean cosine of "
    "members to their own 6-dp-rounded centroid vs the worst (highest) "
    "cosine to ANY other label's centroid — the silhouette-style "
    "representation diagnostic; fully hash-gated",
)
def sim_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are the labels separable in embedding space? For each label:
    cohesion (mean member-to-own-centroid cosine) and the closest
    rival centroid's cosine — cohesion well above the rival cosine is
    the separability signal a linear probe (`classifier_linear_probe_
    2step`) will confirm; overlapping values predict probe failure.
    The centroid-based form is the O(n·k) silhouette stand-in (true
    silhouette is O(n²) pairwise — never at 100 TB).

    Determinism discipline: centroid components are 6-dp-rounded
    per-dim means (the `KMEANS2_CTES` idiom), per-member cosines round
    to 6 dp and sum as DECIMAL so partition order can't move the mean,
    and the k×k rival matrix is exact double arithmetic over identical
    inputs. Scale shape: one posexplode shuffle to (label, dim) means
    (map-side combined), centroids broadcast back for the member
    cosine scan, and the rival matrix is k² rows."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    comps = emb.select(
        "label", F.posexplode("v").alias("pos", "comp")
    ).groupBy("label", "pos").agg(F.round(F.avg("comp"), 6).alias("m"))
    cent = comps.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cv")
    )
    intra = (
        emb.join(F.broadcast(cent), "label")
        .select(
            "label",
            F.round(cosine(F.col("v"), F.col("cv")), 6)
            .cast("decimal(18,6)").alias("cos6"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            (F.round(
                F.sum("cos6").cast("double") / F.count(F.lit(1)), 4
            ) + F.lit(0.0)).alias("intra_cos"),
        )
    )
    a = cent.select(F.col("label"), F.col("cv"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cv").alias("cv_b"))
    cross_sep = (
        a.join(F.broadcast(b), F.col("label") != F.col("label_b"))
        .groupBy("label")
        .agg((F.round(F.max(cosine(F.col("cv"), F.col("cv_b"))), 4) + F.lit(0.0)).alias("max_other_cos"))
    )
    return intra.join(cross_sep, "label")


@query(
    "sim_recall_at_k_eval",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql("embedding::DOUBLE[]")} AS bucket
               FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket
               FROM e WHERE vec_id < {N_QUERIES}),
         exact AS (
           SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                               e.vec_id) AS rk
             FROM q JOIN e ON q.query_id <> e.vec_id
           ) WHERE rk <= {TOP_K}
         ),
         approx AS (
           SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                               e.vec_id) AS rk
             FROM q JOIN e ON q.bucket = e.bucket AND q.query_id <> e.vec_id
           ) WHERE rk <= {TOP_K}
         )
    SELECT exact.query_id,
           CAST(count(approx.vec_id) AS BIGINT) AS n_hits,
           round(count(approx.vec_id) * 1.0 / {TOP_K}, 4) AS recall_at_k
    FROM exact LEFT JOIN approx
      ON exact.query_id = approx.query_id AND exact.vec_id = approx.vec_id
    GROUP BY exact.query_id
    """,
    doc=f"retrieval-quality eval as a QUERY: per-query recall@{TOP_K} "
    "of the sign-LSH index against the exact top-k — the number an "
    "index rollout is judged by, computed by joining the two result "
    "sets; fully hash-gated",
)
def sim_recall_at_k_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotes the test-suite recall metric
    (tests/test_similarity_recall.py) to a registered, oracled eval:
    recall@k of `sim_ann_lsh` against `sim_knn_bruteforce` per query,
    computed as |approx ∩ exact| / k by a left join on (query,
    neighbor). This is the continuous-monitoring form — at 100 TB you
    run it over a FIXED query panel after every index rebuild and
    alert on recall regressions (bucket-occupancy drift, plane-count
    misconfiguration), exactly how production vector stores gate
    deployments.

    Scale shape: both sides reuse the registered queries' plans (exact
    side bounded by the query panel; approx side bucket-pruned); the
    compare join touches ≤ 2·|panel|·k rows."""
    exact = sim_knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = sim_ann_lsh(spark, sf_dir).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("aq")) & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("an").cast("long").alias("n_hits"),
            F.round(F.count("an") * 1.0 / TOP_K, 4).alias("recall_at_k"),
        )
    )


MMR_POOL = 10  # relevance candidates per query entering the re-rank
MMR_LAMBDA = 0.7  # relevance-vs-diversity tradeoff


@query(
    "sim_mmr_rerank",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv
               FROM e WHERE vec_id < {N_QUERIES}),
         cand AS (
           SELECT query_id, vec_id, v, rel FROM (
             SELECT q.query_id, e.vec_id, e.v,
                    round(list_cosine_similarity(qv, e.v), 4) + 0.0 AS rel,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY round(list_cosine_similarity(qv, e.v), 4) DESC,
                               e.vec_id) AS rk
             FROM q JOIN e ON q.query_id <> e.vec_id
           ) WHERE rk <= {MMR_POOL}
         ),
         p1 AS (
           SELECT query_id, vec_id, v, rel FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY rel DESC, vec_id) AS rk FROM cand
           ) WHERE rk = 1
         ),
         s2 AS (
           SELECT c.query_id, c.vec_id, c.v,
                  round({MMR_LAMBDA} * c.rel - {1 - MMR_LAMBDA}
                        * round(list_cosine_similarity(c.v, p1.v), 6), 6) + 0.0 AS mmr
           FROM cand c JOIN p1 ON c.query_id = p1.query_id
           WHERE c.vec_id <> p1.vec_id
         ),
         p2 AS (
           SELECT query_id, vec_id, v, mmr FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY mmr DESC, vec_id) AS rk FROM s2
           ) WHERE rk = 1
         ),
         s3 AS (
           SELECT c.query_id, c.vec_id,
                  round({MMR_LAMBDA} * c.rel - {1 - MMR_LAMBDA}
                        * greatest(round(list_cosine_similarity(c.v, p1.v), 6),
                                   round(list_cosine_similarity(c.v, p2.v), 6)), 6) + 0.0
                    AS mmr
           FROM cand c
           JOIN p1 ON c.query_id = p1.query_id
           JOIN p2 ON c.query_id = p2.query_id
           WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id
         ),
         p3 AS (
           SELECT query_id, vec_id, mmr FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY mmr DESC, vec_id) AS rk FROM s3
           ) WHERE rk = 1
         )
    SELECT query_id, vec_id AS neighbor_id, CAST(1 AS INT) AS mmr_rank,
           rel AS mmr_score
    FROM p1
    UNION ALL
    SELECT query_id, vec_id, CAST(2 AS INT), mmr FROM p2
    UNION ALL
    SELECT query_id, vec_id, CAST(3 AS INT), mmr FROM p3
    """,
    doc=f"MMR diversified re-ranking: 3 greedy maximal-marginal-"
    f"relevance selections (lambda={MMR_LAMBDA}) from each query's "
    f"top-{MMR_POOL} relevance pool — the result-diversity primitive; "
    "every stage bounded by the pool; fully hash-gated",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): after
    plain cosine retrieval returns near-duplicates of the same hit,
    MMR greedily picks argmax of λ·rel(c) − (1−λ)·max_{p∈picked}
    sim(c, p) — relevance discounted by redundancy against what is
    already selected. The standard re-rank for RAG context assembly
    and for diversifying training-data retrieval; three selections
    are unrolled here (the greedy loop is inherently sequential, but
    each step is one bounded join over the ≤{MMR_POOL}-row pool, so
    k steps cost k tiny stages — never a scan).

    Determinism: relevance at 4 dp (the kNN convention), redundancy
    cosines and MMR scores at 6 dp, argmax ties broken by vec_id —
    identical double inputs on both engines make every comparison
    replay exactly. Scale shape: the pool build is the brute-force
    kNN plan (or any registered ANN index — the re-rank only needs
    (id, v, rel) rows); everything after is per-query constant work."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_rel = Window.partitionBy("query_id").orderBy(F.desc("rel"), "vec_id")
    cand = (
        emb.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "vec_id", "v",
            (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("rel"),
        )
        .withColumn("rk", F.row_number().over(w_rel))
        .filter(F.col("rk") <= MMR_POOL)
        .drop("rk")
    )
    p1 = cand.withColumn("rk", F.row_number().over(w_rel)).filter(
        F.col("rk") == 1
    ).select("query_id", F.col("vec_id").alias("n1"), F.col("v").alias("v1"), "rel")
    lam, mu = F.lit(MMR_LAMBDA), F.lit(1 - MMR_LAMBDA)
    s2 = (
        cand.join(p1.select("query_id", "n1", "v1"), "query_id")
        .filter(F.col("vec_id") != F.col("n1"))
        .select(
            "query_id", "vec_id", "v", "rel",
            (F.round(
                lam * F.col("rel") - mu * F.round(cosine(F.col("v"), F.col("v1")), 6), 6
            ) + F.lit(0.0)).alias("mmr"),
        )
    )
    w_mmr = Window.partitionBy("query_id").orderBy(F.desc("mmr"), "vec_id")
    p2 = s2.withColumn("rk", F.row_number().over(w_mmr)).filter(
        F.col("rk") == 1
    ).select("query_id", F.col("vec_id").alias("n2"), F.col("v").alias("v2"),
             F.col("mmr").alias("mmr2"))
    s3 = (
        cand.join(p1.select("query_id", "n1", "v1"), "query_id")
        .join(p2.select("query_id", "n2", "v2"), "query_id")
        .filter((F.col("vec_id") != F.col("n1")) & (F.col("vec_id") != F.col("n2")))
        .select(
            "query_id", "vec_id",
            (F.round(
                lam * F.col("rel")
                - mu * F.greatest(
                    F.round(cosine(F.col("v"), F.col("v1")), 6),
                    F.round(cosine(F.col("v"), F.col("v2")), 6),
                ), 6,
            ) + F.lit(0.0)).alias("mmr"),
        )
    )
    p3 = s3.withColumn("rk", F.row_number().over(w_mmr)).filter(
        F.col("rk") == 1
    ).select("query_id", F.col("vec_id").alias("n3"), F.col("mmr").alias("mmr3"))
    out1 = p1.select(
        "query_id", F.col("n1").alias("neighbor_id"),
        F.lit(1).cast("int").alias("mmr_rank"), F.col("rel").alias("mmr_score"),
    )
    out2 = p2.select(
        "query_id", F.col("n2").alias("neighbor_id"),
        F.lit(2).cast("int").alias("mmr_rank"), F.col("mmr2").alias("mmr_score"),
    )
    out3 = p3.select(
        "query_id", F.col("n3").alias("neighbor_id"),
        F.lit(3).cast("int").alias("mmr_rank"), F.col("mmr3").alias("mmr_score"),
    )
    return out1.unionByName(out2).unionByName(out3)


# ---------------------------------------------------------------------------
# Bitext mining — margin-scored cross-lingual pairing (Artetxe & Schwenk)
# ---------------------------------------------------------------------------

BT_X = 30   # source-side slice (en docs, smallest doc_ids — deterministic)
BT_Y = 120  # target-side slice (de docs)
BT_K = 4    # neighborhood size for the margin normalizer


@query(
    "sim_bitext_margin_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         x AS (SELECT doc_id AS x_id, v AS xv
               FROM documents JOIN e ON doc_id = vec_id
               WHERE lang = 'en' ORDER BY doc_id LIMIT {BT_X}),
         y AS (SELECT doc_id AS y_id, v AS yv
               FROM documents JOIN e ON doc_id = vec_id
               WHERE lang = 'de' ORDER BY doc_id LIMIT {BT_Y}),
         s AS (SELECT x_id, y_id,
                      round(list_cosine_similarity(xv, yv), 4) + 0.0 AS cosine
               FROM x CROSS JOIN y),
         kx AS (SELECT x_id, round(avg(cosine), 6) AS knx FROM (
                  SELECT *, row_number() OVER (PARTITION BY x_id
                            ORDER BY cosine DESC, y_id) AS rk FROM s
                ) WHERE rk <= {BT_K} GROUP BY x_id),
         ky AS (SELECT y_id, round(avg(cosine), 6) AS kny FROM (
                  SELECT *, row_number() OVER (PARTITION BY y_id
                            ORDER BY cosine DESC, x_id) AS rk FROM s
                ) WHERE rk <= {BT_K} GROUP BY y_id),
         m AS (SELECT s.x_id, s.y_id, s.cosine,
                      round(s.cosine * 2 / (knx + kny), 4) + 0.0 AS margin
               FROM s JOIN kx USING (x_id) JOIN ky USING (y_id))
    SELECT x_id, y_id AS match_id, cosine, margin
    FROM (SELECT *, row_number() OVER (PARTITION BY x_id
                    ORDER BY margin DESC, y_id) AS rk FROM m)
    WHERE rk = 1
    """,
    doc=f"margin-based bitext mining (ratio margin, Artetxe & Schwenk "
    f"2019): best cross-lingual match per en doc against a de slice, "
    f"scored cosine / mean-of-{BT_K}-NN-cosines both directions — the "
    "CCMatrix-style parallel-corpus miner; bounded slices, fully "
    "hash-gated (cosines 4 dp, normalizers 6 dp, ties by id)",
)
def sim_bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual bitext mining with the RATIO MARGIN score: a raw
    cosine threshold can't separate true translations from hubs
    (vectors cosine-close to everything), so each candidate cosine is
    normalized by the mean cosine of BOTH endpoints' k-nearest
    neighborhoods — margin(x,y) = cos(x,y) / ((kNN̄(x)+kNN̄(y))/2) —
    and the best-margin target is kept per source doc. This is the
    mining objective behind CCMatrix/WikiMatrix parallel-corpus
    construction, a first-class acquisition op for multilingual
    training data.

    Registered shape: deterministic bounded slices (smallest doc_ids
    per lang) so the oracle replays exactly; the scored frame is a
    BroadcastNestedLoopJoin of the slices (never a shuffle). At
    100 TB the slices become ANN candidate lists — compose
    `sim_ann_lsh_filtered`'s bucket probe per side, then this margin
    arithmetic runs unchanged over (x_id, y_id, cosine) rows: the
    normalizers need only each endpoint's OWN top-k, which the ANN
    search already produces. Both kNN̄ aggregations are bounded by
    the candidate lists, margins are pure row arithmetic, and the
    final per-source argmax is a window over candidate rows only."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    de = docs.join(emb, docs.doc_id == emb.vec_id)

    def side(lang: str, n: int, idc: str, vc: str) -> DataFrame:
        return (
            de.filter(F.col("lang") == lang)
            .select(F.col("doc_id").alias(idc), F.col("v").alias(vc))
            .orderBy(idc)
            .limit(n)
        )

    x = side("en", BT_X, "x_id", "xv")
    y = side("de", BT_Y, "y_id", "yv")
    s = x.join(F.broadcast(y), F.col("x_id") != F.col("y_id")).select(
        "x_id", "y_id",
        (F.round(cosine(F.col("xv"), F.col("yv")), 4) + F.lit(0.0)).alias("cosine"),
    )
    wx = Window.partitionBy("x_id").orderBy(F.desc("cosine"), "y_id")
    wy = Window.partitionBy("y_id").orderBy(F.desc("cosine"), "x_id")
    kx = (
        s.withColumn("rk", F.row_number().over(wx))
        .filter(F.col("rk") <= BT_K)
        .groupBy("x_id")
        .agg(F.round(F.avg("cosine"), 6).alias("knx"))
    )
    ky = (
        s.withColumn("rk", F.row_number().over(wy))
        .filter(F.col("rk") <= BT_K)
        .groupBy("y_id")
        .agg(F.round(F.avg("cosine"), 6).alias("kny"))
    )
    m = (
        s.join(kx, "x_id")
        .join(ky, "y_id")
        .select(
            "x_id", "y_id", "cosine",
            (F.round(F.col("cosine") * 2 / (F.col("knx") + F.col("kny")), 4)
             + F.lit(0.0)).alias("margin"),
        )
    )
    wbest = Window.partitionBy("x_id").orderBy(F.desc("margin"), "y_id")
    return (
        m.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("x_id", F.col("y_id").alias("match_id"), "cosine", "margin")
    )


# ---------------------------------------------------------------------------
# k-center diversity selection — greedy farthest-point coreset picks
# ---------------------------------------------------------------------------


@query(
    "sim_kcenter_diverse",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         s1 AS (SELECT vec_id AS id1, v AS v1 FROM e ORDER BY vec_id LIMIT 1),
         d1 AS (SELECT e.vec_id, e.v,
                       round(1 - list_cosine_similarity(e.v, s1.v1), 6) + 0.0 AS d1
                FROM e CROSS JOIN s1 WHERE e.vec_id <> s1.id1),
         s2 AS (SELECT vec_id AS id2, v AS v2, d1 AS dist2 FROM d1
                ORDER BY d1 DESC, vec_id LIMIT 1),
         d2 AS (SELECT d1.vec_id,
                       least(d1.d1,
                             round(1 - list_cosine_similarity(d1.v, s2.v2), 6) + 0.0)
                         AS d2
                FROM d1 CROSS JOIN s2 WHERE d1.vec_id <> s2.id2),
         s3 AS (SELECT vec_id AS id3, d2 AS dist3 FROM d2
                ORDER BY d2 DESC, vec_id LIMIT 1)
    SELECT CAST(1 AS INT) AS sel_rank, id1 AS vec_id,
           CAST(0.0 AS DOUBLE) AS coverage_dist FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), id2, dist2 FROM s2
    UNION ALL
    SELECT CAST(3 AS INT), id3, dist3 FROM s3
    """,
    doc="greedy k-center (farthest-point) diversity selection, 3 picks "
    "unrolled corpus-wide: each pick is one scan + a 1-row TakeOrdered "
    "argmax (cosine distance, 6 dp, ties by vec_id) — the coreset/"
    "diverse-sampling primitive; fully hash-gated",
)
def sim_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (Gonzalez 1985 farthest-point traversal) over
    the embedding corpus: pick the seed, then repeatedly the point
    farthest (max-min cosine distance) from everything picked — the
    classic 2-approximation for diverse coreset selection, used to
    seed diverse training subsets and kmeans++-style initializations
    (`cluster_kmeans_embeddings` starts from id-ordered seeds; this
    is the diversity-aware alternative).

    Scale shape: selection k is small by construction, and each round
    is ONE linear scan (distance column against the last pick's
    broadcast 1-row vector, folded into the running min) + a 1-row
    TakeOrdered argmax — k scans total, no pair stage, no window over
    the corpus. The crossJoins are 1-row broadcast scalars (the
    picked vector), the same discipline as the lift support scalar."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    s1 = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1")
    )
    d1 = (
        e.crossJoin(F.broadcast(s1))
        .filter(F.col("vec_id") != F.col("id1"))
        .select(
            "vec_id", "v",
            (F.round(1 - cosine(F.col("v"), F.col("v1")), 6) + F.lit(0.0)).alias("d1"),
        )
    )
    s2 = d1.orderBy(F.desc("d1"), "vec_id").limit(1).select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2"),
        F.col("d1").alias("dist2"),
    )
    d2 = (
        d1.crossJoin(F.broadcast(s2))
        .filter(F.col("vec_id") != F.col("id2"))
        .select(
            "vec_id",
            F.least(
                F.col("d1"),
                F.round(1 - cosine(F.col("v"), F.col("v2")), 6) + F.lit(0.0),
            ).alias("d2"),
        )
    )
    s3 = d2.orderBy(F.desc("d2"), "vec_id").limit(1).select(
        F.col("vec_id").alias("id3"), F.col("d2").alias("dist3")
    )
    r1 = s1.select(
        F.lit(1).cast("int").alias("sel_rank"),
        F.col("id1").alias("vec_id"),
        F.lit(0.0).cast("double").alias("coverage_dist"),
    )
    r2 = s2.select(
        F.lit(2).cast("int").alias("sel_rank"),
        F.col("id2").alias("vec_id"),
        F.col("dist2").alias("coverage_dist"),
    )
    r3 = s3.select(
        F.lit(3).cast("int").alias("sel_rank"),
        F.col("id3").alias("vec_id"),
        F.col("dist3").alias("coverage_dist"),
    )
    return r1.unionByName(r2).unionByName(r3)


# ---------------------------------------------------------------------------
# int8 scalar quantization — storage-reduction recall eval
# ---------------------------------------------------------------------------


@query(
    "sim_int8_quant_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         sc AS (SELECT vec_id, v,
                       greatest(list_max(list_transform(v, x -> abs(x))),
                                1e-12) AS s
                FROM e),
         d8 AS (SELECT vec_id,
                       list_transform(v, x -> round(x * 127 / s) * s / 127)
                         AS v8
                FROM sc),
         q AS (SELECT vec_id AS query_id, v AS qv
               FROM e WHERE vec_id < {N_QUERIES}),
         exact AS (
           SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
                               e.vec_id) AS rk
             FROM q JOIN e ON q.query_id <> e.vec_id
           ) WHERE rk <= {TOP_K}
         ),
         approx AS (
           SELECT query_id, vec_id FROM (
             SELECT q.query_id, d8.vec_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY round(list_cosine_similarity(qv, v8), 4) DESC,
                               d8.vec_id) AS rk
             FROM q JOIN d8 ON q.query_id <> d8.vec_id
           ) WHERE rk <= {TOP_K}
         )
    SELECT exact.query_id,
           CAST(count(approx.vec_id) AS BIGINT) AS n_hits,
           round(count(approx.vec_id) * 1.0 / {TOP_K}, 4) AS recall_at_k
    FROM exact LEFT JOIN approx
      ON exact.query_id = approx.query_id AND exact.vec_id = approx.vec_id
    GROUP BY exact.query_id
    """,
    doc=f"int8 scalar-quantization recall@{TOP_K}: per-vector max-abs "
    "scale, symmetric round-to-127 quantize/dequantize of the CORPUS "
    "(queries stay float — the asymmetric-distance convention), exact "
    "top-k under both representations compared per query — the eval "
    "that gates a 4x-storage-reduction rollout; fully hash-gated",
)
def sim_int8_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization is the standard first storage lever
    for a 100 TB embedding corpus (4x smaller than float32, 8x than
    float64, usually within a point of full recall; PQ is the next
    lever, `sim_ann_pq`). This registers the ROLLOUT GATE: quantize
    the corpus with a per-vector max-abs symmetric scale, keep
    queries float (asymmetric distance, the FAISS SQ convention), and
    compare exact top-k under both representations per panel query.

    Determinism: quantize/dequantize is pure double arithmetic with
    identical association on both engines (round(x*127/s)*s/127 —
    Spark HALF_UP and DuckDB round() both round ties away from zero),
    cosines 4 dp, ties by vec_id. Scale shape: the quantized corpus
    is MATERIALIZED once (localCheckpoint here; a written table in
    production — it IS the serving index) so the per-vector scale
    never recomputes per query pair; both top-k sides are panel-
    bounded brute-force scans, and the compare join touches
    ≤ 2·|panel|·k rows."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sc = emb.select(
        "vec_id", "v",
        F.greatest(
            F.array_max(F.transform(F.col("v"), F.abs)), F.lit(1e-12)
        ).alias("s"),
    )
    d8 = sc.select(
        "vec_id",
        F.transform(
            F.col("v"),
            lambda x: F.round(x * 127 / F.col("s"), 0) * F.col("s") / 127,
        ).alias("v8"),
    ).transform(eager_checkpoint)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), "vec_id")
    exact = (
        emb.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("c"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id")
    )
    approx = (
        d8.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            F.col("query_id").alias("aq"), F.col("vec_id").alias("an"),
            F.round(cosine(F.col("qv"), F.col("v8")), 4).alias("c"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("aq").orderBy(F.desc("c"), "an")
            ),
        )
        .filter(F.col("rk") <= TOP_K)
        .select("aq", "an")
    )
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("aq"))
            & (F.col("vec_id") == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("an").cast("long").alias("n_hits"),
            F.round(F.count("an") * 1.0 / TOP_K, 4).alias("recall_at_k"),
        )
    )
