"""Corpus mixing operators — choosing *how much of each slice* of a
corpus goes into a training run, and assigning reproducible splits.

Multilingual / multi-source LLM corpora are not sampled uniformly:
low-resource slices are up-weighted by temperature scaling (weight ∝
count^α, α<1 — the mixing rule from multilingual BERT/XLM-R and
GPT-style data recipes). Both operators here are deterministic: the
same corpus always yields the same sample and the same splits
(hash-based, no ``rand()``), which is what makes a 100 TB pipeline
auditable and re-runnable. Same md5-hash construction as
``operators/curation`` so DuckDB replicates selection bit-for-bit.

Scale shape: the weight table is one tiny aggregate (|langs| rows,
broadcast); selection is one per-lang top-k window (single shuffle
keyed by lang); split assignment is a pure scan projection with zero
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.operators.curation import _md5_hash60
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

ALPHA = 0.5
BUDGET = 200  # total docs in the mixed sample


@query(
    "mixing_temperature_sample",
    oracle=rf"""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT sum(power(n, {ALPHA})) AS z FROM counts),
    quota AS (
      SELECT lang, CAST(n AS BIGINT) AS lang_total,
             CAST(floor(round({BUDGET} * power(n, {ALPHA}) / z, 6)) AS BIGINT) AS quota
      FROM counts, tot
    ),
    ranked AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT),
                        doc_id) AS BIGINT) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk, quota, lang_total
    FROM ranked JOIN quota USING (lang)
    WHERE rk <= quota
    """,
)
def mixing_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language mixing: per-lang quota ∝ count^α
    (α=0.5) of a fixed document budget, filled in deterministic
    md5-hash order. Up-weights low-resource languages relative to their
    raw share — e.g. a lang with 13% of docs gets ~18% of the sample.
    The quota quotient is 6-dp-rounded BEFORE floor() on both engines
    so a 1-ulp pow/division skew cannot flip the integer boundary."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum(F.pow("n", ALPHA)).alias("z"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n").cast("long").alias("lang_total"),
        F.floor(F.round(BUDGET * F.pow("n", ALPHA) / F.col("z"), 6))
        .cast("long")
        .alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy(
        _md5_hash60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rk")
    )
    return ranked.join(F.broadcast(quota), "lang").filter(
        F.col("rk") <= F.col("quota")
    ).select("doc_id", "lang", "rk", "quota", "lang_total")


@query(
    "mixing_split_assign",
    oracle="""
    SELECT doc_id, lang,
           CAST(CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 100 AS BIGINT) AS bucket,
           CASE
             WHEN CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 100 < 90 THEN 'train'
             WHEN CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 100 < 95 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def mixing_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment (90/5/5): hash a salted
    doc id into 100 buckets. A pure projection — the split of any
    document is decidable from its id alone, with no global state, so
    late-arriving data lands in stable splits (the property random
    splits lack). The salt keeps this hash independent of the sampling
    hash above."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        _md5_hash60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    ).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )


TOKEN_BUDGET = 10_000  # total training tokens in the mix
PFX_BUCKETS = 32  # order-range buckets for the two-level prefix sum
_BUCKET_DIV = (1 << 60) // PFX_BUCKETS  # hash60 range per bucket (exact)


@query(
    "mixing_token_budget",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM documents
    ),
    totals AS (SELECT source, sum(n_tokens) AS src_tokens FROM toks GROUP BY source),
    z AS (SELECT sum(power(src_tokens, {ALPHA})) AS z FROM totals),
    budget AS (
      SELECT source,
             CAST(floor(round({TOKEN_BUDGET} * power(src_tokens, {ALPHA}) / z, 6))
                  AS BIGINT) AS budget_tokens
      FROM totals, z
    ),
    bucketed AS (SELECT *, h // {_BUCKET_DIV} AS bkt FROM toks),
    bucket_sums AS (
      SELECT source, bkt, sum(n_tokens) AS bkt_tokens
      FROM bucketed GROUP BY source, bkt
    ),
    offsets AS (
      SELECT source, bkt,
             CAST(coalesce(sum(bkt_tokens) OVER (
               PARTITION BY source ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS bkt_offset
      FROM bucket_sums
    ),
    running AS (
      SELECT b.doc_id, b.source, b.n_tokens,
             CAST(o.bkt_offset + sum(b.n_tokens) OVER (
               PARTITION BY b.source, b.bkt ORDER BY b.h, b.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM bucketed b JOIN offsets o ON b.source = o.source AND b.bkt = o.bkt
    )
    SELECT r.doc_id, r.source, r.n_tokens, r.cum_tokens, g.budget_tokens
    FROM running r JOIN budget g USING (source)
    WHERE r.cum_tokens <= g.budget_tokens
    """,
)
def mixing_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing: each source gets a TOKEN quota ∝
    src_tokens^α of a fixed total training budget (tokens, not docs —
    the unit a training run is actually provisioned in), filled as the
    greedy prefix of the source's deterministic hash order: a doc is
    in iff its running token total fits the quota.

    The running total is a TWO-LEVEL prefix sum, which is the 100 TB
    shape: a single per-source window would serialize each source
    through one task (sources are few ⇒ maximal skew). Instead the
    hash order is range-split into {PFX_BUCKETS} buckets (bucket =
    hash DIV range — contiguous in the order by construction), per-
    (source, bucket) sums roll up map-side, bucket offsets come from a
    window over that tiny table, and each bucket's internal running
    total adds its offset — every window partition is corpus/{PFX_BUCKETS}
    instead of corpus/|sources|. All arithmetic is BIGINT-exact, so
    the greedy cut is engine-reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        _md5_hash60(F.col("doc_id").cast("string")).alias("h"),
    )
    totals = toks.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    z = totals.agg(F.sum(F.pow("src_tokens", ALPHA)).alias("z"))
    # round the double quotient to 6 dp BEFORE floor on both engines:
    # a 1-ulp pow/division skew between the JVM and DuckDB's libm can
    # otherwise flip floor() at an integer boundary (the realistic case
    # is a mathematically-integer quota landing at k±ulp)
    budget = totals.crossJoin(F.broadcast(z)).select(
        "source",
        F.floor(F.round(TOKEN_BUDGET * F.pow("src_tokens", ALPHA) / F.col("z"), 6))
        .cast("long")
        .alias("budget_tokens"),
    )
    bucketed = toks.withColumn("bkt", F.expr(f"h DIV {_BUCKET_DIV}"))
    bucket_sums = bucketed.groupBy("source", "bkt").agg(
        F.sum("n_tokens").alias("bkt_tokens")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "source",
        "bkt",
        F.coalesce(F.sum("bkt_tokens").over(w_off), F.lit(0)).cast("long").alias("bkt_offset"),
    )
    w_run = (
        Window.partitionBy("source", "bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = bucketed.join(F.broadcast(offsets), ["source", "bkt"]).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("bkt_offset") + F.sum("n_tokens").over(w_run)).cast("long").alias("cum_tokens"),
    )
    return running.join(F.broadcast(budget), "source").filter(
        F.col("cum_tokens") <= F.col("budget_tokens")
    ).select("doc_id", "source", "n_tokens", "cum_tokens", "budget_tokens")


# -- data-constrained epoch scheduling --------------------------------------

EPOCH_CAP = 4.0        # max repetitions of any source (up-sampling cap)
EPOCH_BUDGET_MULT = 3  # training budget = 3 x total corpus tokens


@query(
    "mixing_epoch_schedule",
    oracle=rf"""
    WITH toks AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    per AS (SELECT source, sum(n_tokens) AS src_tokens FROM toks GROUP BY source),
    tot AS (SELECT sum(src_tokens) AS total_tokens,
                   sum(sqrt(src_tokens)) AS z FROM per),
    base AS (
      SELECT p.source, p.src_tokens,
             {EPOCH_BUDGET_MULT} * t.total_tokens * sqrt(p.src_tokens) / t.z
               AS target,
             ({EPOCH_BUDGET_MULT} * t.total_tokens * sqrt(p.src_tokens) / t.z)
               / p.src_tokens > {EPOCH_CAP} AS capped
      FROM per p, tot t
    ),
    spill AS (
      SELECT coalesce(sum(CASE WHEN capped
                               THEN target - {EPOCH_CAP} * src_tokens END), 0)
               AS spill,
             coalesce(sum(CASE WHEN NOT capped THEN target END), 0) AS open_target
      FROM base
    )
    SELECT b.source, CAST(b.src_tokens AS BIGINT) AS src_tokens,
           round(CASE WHEN b.capped THEN {EPOCH_CAP}
                      ELSE least({EPOCH_CAP},
                                 (b.target + CASE WHEN s.open_target > 0
                                                  THEN s.spill * b.target / s.open_target
                                                  ELSE 0 END) / b.src_tokens)
                 END, 4) AS epochs,
           CAST(round(CASE WHEN b.capped THEN {EPOCH_CAP} * b.src_tokens
                      ELSE least({EPOCH_CAP} * b.src_tokens,
                                 b.target + CASE WHEN s.open_target > 0
                                                 THEN s.spill * b.target / s.open_target
                                                 ELSE 0 END)
                 END, 2) AS DOUBLE) AS allocated_tokens
    FROM base b, spill s
    """,
    doc="data-constrained epoch schedule: temperature-weighted token "
    "budget split across sources with a hard up-sampling cap and one "
    "deterministic spill-redistribution round — the 'how many epochs "
    "of each source' plan a repetition-limited training run needs; "
    "fully hash-gated",
)
def mixing_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many EPOCHS of each source a token budget buys — the
    data-constrained regime (Muennighoff et al. 2023, arXiv:2305.16264:
    repeating data beyond ~4 epochs yields rapidly diminishing
    returns, so up-sampling is capped). Budget = {EPOCH_BUDGET_MULT}x
    the corpus, split by temperature weights (sqrt — i.e. tau=0.5,
    chosen because sqrt is IEEE-correctly-rounded on BOTH engines
    where general pow is not, keeping the gate bit-stable), with one
    redistribution round: sources whose allocation exceeds the
    {EPOCH_CAP}-epoch cap return their excess to the pool, which
    spreads over uncapped sources in proportion to their target (then
    caps again; residual spill after the second cap stays
    unallocated — a single deterministic round, not an iterative
    water-fill, so the SQL replica is exact).

    Scale shape: one corpus-sized token-count aggregate; everything
    after runs on |sources| rows through broadcast scalar joins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    per = toks.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    return epoch_schedule(per)


def epoch_schedule(
    per: DataFrame, budget_mult: float = EPOCH_BUDGET_MULT, cap: float = EPOCH_CAP
) -> DataFrame:
    """The schedule computation over a (source, src_tokens) frame —
    factored out so the cap/redistribution arithmetic is unit-testable
    on skewed synthetic mixes the corpus fixture never produces."""
    tot = per.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.sum(F.sqrt(F.col("src_tokens"))).alias("z"),
    )
    target = (
        F.lit(budget_mult) * F.col("total_tokens")
        * F.sqrt(F.col("src_tokens")) / F.col("z")
    )
    base = per.crossJoin(F.broadcast(tot)).select(
        "source", "src_tokens",
        target.alias("target"),
        (target / F.col("src_tokens") > cap).alias("capped"),
    )
    spill = base.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"),
                         F.col("target") - cap * F.col("src_tokens"))),
            F.lit(0.0),
        ).alias("spill"),
        F.coalesce(
            F.sum(F.when(~F.col("capped"), F.col("target"))), F.lit(0.0)
        ).alias("open_target"),
    )
    share = F.when(
        F.col("open_target") > 0,
        F.col("spill") * F.col("target") / F.col("open_target"),
    ).otherwise(F.lit(0.0))
    final_target = F.when(
        F.col("capped"), F.lit(cap) * F.col("src_tokens")
    ).otherwise(F.least(F.lit(cap) * F.col("src_tokens"),
                        F.col("target") + share))
    return base.crossJoin(F.broadcast(spill)).select(
        "source",
        F.col("src_tokens").cast("long").alias("src_tokens"),
        F.round(final_target / F.col("src_tokens"), 4).alias("epochs"),
        F.round(final_target, 2).alias("allocated_tokens"),
    )


def _leakage_safe_split_oracle() -> str:
    from tripl_spark.operators.dedup_groups import _groups_oracle_sql

    return f"""
    WITH g AS ({_groups_oracle_sql()})
    SELECT doc_id, group_id,
           CAST(CAST('0x' || substring(md5('split:' || CAST(group_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 100 AS BIGINT) AS bucket,
           CASE
             WHEN CAST('0x' || substring(md5('split:' || CAST(group_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 100 < 90 THEN 'train'
             WHEN CAST('0x' || substring(md5('split:' || CAST(group_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 100 < 95 THEN 'val'
             ELSE 'test'
           END AS split
    FROM g
    """


@query(
    "mixing_leakage_safe_split",
    oracle=_leakage_safe_split_oracle(),
    doc="leakage-safe train/val/test split: the split hash keys on the "
    "near-dup FAMILY's canonical id (MinHash groups closure), so no "
    "duplicate family ever straddles train and test — eval "
    "contamination by near-copies is impossible by construction; "
    "singleton docs hash exactly like mixing_split_assign (group_id = "
    "doc_id), so the two splitters agree outside dup families; fully "
    "hash-gated",
)
def mixing_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random splits leak: a near-duplicate pair split across train
    and test inflates eval scores with memorized copies (the classic
    benchmark-contamination mechanism inside one corpus). The fix is
    to make the split decision per duplicate FAMILY — hash the
    family's canonical id (the dedup-groups component), so every
    member lands in the same split. For singleton documents the
    family id IS the doc id, so this agrees with `mixing_split_assign`
    everywhere dedup found nothing — the plain splitter is the
    degenerate case of this one.

    Scale shape: the groups closure is the dedup pipeline's existing
    cost (CC over the dup-rate-sized pair list + one corpus
    membership join); the split itself stays a pure projection of the
    group id — no new shuffle over the corpus."""
    from tripl_spark.operators.dedup_groups import dedup_groups_canonical

    groups = dedup_groups_canonical(spark, sf_dir).select("doc_id", "group_id")
    bucket = F.pmod(
        _md5_hash60(F.concat(F.lit("split:"), F.col("group_id").cast("string"))),
        F.lit(100),
    ).cast("long")
    return groups.select(
        "doc_id",
        "group_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )
