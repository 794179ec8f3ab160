"""End-to-end curation pipeline: the composed shape a training-data
run actually executes, as ONE declarative plan.

Individual operators (exact dedup, quality scoring, stratified quotas,
token counting) each have their own oracled query; this module chains
them the way a real corpus build does —

    exact-dedup keepers → quality filter → per-(source,lang) quota →
    token accounting —

and registers the WHOLE composition under the hash gate. That pins the
cross-stage contracts (a doc dropped by dedup must never re-enter at
quota time; quality filtering happens before, not after, quotas) which
per-stage oracles cannot see.

Scale shape: the four stages fuse into two shuffles — one keyed by the
content fingerprint (dedup groupBy-join), one by the stratum (quota
window). Quality scoring and token counting are map-side projections
Catalyst pipelines into the adjacent stages; nothing is materialized
between stages, so the optimizer sees (and prunes/pushes through) the
whole pipeline at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.operators.curation import _md5_hash60
from tripl_spark.operators.dedup import normalized_text
from tripl_spark.operators.text import (
    PPL_KEEP_BUCKETS,
    _tokens,
    contamination_pairs,
    quality_score_expr,
    quality_score_sql,
)
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table, local_df

QUALITY_CUT = 0.5
QUOTA_PER_STRATUM = 30


@query(
    "pipeline_curation_end2end",
    oracle=rf"""
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    ),
    scored AS (
      SELECT d.doc_id, d.source, d.lang,
             CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS n_tokens,
             {quality_score_sql('d.')} AS quality_score
      FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    ),
    quota AS (
      SELECT *, row_number() OVER (
               PARTITION BY source, lang
               ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT),
                        doc_id) AS rk
      FROM scored
      WHERE quality_score >= {QUALITY_CUT}
    )
    SELECT doc_id, source, lang, quality_score, n_tokens, CAST(rk AS INT) AS rk
    FROM quota WHERE rk <= {QUOTA_PER_STRATUM}
    """,
)
def pipeline_curation_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keepers → quality ≥ 0.5 → ≤30 docs per (source, lang) by
    stable hash order → token counts, as one Catalyst plan."""
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: exact-dedup keepers (smallest doc_id per content class)
    keepers = (
        docs.groupBy(F.md5(normalized_text()).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = docs.join(keepers, "doc_id")

    # stage 2: quality scoring (map-side projection, same formula as
    # text_quality_score) + filter
    n_tokens = F.size(_tokens()).cast("long")
    score = quality_score_expr()
    scored = deduped.select(
        "doc_id", "source", "lang",
        n_tokens.alias("n_tokens"), score.alias("quality_score"),
    ).filter(F.col("quality_score") >= QUALITY_CUT)

    # stage 3: deterministic per-stratum quota
    h = _md5_hash60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source", "lang").orderBy(h, F.col("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA_PER_STRATUM)
        .select("doc_id", "source", "lang", "quality_score", "n_tokens", "rk")
    )


SEM_QUOTA_PER_LANG = 40
SEM_PIPE_THRESHOLD = 0.4


def _semantic_pipeline_oracle() -> str:
    from tripl_spark.operators.clustering import KMEANS2_CTES, _capped_cte, _lists_cte

    # `cl` replicates the SEM_MAX_CLUSTER cap the Spark pair stage
    # applies by default, so the gate pins the bounded production shape
    return rf"""
    WITH {KMEANS2_CTES},
{_lists_cte()},
{_capped_cte()},
    dropped AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= {SEM_PIPE_THRESHOLD}
    ),
    survivors AS (
      SELECT vec_id FROM e
      WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    ),
    scored AS (
      SELECT d.doc_id, d.source, d.lang,
             {quality_score_sql('d.')} AS quality_score
      FROM documents d JOIN survivors s ON d.doc_id = s.vec_id
    )
    SELECT doc_id, source, lang, quality_score, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY lang
               ORDER BY quality_score DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {SEM_QUOTA_PER_LANG}
    """


@query(
    "pipeline_semantic_curation",
    oracle=_semantic_pipeline_oracle(),
    doc="cross-modal curation: SemDeDup pair-greedy keepers over the "
    "embeddings joined back to documents, quality-ranked per lang — "
    "the embedding-space twin of pipeline_curation_end2end, fully "
    "hash-gated end-to-end",
)
def pipeline_semantic_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space curation pipeline: semantic near-dup pairs
    (k-means-trained clusters, cosine ≥ threshold) elect pair-greedy
    keepers — a doc is dropped iff it is the HIGHER vec_id of any dup
    pair, the one-pass rule; transitive-closure canonicalization is
    the separate `dedup_groups_canonical` path — then the surviving
    embeddings join back to their documents (doc_id = vec_id) for
    quality scoring and a top-N-per-lang cut.

    Pins the cross-modal contract per-stage oracles can't see: a doc
    semantically deduped in embedding space must never re-enter at
    quota time, and the doc⋈embedding join must not resurrect rows.

    Scale shape: dup-pair generation is the within-cluster join with
    the DEFAULT `SEM_MAX_CLUSTER` cap (`semantic_dedup_pairs`),
    replicated in the oracle's `cl` CTE so the hash gate pins the
    bounded shape; `dropped` is a distinct projection of
    the pair list (≪ corpus); survivors anti-join it broadcast; the
    doc⋈embedding equi-join is the one corpus-sized shuffle; the lang
    quota window shuffles only surviving rows."""
    from tripl_spark.operators.clustering import (
        _assign_literal,
        kmeans_2iter_centroid_rows,
        semantic_dedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = _assign_literal(emb, kmeans_2iter_centroid_rows(emb)).select(
        "vec_id", "v", "cid"
    )
    pairs = semantic_dedup_pairs(assigned, threshold=SEM_PIPE_THRESHOLD)
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    survivors = emb.select("vec_id").join(F.broadcast(dropped), "vec_id", "left_anti")

    docs = load_table(spark, sf_dir, "documents")
    score = quality_score_expr()
    scored = docs.join(
        survivors.withColumnRenamed("vec_id", "doc_id"), "doc_id"
    ).select("doc_id", "source", "lang", score.alias("quality_score"))
    w = Window.partitionBy("lang").orderBy(F.desc("quality_score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SEM_QUOTA_PER_LANG)
        .select("doc_id", "source", "lang", "quality_score", "rk")
    )


DECON_MIN_SHARED = 5
DECON_QUOTA_PER_SOURCE = 25


@query(
    "pipeline_decontaminated_corpus",
    # Contamination detection (the text_ngram_contamination stage) →
    # anti-join → quality ranking, as one plan. The oracle matches
    # grams as strings; the Spark side joins 64-bit gram hashes — the
    # same equivalence the oracled contamination query already pins.
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, greatest(len(t) - 2, 1) + 1)]))
               AS g
      FROM toks
    ),
    contaminated AS (
      SELECT DISTINCT tr.doc_id
      FROM (SELECT * FROM grams WHERE doc_id % 97 != 0) tr
      JOIN (SELECT * FROM grams WHERE doc_id % 97 = 0) be ON tr.g = be.g
      GROUP BY tr.doc_id, be.doc_id
      HAVING count(*) >= {DECON_MIN_SHARED}
    ),
    scored AS (
      SELECT d.doc_id, d.source, d.lang,
             {quality_score_sql('d.')} AS quality_score
      FROM documents d
      WHERE d.doc_id % 97 != 0
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT doc_id, source, lang, quality_score, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source
               ORDER BY quality_score DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {DECON_QUOTA_PER_SOURCE}
    """,
)
def pipeline_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination as a pipeline stage: drop every training doc
    sharing >= DECON_MIN_SHARED distinct 3-grams with the held-out
    benchmark slice (doc_id % 97 = 0 — the text_ngram_contamination
    stage), then quality-rank the survivors per source. Pins the
    contract a benchmark-honest corpus build needs: a contaminated doc
    must never reach ranking, and the benchmark slice itself is
    excluded from the training output.

    Scale shape: the benchmark gram set broadcasts (eval sets are
    small by definition); the contaminated-id list — dup rate ×
    corpus, tiny — broadcasts into the anti-join; the only
    corpus-sized work is the gram scan and the per-source ranking
    window over survivors."""
    docs = load_table(spark, sf_dir, "documents")
    contaminated = (
        contamination_pairs(docs, n=3, min_shared=DECON_MIN_SHARED)
        .select("doc_id")
        .distinct()
    )
    score = quality_score_expr()
    scored = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select("doc_id", "source", "lang", score.alias("quality_score"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality_score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DECON_QUOTA_PER_SOURCE)
        .select("doc_id", "source", "lang", "quality_score", "rk")
    )


SEM_DECON_THRESHOLD = 0.3
SEM_DECON_QUOTA_PER_SOURCE = 25


@query(
    "pipeline_semantic_decontamination",
    # Embedding-space decontamination: the n-gram pass above catches
    # verbatim leakage; this catches PARAPHRASED benchmark content the
    # token-overlap scan is blind to. The benchmark slice (vec_id % 97
    # = 0) is tiny by definition, so the match stage is bench x corpus
    # (linear in the corpus) — never corpus x corpus.
    oracle=rf"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT * FROM e WHERE vec_id % 97 = 0),
    c AS (SELECT * FROM e WHERE vec_id % 97 != 0),
    contaminated AS (
      SELECT DISTINCT c.vec_id
      FROM c JOIN b
        ON round(list_cosine_similarity(c.v, b.v), 4) >= {SEM_DECON_THRESHOLD}
    ),
    scored AS (
      SELECT d.doc_id, d.source, d.lang,
             {quality_score_sql('d.')} AS quality_score
      FROM documents d JOIN c ON c.vec_id = d.doc_id
      WHERE d.doc_id NOT IN (SELECT vec_id FROM contaminated)
    )
    SELECT doc_id, source, lang, quality_score, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source
               ORDER BY quality_score DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {SEM_DECON_QUOTA_PER_SOURCE}
    """,
    doc="embedding-space decontamination: drop training docs whose "
    "embedding matches any held-out benchmark embedding above a cosine "
    "threshold (catches the paraphrased leakage n-gram overlap "
    "misses), then quality-rank survivors per source — fully "
    "hash-gated",
)
def pipeline_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: the embedding-space twin of
    ``pipeline_decontaminated_corpus``. N-gram overlap only catches
    verbatim benchmark leakage; paraphrased or translated eval content
    survives it — matching in embedding space (cosine >= threshold to
    ANY held-out benchmark vector) is the standard second pass. Docs
    whose embedding matches the benchmark slice (vec_id % 97 = 0) are
    dropped before quality ranking; the benchmark slice itself never
    reaches the output (the corpus side excludes it by construction).

    Scale shape: the benchmark embeddings broadcast (eval sets are
    small by definition) into a BroadcastNestedLoopJoin against the
    corpus — bench x corpus comparisons, LINEAR in corpus size, the
    same bounded shape as the quantile probe; at larger eval sets,
    pre-bucket both sides with the trained codebook and match within
    clusters only (``semantic_match_new`` is exactly that machinery).
    The contaminated-id list (tiny) broadcasts into the anti-join;
    the per-source ranking window shuffles only survivor rows."""
    from tripl_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bench = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv")
    )
    corpus = emb.filter(F.col("vec_id") % 97 != 0)
    contaminated = (
        corpus.join(
            F.broadcast(bench),
            F.round(cosine(F.col("v"), F.col("bv")), 4) >= SEM_DECON_THRESHOLD,
        )
        .select("vec_id")
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    score = quality_score_expr()
    scored = (
        docs.join(corpus.select("vec_id").withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .join(F.broadcast(contaminated.withColumnRenamed("vec_id", "doc_id")),
              "doc_id", "left_anti")
        .select("doc_id", "source", "lang", score.alias("quality_score"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality_score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SEM_DECON_QUOTA_PER_SOURCE)
        .select("doc_id", "source", "lang", "quality_score", "rk")
    )


FULL_QUOTA_PER_SOURCE = 20


def _full_curation_oracle(bucketing: str = "ntile") -> str:
    from tripl_spark.operators.clustering import (
        KMEANS2_CTES,
        SEM_THRESHOLD,
        _capped_cte,
        _lists_cte,
    )
    from tripl_spark.operators.text import (
        bigram_scored_ctes,
        ppl_bucket_case,
        ppl_cutoff_sql,
    )

    # the LM chain is prefixed lm_ to avoid CTE-name collisions with
    # the k-means chain (both define c1); lm_toks carries the same
    # lower/trim/split normalization the contamination stage uses, so
    # the gram CTEs build on it directly.
    return rf"""
    WITH {KMEANS2_CTES},
{_lists_cte()},
{_capped_cte()},
{bigram_scored_ctes('lm_')},
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, greatest(len(t) - 2, 1) + 1)]))
               AS g
      FROM lm_toks
    ),
    contaminated AS (
      SELECT DISTINCT tr.doc_id
      FROM (SELECT * FROM grams WHERE doc_id % 97 != 0) tr
      JOIN (SELECT * FROM grams WHERE doc_id % 97 = 0) be ON tr.g = be.g
      GROUP BY tr.doc_id, be.doc_id
      HAVING count(*) >= {DECON_MIN_SHARED}
    ),
    semdropped AS (
      SELECT DISTINCT b.vec_id AS doc_id
      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= {SEM_THRESHOLD}
    ),
    survivors AS (
      SELECT d.doc_id, d.source, d.lang,
             {quality_score_sql('d.')} AS quality_score
      FROM documents d
      JOIN keepers k ON d.doc_id = k.doc_id
      WHERE d.doc_id % 97 != 0
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND d.doc_id NOT IN (SELECT doc_id FROM semdropped)
    ),
    {_bucketed_lbl_sql(bucketing, ppl_cutoff_sql, ppl_bucket_case)}
    SELECT doc_id, source, lang, quality_score, avg_logprob,
           CAST(ppl_bucket AS INT) AS ppl_bucket, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source
               ORDER BY quality_score DESC, doc_id) AS rk
      FROM lbl WHERE ppl_bucket <= {PPL_KEEP_BUCKETS}
    ) WHERE rk <= {FULL_QUOTA_PER_SOURCE}
    """


def _bucketed_lbl_sql(bucketing, ppl_cutoff_sql, ppl_bucket_case) -> str:
    """Stage-4 CTE(s) producing ``lbl(doc_id, source, lang,
    quality_score, avg_logprob, ppl_bucket)`` over survivors — exact
    per-lang ntile, or the broadcast-cutoff twin's sample chain."""
    if bucketing == "ntile":
        return f"""lbl AS (
      SELECT sv.doc_id, sv.source, sv.lang, sv.quality_score, sc.avg_logprob,
             ntile(3) OVER (PARTITION BY sv.lang
                            ORDER BY sc.avg_logprob DESC, sv.doc_id) AS ppl_bucket
      FROM survivors sv JOIN lm_scored sc USING (doc_id)
    )"""
    return f"""pplbl AS (
      SELECT sv.doc_id, sv.lang, sc.avg_logprob
      FROM survivors sv JOIN lm_scored sc USING (doc_id)
    ),
    {ppl_cutoff_sql('pp')},
    lbl AS (
      SELECT sv.doc_id, sv.source, sv.lang, sv.quality_score, l.avg_logprob,
             {ppl_bucket_case('l', 'c')} AS ppl_bucket
      FROM survivors sv
      JOIN pplbl l ON sv.doc_id = l.doc_id
      LEFT JOIN ppcuts c ON l.lang = c.lang
    )"""


@query(
    "pipeline_full_curation",
    oracle=_full_curation_oracle(),
    doc="the complete corpus build as ONE plan: exact dedup -> n-gram "
    "decontamination -> semantic dedup (capped clusters) -> "
    "perplexity tail-drop -> per-source quality quota, every stage's "
    "training replayed in SQL — fully hash-gated end-to-end",
)
def pipeline_full_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grand composition — every curation family this engine
    implements, chained the way a production corpus build runs them,
    as ONE declarative plan:

    1. exact-dedup keepers (smallest doc_id per normalized-content
       class — a duplicate never re-enters downstream);
    2. n-gram decontamination (docs sharing >= DECON_MIN_SHARED
       3-grams with the held-out benchmark slice drop; the slice
       itself never reaches the output);
    3. semantic dedup (SemDeDup pair-greedy: the higher vec_id of any
       within-cluster cosine pair drops — the capped trained-cluster
       stage; docs without embeddings pass through unchecked);
    4. perplexity tail-drop: the bigram LM trains on the FULL corpus
       (stable statistics regardless of upstream drops), but bucket
       ranks are computed over SURVIVORS only — per-lang ntile
       thirds, tail dropped;
    5. per-source quality quota on what remains.

    Per-stage oracles can't see cross-stage contracts (a deduped doc
    re-entering at LM-bucketing time, a contaminated doc reaching the
    quota, bucketing computed over the wrong population); this pins
    the whole chain, training included.

    Scale shape: stages fuse into one Catalyst plan — the fingerprint
    groupBy, the capped within-cluster pair join, and the LM bigram
    count are the corpus-sized shuffles; benchmark grams, dropped-id
    lists, and both LM count tables broadcast; the ntile and quota
    windows shuffle only survivor stub rows (id + stratum + scores,
    never text). The per-lang ntile is still a skewed-key sort at
    100 TB — ``pipeline_full_curation_bycutoff`` is the production
    twin with that stage swapped for broadcast cutoffs."""
    return _full_curation_df(spark, sf_dir, bucketing="ntile")


@query(
    "pipeline_full_curation_bycutoff",
    oracle=_full_curation_oracle(bucketing="cutoff"),
    doc="the full corpus build with stage 4 in PRODUCTION shape: "
    "perplexity buckets assigned from broadcast per-lang sample "
    "cutoffs instead of the per-lang ntile sort — the variant that "
    "survives a dominant language at 100 TB; fully hash-gated",
)
def pipeline_full_curation_bycutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pipeline_full_curation`` with the one remaining skewed-key
    stage replaced by its scale-safe twin: stage 4's bucket
    boundaries come from ``perplexity_cutoffs`` (bounded per-lang
    sample, broadcast) and buckets are assigned scan-side, so NO
    window in the whole composition partitions by a potentially
    dominant key — the quota window is WindowGroupLimit-pushed and
    per-source. This is the plan a 1000-executor corpus build should
    run; the exact-ntile composition stays registered as the
    rank-arithmetic oracle shape."""
    return _full_curation_df(spark, sf_dir, bucketing="cutoff")


def _full_curation_df(spark: SparkSession, sf_dir: str, bucketing: str) -> DataFrame:
    from tripl_spark.operators.clustering import (
        SEM_THRESHOLD,
        _assign_literal,
        kmeans_2iter_centroid_rows,
        semantic_dedup_pairs,
    )
    from tripl_spark.operators.text import bigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    keepers = (
        docs.groupBy(F.md5(normalized_text()).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    contaminated = (
        contamination_pairs(docs, n=3, min_shared=DECON_MIN_SHARED)
        .select("doc_id")
        .distinct()
    )
    assigned = _assign_literal(emb, kmeans_2iter_centroid_rows(emb)).select(
        "vec_id", "v", "cid"
    )
    semdropped = (
        semantic_dedup_pairs(assigned, threshold=SEM_THRESHOLD)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    score = quality_score_expr()
    survivors = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .join(keepers, "doc_id")
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .join(F.broadcast(semdropped), "doc_id", "left_anti")
        .select("doc_id", "source", "lang", score.alias("quality_score"))
    )
    # the LM trains on the FULL corpus (stable statistics regardless of
    # upstream drops); bucketing is survivor-scoped — both oracles
    # replicate exactly this population split
    lm = bigram_logprob_scores(docs).select("doc_id", "avg_logprob")
    if bucketing == "ntile":
        w_ppl = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
        lbl = (
            survivors.join(lm, "doc_id")
            .withColumn("ppl_bucket", F.ntile(3).over(w_ppl))
            .filter(F.col("ppl_bucket") <= PPL_KEEP_BUCKETS)
        )
    else:
        from tripl_spark.operators.text import assign_ppl_buckets, perplexity_cutoffs

        scored_stubs = survivors.select("doc_id", "lang").join(lm, "doc_id")
        cuts = perplexity_cutoffs(scored_stubs)
        lbl = assign_ppl_buckets(survivors.join(lm, "doc_id"), cuts).filter(
            F.col("ppl_bucket") <= PPL_KEEP_BUCKETS
        )
    w_q = Window.partitionBy("source").orderBy(F.desc("quality_score"), "doc_id")
    return (
        lbl.withColumn("rk", F.row_number().over(w_q))
        .filter(F.col("rk") <= FULL_QUOTA_PER_SOURCE)
        .select(
            "doc_id", "source", "lang", "quality_score", "avg_logprob",
            "ppl_bucket", "rk",
        )
    )


def _leakage_safe_corpus_oracle() -> str:
    from tripl_spark.operators.dedup_groups import _groups_oracle_sql
    from tripl_spark.operators.text import _GOPHER_ORACLE

    return rf"""
    WITH g AS ({_groups_oracle_sql()}),
    flags AS ({_GOPHER_ORACLE}),
    train AS (
      SELECT g.doc_id, g.group_id
      FROM g JOIN flags ON g.doc_id = flags.doc_id
      WHERE g.keep AND flags.passes
        AND CAST('0x' || substring(md5('split:' || CAST(g.group_id AS VARCHAR)), 1, 15)
                 AS BIGINT) % 100 < 90
    )
    SELECT t.doc_id, t.group_id, d.source, d.lang,
           CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT)
             AS n_tokens
    FROM train t JOIN documents d ON t.doc_id = d.doc_id
    """


@query(
    "pipeline_leakage_safe_corpus",
    oracle=_leakage_safe_corpus_oracle(),
    doc="the leakage-safe training-corpus builder, fused: near-dup "
    "family resolution (canonical survivor per MinHash group) -> "
    "Gopher rule battery -> family-keyed train split (no dup family "
    "straddles train/eval) -> token-counted manifest; one Catalyst "
    "plan composing three oracled stages; fully hash-gated",
)
def pipeline_leakage_safe_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus a careful team actually trains on, as ONE fused
    plan: (1) fuzzy-dedup GROUP resolution keeps the canonical
    survivor per near-dup family (`dedup_groups_canonical` — pairwise
    keep/drop over-retains transitive chains); (2) the Gopher rule
    battery drops rule-failing documents (`text_gopher_rules`); (3)
    the train split keys on the FAMILY id
    (`mixing_leakage_safe_split`), so even the dropped near-dups'
    surviving canonical lands opposite no family member — eval
    contamination by near-copies is structurally impossible; (4) the
    manifest carries token counts for budget accounting.

    Scale shape: stage 1 is the dedup pipeline's existing cost
    (banded candidate pairs + CC over the dup-rate-sized pair list +
    one corpus membership join); stages 2-3 are scan projections
    fused into the same plan (the split is a hash of a column already
    present); stage 4 is one doc_id-keyed join back to documents.
    Catalyst sees the whole chain, so the documents scan serves both
    the flag projection and the final join with column pruning
    intact."""
    from tripl_spark.operators.dedup_groups import dedup_groups_canonical
    from tripl_spark.operators.text import gopher_flag_frame

    docs = load_table(spark, sf_dir, "documents")
    groups = dedup_groups_canonical(spark, sf_dir)
    passing = gopher_flag_frame(docs).filter(F.col("passes")).select("doc_id")
    bucket = F.pmod(
        _md5_hash60(
            F.concat(F.lit("split:"), F.col("group_id").cast("string"))
        ),
        F.lit(100),
    )
    train = (
        groups.filter(F.col("keep"))
        .join(passing, "doc_id")
        .filter(bucket < 90)
        .select("doc_id", "group_id")
    )
    return train.join(docs, "doc_id").select(
        "doc_id",
        "group_id",
        "source",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )


def _drop_ledger_oracle() -> str:
    from tripl_spark.operators.dedup_groups import _groups_oracle_sql
    from tripl_spark.operators.text import _GOPHER_ORACLE

    return rf"""
    WITH g AS ({_groups_oracle_sql()}),
    flags AS ({_GOPHER_ORACLE}),
    b AS (
      SELECT g.doc_id, g.group_id, g.keep,
             flags.wc_ok, flags.mwl_ok, flags.alpha_ok, flags.symbol_ok,
             flags.stop_ok,
             CAST('0x' || substring(md5('split:' || CAST(g.group_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 100 AS bucket
      FROM g JOIN flags ON g.doc_id = flags.doc_id
    )
    SELECT doc_id, group_id,
           CASE
             WHEN NOT keep THEN 'dropped:near_dup'
             WHEN NOT wc_ok THEN 'dropped:rule_wc'
             WHEN NOT mwl_ok THEN 'dropped:rule_mwl'
             WHEN NOT alpha_ok THEN 'dropped:rule_alpha'
             WHEN NOT symbol_ok THEN 'dropped:rule_symbol'
             WHEN NOT stop_ok THEN 'dropped:rule_stop'
             WHEN bucket >= 95 THEN 'held_out:test'
             WHEN bucket >= 90 THEN 'held_out:val'
             ELSE 'train'
           END AS fate
    FROM b
    """


@query(
    "pipeline_drop_ledger",
    oracle=_drop_ledger_oracle(),
    doc="per-document FATE through the leakage-safe corpus build: the "
    "first stage that dropped it (near-dup election, then the Gopher "
    "rules in battery order) or its held-out/train assignment — the "
    "'why was my document dropped' debugger and the conservation "
    "ledger (every input doc appears exactly once); fully hash-gated",
)
def pipeline_drop_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pipeline_leakage_safe_corpus` emits the survivors; THIS emits
    everything else with a reason — the observability surface a data
    team actually debugs with ('why did doc X vanish?') and the
    conservation check (ledger rows == corpus rows, exactly one fate
    each; pinned in tests/test_sampling_ops.py). Fate precedence
    mirrors execution order: near-dup election first (a non-canonical
    family member is dropped before its quality is ever consulted),
    then the Gopher rules in battery order (first failing rule
    named), then the family-keyed split.

    Scale shape: the same fused plan as the corpus builder — the
    groups closure plus scan projections — with the CASE fate a pure
    projection on top; no new shuffle."""
    from tripl_spark.operators.dedup_groups import dedup_groups_canonical
    from tripl_spark.operators.text import gopher_flag_frame

    docs = load_table(spark, sf_dir, "documents")
    groups = dedup_groups_canonical(spark, sf_dir).select(
        "doc_id", "group_id", "keep"
    )
    flags = gopher_flag_frame(docs).select(
        "doc_id", "wc_ok", "mwl_ok", "alpha_ok", "symbol_ok", "stop_ok"
    )
    bucket = F.pmod(
        _md5_hash60(
            F.concat(F.lit("split:"), F.col("group_id").cast("string"))
        ),
        F.lit(100),
    )
    from tripl_spark.operators.text import first_failing_rule

    rule_fate = first_failing_rule()  # the SHARED battery order
    fate = (
        F.when(~F.col("keep"), F.lit("dropped:near_dup"))
        .when(rule_fate.isNotNull(), F.concat(F.lit("dropped:"), rule_fate))
        .when(bucket >= 95, F.lit("held_out:test"))
        .when(bucket >= 90, F.lit("held_out:val"))
        .otherwise(F.lit("train"))
    )
    return groups.join(flags, "doc_id").select(
        "doc_id", "group_id", fate.alias("fate")
    )


def _provenance_oracle() -> str:
    """Composed provenance-axis oracle: blocklist → domain quota →
    mojibake → PII, one CASE fate per document. Every fragment is the
    SAME constant the standalone queries inject (url planting +
    components, mojibake planting + patterns, the PII scrub CTE
    chain), so this oracle cannot drift from the per-stage gates."""
    from tripl_spark.operators.pii import _FINAL_T, _STAGES_SQL, _SUM_SQL
    from tripl_spark.operators.text import _MOJI_ENRICH_SQL, MOJIBAKE_PATTERNS
    from tripl_spark.operators.urls import (
        BLOCKED_DOMAINS,
        BLOCKED_TLDS,
        DOMAIN_QUOTA_K,
        _COMPONENTS_SQL,
    )

    moji_sum = " + ".join(
        f"len(regexp_extract_all(mt, '{pat}'))" for _, pat in MOJIBAKE_PATTERNS
    )
    bd = ", ".join(f"('{d}', '{r}')" for d, r in BLOCKED_DOMAINS)
    bt = ", ".join(f"('{t}', '{r}')" for t, r in BLOCKED_TLDS)
    return f"""
    WITH u AS ({_COMPONENTS_SQL}),
    b AS (
      SELECT u.doc_id, u.reg_domain, u.n_chars,
             COALESCE(bd.reason, bt.reason) AS block_reason
      FROM u
      LEFT JOIN (VALUES {bd}) AS bd(dom, reason) ON u.reg_domain = bd.dom
      LEFT JOIN (VALUES {bt}) AS bt(tld2, reason) ON u.tld = bt.tld2),
    q AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY reg_domain
                 ORDER BY n_chars DESC, doc_id) AS rk
      FROM b WHERE block_reason IS NULL),
    m AS (
      SELECT doc_id, {moji_sum} AS n_moji
      FROM (SELECT doc_id, {_MOJI_ENRICH_SQL} AS mt FROM documents)),
    {_STAGES_SQL},
    p AS (SELECT doc_id, {_SUM_SQL} AS n_pii
          FROM {_FINAL_T.replace('t', 's')}),
    fate AS (
      SELECT b.doc_id,
             CASE WHEN b.block_reason IS NOT NULL THEN b.block_reason
                  WHEN q.rk > {DOMAIN_QUOTA_K} THEN 'domain_quota'
                  WHEN m.n_moji > 0 THEN 'mojibake'
                  WHEN p.n_pii >= 2 THEN 'pii'
                  ELSE NULL END AS drop_stage
      FROM b
      LEFT JOIN q ON b.doc_id = q.doc_id
      JOIN m ON b.doc_id = m.doc_id
      JOIN p ON b.doc_id = p.doc_id)
    SELECT doc_id, drop_stage, (drop_stage IS NULL) AS kept FROM fate
    """


@query(
    "pipeline_provenance_curation",
    oracle=_provenance_oracle(),
    doc="per-document FATE through the provenance axis: blocklisted "
    "domain/TLD first (a blocked source never consults content), then "
    "the per-domain quota, then encoding damage, then PII density — "
    "the composed drop ledger of the r12-r14 hygiene families "
    "(conservation: every doc appears exactly once); fully hash-gated",
)
def pipeline_provenance_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The provenance twin of `pipeline_drop_ledger` (content axis):
    WHERE a document came from decides first, WHAT it contains second.
    Stage precedence mirrors execution order — blocklist (broadcast
    rules), domain quota (rank among blocklist SURVIVORS — a blocked
    doc must not consume quota), mojibake, PII density.

    Scale shape: every content signal (mojibake counts, PII counts) is
    a map-only projection computed ON THE SAME SCAN as the URL parse —
    never a doc_id-keyed join back — so the plan is broadcasts + ONE
    shuffle (the survivors' quota window) + a union with the blocked
    branch. Plan-gated in tests/test_plan_quality.py."""
    from tripl_spark.operators.pii import _enriched_text, pii_counts
    from tripl_spark.operators.text import MOJIBAKE_PATTERNS, _mojibake_text
    from tripl_spark.operators.urls import (
        BLOCKED_DOMAINS,
        BLOCKED_TLDS,
        DOMAIN_QUOTA_K,
        _url_col,
        registered_domain,
    )

    docs = load_table(spark, sf_dir, "documents")
    moji_total = None
    mt = _mojibake_text()
    for _, pat in MOJIBAKE_PATTERNS:
        c = F.size(F.regexp_extract_all(mt, F.lit(pat), F.lit(0)))
        moji_total = c if moji_total is None else (moji_total + c)
    pii_cols = pii_counts(_enriched_text())
    pii_total = None
    for col in pii_cols:
        # each entry is an aliased count column; strip to the expression
        pii_total = col if pii_total is None else (pii_total + col)
    # every signal is computed ON ONE SCAN — no doc_id-keyed join back
    base = docs.select(
        "doc_id",
        F.col("n_chars"),
        registered_domain(F.parse_url(_url_col(), F.lit("HOST"))).alias(
            "reg_domain"
        ),
        F.element_at(
            F.split(F.parse_url(_url_col(), F.lit("HOST")), r"\."), -1
        ).alias("tld"),
        moji_total.alias("n_moji"),
        pii_total.alias("n_pii"),
    )
    bd = F.broadcast(
        local_df(spark, BLOCKED_DOMAINS, "dom string, d_reason string")
    )
    bt = F.broadcast(
        local_df(spark, BLOCKED_TLDS, "btld string, t_reason string")
    )
    flagged = (
        base.join(bd, base.reg_domain == bd.dom, "left")
        .join(bt, base.tld == bt.btld, "left")
        .withColumn("block_reason", F.coalesce("d_reason", "t_reason"))
    )
    # ONE corpus scan, ONE shuffle: a filter-then-union would read the
    # scan once per branch, so instead the quota window partitions by
    # (block_reason IS NULL, reg_domain) — survivors of a domain rank
    # exactly as they would after filtering (their partition holds
    # precisely them), blocked rows rank among themselves and their
    # rank is never consulted (the CASE claims them first)
    w = Window.partitionBy(
        F.col("block_reason").isNull(), F.col("reg_domain")
    ).orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    fate = (
        F.when(F.col("block_reason").isNotNull(), F.col("block_reason"))
        .when(F.row_number().over(w) > DOMAIN_QUOTA_K, F.lit("domain_quota"))
        .when(F.col("n_moji") > 0, F.lit("mojibake"))
        .when(F.col("n_pii") >= 2, F.lit("pii"))
    )
    return flagged.select(
        "doc_id",
        fate.alias("drop_stage"),
        fate.isNull().alias("kept"),
    )


def _admission_oracle() -> str:
    """Composed crawl-admission oracle: robots → blocklist → domain
    quota, one CASE fate per document. Every fragment is the SAME
    constant the standalone queries inject (URL planting + components,
    robots VALUES, blocklist VALUES), so this oracle cannot drift from
    the per-stage gates."""
    from tripl_spark.operators.urls import (
        BLOCKED_DOMAINS,
        BLOCKED_TLDS,
        DOMAIN_QUOTA_K,
        _COMPONENTS_SQL,
        _ROBOTS_WINNER_SQL,
    )

    bd = ", ".join(f"('{d}', '{r}')" for d, r in BLOCKED_DOMAINS)
    bt = ", ".join(f"('{t}', '{r}')" for t, r in BLOCKED_TLDS)
    return f"""
    WITH d AS ({_COMPONENTS_SQL}),{_ROBOTS_WINNER_SQL},
    pre AS (
      SELECT d.doc_id, d.reg_domain, d.n_chars,
             CASE WHEN NOT COALESCE(w.allow, TRUE) THEN 'robots'
                  ELSE COALESCE(bd.reason, bt.reason) END AS pre_drop
      FROM d
      LEFT JOIN w ON d.doc_id = w.doc_id
      LEFT JOIN (VALUES {bd}) AS bd(dom, reason) ON d.reg_domain = bd.dom
      LEFT JOIN (VALUES {bt}) AS bt(tld2, reason) ON d.tld = bt.tld2),
    q AS (SELECT doc_id,
                 row_number() OVER (PARTITION BY reg_domain
                     ORDER BY n_chars DESC, doc_id) AS rk
          FROM pre WHERE pre_drop IS NULL),
    fate AS (
      SELECT pre.doc_id,
             CASE WHEN pre.pre_drop IS NOT NULL THEN pre.pre_drop
                  WHEN q.rk > {DOMAIN_QUOTA_K} THEN 'domain_quota'
                  ELSE NULL END AS drop_stage
      FROM pre LEFT JOIN q ON pre.doc_id = q.doc_id)
    SELECT doc_id, drop_stage, (drop_stage IS NULL) AS admitted FROM fate
    """


@query(
    "pipeline_crawl_admission",
    oracle=_admission_oracle(),
    doc="per-document FATE through crawl admission: robots deny first "
    "(a disallowed path is never fetched, so it never consults the "
    "blocklist), then blocklisted domain/TLD, then the per-domain "
    "quota among admission survivors — the crawl-side front door of "
    "the provenance ledger (conservation: every doc appears exactly "
    "once); fully hash-gated",
)
def pipeline_crawl_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ADMISSION half of provenance curation: what a crawler
    decides BEFORE and AT fetch time (robots verdict, blocklist,
    per-domain volume cap), composed in execution order. The planted
    universe makes the precedence observable — the tracker host is
    both robots-denied and blocklist-listed and must read 'robots';
    spam hosts split between the two stages by path.

    Scale shape: ONE corpus scan; robots election and the registered
    domain both ride broadcasts (per-host rule arrays + the PSL
    table) with the winner elected inside codegen
    (`urls.robots_winner` — shared with the standalone filter, so the
    two surfaces cannot drift); blocklist is two more broadcast rule
    joins; the ONE shuffle is the null-guarded quota window (blocked
    and denied rows rank among themselves, their rank never
    consulted — the provenance ledger's partition trick, no union
    double-read). Plan-gated: 1 scan, 5 BroadcastHashJoins, exactly
    1 Exchange."""
    from tripl_spark.operators.urls import (
        BLOCKED_DOMAINS,
        BLOCKED_TLDS,
        DOMAIN_QUOTA_K,
        _url_col,
        robots_rules_df,
        robots_winner,
        url_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    u = url_components(docs, _url_col())
    per_host = robots_rules_df(spark)
    j = u.join(per_host, u.host == per_host.rhost, "left")
    best = robots_winner(F.col("path"), F.col("rules"))
    robots_deny = ~F.coalesce(best["allow"], F.lit(True))
    bd = F.broadcast(
        local_df(spark, BLOCKED_DOMAINS, "dom string, d_reason string")
    )
    bt = F.broadcast(
        local_df(spark, BLOCKED_TLDS, "btld string, t_reason string")
    )
    flagged = (
        j.join(bd, j.reg_domain == bd.dom, "left")
        .join(bt, j.tld == bt.btld, "left")
        .withColumn(
            "pre_drop",
            F.when(robots_deny, F.lit("robots")).otherwise(
                F.coalesce("d_reason", "t_reason")
            ),
        )
    )
    w = Window.partitionBy(
        F.col("pre_drop").isNull(), F.col("reg_domain")
    ).orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    fate = (
        F.when(F.col("pre_drop").isNotNull(), F.col("pre_drop"))
        .when(F.row_number().over(w) > DOMAIN_QUOTA_K, F.lit("domain_quota"))
    )
    return flagged.select(
        "doc_id",
        fate.alias("drop_stage"),
        fate.isNull().alias("admitted"),
    )
