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
from tripl_spark.operators.text import PUNCT_CLASS, STOPWORDS, _count_tokens_in, _tokens
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

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
             round(0.5 * (len(list_filter(string_split_regex(trim(d.text), '\s+'),
                                          x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
                          / len(string_split_regex(trim(d.text), '\s+')))
                   + 0.3 * (1 - (length(d.text)
                                 - length(regexp_replace(d.text, '[.,;:!?]', '', 'g'))) * 1.0
                                / length(d.text))
                   + 0.2 * least(1.0, len(string_split_regex(trim(d.text), '\s+')) / 100.0),
                   4) AS quality_score
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
    n_stop = _count_tokens_in(STOPWORDS)
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    ).cast("long")
    n_chars = F.length("text").cast("long")
    score = F.round(
        0.5 * (n_stop * 1.0 / n_tokens)
        + 0.3 * (1 - n_punct * 1.0 / n_chars)
        + 0.2 * F.least(F.lit(1.0), n_tokens / 100.0),
        4,
    )
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
