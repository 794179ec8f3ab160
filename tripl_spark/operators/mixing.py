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
             CAST(floor({BUDGET} * power(n, {ALPHA}) / z) AS BIGINT) AS quota
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
    floor() (not round) keeps the quota integer boundary engine-safe."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum(F.pow("n", ALPHA)).alias("z"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n").cast("long").alias("lang_total"),
        F.floor(BUDGET * F.pow("n", ALPHA) / F.col("z")).cast("long").alias("quota"),
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
