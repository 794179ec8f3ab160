"""Dataset-curation operators for training-data pipelines:
deterministic sampling, per-stratum quotas, quality-ranked selection,
and PII-shaped redaction.

Scale design:

* **Sampling must be deterministic.** ``df.sample`` / ``F.rand`` give
  different rows on re-run, speculative retry, and partition re-split —
  a training-data pipeline needs the SAME sample on every run to be
  auditable. We hash a stable row id (first 15 hex chars of md5 → 60-bit
  int, the same construction DuckDB can replicate verbatim, cf.
  ``dedup.dedup_minhash_oracled``) and keep rows whose hash bucket is
  below the rate. No shuffle at all — the sample is a pushed-down
  filter on a scan.
* **Quotas are a top-k per group, not a global sort.** ``row_number``
  over (stratum, hash order) shuffles once by stratum and keeps k rows
  per group; a global orderBy would range-partition the whole corpus.
* **Redaction is a pure projection** — regexp chains run inside
  whole-stage codegen, no UDF, so it streams at scan speed on any
  cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table
from tripl_spark.operators.text import quality_score_expr, quality_score_sql

# deterministic 60-bit hash of a column, reproducible in DuckDB as
# CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)
def _md5_hash60(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def deterministic_sample(df: DataFrame, id_col: str, percent: int) -> DataFrame:
    """Keep ~percent% of rows, chosen by stable hash — same rows every
    run, no shuffle, filter pushed to the scan."""
    bucket = F.pmod(_md5_hash60(F.col(id_col).cast("string")), F.lit(100))
    return df.filter(bucket < percent)


def stratum_quota(df: DataFrame, strata: list[str], id_col: str, k: int) -> DataFrame:
    """Deterministic k-per-stratum subset: rank rows inside each
    stratum by stable hash (id tiebreak) and keep the first k."""
    h = _md5_hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata).orderBy(h, F.col(id_col))
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


@query(
    "curation_stratified_sample",
    oracle="""
    SELECT doc_id, source, lang
    FROM documents
    WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          % 100 < 10
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic document sample: md5-bucket the doc id, keep
    buckets 0-9. Hash-uniform across strata, reproducible run-to-run,
    and executed as a plain scan filter (zero shuffles)."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 10).select("doc_id", "source", "lang")


@query(
    "curation_quota_per_stratum",
    oracle="""
    SELECT doc_id, source, lang, CAST(rk AS INT) AS rk
    FROM (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT),
                        doc_id) AS rk
      FROM documents)
    WHERE rk <= 20
    """,
)
def curation_quota_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced corpus: at most 20 docs per (source, lang) stratum,
    chosen by stable hash order — one shuffle keyed by stratum, k rows
    kept per group regardless of stratum skew."""
    docs = load_table(spark, sf_dir, "documents")
    return stratum_quota(docs, ["source", "lang"], "doc_id", 20).select(
        "doc_id", "source", "lang", "rk"
    )


@query(
    "curation_top_quality_per_lang",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stop,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT)
               AS n_punct,
             CAST(length(text) AS BIGINT) AS n_chars_m
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             round(0.5 * (n_stop * 1.0 / n_tokens)
                   + 0.3 * (1 - n_punct * 1.0 / n_chars_m)
                   + 0.2 * least(1.0, n_tokens / 100.0), 4) AS quality_score
      FROM t
    )
    SELECT doc_id, lang, quality_score, CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY quality_score DESC, doc_id) AS rk
          FROM scored)
    WHERE rk <= 25
    """,
)
def curation_top_quality_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked selection: score every document (same heuristic
    as text_quality_score), keep the top 25 per language. Score is a
    codegen projection; the only shuffle is the per-lang top-k."""
    docs = load_table(spark, sf_dir, "documents")
    score = quality_score_expr()
    scored = docs.select("doc_id", "lang", score.alias("quality_score"))
    w = Window.partitionBy("lang").orderBy(F.desc("quality_score"), "doc_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 25)


@query(
    "curation_redacted_texts",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(text, '[0-9]+', '[NUM]', 'g'),
                              '\b(customer|user)\b', '[ENT]', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(text, '\b(customer|user)\b')) AS BIGINT)
             AS n_entities
    FROM documents
    WHERE doc_id < 500
    """,
)
def curation_redacted_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-shaped redaction as a pure projection: digit runs → [NUM],
    entity words → [ENT]. Output is the md5 of the redacted text (so
    the oracle compares content without shipping it) plus the match
    count. The regexp chain stays in whole-stage codegen — this is the
    scrubbing pattern for a 100 TB corpus, no Python in the loop."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    redacted = F.regexp_replace(
        F.regexp_replace("text", r"[0-9]+", "[NUM]"),
        r"\b(customer|user)\b",
        "[ENT]",
    )
    return docs.select(
        "doc_id",
        F.md5(redacted).alias("redacted_md5"),
        F.size(F.regexp_extract_all("text", F.lit(r"\b(customer|user)\b"), F.lit(0)))
        .cast("long")
        .alias("n_entities"),
    )


WS_TOP = 100  # weighted-sample size


@query(
    "curation_weighted_sample",
    # Priority = (hash60(doc_id)+1) DIV n_chars — pure BIGINT
    # arithmetic (no doubles anywhere), so the ordering and hence the
    # LIMIT contents are engine-exact. The u^(1/w) exponential-keys
    # form of weighted sampling would hit pow() rounding skew, and
    # even plain double division rounds differently once round(x, n)
    # is applied to 1e14-magnitude values.
    oracle=f"""
    SELECT doc_id, source, n_chars, pri AS priority
    FROM (
      SELECT doc_id, source, n_chars,
             (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
              + 1) // n_chars AS pri
      FROM documents
      WHERE n_chars > 0
    )
    ORDER BY pri, doc_id LIMIT {WS_TOP}
    """,
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (sequential
    Poisson / Ohlsson scheme): priority = uniform-hash / weight, keep
    the WS_TOP smallest — longer documents (weight = n_chars) are
    proportionally more likely to be drawn, and the draw is
    reproducible run-to-run because the uniform comes from md5(doc_id)
    rather than a RNG. Integer division stands in for real division:
    it only coarsens ties (broken by doc_id), keeps the scheme's
    weighting, and is bit-exact across engines. Zero-weight rows are
    excluded up front — semantically they have draw probability 0, and
    a NULL priority (x DIV 0) would sort NULLS FIRST on Spark but
    NULLS LAST on DuckDB, silently diverging the sample.

    100 TB shape: priority is a scan-side expression; the global top-k
    executes as TakeOrderedAndProject (per-partition heaps merged at
    the driver, k rows each) — no full sort, no shuffle of the
    corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # DIV (integral division) exists only in SQL expression syntax;
    # hash60 exceeds 2^53, so floor(double-division) could be off by
    # one ulp — this must stay in BIGINT arithmetic end-to-end. The
    # hash itself comes from the shared helper so the 60-bit formula
    # has one definition.
    pri = F.expr("(h + 1L) DIV n_chars")
    return (
        docs.withColumn("h", _md5_hash60(F.col("doc_id").cast("string")))
        .withColumn("pri", pri)
        .orderBy("pri", "doc_id")
        .limit(WS_TOP)
        .select("doc_id", "source", "n_chars", F.col("pri").alias("priority"))
    )


@query(
    "corpus_datacard",
    # One row of corpus-level facts — the "data card" a training run
    # is documented with. Exact distincts so the oracle hash-matches;
    # the docstring names the sketch substitutions for cluster scale.
    oracle=rf"""
    WITH s AS (
      SELECT doc_id, source, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             {{quality}} AS q
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           round(1.0 - count(DISTINCT fp) * 1.0 / count(*), 4) AS exact_dup_rate,
           round(avg(n_tokens), 2) AS avg_doc_tokens,
           round(avg(q), 4) AS avg_quality
    FROM s
    """.replace("{quality}", quality_score_sql("")),
    doc="one-row corpus data card: doc/token totals, lang/source "
    "cardinalities, exact-dup rate, mean quality — the dataset "
    "documentation a training run ships with; fully hash-gated",
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level summary statistics in one aggregation pass — the
    numbers a dataset card reports: document and token counts,
    language/source cardinalities, the exact-duplicate rate (1 −
    distinct fingerprints / docs), and mean heuristic quality.

    Scale shape: ONE map-side-combined aggregation over a single scan.
    The exact fingerprint distinct is the only corpus-cardinality
    term — at 100 TB swap it for the HLL register sketch
    (`sketch_hll_registers` machinery) and the lang/source distincts
    stay tiny; exact is kept here because the oracle hash gate wants
    bit-equal values."""
    from tripl_spark.operators.dedup import normalized_text
    from tripl_spark.operators.text import quality_score_expr, quality_score_sql

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    s = docs.select(
        "source", "lang",
        n_tokens.alias("n_tokens"),
        F.md5(normalized_text()).alias("fp"),
        quality_score_expr().alias("q"),
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.round(F.lit(1.0) - F.countDistinct("fp") * 1.0 / F.count(F.lit(1)), 4).alias(
            "exact_dup_rate"
        ),
        F.round(F.avg("n_tokens"), 2).alias("avg_doc_tokens"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
    )
