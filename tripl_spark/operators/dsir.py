"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over the ``documents`` table.

Given a small TARGET domain (here: the ``src13`` source, the corpus's
largest single stratum — the "high-quality domain" stand-in) and the
RAW corpus, DSIR scores every raw document by the log-likelihood ratio
of its hashed n-gram features under the target vs raw unigram bucket
distributions, then keeps the top-weighted documents. It is the
standard cheap alternative to classifier-based quality selection
(used for The Pile→Wiki/Books selection in the paper) and composes
with the rest of the curation family. The reference has no text
analytics at all (SURVEY.md §2.9) — driver-mandated extension surface.

Scale shape at 100 TB:

* the corpus explodes to a token stream ONCE (linear, no skew — the
  hash-bucket key is near-uniform by construction);
* both feature distributions are ``N_BUCKETS``-row aggregates with
  map-side combine — the only corpus-sized shuffle is the per-(doc,
  bucket) count, keyed by (doc_id, bucket) which is near-unique;
* the log-ratio table is ``N_BUCKETS`` rows and BROADCASTS back onto
  the per-doc counts: the corpus never joins corpus-sized state;
* the two normalizing totals are one scalar aggregate collected to
  the driver (they parameterize the expression — the bm25 pattern,
  cf. ``operators/search.py``);
* the final selection is ``orderBy().limit()`` → TakeOrderedAndProject
  (per-partition heaps, no global sort); the rank window then sees
  ``DSIR_TOP`` rows only (allowlisted bounded global window).

Hashing is the repo's engine-agnostic 60-bit md5 construction
(``curation._md5_hash60``), so the DuckDB oracle reproduces bucket
assignment bit-for-bit and the driver hash gate pins the whole
pipeline: featurize → estimate → weigh → select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.operators.curation import _md5_hash60
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

N_BUCKETS = 256  # hashed-feature dimensionality (paper: 10k buckets of
# hashed bigrams; the synthetic corpus's vocabulary is tiny, so fewer
# buckets keep per-bucket counts dense enough for the ratio to carry
# signal)
TARGET_SOURCE = "src13"
DSIR_TOP = 150


def dsir_log_ratios(tok: DataFrame, is_target: F.Column, n_buckets: int = N_BUCKETS) -> DataFrame:
    """``(b, lr)``: per-bucket log-ratio ln p_target(b) − ln p_raw(b)
    with add-one smoothing, from a (doc_id, term[, …]) token stream.
    Always ``n_buckets`` rows or fewer — broadcast it."""
    bkt = tok.select(
        F.pmod(_md5_hash60(F.col("term")), F.lit(n_buckets)).alias("b"),
        is_target.alias("is_t"),
    )
    counts = bkt.groupBy("b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("tc"),
    )
    tot = counts.agg(F.sum("rc").alias("rt"), F.sum("tc").alias("tt")).collect()[0]
    rt, tt = tot["rt"], tot["tt"]
    return counts.select(
        "b",
        (
            F.log((F.col("tc") + 1.0) / F.lit(float(tt + n_buckets)))
            - F.log((F.col("rc") + 1.0) / F.lit(float(rt + n_buckets)))
        ).alias("lr"),
    )


@query(
    "curation_dsir_weights",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    bkt AS (
      SELECT doc_id, source,
             CAST('0x' || substring(md5(term), 1, 15) AS BIGINT) % {N_BUCKETS} AS b
      FROM tok
    ),
    counts AS (
      SELECT b, count(*) AS rc,
             sum(CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS tc
      FROM bkt GROUP BY b
    ),
    tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM counts),
    lr AS (
      SELECT b, ln((tc + 1.0) / (tt + {N_BUCKETS})) - ln((rc + 1.0) / (rt + {N_BUCKETS})) AS lr
      FROM counts, tot
    ),
    dc AS (SELECT doc_id, b, count(*) AS c FROM bkt GROUP BY doc_id, b),
    w AS (
      SELECT doc_id, round(sum(c * lr), 4) + 0.0 AS dsir_logweight
      FROM dc JOIN lr USING (b) GROUP BY doc_id
    ),
    top AS (SELECT * FROM w ORDER BY dsir_logweight DESC, doc_id LIMIT {DSIR_TOP})
    SELECT doc_id, dsir_logweight,
           CAST(row_number() OVER (ORDER BY dsir_logweight DESC, doc_id) AS BIGINT) AS rank
    FROM top
    """,
    doc="DSIR importance weights: hashed-unigram log-likelihood ratio "
    f"of target ({TARGET_SOURCE}) vs raw distributions, top-{DSIR_TOP} "
    "selection — featurize/estimate/weigh/select fully hash-gated",
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{DSIR_TOP} documents by DSIR importance log-weight against
    the ``src13`` target domain. Weight(doc) = Σ_tokens [ln p_target(
    bucket) − ln p_raw(bucket)] with add-one smoothing over
    {N_BUCKETS} md5-hashed unigram buckets — Xie et al. 2023's hashed
    n-gram importance estimator, the resampling step replaced by a
    deterministic top-k so the driver hash gate can pin the result
    (the paper's Gumbel-noise sampling is inherently nondeterministic;
    rank-by-weight is its auditable counterpart, same spirit as
    ``curation_weighted_sample``)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    lr = dsir_log_ratios(tok, F.col("source") == TARGET_SOURCE)
    dc = (
        tok.select("doc_id", F.pmod(_md5_hash60(F.col("term")), F.lit(N_BUCKETS)).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        dc.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg((F.round(F.sum(F.col("c") * F.col("lr")), 4) + F.lit(0.0)).alias("dsir_logweight"))
    )
    order = [F.col("dsir_logweight").desc(), F.col("doc_id")]
    top = w.orderBy(*order).limit(DSIR_TOP)
    return top.select(
        "doc_id",
        "dsir_logweight",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
    )
