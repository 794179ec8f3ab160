"""Broadcast-cutoff perplexity bucketing — the production twin of the
exact per-lang ntile (operators/text.py). The twin must stay CLOSE to
the exact ntile (it is an estimator of the same tercile boundaries) and
must plan with NO per-lang window over the full relation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tripl_spark.operators.text import (
    PPL_KEEP_BUCKETS,
    assign_ppl_buckets,
    bigram_logprob_scores,
    perplexity_cutoffs,
)
from tripl_spark.session import load_table


def _labeled(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_logprob_scores(docs)
    return scored.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "avg_logprob"
    )


def test_cutoff_buckets_agree_with_exact_ntile(spark, sf_small):
    """Equivalence bound: per-doc bucket agreement and keep-set
    (bucket <= 2) agreement vs the exact ntile. Disagreement is
    confined to docs near the tercile boundaries, O(1/sqrt(sample))
    of each lang — 80%/85% are loose floors for the default sample
    parameters."""
    lbl = _labeled(spark, sf_small)
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
    exact = lbl.select(
        "doc_id", F.ntile(3).over(w).alias("b_exact")
    )
    cut = assign_ppl_buckets(lbl, perplexity_cutoffs(lbl)).select(
        "doc_id", F.col("ppl_bucket").alias("b_cut")
    )
    j = exact.join(cut, "doc_id").select(
        (F.col("b_exact") == F.col("b_cut")).cast("int").alias("same"),
        (
            (F.col("b_exact") <= PPL_KEEP_BUCKETS)
            == (F.col("b_cut") <= PPL_KEEP_BUCKETS)
        ).cast("int").alias("same_keep"),
    )
    row = j.agg(
        F.avg("same").alias("bucket_agree"),
        F.avg("same_keep").alias("keep_agree"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["n"] > 0
    assert row["bucket_agree"] >= 0.80, row
    assert row["keep_agree"] >= 0.85, row


def test_cutoff_bucket_proportions_are_tercile_like(spark, sf_small):
    # each bucket should hold roughly a third of each sampled lang;
    # allow wide slack (sampling error + tie mass at boundaries)
    lbl = _labeled(spark, sf_small)
    got = (
        assign_ppl_buckets(lbl, perplexity_cutoffs(lbl))
        .groupBy("lang")
        .agg(
            F.avg((F.col("ppl_bucket") == 1).cast("int")).alias("p1"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 100)
        .collect()
    )
    assert got, "no lang with enough docs to check"
    for r in got:
        assert 0.15 <= r["p1"] <= 0.55, (r["lang"], r["p1"])


def test_lang_absent_from_sample_keeps_everything(spark):
    # a lang the sample never saw gets NULL cutoffs -> bucket 1 (keep):
    # low-resource languages are never tail-dropped on no evidence
    lbl = spark.createDataFrame(
        [(1, "xx", -3.5), (2, "xx", -9.9)],
        "doc_id long, lang string, avg_logprob double",
    )
    cuts = spark.createDataFrame(
        [("en", -4.0, -6.0)], "lang string, c_hi double, c_lo double"
    )
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in assign_ppl_buckets(lbl, cuts).collect()
    }
    assert got == {1: 1, 2: 1}


def test_cutoffs_are_one_row_per_lang_and_ordered(spark, sf_small):
    cuts = perplexity_cutoffs(_labeled(spark, sf_small)).collect()
    langs = [r["lang"] for r in cuts]
    assert len(langs) == len(set(langs))
    for r in cuts:
        assert r["c_hi"] is not None and r["c_lo"] is not None
        assert r["c_hi"] >= r["c_lo"], r
