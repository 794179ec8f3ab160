"""Sketch guarantees over the testdata distribution: count-min never
underestimates (bounded overestimate), Bloom has zero false negatives,
and the HLL register table yields an estimate within the standard
error envelope of the true distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.operators.sketches import CM_WIDTH, HLL_M, hll_estimate
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table

_ensure_loaded()


def test_countmin_never_underestimates_and_bounded(spark, sf_small):
    rows = REGISTRY["sketch_countmin_terms"].fn(spark, sf_small).collect()
    assert len(rows) == 20
    total = sum(r.true_count for r in rows)  # lower bound on stream size N
    for r in rows:
        assert r.cm_estimate >= r.true_count, r
        # CM bound: overestimate <= ~2N/w with high prob; the top-20
        # mass alone underestimates N, so allow the loose 4x factor
        assert r.cm_estimate - r.true_count <= 4 * (total * 20 / CM_WIDTH), r


def test_bloom_no_false_negatives(spark, sf_small):
    rows = REGISTRY["sketch_bloom_membership"].fn(spark, sf_small).collect()
    assert len(rows) == 20
    present = [r for r in rows if r.present]
    assert len(present) == 10  # the top-10 frequent terms exist by construction
    for r in present:
        assert r.in_bloom, r  # the Bloom guarantee: no false negatives
    # false-positive side: with m=4096, k=4 and a vocab of a few
    # thousand, not ALL 10 absent probes should collide
    absent = [r for r in rows if not r.present]
    assert len(absent) == 10
    assert any(not r.in_bloom for r in absent)


def test_quantile_merge_within_rank_error_bound(spark, sf_small):
    from tripl_spark.operators.sketches import Q_SAMPLES, Q_SHARDS

    est = {
        r.q: r.estimate
        for r in REGISTRY["sketch_quantile_merge"].fn(spark, sf_small).collect()
    }
    vals = sorted(
        r.value
        for r in load_table(spark, sf_small, "events").select("value").collect()
    )
    n = len(vals)
    for q, e in est.items():
        # the estimate must be an actual data value whose global rank is
        # within the summary's rank-error bound of q*n
        import bisect

        lo, hi = bisect.bisect_left(vals, e), bisect.bisect_right(vals, e)
        target = q * n
        slack = n / Q_SAMPLES + Q_SHARDS
        assert lo - slack <= target <= hi + slack, (q, e, lo, hi, target)


def test_hll_estimate_within_error_envelope(spark, sf_small):
    regs = [
        (r.register, r.max_rho)
        for r in REGISTRY["sketch_hll_registers"].fn(spark, sf_small).collect()
    ]
    assert 1 <= len(regs) <= HLL_M
    est = hll_estimate(regs)
    docs = load_table(spark, sf_small, "documents")
    truth = (
        docs.select(F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"))
        .agg(F.countDistinct("t").alias("n"))
        .collect()[0]["n"]
    )
    # raw-HLL std error is 1.04/sqrt(64) ~ 13%; allow 3 sigma (this
    # variant skips the small/large-range bias corrections)
    assert abs(est - truth) / truth < 0.40, (est, truth)
