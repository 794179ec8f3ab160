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


def _tokens_df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 11} shared") for i in range(lo, hi)],
        "doc_id long, text string",
    ).select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )


def test_countmin_shard_merge_equals_whole(spark):
    # the 100 TB contract: per-shard sketches merge by cell-wise ADD
    from tripl_spark.operators.sketches import countmin_table

    whole = countmin_table(_tokens_df(spark, 0, 60))
    a = countmin_table(_tokens_df(spark, 0, 25))
    b = countmin_table(_tokens_df(spark, 25, 60))
    merged = (
        a.unionByName(b).groupBy("row", "cell").agg(F.sum("n").alias("n"))
    )
    as_map = lambda df: {(r.row, r.cell): r.n for r in df.collect()}  # noqa: E731
    assert as_map(merged) == as_map(whole)


def test_hll_shard_merge_equals_whole(spark):
    # per-register MAX merges shard HLLs into the whole-corpus HLL
    from tripl_spark.operators.sketches import hll_registers

    whole = hll_registers(_tokens_df(spark, 0, 60))
    a = hll_registers(_tokens_df(spark, 0, 25))
    b = hll_registers(_tokens_df(spark, 25, 60))
    merged = (
        a.unionByName(b).groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    )
    as_map = lambda df: {r.register: r.max_rho for r in df.collect()}  # noqa: E731
    assert as_map(merged) == as_map(whole)


def test_bloom_shard_merge_equals_whole(spark):
    # bit-OR is set-union on positions: bits(A∪B) == bits(A) ∪ bits(B)
    from tripl_spark.operators.sketches import bloom_bits

    whole = {r.pos for r in bloom_bits(_tokens_df(spark, 0, 60).distinct()).collect()}
    a = {r.pos for r in bloom_bits(_tokens_df(spark, 0, 25).distinct()).collect()}
    b = {r.pos for r in bloom_bits(_tokens_df(spark, 25, 60).distinct()).collect()}
    assert a | b == whole


def test_quantile_summary_merges_along_shards(spark):
    # summaries are per-shard and merge by plain union: summarizing two
    # shard-aligned dataset splits yields exactly the whole's summary
    from tripl_spark.operators.sketches import Q_SHARDS, quantile_summary

    vals = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(400)], "event_id long, value double"
    )
    half = Q_SHARDS // 2
    lo = vals.filter(F.pmod(F.col("event_id"), Q_SHARDS) < half)
    hi = vals.filter(F.pmod(F.col("event_id"), Q_SHARDS) >= half)
    key = lambda df: sorted(  # noqa: E731
        (r.shard, r.value, r.id, r.rn, r.weight)
        for r in quantile_summary(df, "value", "event_id").collect()
    )
    whole = sorted(key(lo) + key(hi))
    assert whole == key(vals)


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


def test_heavy_hitters_lower_bound_and_exact_when_everywhere(spark, sf_small):
    from tripl_spark.operators.sketches import HH_SHARDS, HH_TOP

    rows = REGISTRY["sketch_heavy_hitters"].fn(spark, sf_small).collect()
    assert len(rows) == HH_TOP
    for r in rows:
        # merged summary counts are a lower bound of the true count...
        assert r.hh_estimate <= r.true_count, r
        assert 1 <= r.n_shards <= HH_SHARDS, r
        # ...and exact when the term survived every shard's local top-k
        if r.n_shards == HH_SHARDS:
            assert r.hh_estimate == r.true_count, r
    # the very top of the distribution must be everywhere-exact
    assert rows[0].n_shards == HH_SHARDS


def test_hll_overlap_inclusion_exclusion_on_controlled_sets(spark):
    """Synthetic segments with KNOWN overlap: the sketch-composed
    inclusion-exclusion estimate must track the true intersection
    within the HLL error envelope, and disjoint segments must
    estimate ~zero overlap (the driver fixture has full overlap, so
    this is where partial/disjoint behavior is actually exercised)."""
    from pyspark.sql import functions as F

    from tripl_spark.operators.sketches import HLL_M, _hll_est_agg, hll_registers

    def seg_regs(ids):
        df = spark.createDataFrame([(i,) for i in ids], "user_id long").select(
            F.col("user_id").cast("string").alias("term")
        )
        # reuse the corpus register builder (same 'hll:' hash domain)
        return hll_registers(df).withColumnRenamed("max_rho", "r")

    def est(regs):
        return regs.agg(_hll_est_agg().alias("e")).collect()[0]["e"]

    a = list(range(0, 600))            # |A| = 600
    b = list(range(400, 1000))         # |B| = 600, |A ∩ B| = 200
    c = list(range(2000, 2600))        # disjoint from A
    ra, rb, rc = seg_regs(a), seg_regs(b), seg_regs(c)

    def union_est(r1, r2):
        u = r1.unionByName(r2).groupBy("register").agg(F.max("r").alias("r"))
        return est(u)

    ov_ab = est(ra) + est(rb) - union_est(ra, rb)
    ov_ac = est(ra) + est(rc) - union_est(ra, rc)
    # raw-HLL std error ~13% of EACH of three estimates; the
    # intersection difference amplifies it — allow a wide envelope,
    # the point is tracking (200 vs 0), not precision
    assert abs(ov_ab - 200) < 250, ov_ab
    assert abs(ov_ac) < 250, ov_ac
    assert ov_ab > ov_ac, (ov_ab, ov_ac)
