"""Recall tests for the approximate dedup operators: plant near-duplicate
documents and require MinHash-LSH and SimHash to find them (the driver's
rows-only check can't prove this; these tests do)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.dedup import (
    jaccard_pairs,
    minhash_candidates,
    simhash_signatures,
)

# vocabulary must be much larger than doc length: simhash/minhash operate
# on distinct-token (shingle) sets, and a tiny vocab makes every doc's set
# identical
VOCAB = [f"w{i:03d}" for i in range(400)]


@pytest.fixture(scope="module")
def planted_docs(spark):
    rng = random.Random(7)
    rows = []
    for i in range(40):
        words = [rng.choice(VOCAB) for _ in range(60)]
        rows.append((i * 2, " ".join(words)))
        near = list(words)
        for _ in range(3):  # ~5% token perturbation → Jaccard ≈ 0.85
            near[rng.randrange(len(near))] = rng.choice(VOCAB)
        rows.append((i * 2 + 1, " ".join(near)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_pairs(planted_docs):
    cands = minhash_candidates(planted_docs)
    verified = jaccard_pairs(planted_docs, cands).filter(F.col("jaccard") >= 0.5)
    found = {(r.id_a, r.id_b) for r in verified.collect()}
    planted = {(i * 2, i * 2 + 1) for i in range(40)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall too low: {recall} ({len(found)} pairs found)"


def test_simhash_separates_dups_from_random(planted_docs, spark):
    sigs = {r.doc_id: r.sig for r in simhash_signatures(planted_docs).collect()}
    planted_dists = [bin(sigs[i * 2] ^ sigs[i * 2 + 1]).count("1") for i in range(40)]
    random_dists = [bin(sigs[i * 2] ^ sigs[(i * 2 + 2) % 80]).count("1") for i in range(40)]
    # near-dups must be markedly closer in Hamming space than random pairs
    assert sum(planted_dists) / len(planted_dists) < sum(random_dists) / len(random_dists) - 5


def test_multimodal_features_contract(spark, sf_small):
    from tripl_spark.operators.multimodal import extract_image_features, image_table

    feats = extract_image_features(image_table(spark, sf_small))
    rows = feats.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.codec in ("bmp", "ppm")
        assert r.width >= 4 and r.height >= 4
        assert 0.0 <= r.px_mean <= 255.0


def test_decode_unknown_format_raises():
    from tripl_spark.operators.media_codecs import decode_image

    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")


def test_duplicate_groups_transitive_and_canonical(spark):
    """A≈B and B≈C (but never A≈C directly) must land in ONE group, and
    exactly one doc per group survives — the longest, ties to min id."""
    from tripl_spark.operators.dedup_groups import duplicate_groups

    docs = spark.createDataFrame(
        [(1, "aa", 10), (2, "bb", 30), (3, "cc", 30), (4, "dd", 5), (5, "ee", 7)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in duplicate_groups(docs, pairs).collect()}
    assert len(out) == 5
    # chain 1-2-3 is one group rooted at min id 1
    assert out[1]["group_id"] == out[2]["group_id"] == out[3]["group_id"] == 1
    assert out[1]["group_size"] == 3
    # canonical = longest (30), tie broken by smaller doc_id → 2
    assert [out[i]["keep"] for i in (1, 2, 3)] == [False, True, False]
    # singletons keep themselves
    assert out[4]["keep"] and out[5]["keep"]
    assert out[4]["group_size"] == 1


def test_max_bucket_cap_drops_degenerate_bucket(spark):
    # 30 identical docs = one degenerate bucket in EVERY band (the
    # quadratic-blowup case); cap below 30 must yield zero candidates,
    # uncapped must yield all 435 pairs.
    docs = spark.createDataFrame(
        [(i, "same tokens everywhere forever and ever amen") for i in range(30)],
        "doc_id long, text string",
    )
    assert minhash_candidates(docs, max_bucket=10).count() == 0
    assert minhash_candidates(docs, max_bucket=None).count() == 30 * 29 // 2


def test_two_capped_stages_in_one_action(spark):
    # regression: _pairs_from_buckets used a FIXED observation name, and
    # Spark requires observed-metric names to be unique per query — a
    # single action whose plan contained two capped candidate stages
    # (e.g. a union of two minhash_candidates calls) failed analysis
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    a = minhash_candidates(docs, max_bucket=50)
    b = minhash_candidates(docs.withColumn("doc_id", F.col("doc_id") + 100), max_bucket=50)
    assert a.unionByName(b).count() >= 0  # must not raise AnalysisException


def test_max_bucket_default_keeps_honest_buckets(planted_docs):
    # the default cap (1000) must not disturb normal-size buckets:
    # identical candidate set with and without the cap
    capped = {(r.id_a, r.id_b) for r in minhash_candidates(planted_docs).collect()}
    uncapped = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(planted_docs, max_bucket=None).collect()
    }
    assert capped == uncapped


def test_minhash_caches_do_not_outlive_the_call(spark, sf_small):
    """Long-lived-session invariant (same contract as shared_span_pairs
    and video_near_dup_pairs): minhash_dedup and minhash_match_new
    release their corpus-sized shingle caches before returning — after
    each call at most the localCheckpoint block backing the RETURNED
    pair list remains in block storage."""
    from pyspark.sql import functions as F

    from tripl_spark.operators.dedup import minhash_dedup, minhash_match_new
    from tripl_spark.session import load_table

    sc = spark.sparkContext

    def n_cached() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    docs = load_table(spark, sf_small, "documents")
    before = n_cached()
    r1 = minhash_dedup(docs)
    r1.collect()
    assert n_cached() <= before + 1, sc._jsc.sc().getRDDStorageInfo()
    r2 = minhash_match_new(
        docs.filter(F.col("doc_id") < 400), docs.filter(F.col("doc_id") >= 400)
    )
    r2.collect()
    assert n_cached() <= before + 2, sc._jsc.sc().getRDDStorageInfo()
