"""Planted-duplication tests for cross-document substring-span dedup."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tripl_spark.operators.substring import SPAN_TOKENS, shared_span_pairs


def test_planted_shared_block_detected(spark):
    rng = random.Random(5)
    vocab = [f"w{i:03d}" for i in range(500)]
    block = " ".join(rng.choice(vocab) for _ in range(2 * SPAN_TOKENS))  # 40 tokens
    rows = []
    for i in range(20):
        filler = " ".join(rng.choice(vocab) for _ in range(60))
        if i in (3, 11):  # two docs share the verbatim block
            rows.append((i, filler + " " + block))
        else:
            rows.append((i, filler + " " + " ".join(rng.choice(vocab) for _ in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in shared_span_pairs(docs).collect()}
    assert (3, 11) in pairs
    # random 100-token docs over a 500-word vocab share no 20-token run
    assert all(p == (3, 11) for p in pairs), pairs


def test_short_docs_skipped(spark):
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    assert shared_span_pairs(docs).count() == 0


def test_span_pair_cache_does_not_outlive_the_call(spark):
    """Long-lived-session invariant: shared_span_pairs unpersists its
    span-frame intermediate before returning — after the call, at most
    the (GC-managed) localCheckpoint block backing the RETURNED result
    remains in block storage, never the corpus-sized span cache."""
    sc = spark.sparkContext

    def n_cached() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    docs = spark.createDataFrame(
        [(i, "tok " * 64) for i in range(4)], "doc_id long, text string"
    )
    before = n_cached()
    res = shared_span_pairs(docs)
    res.collect()
    assert n_cached() <= before + 1, sc._jsc.sc().getRDDStorageInfo()
