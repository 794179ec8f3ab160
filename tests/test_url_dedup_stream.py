"""Streaming canonical-URL keeper table ≡ the oracled batch dedup,
for any micro-batch split, idempotent under replay, with restart
recovery (`streaming/url_dedup_stream.py` over the generic counter
base — the line-dedup monitor's min-merge algebra on crawl URLs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.urls import _dup_url_col
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.url_dedup_stream import StreamingUrlDedup

_ensure_loaded()


def _url_docs(spark, sf):
    return load_table(spark, sf, "documents").select(
        "doc_id", _dup_url_col().alias("url")
    )


def _batch_keepers_want(spark, sf):
    q = REGISTRY["url_canonical_dedup"].fn(spark, sf)
    return {
        r.canonical_url: r.doc_id for r in q.collect() if r.keeper
    }


@pytest.mark.parametrize("split", ["one", "mod3"])
def test_url_dedup_split_invariant_matches_batch(spark, sf_small, split):
    docs = _url_docs(spark, sf_small)
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.pmod("doc_id", 3) == i) for i in range(3)],
    }[split]
    mon = StreamingUrlDedup(spark)
    for i, b in enumerate(batches):
        mon.process(b, batch_id=i)
    got = {r.cu: r.keep for r in mon.keepers().collect()}
    batch_rows = REGISTRY["url_canonical_dedup"].fn(spark, sf_small).collect()
    assert got == {r.canonical_url: r.doc_id for r in batch_rows if r.keeper}
    # dedup() applies the table with the batch query's keeper rule
    labeled = {r.doc_id: r.kept for r in mon.dedup(docs).collect()}
    assert labeled == {r.doc_id: r.keeper for r in batch_rows}


def test_url_dedup_replay_is_harmless_by_algebra(spark, sf_small):
    """min-merge is idempotent: the SAME rows re-delivered under a NEW
    batch_id (so the lifecycle replay-skip does NOT catch it) re-merge
    without corruption — stronger than the additive monitors."""
    docs = _url_docs(spark, sf_small)
    mon = StreamingUrlDedup(spark)
    mon.process(docs, batch_id=0)
    before = {r.cu: r.keep for r in mon.keepers().collect()}
    mon.process(docs, batch_id=1)  # full re-delivery, new id
    after = {r.cu: r.keep for r in mon.keepers().collect()}
    assert after == before


def test_url_dedup_survives_restart(spark, sf_small, tmp_path):
    docs = _url_docs(spark, sf_small)
    sink = str(tmp_path / "urlsink")
    mon = StreamingUrlDedup(spark, sink_path=sink)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)
    mon2 = StreamingUrlDedup(spark, sink_path=sink)  # restart
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)  # replay
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 1), batch_id=1)
    got = {r.cu: r.keep for r in mon2.keepers().collect()}
    assert got == _batch_keepers_want(spark, sf_small)


def test_url_dedup_frontier_semantics(spark):
    """The crawl-frontier question: a refetch of a seen page (any
    spelling) is NOT kept; a genuinely new page is."""
    b0 = spark.createDataFrame(
        [(1, "https://a.com/x"), (2, "https://b.com/y?utm_source=s")],
        "doc_id long, url string",
    )
    b1 = spark.createDataFrame(
        [
            (7, "http://a.com/x"),                  # refetch, scheme flip
            (8, "https://b.com/y?utm_campaign=c"),  # refetch, tracking flip
            (9, "https://c.com/z"),                 # new page
        ],
        "doc_id long, url string",
    )
    mon = StreamingUrlDedup(spark)
    mon.process(b0, batch_id=0)
    mon.process(b1, batch_id=1)
    labeled = {r.doc_id: r.kept for r in mon.dedup(b1).collect()}
    assert labeled == {7: False, 8: False, 9: True}
