"""Streaming domain monitor ≡ the oracled batch prevalence rollup,
for any micro-batch split, with restart recovery
(`streaming/url_stream.py` over the generic counter base)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.urls import _url_col, url_components
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.url_stream import StreamingDomainMonitor

_ensure_loaded()


def _parsed_docs(spark, sf):
    return url_components(load_table(spark, sf, "documents"), _url_col())


def _card(df):
    return {r.reg_domain: tuple(r)[1:] for r in df.collect()}


@pytest.mark.parametrize("split", ["one", "mod3"])
def test_domain_monitor_split_invariant_matches_batch(spark, sf_small, split):
    docs = _parsed_docs(spark, sf_small)
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.pmod("doc_id", 3) == i) for i in range(3)],
    }[split]
    mon = StreamingDomainMonitor(spark)
    for i, b in enumerate(batches):
        mon.process(b, batch_id=i)
    want = _card(REGISTRY["url_domain_prevalence"].fn(spark, sf_small))
    assert _card(mon.prevalence()) == want


def test_domain_monitor_survives_restart(spark, sf_small, tmp_path):
    docs = _parsed_docs(spark, sf_small)
    sink = str(tmp_path / "domsink")
    mon = StreamingDomainMonitor(spark, sink_path=sink)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)
    mon2 = StreamingDomainMonitor(spark, sink_path=sink)  # restart
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)  # replay
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 1), batch_id=1)
    want = _card(REGISTRY["url_domain_prevalence"].fn(spark, sf_small))
    assert _card(mon2.prevalence()) == want


def test_domain_monitor_flags_a_flooding_domain(spark):
    """A mirror network flooding the crawl must dominate doc_share
    within a batch — the live signal domain quotas are tuned on."""
    steady = spark.createDataFrame(
        [("https", "a", "hub0.com")] * 3 + [("https", "b", "hub1.com")] * 3,
        "scheme string, qstring string, reg_domain string",
    )
    flood = spark.createDataFrame(
        [("http", "utm_source=seo", "seofarm.biz")] * 14,
        "scheme string, qstring string, reg_domain string",
    )
    mon = StreamingDomainMonitor(spark)
    mon.process(steady, batch_id=0)
    mon.process(flood, batch_id=1)
    card = {r.reg_domain: r for r in mon.prevalence().collect()}
    assert card["seofarm.biz"].doc_share == 0.7
    assert card["seofarm.biz"].n_http == 14
    assert card["seofarm.biz"].n_tracking == 14
    assert card["hub0.com"].n_http == 0 and card["hub0.com"].doc_share == 0.15


def test_domain_monitor_readstream_end_to_end(spark, sf_small, tmp_path):
    """The deployment shape: a real readStream drain through
    foreachBatch equals the batch rollup (same contract as the PII,
    quality, line, and mojibake monitors)."""
    docs = _parsed_docs(spark, sf_small).select(
        "doc_id", "scheme", "qstring", "reg_domain"
    )
    src = str(tmp_path / "src")
    for i in range(3):
        docs.filter(F.pmod("doc_id", 3) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    mon = StreamingDomainMonitor(spark, sink_path=str(tmp_path / "sink"))
    stream = (
        spark.readStream.schema(
            "doc_id long, scheme string, qstring string, reg_domain string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(mon.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    want = _card(REGISTRY["url_domain_prevalence"].fn(spark, sf_small))
    assert _card(mon.prevalence()) == want
