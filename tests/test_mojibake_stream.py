"""Streaming mojibake monitor ≡ the oracled batch prevalence rollup,
for any micro-batch split, with restart recovery
(`streaming/mojibake_stream.py` over the generic counter base)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.text import _mojibake_text
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.mojibake_stream import StreamingMojibakeMonitor

_ensure_loaded()


def _enriched_docs(spark, sf):
    return load_table(spark, sf, "documents").select(
        "doc_id", "source", "lang", _mojibake_text().alias("text")
    )


def _card(df):
    return {(r.source, r.lang): tuple(r)[2:] for r in df.collect()}


@pytest.mark.parametrize("split", ["one", "mod3"])
def test_mojibake_monitor_split_invariant_matches_batch(spark, sf_small, split):
    docs = _enriched_docs(spark, sf_small)
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.pmod("doc_id", 3) == i) for i in range(3)],
    }[split]
    mon = StreamingMojibakeMonitor(spark)
    for i, b in enumerate(batches):
        mon.process(b.drop("doc_id"), batch_id=i)
    want = _card(REGISTRY["text_mojibake_prevalence"].fn(spark, sf_small))
    assert _card(mon.prevalence()) == want


def test_mojibake_monitor_survives_restart(spark, sf_small, tmp_path):
    docs = _enriched_docs(spark, sf_small)
    sink = str(tmp_path / "mojisink")
    mon = StreamingMojibakeMonitor(spark, sink_path=sink)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0).drop("doc_id"), batch_id=0)
    mon2 = StreamingMojibakeMonitor(spark, sink_path=sink)  # restart
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 0).drop("doc_id"), batch_id=0)
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 1).drop("doc_id"), batch_id=1)
    want = _card(REGISTRY["text_mojibake_prevalence"].fn(spark, sf_small))
    assert _card(mon2.prevalence()) == want


def test_mojibake_monitor_flags_a_rotting_source(spark):
    """A source whose decoder breaks must page while the clean source
    stays at zero — and NULL text counts zero, never -1."""
    clean = spark.createDataFrame(
        [("plain ascii words", "web", "en")] * 6 + [(None, "web", "en")],
        "text string, source string, lang string",
    )
    rotten = spark.createDataFrame(
        [("p�ge g�rbage cafÃ©", "feed", "en")] * 4,
        "text string, source string, lang string",
    )
    mon = StreamingMojibakeMonitor(spark)
    mon.process(clean, batch_id=0)
    mon.process(rotten, batch_id=1)
    card = {r.source: r for r in mon.prevalence().collect()}
    assert card["web"].damage_rate == 0.0 and card["web"].docs_damaged == 0
    assert card["feed"].damage_rate == 1.0
    assert card["feed"].n_replacement == 8 and card["feed"].n_double_enc == 4
