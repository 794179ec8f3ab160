"""Streaming PII monitor ≡ the oracled batch prevalence rollup, for
any micro-batch split, with the snapshot-sink restart contract
(`streaming/pii_stream.py` over the generic `counter_monitor.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.pii import _enriched_text
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.pii_stream import StreamingPIIMonitor

_ensure_loaded()


def _enriched_docs(spark, sf):
    """The registered query's planted corpus, as a streamable frame."""
    return load_table(spark, sf, "documents").select(
        "doc_id", "source", "lang", _enriched_text().alias("text")
    )


def _card(df):
    return {
        (r.source, r.lang): tuple(r)[2:] for r in df.collect()
    }


@pytest.mark.parametrize("split", ["one", "mod3", "skew"])
def test_pii_monitor_split_invariant_matches_batch(spark, sf_small, split):
    """Fed the registered query's enriched corpus in any split, the
    maintained rollup equals `text_pii_prevalence` exactly — integer
    counters plus the batch query's read-time rounding."""
    docs = _enriched_docs(spark, sf_small)
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.pmod("doc_id", 3) == i) for i in range(3)],
        "skew": [
            docs.filter(F.pmod("doc_id", 10) != 0),
            docs.filter(F.pmod("doc_id", 10) == 0),
            docs.limit(0),
        ],
    }[split]
    mon = StreamingPIIMonitor(spark)
    for i, b in enumerate(batches):
        mon.process(b.drop("doc_id"), batch_id=i)
    want = _card(REGISTRY["text_pii_prevalence"].fn(spark, sf_small))
    assert _card(mon.prevalence()) == want


def test_pii_monitor_sink_mode_survives_driver_restart(spark, sf_small, tmp_path):
    """Process half the stream, lose the driver, resume: the recovered
    monitor skips the replayed committed batch, continues from the
    snapshot, and the final rollup equals one-shot."""
    docs = _enriched_docs(spark, sf_small)
    sink = str(tmp_path / "piisink")
    mon = StreamingPIIMonitor(spark, sink_path=sink)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0).drop("doc_id"), batch_id=0)

    mon2 = StreamingPIIMonitor(spark, sink_path=sink)  # restart
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 0).drop("doc_id"), batch_id=0)
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 1).drop("doc_id"), batch_id=1)
    want = _card(REGISTRY["text_pii_prevalence"].fn(spark, sf_small))
    assert _card(mon2.prevalence()) == want


def test_pii_monitor_flags_a_leaking_source(spark):
    """A source that flips to emitting raw contact dumps must page in
    the maintained rollup while the clean source stays at zero."""
    clean = spark.createDataFrame(
        [("just words here no contacts", "web", "en")] * 10,
        "text string, source string, lang string",
    )
    leaking = spark.createDataFrame(
        [(f"user{i}@leak.example.org called from +1 (555) 010-{1000 + i}",
          "feed", "en") for i in range(5)],
        "text string, source string, lang string",
    )
    mon = StreamingPIIMonitor(spark)
    mon.process(clean, batch_id=0)
    mon.process(leaking, batch_id=1)
    card = {r.source: r for r in mon.prevalence().collect()}
    assert card["web"].pii_rate == 0.0 and card["web"].docs_with_pii == 0
    assert card["feed"].pii_rate == 1.0
    assert card["feed"].n_email == 5 and card["feed"].n_phone == 5


def test_pii_monitor_readstream_end_to_end(spark, sf_small, tmp_path):
    """The deployment shape: a real readStream drain through
    foreachBatch equals the batch rollup."""
    docs = _enriched_docs(spark, sf_small)
    src = str(tmp_path / "src")
    for i in range(3):
        docs.filter(F.pmod("doc_id", 3) == i).drop("doc_id").coalesce(
            1
        ).write.mode("append").parquet(src)
    mon = StreamingPIIMonitor(spark, sink_path=str(tmp_path / "sink"))
    stream = spark.readStream.schema("source string, lang string, text string") \
        .option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        stream.writeStream.foreachBatch(mon.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    want = _card(REGISTRY["text_pii_prevalence"].fn(spark, sf_small))
    assert _card(mon.prevalence()) == want


def test_counter_monitor_adopts_foreign_commit(spark, tmp_path):
    """REGRESSION (r12 review): two monitors sharing a sink. When A
    sees a batch_id that ANOTHER writer committed, it must ADOPT the
    sink's latest snapshot rather than skip-without-reloading —
    otherwise A's in-memory state permanently undercounts that batch
    and A's next snapshot overwrites the sink with the loss."""
    docs = _enriched_docs(spark, "/root/testdata/sf0.001")
    b0 = docs.filter(F.pmod("doc_id", 2) == 0).drop("doc_id")
    b1 = docs.filter(F.pmod("doc_id", 2) == 1).drop("doc_id")
    sink = str(tmp_path / "shared")
    a = StreamingPIIMonitor(spark, sink_path=sink)
    a.process(b0, batch_id=0)
    b = StreamingPIIMonitor(spark, sink_path=sink)  # sees committed {0}
    b.process(b1, batch_id=1)
    # A replays batch 1 (committed by B): must adopt snapshot 1
    a.process(b1, batch_id=1)
    assert _card(a.prevalence()) == _card(b.prevalence())
    # and A's NEXT merge builds on the adopted (complete) state
    extra = spark.createDataFrame(
        [("x@y.io leaked", "weird", "xx")], "text string, source string, lang string"
    )
    a.process(extra, batch_id=2)
    got = {(r.source, r.lang): r.n_email for r in a.prevalence().collect()}
    assert got[("weird", "xx")] == 1
    full = _card(REGISTRY["text_pii_prevalence"].fn(spark, "/root/testdata/sf0.001"))
    for key, vals in full.items():
        assert _card(a.prevalence())[key] == vals


def test_monitor_tracks_all_six_classes(spark):
    """The monitor's counter schema is PII_CLASSES-driven: adding a
    class (cc in r13, secret in r15) must flow into the streaming
    rollup with no monitor change — pin the class set so a drop is
    loud."""
    from tripl_spark.operators.pii import PII_CLASSES

    assert [n for n, _, _ in PII_CLASSES] == [
        "email", "secret", "id", "cc", "phone", "ip"
    ]
    mon = StreamingPIIMonitor(spark)
    b = spark.createDataFrame(
        [("s", "en",
          "card 4111 1111 1111 1111 mail a@b.co "
          "key sk-abcdefghij0123456789ABCD")],
        "source string, lang string, text string",
    )
    mon.process(b, batch_id=0)
    (row,) = mon.prevalence().collect()
    assert row.n_cc == 1 and row.n_email == 1 and row.n_secret == 1
    assert row.docs_with_pii == 1
