"""Streaming line dedup ≡ the oracled batch operator, for any
micro-batch split, with the snapshot-sink restart contract and the
idempotent-min-merge property (`streaming/line_stream.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.dedup import _planted_multiline
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.line_stream import StreamingLineDedup

_ensure_loaded()


def _multi_docs(spark, sf):
    """The registered query's planted multi-line corpus."""
    return load_table(spark, sf, "documents").select(
        "doc_id", _planted_multiline().alias("text")
    )


def _by_doc(df):
    return {r.doc_id: tuple(r)[1:] for r in df.collect()}


@pytest.mark.parametrize("split", ["one", "mod3", "skew"])
def test_line_monitor_split_invariant_matches_batch(spark, sf_small, split):
    """Fed the corpus in any split, the maintained keeper table applied
    to the full corpus equals the one-shot `dedup_lines_newline` —
    min-merge is associative, so the split cannot matter."""
    docs = _multi_docs(spark, sf_small)
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.pmod("doc_id", 3) == i) for i in range(3)],
        "skew": [
            docs.filter(F.pmod("doc_id", 10) != 0),
            docs.filter(F.pmod("doc_id", 10) == 0),
            docs.limit(0),
        ],
    }[split]
    mon = StreamingLineDedup(spark)
    for i, b in enumerate(batches):
        mon.process(b, batch_id=i)
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon.dedup(docs)) == want


def test_line_monitor_merge_is_idempotent(spark, sf_small):
    """Stronger than the counter monitors: re-merging a batch is
    HARMLESS (min(x, x) = x), not just skipped. Force a re-merge by
    clearing the seen-set and verify the state is unchanged."""
    docs = _multi_docs(spark, sf_small)
    b0 = docs.filter(F.pmod("doc_id", 2) == 0)
    mon = StreamingLineDedup(spark)
    mon.process(b0, batch_id=0)
    before = {r.h: (r.keep.doc_id, r.keep.pos) for r in mon.keepers().collect()}
    mon._seen.clear()  # simulate a replay the dedupe misses
    mon.process(b0, batch_id=0)
    after = {r.h: (r.keep.doc_id, r.keep.pos) for r in mon.keepers().collect()}
    assert after == before


def test_line_monitor_sink_mode_survives_driver_restart(spark, sf_small, tmp_path):
    """Process half the stream, lose the driver, resume from the
    snapshot: the replayed committed batch is skipped and the final
    table equals one-shot."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "linesink")
    mon = StreamingLineDedup(spark, sink_path=sink)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)

    mon2 = StreamingLineDedup(spark, sink_path=sink)  # restart
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 1), batch_id=1)
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon2.dedup(docs)) == want


def test_line_monitor_crash_between_sink_and_checkpoint(spark, sf_small, tmp_path):
    """The quality/PII monitors' crash-restart contract on the new
    base: a crash AFTER the sink commit but BEFORE the streaming
    checkpoint re-delivers the batch; the resumed monitor must not
    corrupt state (here doubly safe: commit-skip AND idempotent
    merge)."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "sink")
    mon = StreamingLineDedup(spark, sink_path=sink)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)
    # crash: new monitor instance resumes from sink, gets batch 0 again
    mon2 = StreamingLineDedup(spark, sink_path=sink)
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)  # replay
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 1), batch_id=1)
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon2.dedup(docs)) == want


def test_line_monitor_adopts_foreign_commit(spark, tmp_path):
    """Two monitors sharing a sink: a batch committed by the OTHER
    writer is adopted from the sink snapshot (the CounterMonitor
    rule), so the next merge builds on complete state."""
    docs = _multi_docs(spark, "/root/testdata/sf0.001")
    b0 = docs.filter(F.pmod("doc_id", 2) == 0)
    b1 = docs.filter(F.pmod("doc_id", 2) == 1)
    sink = str(tmp_path / "shared")
    a = StreamingLineDedup(spark, sink_path=sink)
    a.process(b0, batch_id=0)
    b = StreamingLineDedup(spark, sink_path=sink)
    b.process(b1, batch_id=1)
    a.process(b1, batch_id=1)  # committed by B: adopt
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, "/root/testdata/sf0.001"))
    assert _by_doc(a.dedup(docs)) == want


def test_line_monitor_readstream_end_to_end(spark, sf_small, tmp_path):
    """Deployment shape: a real readStream drain through foreachBatch
    equals the batch operator."""
    docs = _multi_docs(spark, sf_small)
    src = str(tmp_path / "src")
    for i in range(3):
        docs.filter(F.pmod("doc_id", 3) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    mon = StreamingLineDedup(spark, sink_path=str(tmp_path / "sink"))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
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
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon.dedup(docs)) == want
