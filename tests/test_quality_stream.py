"""Streaming quality monitor ≡ the oracled batch scorecard, for any
micro-batch split, with the snapshot-sink restart contract
(`streaming/quality_stream.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.quality_stream import (
    StreamingQualityMonitor,
    quality_partials,
)

_ensure_loaded()


def _docs(spark, sf):
    return load_table(spark, sf, "documents")


def _card_map(df):
    return {
        (r.source, r.lang): (
            r.n_docs, r.pass_rate, r.fail_wc, r.fail_mwl,
            r.fail_alpha, r.fail_symbol, r.fail_stop,
        )
        for r in df.collect()
    }


def _ledger_map(df):
    return {
        (r.source, r.lang): (
            r.n_docs, r.n_kept, r.dropped_rule_wc, r.dropped_rule_mwl,
            r.dropped_rule_alpha, r.dropped_rule_symbol, r.dropped_rule_stop,
        )
        for r in df.collect()
    }


def _batch_rule_ledger(spark, docs):
    """One-shot rule-fate counts over the SHARED precedence expression
    (`text.first_failing_rule`) — what the streaming ledger must equal
    after any split."""
    from tripl_spark.operators.text import first_failing_rule, gopher_flag_frame

    flags = gopher_flag_frame(docs, keep=("source", "lang"))
    fate = first_failing_rule()
    out = flags.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(fate.isNull(), 1).otherwise(0)).cast("long").alias("n_kept"),
        *[
            F.sum(F.when(fate == f"rule_{r}", 1).otherwise(0))
            .cast("long")
            .alias(f"dropped_rule_{r}")
            for r in ("wc", "mwl", "alpha", "symbol", "stop")
        ],
    )
    return _ledger_map(out)


@pytest.mark.parametrize("split", ["one", "mod3", "skew"])
def test_quality_monitor_is_split_invariant_and_matches_batch(
    spark, sf_small, split
):
    """The maintained scorecard after ANY split equals the oracled
    `curation_gopher_scorecard` one-shot — counters are integers, the
    read-time ratios use the batch query's rounding, so the equality
    is exact, not approximate."""
    docs = _docs(spark, sf_small)
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.pmod("doc_id", 3) == i) for i in range(3)],
        "skew": [
            docs.filter(F.pmod("doc_id", 10) != 0),
            docs.filter(F.pmod("doc_id", 10) == 0),
            docs.limit(0),
        ],
    }[split]
    mon = StreamingQualityMonitor(spark)
    for i, b in enumerate(batches):
        mon.process(b, batch_id=i)
    want = _card_map(REGISTRY["curation_gopher_scorecard"].fn(spark, sf_small))
    assert _card_map(mon.scorecard()) == want
    # the fused drop ledger is split-invariant too, and equals the
    # one-shot rule-fate counts under the shared precedence expression
    assert _ledger_map(mon.drop_ledger()) == _batch_rule_ledger(spark, docs)


def test_quality_monitor_sink_mode_survives_driver_restart(
    spark, sf_small, tmp_path
):
    """Process half the stream, lose the driver, resume: the recovered
    monitor (a) skips replayed committed batches, (b) continues from
    the snapshot, and the final scorecard equals one-shot."""
    docs = _docs(spark, sf_small)
    sink = str(tmp_path / "qsink")
    mon = StreamingQualityMonitor(spark, sink_path=sink)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)

    mon2 = StreamingQualityMonitor(spark, sink_path=sink)  # restart
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)  # replay
    mon2.process(docs.filter(F.pmod("doc_id", 2) == 1), batch_id=1)
    want = _card_map(REGISTRY["curation_gopher_scorecard"].fn(spark, sf_small))
    assert _card_map(mon2.scorecard()) == want
    assert _ledger_map(mon2.drop_ledger()) == _batch_rule_ledger(spark, docs)


def test_quality_monitor_flags_a_planted_regression(spark):
    """A source that flips to boilerplate (all '#', no stopwords) must
    show a pass-rate collapse in the maintained scorecard while the
    healthy source stays green."""
    good = spark.createDataFrame(
        [(i, "the appled oranges and buildings of streams " * 10, "web", "en")
         for i in range(20)],
        "doc_id long, text string, source string, lang string",
    )
    bad = spark.createDataFrame(
        [(100 + i, "### ## #### " * 30, "feed", "en") for i in range(10)],
        "doc_id long, text string, source string, lang string",
    )
    mon = StreamingQualityMonitor(spark)
    mon.process(good, batch_id=0)
    mon.process(bad, batch_id=1)
    card = {r.source: r for r in mon.scorecard().collect()}
    assert card["web"].pass_rate == 1.0
    assert card["feed"].pass_rate == 0.0
    # the per-rule diagnostics say WHY: symbols and stop words
    assert card["feed"].fail_symbol == 1.0
    assert card["feed"].fail_stop == 1.0
    assert card["web"].fail_symbol == 0.0


def test_quality_partials_counters_sum_consistently(spark, sf_small):
    p = quality_partials(_docs(spark, sf_small)).collect()
    for r in p:
        assert 0 <= r.n_pass <= r.n_docs
        for c in ("n_fail_wc", "n_fail_mwl", "n_fail_alpha",
                  "n_fail_symbol", "n_fail_stop"):
            assert 0 <= r[c] <= r.n_docs


def test_quality_monitor_readstream_end_to_end(spark, sf_small, tmp_path):
    """A real readStream → foreachBatch(mon.process) availableNow
    drain over a file-split corpus equals the oracled batch scorecard
    — the deployment shape, not just the unit-level process() calls.
    documents.text may embed newlines, so the stream source is
    parquet, not a text format."""
    docs = _docs(spark, sf_small).select("doc_id", "text", "source", "lang")
    src = str(tmp_path / "src")
    for i in range(3):
        docs.filter(F.pmod("doc_id", 3) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    mon = StreamingQualityMonitor(spark, sink_path=str(tmp_path / "sink"))
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(mon.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    want = _card_map(REGISTRY["curation_gopher_scorecard"].fn(spark, sf_small))
    assert _card_map(mon.scorecard()) == want
    assert _ledger_map(mon.drop_ledger()) == _batch_rule_ledger(
        spark, _docs(spark, sf_small)
    )


def test_streaming_ledger_agrees_with_batch_drop_ledger(spark, sf_small):
    """The fused contract end-to-end: the streaming monitor's per-rule
    drop counts, summed over (source, lang), equal the batch
    `pipeline_drop_ledger`'s rule-fate counts over the SAME documents
    restricted to docs that reach the rule battery (the ledger tries
    near-dup election first; the monitor sees the full stream). One
    precedence definition, two surfaces."""
    docs = _docs(spark, sf_small)
    mon = StreamingQualityMonitor(spark)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 0), batch_id=0)
    mon.process(docs.filter(F.pmod("doc_id", 2) == 1), batch_id=1)
    stream_drops = {
        f"dropped:rule_{r}": v
        for r in ("wc", "mwl", "alpha", "symbol", "stop")
        for v in [
            sum(x[f"dropped_rule_{r}"] for x in mon.drop_ledger().collect())
        ]
    }
    ledger = REGISTRY["pipeline_drop_ledger"].fn(spark, sf_small)
    # restrict the batch ledger to docs the rules actually judged
    # (fate precedence puts near-dup losses first)
    batch_rule_fates = {
        r["fate"]: r["n"]
        for r in ledger.filter(F.col("fate").startswith("dropped:rule_"))
        .groupBy("fate").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # every rule fate the batch ledger emits must appear in the stream
    # counters with at least that count (the stream also judges docs
    # the ledger dropped as near-dups first)
    for fate, n in batch_rule_fates.items():
        assert stream_drops[fate] >= n, (fate, n, stream_drops)
    # conservation on the stream side: drops + kept == docs, per stratum
    for (src_, lang), row in _ledger_map(mon.drop_ledger()).items():
        n_docs, n_kept, *drops = row
        assert n_kept + sum(drops) == n_docs, (src_, lang, row)


def test_quality_monitor_readstream_restart_mid_stream(spark, sf_small, tmp_path):
    """Kill the DEPLOYED shape mid-stream and restart it: a real
    readStream drains through foreachBatch until an injected crash at
    the nastiest point — AFTER the monitor committed its batch_id
    snapshot to the sink, BEFORE the streaming checkpoint committed
    the batch — then a fresh monitor + query resume from the same
    checkpoint. Spark re-delivers the crashed batch; the committed
    sink is authoritative, so the recovered monitor must SKIP the
    re-merge (the double-count hazard the snapshot-sink contract
    exists for), the conservation invariant Σ n_drop = n_docs − n_pass
    must hold at the recovery point, and the fully-drained scorecard
    and ledger must equal the one-shot batch query."""
    docs = _docs(spark, sf_small).select("doc_id", "text", "source", "lang")
    src = str(tmp_path / "src")
    for i in range(4):
        docs.filter(F.pmod("doc_id", 4) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    mon = StreamingQualityMonitor(spark, sink_path=sink)
    done = {"n": 0}

    def crash_after_commit(batch, batch_id):
        mon.process(batch, batch_id)  # sink snapshot IS committed
        done["n"] += 1
        if done["n"] == 3:
            raise RuntimeError("injected crash")  # checkpoint is NOT

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(crash_after_commit)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()

    # --- recovery point: a FRESH monitor (new driver) resumes from the
    # sink; the orphaned batch (committed in sink, absent in ckpt) is
    # visible and the counters are already conservation-consistent
    from tripl_spark.streaming.sinks import committed_batches

    assert set(committed_batches(sink)) == {0, 1, 2}
    mon2 = StreamingQualityMonitor(spark, sink_path=sink)
    mid = _ledger_map(mon2.drop_ledger())
    assert mid  # some strata seen before the crash
    for (src_, lang), row in mid.items():
        n_docs, n_kept, *drops = row
        assert n_kept + sum(drops) == n_docs, (src_, lang, row)

    # --- restart the query on the SAME checkpoint: Spark re-delivers
    # batch 2; mon2 must skip the re-merge and drain the rest
    q2 = (
        stream.writeStream.foreachBatch(mon2.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q2.awaitTermination()
    want = _card_map(REGISTRY["curation_gopher_scorecard"].fn(spark, sf_small))
    assert _card_map(mon2.scorecard()) == want
    assert _ledger_map(mon2.drop_ledger()) == _batch_rule_ledger(
        spark, _docs(spark, sf_small)
    )
    for (src_, lang), row in _ledger_map(mon2.drop_ledger()).items():
        n_docs, n_kept, *drops = row
        assert n_kept + sum(drops) == n_docs, (src_, lang, row)
