"""Streaming fact-log ingest: committed batches are prunable via the
maintained skip index; replays and crashes heal (`streaming/log_ingest.py`)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tripl_spark.session import load_table
from tripl_spark.sources.skipindex import plan_files, verify_skip_index
from tripl_spark.streaming.log_ingest import StreamingLogIngest


def _fact_batches(spark, sf_small, n_batches=3):
    events = load_table(spark, sf_small, "events")
    facts = events.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("e"),
        F.lit("user:last_type").alias("a"),
        F.lit("str").alias("vtype"),
        F.col("event_type").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        (F.unix_millis("ts") * 1_000_000 + F.col("event_id")).alias("t"),
    )
    # time-sliced batches — the shape a real ingest produces
    cuts = [
        int(c)
        for c in facts.selectExpr(
            "percentile(t, array(0.33, 0.66))"
        ).collect()[0][0]
    ]
    lo = facts.filter(F.col("t") <= cuts[0])
    mid = facts.filter((F.col("t") > cuts[0]) & (F.col("t") <= cuts[1]))
    hi = facts.filter(F.col("t") > cuts[1])
    return facts, [lo, mid, hi], cuts


def test_ingest_builds_consistent_index_and_prunes(spark, sf_small, tmp_path):
    facts, batches, cuts = _fact_batches(spark, sf_small)
    log = str(tmp_path / "log")
    ing = StreamingLogIngest(spark, log)
    for i, b in enumerate(batches):
        ing.process(b, batch_id=i)

    assert ing.log_df().count() == facts.count()
    verify_skip_index(spark, log)

    # as_of below the first cut: only batch 0's files are opened
    _, rep, _idx = plan_files(spark, log, as_of_t=int(cuts[0]))
    assert 0 < rep["kept"] < rep["total"]
    got = ing.as_of(int(cuts[0])).count()
    want = facts.filter(F.col("t") <= cuts[0]).count()
    assert got == want


def test_ingest_batch_with_empty_parts_stays_readable(spark, sf_small, tmp_path):
    """REGRESSION (r8 verdict #1, streaming path): a micro-batch whose
    partitioning leaves zero-row part files must not poison the
    sidecar — old behavior left them unindexed so verify (and any
    default-freshness read) raised 'stale' forever."""
    facts, batches, cuts = _fact_batches(spark, sf_small)
    log = str(tmp_path / "log")
    ing = StreamingLogIngest(spark, log)
    ing.process(batches[0], batch_id=0)
    # an over-partitioned tiny batch: some tasks write empty parts
    ing.process(batches[1].limit(1).repartition(4), batch_id=1)
    verify_skip_index(spark, log)
    assert ing.log_df().count() == batches[0].count() + 1
    assert ing.as_of(2**62).count() == batches[0].count() + 1
    # restart over the same log heals nothing because nothing is broken
    ing2 = StreamingLogIngest(spark, log)
    verify_skip_index(spark, log)
    assert ing2.as_of(2**62).count() == batches[0].count() + 1


def test_replay_is_idempotent(spark, sf_small, tmp_path):
    facts, batches, _ = _fact_batches(spark, sf_small)
    log = str(tmp_path / "log")
    ing = StreamingLogIngest(spark, log)
    for i, b in enumerate(batches):
        ing.process(b, batch_id=i)
    ing.process(batches[1], batch_id=1)  # engine replay after recovery
    assert ing.log_df().count() == facts.count()
    verify_skip_index(spark, log)


def test_restart_resumes_and_drops_uncommitted(spark, sf_small, tmp_path):
    facts, batches, _ = _fact_batches(spark, sf_small)
    log = str(tmp_path / "log")
    ing = StreamingLogIngest(spark, log)
    ing.process(batches[0], batch_id=0)
    ing.process(batches[1], batch_id=1)

    # simulate a crash mid-write of batch 2: data files, no _SUCCESS
    crashed = os.path.join(log, "batch_id=2")
    batches[2].write.mode("overwrite").partitionBy("a").parquet(crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))

    ing2 = StreamingLogIngest(spark, log)  # restart
    assert not os.path.isdir(crashed)  # orphan dropped, never indexed
    verify_skip_index(spark, log)
    ing2.process(batches[2], batch_id=2)  # engine replays the batch
    assert ing2.log_df().count() == facts.count()
    verify_skip_index(spark, log)


def test_restart_heals_missing_sidecar_rows(spark, sf_small, tmp_path):
    """Crash AFTER a batch's data commit but BEFORE its index refresh:
    the restarted consumer's construction refresh catches the gap."""
    import shutil

    facts, batches, _ = _fact_batches(spark, sf_small)
    log = str(tmp_path / "log")
    ing = StreamingLogIngest(spark, log)
    ing.process(batches[0], batch_id=0)
    # batch 1 commits its data, but the refresh never ran
    batches[1].write.mode("overwrite").partitionBy("a").parquet(
        os.path.join(log, "batch_id=1")
    )
    ing2 = StreamingLogIngest(spark, log)
    verify_skip_index(spark, log)
    assert ing2.log_df().count() == batches[0].count() + batches[1].count()
    shutil.rmtree(log)


def test_compact_to_canonical_dump(spark, sf_small, tmp_path):
    """Compaction with a card-one schema REALLY collapses: the raw
    compacted parquet holds exactly one user:last_type fact per
    entity (superseded history gone), the declarations travel in the
    dump (no re-declare on load), and the compacted store answers the
    same current-state query as a store built straight from the log."""
    from tripl_spark.core.schema import CARD_ONE
    from tripl_spark.core.store import TripleStore

    facts, batches, _ = _fact_batches(spark, sf_small)
    log = str(tmp_path / "log")
    ing = StreamingLogIngest(spark, log)
    for i, b in enumerate(batches):
        ing.process(b, batch_id=i)
    dst = str(tmp_path / "compacted")
    schema = {"user:last_type": {"db:cardinality": CARD_ONE}}
    ing.compact_to(dst, schema=schema)
    verify_skip_index(spark, dst)

    # true LWW collapse, checked on the RAW compacted parquet
    raw = spark.read.parquet(dst).filter(F.col("a") == "user:last_type")
    per_entity = raw.groupBy("e").count().agg(F.max("count")).collect()[0][0]
    assert per_entity == 1

    compacted = TripleStore.load_parquet(dst, spark=spark)
    assert compacted.registry.cardinality("user:last_type") == CARD_ONE
    direct = TripleStore.from_facts_df(facts, spark=spark)
    direct.registry.declare("user:last_type", {"db:cardinality": CARD_ONE})
    got = {
        (r.e, r.v_str)
        for r in compacted.current_facts(cache=False)
        .filter(F.col("a") == "user:last_type")
        .collect()
    }
    want = {
        (r.e, r.v_str)
        for r in direct.current_facts(cache=False)
        .filter(F.col("a") == "user:last_type")
        .collect()
    }
    assert got == want and got


def test_foreachbatch_stream_end_to_end(spark, sf_small, tmp_path):
    """A real readStream → foreachBatch(ingest.process) drain equals
    the one-shot log, and the index verifies after the stream stops."""
    facts, batches, cuts = _fact_batches(spark, sf_small)
    src = str(tmp_path / "src")
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(batches[0].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    log = str(tmp_path / "log")
    ing = StreamingLogIngest(spark, log)
    q = (
        stream.writeStream.foreachBatch(ing.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert ing.log_df().count() == facts.count()
    verify_skip_index(spark, log)
    got = ing.as_of(int(cuts[0])).count()
    assert got == facts.filter(F.col("t") <= cuts[0]).count()
