"""Streaming C4 line dedup: an incremental keeper table for
``operators.dedup.line_keeper_dedup`` maintained micro-batch by
micro-batch (``foreachBatch(mon.process)``).

State is the ``h → keep`` table itself: per batch, split the incoming
documents into newline lines, take the per-hash lexicographic
``min(struct(doc_id, pos))``, and MIN-MERGE into the maintained table.
Min is associative, commutative and IDEMPOTENT, so the maintained
keeper table after any micro-batch split equals the one-shot batch
computation over the union — and, stronger than the additive counter
monitors, a re-delivered batch may be re-merged without corruption
(min(x, x) = x). The snapshot-sink restart contract is therefore pure
availability bookkeeping here, not a correctness requirement: resume
from the last committed ``batch_id=N`` snapshot, adopt a foreign
commit, re-merge anything uncertain.

Scale: state is one row per DISTINCT line corpus-wide (the same
keeper-table shape the batch operator shuffles); each batch costs a
line split of the batch plus one min-merge keyed by line hash.

The monitor answers the production question directly: ``dedup(docs)``
applies the maintained table to any document frame, reproducing the
batch ``line_keeper_dedup`` output exactly when the table was fed the
same corpus (pinned by tests/test_line_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.dedup import split_lines_newline

_STATE_SCHEMA = (
    "h string, keep struct<doc_id: bigint, pos: bigint>"
)


class StreamingLineDedup:
    """Maintains the global first-occurrence line keeper table across
    micro-batches; ``foreachBatch(mon.process)`` target."""

    def __init__(
        self,
        spark: SparkSession,
        sink_path: str | None = None,
    ) -> None:
        from tripl_spark.streaming.sinks import committed_batches

        self.spark = spark
        self.sink_path = sink_path
        self.state: DataFrame | None = None
        self._seen: set[int] = set()
        if sink_path:
            committed = committed_batches(sink_path)
            self._seen = set(committed)
            if committed:
                self.state = self._read_snapshot(max(committed))

    def _read_snapshot(self, batch_id: int) -> DataFrame:
        return (
            self.spark.read.schema(_STATE_SCHEMA)
            .parquet(f"{self.sink_path}/batch_id={batch_id}")
            .localCheckpoint(eager=True)
        )

    @staticmethod
    def _batch_keepers(docs: DataFrame) -> DataFrame:
        return (
            split_lines_newline(docs)
            .groupBy("h")
            .agg(F.min(F.struct("doc_id", "pos")).alias("keep"))
        )

    def process(self, batch: DataFrame, batch_id: int) -> None:
        """Min-merge the batch's keepers into the maintained table.
        Replays are skipped for economy, but would be harmless: the
        merge is idempotent."""
        if batch_id in self._seen:
            return
        if self.sink_path is not None:
            from tripl_spark.streaming.sinks import committed_batches

            committed = committed_batches(self.sink_path)
            if batch_id in committed:
                # foreign commit: the sink is authoritative — adopt
                # its latest snapshot (same rule as CounterMonitor)
                self.state = self._read_snapshot(max(committed))
                self._seen.update(committed)
                return
        delta = self._batch_keepers(batch)
        if self.state is None:
            merged = delta
        else:
            merged = (
                self.state.unionByName(delta)
                .groupBy("h")
                .agg(F.min("keep").alias("keep"))
            )
        new_state = merged.localCheckpoint(eager=True)
        if self.sink_path is not None:
            new_state.write.mode("overwrite").parquet(
                f"{self.sink_path}/batch_id={batch_id}"
            )
        self.state = new_state
        self._seen.add(batch_id)

    def keepers(self) -> DataFrame:
        """The maintained ``(h, keep)`` table (empty frame before any
        batch)."""
        if self.state is None:
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        return self.state

    def dedup(self, docs: DataFrame) -> DataFrame:
        """Apply the maintained table to a document frame: the same
        output contract as the batch ``line_keeper_dedup`` (n_lines /
        n_kept / n_dropped / dedup_fp, newline-joined). A line absent
        from the table (never streamed) keeps its occurrence in
        ``docs`` — defensive, cannot happen when ``docs`` ⊆ streamed
        corpus."""
        keyed = split_lines_newline(docs)
        flagged = keyed.join(self.keepers(), "h", "left").withColumn(
            "kept",
            F.col("keep").isNull()
            | (
                (F.col("doc_id") == F.col("keep.doc_id"))
                & (F.col("pos") == F.col("keep.pos"))
            ),
        )
        return flagged.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
            F.sum((~F.col("kept")).cast("int")).cast("long").alias("n_dropped"),
            F.md5(
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("kept"),
                                    F.struct(F.col("pos"), F.col("line")),
                                )
                            )
                        ),
                        lambda s: s.getField("line"),
                    ),
                )
            ).alias("dedup_fp"),
        )
