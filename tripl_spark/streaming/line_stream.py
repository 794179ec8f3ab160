"""Streaming C4 line dedup: an incremental keeper table for
``operators.dedup.line_keeper_dedup`` maintained micro-batch by
micro-batch (``foreachBatch(mon.process)``).

State is the ``h → keep`` table itself: per batch, split the incoming
documents into newline lines, take the per-hash lexicographic
``min(struct(doc_id, pos))``, and MIN-MERGE into the maintained table
(the ``CounterMonitor`` lifecycle with the merge hook overridden —
replay skip, foreign-commit adoption, and the snapshot-sink restart
order all live in the base). Min is associative, commutative and
IDEMPOTENT, so the maintained keeper table after any micro-batch split
equals the one-shot batch computation over the union — and, stronger
than the additive counter monitors, a re-delivered batch may be
re-merged without corruption (min(x, x) = x). The snapshot-sink
restart contract is therefore pure availability bookkeeping here, not
a correctness requirement.

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
from tripl_spark.streaming.counter_monitor import CounterMonitor

_STATE_SCHEMA = (
    "h string, keep struct<doc_id: bigint, pos: bigint>"
)


def _batch_keepers(docs: DataFrame) -> DataFrame:
    return (
        split_lines_newline(docs)
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("keep"))
    )


class StreamingLineDedup(CounterMonitor):
    """Maintains the global first-occurrence line keeper table across
    micro-batches; ``foreachBatch(mon.process)`` target.

    ``compact_every=N`` switches the sink to the merge-on-read
    changelog (delta per batch, full snapshot every Nth) — the keeper
    table is one row per distinct line corpus-wide, so the default
    per-batch full-snapshot rewrite is O(|state|) and this monitor is
    exactly the shape the mode exists for. Min-merge is idempotent,
    which the mode requires."""

    _IDEMPOTENT_MERGE = True

    def __init__(
        self,
        spark: SparkSession,
        sink_path: str | None = None,
        compact_every: int | None = None,
        compact_ratio: float | None = None,
    ) -> None:
        super().__init__(
            spark,
            partials_fn=_batch_keepers,
            key_cols=("h",),
            state_schema=_STATE_SCHEMA,
            sink_path=sink_path,
            compact_every=compact_every,
            compact_ratio=compact_ratio,
        )

    def _merge(self, state: DataFrame, delta: DataFrame) -> DataFrame:
        """Lexicographic struct min per line hash — associative AND
        idempotent (first occurrence corpus-wide, batch-order-free)."""
        return (
            state.unionByName(delta)
            .groupBy("h")
            .agg(F.min("keep").alias("keep"))
        )

    def _decode_state(self, df: DataFrame) -> DataFrame:
        """Keeper structs need no post-read repair (no additive
        counters to zero-fill)."""
        return df

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
        from tripl_spark.operators.dedup import reassemble_kept_lines

        keyed = split_lines_newline(docs)
        flagged = keyed.join(self.keepers(), "h", "left").withColumn(
            "kept",
            F.col("keep").isNull()
            | (
                (F.col("doc_id") == F.col("keep.doc_id"))
                & (F.col("pos") == F.col("keep.pos"))
            ),
        )
        return reassemble_kept_lines(flagged, sep="\n")
