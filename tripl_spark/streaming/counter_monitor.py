"""Generic restart-safe additive-counter monitor for ``foreachBatch``.

The pattern every counter-table monitor in this package follows
(`quality_stream.py` proved it and now subclasses this base, its own
split-invariance and crash-restart tests still pinning the contract):
per micro-batch, compute a keyed frame of LONG
counters from the batch, merge into the maintained state by summing
per key, snapshot the POST-MERGE state to a ``batch_id=N`` sink
partition, and on restart resume from the last committed snapshot —
an already-committed batch never re-merges (the committed sink is
authoritative, so a crash between the sink write and the streaming
checkpoint commit cannot double-count the re-delivered batch).

Integer addition is associative, so the maintained state after ANY
micro-batch split equals the one-shot batch aggregation bit-for-bit;
read-time views (rates, scorecards) derive from the counters with the
batch query's exact rounding and therefore cannot drift either.

The LIFECYCLE (replay skip, foreign-commit adoption, the
snapshot-then-mark write order) is the subtle part and lives once,
here; the MERGE is a subclass hook (`_merge`, default per-key long
addition) so keyed-state monitors with a different associative fold —
the line-dedup keeper table min-merges, for instance — ride the same
protocol instead of re-implementing it.

Scale: state is |key-combinations| counter rows however long the
stream history; each batch costs one scan of the batch plus a
counter-table merge.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CounterMonitor:
    """``foreachBatch(mon.process)`` target maintaining keyed long
    counters with the snapshot-sink restart contract.

    ``partials_fn(batch) -> DataFrame`` must emit ``key_cols`` plus
    ``counter_cols`` (all long); ``state_schema`` is the DDL string
    used to read back snapshots (new counters added later resume at 0
    via ``na.fill`` rather than poisoning sums with NULL).
    """

    def __init__(
        self,
        spark: SparkSession,
        partials_fn: Callable[[DataFrame], DataFrame],
        key_cols: tuple[str, ...],
        counter_cols: tuple[str, ...] = (),
        state_schema: str = "",
        sink_path: str | None = None,
    ) -> None:
        from tripl_spark.streaming.sinks import committed_batches

        self.spark = spark
        self.partials_fn = partials_fn
        self.key_cols = key_cols
        self.counter_cols = counter_cols
        self.state_schema = state_schema
        self.sink_path = sink_path
        self.state: DataFrame | None = None
        self._seen: set[int] = set()
        if sink_path:
            committed = committed_batches(sink_path)
            self._seen = set(committed)
            if committed:
                self.state = self._load_snapshot(max(committed))

    # -- subclass hooks: the lifecycle (replay skip, foreign-commit
    # adoption, snapshot-sink write order) is THE protocol and lives
    # once, here; monitors whose state merges by something other than
    # per-key addition override only these two methods.

    def _merge(self, state: DataFrame, delta: DataFrame) -> DataFrame:
        """Fold a batch delta into the maintained state. Default:
        per-key long-counter addition. Must be associative over any
        micro-batch split."""
        return (
            state.unionByName(delta)
            .groupBy(*self.key_cols)
            .agg(*[F.sum(c).cast("long").alias(c) for c in self.counter_cols])
        )

    def _decode_state(self, df: DataFrame) -> DataFrame:
        """Post-read repair of a snapshot. Default: counters added
        after a snapshot was written resume at 0 via ``na.fill``
        rather than poisoning sums with NULL."""
        return df.na.fill(0)

    def _load_snapshot(self, batch_id: int) -> DataFrame:
        return self._decode_state(
            self.spark.read.schema(self.state_schema)
            .parquet(f"{self.sink_path}/batch_id={batch_id}")
        ).localCheckpoint(eager=True)

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay: idempotent skip
            return
        if self.sink_path is not None:
            from tripl_spark.streaming.sinks import committed_batches

            committed = committed_batches(self.sink_path)
            if batch_id in committed:
                # committed by ANOTHER writer (not in our _seen): the
                # sink is authoritative, so ADOPT its latest snapshot —
                # skipping without reloading would leave this monitor's
                # in-memory state permanently missing that batch's
                # counts, and its next snapshot would overwrite the
                # sink with the undercounted state
                self.state = self._load_snapshot(max(committed))
                self._seen.update(committed)
                return
        delta = self.partials_fn(batch)
        if self.state is None:
            merged = delta
        else:
            merged = self._merge(self.state, delta)
        new_state = merged.localCheckpoint(eager=True)
        if self.sink_path is not None:
            new_state.write.mode("overwrite").parquet(
                f"{self.sink_path}/batch_id={batch_id}"
            )
        self.state = new_state
        self._seen.add(batch_id)
