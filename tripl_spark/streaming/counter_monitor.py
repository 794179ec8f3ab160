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

**Snapshot-vs-changelog sink (r15).** Writing the FULL post-merge
state per batch is right for counter tables (state = |keys|, small
and bounded), but KEEPER tables (line dedup, canonical-URL dedup)
hold one row per distinct unit corpus-wide — crawl-frontier
cardinality — so the per-batch snapshot rewrite is O(|state|) and
comes to dominate every batch (measured in SCALE.md "keeper sink"
rows: snapshot write cost grows linearly with state while the merge
itself stays near-flat). ``compact_every=N`` switches the sink to
MERGE-ON-READ: each batch writes only its DELTA (the batch's keeper
claims, O(|batch|)), every Nth batch writes a full snapshot
(``_FULL``-marked), and restart folds the latest full snapshot with
the deltas after it — amortized write cost |state|/N + |batch| per
batch — and ``compact_ratio=r`` replaces the fixed period with a SIZE
trigger (full when un-folded delta rows reach r × the last full
snapshot): the doubling argument makes total sink work LINEAR in
stream length, the true asymptote for a state that keeps growing. The mode REQUIRES an idempotent merge (min-merge keepers
qualify; additive counters do NOT and never need it): idempotence
makes the one crash window harmless — a snapshot whose parquet
committed but whose ``_FULL`` marker didn't gets re-folded as a
delta, and ``merge(state, state ∪ …) = state`` absorbs it. A
``_CHANGELOG`` marker at the sink root records the MODE so a resume
without ``compact_every`` fails loudly instead of reading the last
delta as the whole state.

Marker scope: ``_FULL`` / ``_CHANGELOG`` use local-filesystem I/O by
the SAME convention as `sinks.committed_batches`'s local-path listing
(documented there): the test stand-in for a catalog/table-format
commit bit. A non-local sink (s3a/hdfs) needs a transactional table
format for the whole sink family, markers included — not just this
mode.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from tripl_spark.session import eager_checkpoint

_FULL_MARKER = "_FULL"
_CHANGELOG_MARKER = "_CHANGELOG"


class CounterMonitor:
    """``foreachBatch(mon.process)`` target maintaining keyed long
    counters with the snapshot-sink restart contract.

    ``partials_fn(batch) -> DataFrame`` must emit ``key_cols`` plus
    ``counter_cols`` (all long); ``state_schema`` is the DDL string
    used to read back snapshots (new counters added later resume at 0
    via ``na.fill`` rather than poisoning sums with NULL).

    ``compact_every=N`` opts the sink into the merge-on-read changelog
    (delta per batch, full snapshot every Nth batch — see module
    docstring); only subclasses declaring ``_IDEMPOTENT_MERGE`` may
    use it.
    """

    # A merge M is idempotent when M(s, d) = M(s, d ∪ d') for any
    # d' ⊆ s ∪ d — min/max keeper folds qualify; per-key ADDITION does
    # not. Gate for the changelog sink's crash-window absorption.
    _IDEMPOTENT_MERGE = False

    def __init__(
        self,
        spark: SparkSession,
        partials_fn: Callable[[DataFrame], DataFrame],
        key_cols: tuple[str, ...],
        counter_cols: tuple[str, ...] = (),
        state_schema: str = "",
        sink_path: str | None = None,
        compact_every: int | None = None,
        compact_ratio: float | None = None,
    ) -> None:
        from tripl_spark.streaming.sinks import committed_batches

        if compact_every is not None and compact_ratio is not None:
            raise ValueError(
                "pass compact_every (fixed period) OR compact_ratio "
                "(size-triggered), not both"
            )
        if compact_ratio is not None and compact_ratio <= 0:
            raise ValueError("compact_ratio must be > 0")
        if compact_every is not None and compact_every < 1:
            raise ValueError("compact_every must be >= 1")
        if (
            compact_every is not None or compact_ratio is not None
        ) and not self._IDEMPOTENT_MERGE:
            raise ValueError(
                "the merge-on-read changelog sink (compact_every / "
                "compact_ratio) requires an idempotent merge; additive "
                "counter monitors keep the full-snapshot sink (their "
                "state is |keys| rows — snapshots are already cheap)"
            )
        self.spark = spark
        self.partials_fn = partials_fn
        self.key_cols = key_cols
        self.counter_cols = counter_cols
        self.state_schema = state_schema
        self.sink_path = sink_path
        self.compact_every = compact_every
        self.compact_ratio = compact_ratio
        self.state: DataFrame | None = None
        self._seen: set[int] = set()
        # deltas written since the last _FULL-marked snapshot
        # (changelog sink only): count for the fixed period, ROWS for
        # the size trigger; plus the last full snapshot's row count
        self._since_full = 0
        self._delta_rows_since_full = 0
        self._last_full_rows = 0
        if sink_path:
            committed = committed_batches(sink_path)
            self._seen = set(committed)
            if committed:
                self.state = self._load_state(committed)

    @property
    def _changelog(self) -> bool:
        return self.compact_every is not None or self.compact_ratio is not None

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

    def _read_partition(self, batch_id: int) -> DataFrame:
        return self._decode_state(
            self.spark.read.schema(self.state_schema)
            .parquet(f"{self.sink_path}/batch_id={batch_id}")
        )

    def _load_snapshot(self, batch_id: int) -> DataFrame:
        return self._read_partition(batch_id).transform(eager_checkpoint)

    def _full_marker_path(self, batch_id: int) -> str:
        return os.path.join(
            self.sink_path, f"batch_id={batch_id}", _FULL_MARKER
        )

    def _changelog_marker_path(self) -> str:
        return os.path.join(self.sink_path, _CHANGELOG_MARKER)

    def _load_state(self, committed: set[int]) -> DataFrame:
        """Reconstruct the maintained state from the committed sink.

        Full-snapshot sink: the latest partition IS the state.
        Changelog sink (``compact_every``): fold the newest
        ``_FULL``-marked snapshot with every partition committed after
        it, in batch order. A full snapshot that lost its marker in
        the crash window is simply folded as one more delta — the
        idempotent merge this mode requires absorbs it exactly
        (``merge(prefix, full) = full`` when ``full ⊇ prefix``).

        MODE GUARD: a sink carrying the ``_CHANGELOG`` root marker
        holds deltas, and reading its latest partition as if it were a
        full snapshot would silently FORGET every keeper claim outside
        the last batch (and then persist the loss on the next write) —
        so resuming it without a changelog option raises instead. The
        reverse switch (snapshot sink resumed WITH a changelog option)
        is safe and needs no guard: marker-less partitions all fold as
        deltas, and folding full snapshots as deltas is exactly the
        crash-window absorption the idempotent merge provides."""
        if not self._changelog:
            if os.path.exists(self._changelog_marker_path()):
                raise ValueError(
                    f"sink {self.sink_path} was written in changelog "
                    "mode (compact_every/compact_ratio): its latest "
                    "partition is a DELTA, not the state. Resume with "
                    "a changelog option, or compact the sink first."
                )
            return self._load_snapshot(max(committed))
        fulls = [
            b for b in committed
            if os.path.exists(self._full_marker_path(b))
        ]
        base = max(fulls) if fulls else None
        state = self._read_partition(base) if base is not None else None
        if self.compact_ratio is not None:
            self._last_full_rows = state.count() if state is not None else 0
        pending = sorted(b for b in committed if base is None or b > base)
        rows = 0
        for b in pending:
            delta = self._read_partition(b)
            if self.compact_ratio is not None:
                rows += delta.count()
            state = delta if state is None else self._merge(state, delta)
        self._since_full = len(pending)
        self._delta_rows_since_full = rows
        return state.transform(eager_checkpoint)

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay: idempotent skip
            return
        if self.sink_path is not None:
            from tripl_spark.streaming.sinks import committed_batches

            committed = committed_batches(self.sink_path)
            if batch_id in committed:
                # committed by ANOTHER writer (not in our _seen): the
                # sink is authoritative, so ADOPT its state — skipping
                # without reloading would leave this monitor's
                # in-memory state permanently missing that batch's
                # counts, and its next snapshot would overwrite the
                # sink with the undercounted state
                self.state = self._load_state(committed)
                self._seen.update(committed)
                return
        delta = self.partials_fn(batch)
        if self._changelog and self.sink_path is not None:
            # changelog sink: the delta is both the sink record and a
            # merge input — materialize once, reuse for both
            delta = delta.transform(eager_checkpoint)
        if self.state is None:
            merged = delta
        else:
            merged = self._merge(self.state, delta)
        new_state = merged.transform(eager_checkpoint)
        if self.sink_path is not None:
            part = f"{self.sink_path}/batch_id={batch_id}"
            if self._changelog:
                # sink-level mode marker, BEFORE the first partition
                # commit: a later resume without a changelog option
                # must be able to tell this sink holds deltas (see
                # _load_state)
                os.makedirs(self.sink_path, exist_ok=True)
                with open(self._changelog_marker_path(), "w"):
                    pass
            if not self._changelog:
                write_full = True
                d_rows = 0
            elif self.compact_every is not None:
                write_full = self._since_full + 1 >= self.compact_every
                d_rows = 0
            else:
                # size trigger: compact when the un-folded delta rows
                # reach compact_ratio × the last full snapshot — the
                # doubling argument makes TOTAL sink work linear in
                # stream length (each state-sized run of deltas buys
                # one state-sized full), vs the fixed period's
                # |state|/N-per-batch quadratic term
                d_rows = delta.count()  # checkpointed: a cheap count
                write_full = (
                    self._last_full_rows == 0
                    or self._delta_rows_since_full + d_rows
                    >= self.compact_ratio * self._last_full_rows
                )
            if write_full:
                # parquet FIRST, _FULL marker second: a crash in
                # between leaves a committed partition that restart
                # folds as a delta holding the whole state — absorbed
                # exactly by the idempotent merge this mode requires
                new_state.write.mode("overwrite").parquet(part)
                if self._changelog:
                    with open(self._full_marker_path(batch_id), "w"):
                        pass
                    self._since_full = 0
                    self._delta_rows_since_full = 0
                    if self.compact_ratio is not None:
                        self._last_full_rows = new_state.count()
            else:
                delta.write.mode("overwrite").parquet(part)
                self._since_full += 1
                self._delta_rows_since_full += d_rows
        self.state = new_state
        self._seen.add(batch_id)
