"""Streaming fact-log ingest with skip-index maintenance: the
append-only persistence path (`TripleStore.dump_parquet` layout,
reference persistence surface tripl.py:536-558) fed by a stream.

Each micro-batch of facts lands as its own ``batch_id=N`` partition of
the log — exactly the one-file-per-time-slice layout that makes the
file-list skip index (`sources/skipindex.py`) selective — and the
stats sidecar is refreshed incrementally after the data commits, so an
``as_of(t)`` reader prunes its file list from the manifest at any
point in the stream's life without ever rescanning the table.

Restart contract (the package's standard committed-``batch_id``
scheme, `streaming/sinks.py`):

* a batch counts as ingested only when its partition carries the
  ``_SUCCESS`` marker; replayed batches whose marker exists are
  skipped (idempotent).
* a crash mid-write leaves a marker-less partition; construction
  removes those orphans BEFORE any index refresh, so partial files
  can never be indexed, and the engine's checkpoint replay then
  rewrites the batch cleanly.
* a crash between the data commit and the sidecar refresh is healed
  by construction-time (and per-batch) ``refresh_skip_index`` — the
  refresh is a pure new-files-only diff, so running it again is free
  and idempotent.

At 100 TB: per batch this costs one write of the batch plus one stats
pass over the batch's own files — never a table scan; the sidecar
grows one row per (file, attr). Readers pay a file-count-sized
manifest consult instead of an object-store LIST.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from tripl_spark.core.flatten import FACT_COLUMNS as FACT_COLS
from tripl_spark.sources.skipindex import (
    read_pruned,
    refresh_skip_index,
)
from tripl_spark.streaming.sinks import committed_batches


class StreamingLogIngest:
    """``foreachBatch(ingest.process)`` target appending fact batches
    to a skip-indexed log at ``log_path``."""

    def __init__(self, spark: SparkSession, log_path: str) -> None:
        self.spark = spark
        self.log_path = log_path
        os.makedirs(log_path, exist_ok=True)
        self._drop_uncommitted()
        self._seen = committed_batches(log_path)
        if self._seen:
            refresh_skip_index(spark, log_path)  # heal a pre-crash gap

    def _drop_uncommitted(self) -> None:
        """Remove marker-less batch partitions (crashed mid-write):
        their files must never reach the sidecar, and the engine's
        replay will rewrite them."""
        for d in os.listdir(self.log_path):
            full = os.path.join(self.log_path, d)
            if (
                d.startswith("batch_id=")
                and os.path.isdir(full)
                and not os.path.exists(os.path.join(full, "_SUCCESS"))
            ):
                shutil.rmtree(full)

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) in self._seen:
            # replay of a committed batch: data is in place; make sure
            # the sidecar is too (covers crash-after-commit-
            # before-refresh). This heal path is the rare case, so it
            # may pay the full diff.
            refresh_skip_index(self.spark, self.log_path)
            return
        batch_dir = os.path.join(self.log_path, f"batch_id={int(batch_id)}")
        (
            batch.select(*FACT_COLS)
            .write.mode("overwrite")
            .partitionBy("a")
            .parquet(batch_dir)
        )
        # targeted refresh: this writer KNOWS the one new directory, so
        # per-batch maintenance is O(batch) — no full-log LIST, no
        # sidecar read; the steady-state cost contract of the module
        refresh_skip_index(self.spark, self.log_path, new_dirs=[batch_dir])
        self._seen.add(int(batch_id))

    def log_df(self) -> DataFrame:
        """The whole log (all committed batches)."""
        return self.spark.read.parquet(self.log_path).select(*FACT_COLS)

    def as_of(self, t: int, attrs: list[str] | None = None) -> DataFrame:
        """Manifest-pruned time-travel read over everything ingested.
        ``assume_fresh``: this consumer IS the writer protocol — every
        committed batch refreshes the sidecar before the next, and
        construction heals the one crash window — so readers trust the
        manifest instead of paying a full log LIST per read (and never
        spuriously fail against a concurrent batch between its data
        commit and refresh: those rows are correctly invisible until
        the refresh lands). Audits go through `verify_skip_index`."""
        return read_pruned(
            self.spark,
            self.log_path,
            attrs=attrs,
            as_of_t=int(t),
            assume_fresh=True,
        ).select(*FACT_COLS)

    def compact_to(self, dst: str, schema: dict | None = None) -> None:
        """Lifecycle OPTIMIZE: rewrite everything ingested so far as
        the canonical attribute-partitioned compacted dump (LWW
        collapse + exact-dup dedup via the store's merge-on-read view)
        with a fresh skip index — the periodic job that keeps a
        long-lived streamed log from accumulating per-batch small
        files.

        ``schema`` ({attr: {"db:cardinality": ...}, ...}) matters: the
        raw fact stream carries no declarations, and LWW collapse only
        applies to attributes declared card-one — compacting without
        it is exact-dup dedup only (every historical distinct value
        retained). The declarations are ASSERTED into the store before
        the dump, so they persist as meta facts in the compacted
        output and every later ``load_parquet`` of it compacts the
        same way without re-declaring.

        Compaction discards superseded history: ``as_of`` times BEFORE
        the compaction point answer correctly only against the
        original log (the standard MOR-compaction trade — keep the raw
        slices as long as time travel must reach them)."""
        from tripl_spark.core.store import TripleStore

        store = TripleStore.load_parquet(self.log_path, spark=self.spark)
        if schema:
            store.assert_schema(schema)
        store.dump_parquet(dst, skip_index=True)
