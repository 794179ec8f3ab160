"""Shared sink-commit bookkeeping for the ``foreachBatch`` consumers.

All restart-safe streaming consumers in this package use the same
idempotence scheme: each micro-batch's output (or post-merge state
snapshot) overwrites a ``batch_id=N`` parquet partition, and a batch
counts as processed only when its partition carries the ``_SUCCESS``
marker the default FileOutputCommitter writes. A crash mid-write
leaves the directory marker-less, so the checkpoint-replayed batch
reprocesses rather than being silently dropped.

NOTE: committers configured with ``marksuccessfuljobs=false`` (common
on object stores) never write markers; this scheme requires them — at
that scale use a transactional table format instead. Local-path
listing is the test stand-in for a Hadoop-FS listing / catalog
partition query at cluster scale.
"""

from __future__ import annotations

import os


def committed_batches(sink_path: str | None) -> set[int]:
    """Batch ids whose ``batch_id=N`` partitions committed (_SUCCESS)."""
    if sink_path is None or not os.path.isdir(sink_path):
        return set()
    return {
        int(d.split("=", 1)[1])
        for d in os.listdir(sink_path)
        if d.startswith("batch_id=")
        and os.path.exists(os.path.join(sink_path, d, "_SUCCESS"))
    }
