"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The 100 TB story: a fact⋈fact join (lineitem⋈orders on orderkey)
shuffles BOTH tables every time it runs — at scale that is the single
most expensive stage in the pipeline, and it repeats for every query
that joins the same keys. Bucketing moves that shuffle to write time,
once: ``bucketBy(n, key)`` hash-partitions rows into ``n`` files per
partition exactly the way a shuffle would, and records the layout in
the catalog. Catalyst then plans a sort-merge join over matching
bucketed scans with NO Exchange on either side — the join runs
bucket-to-bucket, embarrassingly parallel, and the same layout is
reused by every subsequent join/groupBy on that key.

Design rules encoded here:

* both sides must use the SAME bucket count (Spark only elides the
  shuffle when bucket specs line up; with different counts it can
  shuffle the smaller side into the larger's bucketing);
* bucket count is chosen for the TARGET scale: at 100 TB you want
  buckets of ~128-512 MB, i.e. thousands of buckets — the parameter is
  explicit, not defaulted, for that reason;
* ``sortBy(key)`` within buckets lets the merge join skip its sort;
* bucketed tables must go through the catalog (``saveAsTable``) — a
  plain parquet path write loses the bucket metadata.

``tests/test_bucketing.py`` proves the contract: the bucketed join
plan contains zero Exchange operators and returns byte-identical
results to the shuffled join.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    """Create a catalog database at an explicit filesystem location
    (keeps bucketed tables out of the default warehouse)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize df hash-bucketed (and per-bucket sorted) on key."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain only prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the physical plan."""
    return sum(
        1
        for line in explain_str(df).splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def optimize_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 256 << 20,
    cluster_by: list[str] | None = None,
) -> int:
    """Small-file compaction (the OPTIMIZE half of table maintenance):
    rewrite a parquet dataset into ~target-sized files, optionally
    clustered (repartition by columns + sort within files — the poor
    man's Z-order: one clustering dimension of data skipping via
    parquet min/max row-group stats). Small files are the silent killer
    of 100 TB scans — every file costs a task, a footer read, and a
    listing entry; streaming sinks and per-attribute partitioning both
    produce them, so compaction is a standing maintenance job, not an
    afterthought. Sizing uses the Hadoop FileSystem API (works on
    HDFS/S3, not just local). Returns the file count written."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src)  # noqa: SLF001
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    total = fs.getContentSummary(jpath).getLength()
    n = max(1, -(-int(total) // target_file_bytes))
    df = spark.read.parquet(src)
    df = df.repartition(n, *cluster_by) if cluster_by else df.repartition(n)
    if cluster_by:
        df = df.sortWithinPartitions(*cluster_by)
    df.write.mode("overwrite").parquet(dst)
    return n
