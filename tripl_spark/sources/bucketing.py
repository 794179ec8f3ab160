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
from pyspark.sql import functions as F


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


def _zorder_projection(df: DataFrame, col: str) -> "F.Column":
    """Order-preserving numeric projection of a z-dimension. Numeric
    columns cast straight to double. STRING columns project their
    first-7-byte UTF-8 prefix to an integer (hex of the prefix parsed
    base-16 — byte order IS lexicographic order, and 7 bytes = 56 bits
    fits a long exactly; the double cast afterwards only has to carry
    the top ~12 bucket bits). Approximate beyond the prefix, which is
    fine: the projection only steers CLUSTERING — correctness lives in
    the skip index / row-group min-max stats computed from the actual
    values, so an imperfect projection costs selectivity, never
    soundness."""
    if dict(df.dtypes)[col] == "string":
        prefix = F.substring(F.rpad(F.coalesce(F.col(col), F.lit("")), 7, "\0"), 1, 7)
        return (
            F.conv(F.substring(F.hex(F.encode(prefix, "UTF-8")), 1, 14), 16, 10)
            .cast("long")
            .cast("double")
        )
    return F.col(col).cast("double")


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, "F.Column"]:
    """Z-order (Morton) key over numeric OR string columns: each
    column projects to a double (`_zorder_projection`), is linearly
    bucketed into 2^bits cells between its min and max, and the bucket
    bits are interleaved. Sorting by the interleaved key clusters ALL
    dimensions at once — parquet row-group min/max spans shrink for
    every Z-dimension, so a filter on ANY of them skips row groups,
    where a plain sort only serves its leading column. Two tiny
    driver-side aggregations (min/max per column) parameterize the
    bucketing; the key itself is a pure codegen expression.

    Returns (df_with_bounds, zvalue_column)."""
    projs = {c: _zorder_projection(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(projs[c]).alias(f"__mn_{c}") for c in cols],
        *[F.max(projs[c]).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    cells = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn = float(bounds[f"__mn_{c}"])
        mx = float(bounds[f"__mx_{c}"])
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.lit(cells),
            F.floor((projs[c] - F.lit(mn)) / span * cells).cast("long"),
        )
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                i * len(cols) + j,
            )
    return df, z


def zorder_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    cols: list[str],
    target_file_bytes: int = 256 << 20,
    row_group_bytes: int | None = None,
) -> None:
    """OPTIMIZE ZORDER BY: compact + multi-dimensionally cluster a
    parquet dataset. Range-partition by the Morton key (so files carve
    up Z-space), sort within files, drop the key on write."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src)  # noqa: SLF001
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    total = fs.getContentSummary(jpath).getLength()
    n = max(1, -(-int(total) // target_file_bytes))
    df, z = zorder_value(spark.read.parquet(src), cols)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode("overwrite")
    if row_group_bytes:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(dst)
