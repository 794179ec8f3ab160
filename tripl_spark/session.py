"""SparkSession factory + testdata table loading.

Single place where session tuning lives so tests, bench, and the driver
entry all get the same scale-aware defaults:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  at 100 TB the static plan is never right, AQE fixes it per-stage.
* ``spark.sql.shuffle.partitions`` sized to local cores here; on a real
  cluster this is overridden to ~2-3x total executor cores (AQE
  coalescing makes over-provisioning cheap).
* UTC session timezone so timestamp semantics match the DuckDB oracle.
* Arrow enabled for every pandas interchange (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "tripl_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned local SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.ts is a TIMESTAMP(NANOS) parquet column, which the vectorized
        # reader rejects; read it as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (columnar parquet → pushdown-friendly scan).

    ``events.ts`` arrives as nanoseconds-since-epoch (legacy long read);
    normalize to a microsecond TimestampType — oracle queries apply the
    matching ``CAST(ts AS TIMESTAMP)`` on the DuckDB side so ordering
    and window ties agree.
    """
    from pyspark.sql import functions as F

    if name == "events":
        # Runtime-set so this works under ANY caller-provided session
        # (the driver builds its own, without our builder configs).
        # Read-before-write keeps the call idempotent — no redundant
        # conf mutation racing concurrent streaming query startups.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(key, None) != "true":
            spark.conf.set(key, "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # micros-precision parquet reads as NTZ under Spark 4's
            # inferTimestampNTZ; normalize to TimestampType (session TZ
            # is UTC, so wall-clock values are unchanged) so epoch
            # casts/windows behave uniformly across testdata vintages.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
