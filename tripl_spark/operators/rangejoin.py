"""Range (interval) join: pair rows whose timestamps fall within a
bounded window of each other, without a cross join.

The naive plan for ``L ⋈ R ON r.ts BETWEEN l.ts AND l.ts + w`` is a
broadcast-nested-loop or cartesian filter — O(|L|·|R|) comparisons,
dead at any scale. The scalable shape (what Databricks' range-join
optimization and KDB's window joins do under the hood) is
**bin-bucketing**: quantize time into buckets of the window width,
join on (key, bucket) so each left row meets only the right rows in
its own bucket or the adjacent one, then apply the exact predicate.
With bucket width = window width, each pair is examined in exactly one
bucket (the right row's own bin), so no post-join dedup is needed; the
join is a plain shuffled equi-join on (key, bin) — partition-balanced,
AQE-splittable, no quadratic blowup.

Cost model: comparisons drop from |L|·|R| per key to
sum over buckets of |L_b|·(|R_b| + |R_b+1|) — for event streams that
is ~uniform per bucket, i.e. linear in the data with a small constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    strict: bool = True,
) -> DataFrame:
    """Equi-key interval join: (l, r) pairs with
    ``l.ts < r.ts <= l.ts + window`` (strict) or
    ``l.ts <= r.ts <= l.ts + window``.

    Both sides are binned to ``window_seconds`` buckets; the left side
    explodes into its own and the NEXT bucket (any r within the window
    of l lives in bin(l) or bin(l)+1), the join runs on
    (keys..., bucket), and the exact predicate prunes the remainder.
    Each qualifying pair meets exactly once — at r's own bin."""
    lbin = F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds)
    rbin = F.floor(F.unix_timestamp(F.col(right_ts)) / window_seconds)
    # alias both sides: self-range-joins (left and right sharing lineage)
    # otherwise hit Spark's ambiguous-self-join column resolution
    l = left.withColumn("_bin", F.explode(F.array(lbin, lbin + 1))).alias("L")
    r = right.withColumn("_bin", rbin).alias("R")
    cond: Column = F.col("L._bin") == F.col("R._bin")
    for k in on:
        cond = cond & (F.col(f"L.{k}") == F.col(f"R.{k}"))
    lts, rts = F.col(f"L.{left_ts}"), F.col(f"R.{right_ts}")
    lo = lts < rts if strict else lts <= rts
    hi = rts <= lts + F.make_dt_interval(secs=F.lit(window_seconds))
    return l.join(r, cond & lo & hi).drop("_bin")


@query(
    "range_join_error_followups",
    oracle="""
    SELECT e1.event_type AS t1, e2.event_type AS t2,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events WHERE event_type = 'error') e1
    JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events) e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    GROUP BY t1, t2
    """,
)
def range_join_error_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What do users do in the hour after an error? Interval join of
    error events against all events, executed as the binned equi-join —
    the oracle runs DuckDB's native inequality join, so any bucket-edge
    bug (a pair double-counted across bins, or a boundary dropped)
    hash-mismatches."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    errors = events.filter(F.col("event_type") == "error")
    pairs = range_join(
        errors.withColumnRenamed("event_type", "t1"),
        events.withColumnRenamed("event_type", "t2"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
    )
    return pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "hypertable_rollup_daily",
    oracle="""
    SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
             AS total_value,
           floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                 * 10000 + 0.5) / 10000 AS avg_value
    FROM events
    GROUP BY day, event_type
    """,
)
def hypertable_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: events roll up to HOURLY
    partials (count + sum — the algebraic decomposition), and the daily
    level re-aggregates the partials, never the raw rows. This is the
    TimescaleDB/Druid rollup cascade: at 100 TB the hourly layer is
    what you materialize, and every coarser granularity (day, week,
    month) is a cheap re-aggregation of ~24x fewer rows; avg is
    recovered as sum/count, which is why partials store both. The
    oracle aggregates the raw table directly — if the cascade dropped
    or double-counted a partial, the hashes flip."""
    events = load_table(spark, sf_dir, "events")
    # partials sum in DECIMAL: the rollup cascade re-adds partial sums
    # in a different order than a single-pass aggregation, and float
    # addition is not associative — exact decimal arithmetic makes the
    # cascade bit-identical to the oracle's direct aggregation
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )
    daily = hourly.groupBy(
        F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
    )
    return daily.select(
        "day",
        "event_type",
        "n_events",
        F.round(F.col("sum_value").cast("double"), 2).alias("total_value"),
        # explicit half-up on the BINARY value (floor(x*1e4+0.5)/1e4):
        # Spark's round() rounds the shortest decimal repr of a double,
        # DuckDB rounds the true binary value — at an exact 4dp half
        # boundary (e.g. 307.03/8) they disagree; this formula is
        # engine-independent given identical inputs
        (
            F.floor(
                F.col("sum_value").cast("double") / F.col("n_events") * 10000 + 0.5
            )
            / 10000
        ).alias("avg_value"),
    )
