"""As-of join and statistical-aggregate queries (oracled), plus
approximate-algorithm queries (rows-only, with error-bound tests).

The as-of oracle uses DuckDB's native ``ASOF LEFT JOIN`` — our
union+window composition must reproduce it row-for-row, which is the
strongest available ground truth for a point-in-time join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.asof import asof_join
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

_EV = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"


@query(
    "asof_last_purchase",
    oracle=f"""
    SELECT l.event_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           r.event_id AS asof_event_id,
           round(r.value, 2) AS asof_value
    FROM (SELECT * FROM {_EV} events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM {_EV} events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase at-or-before it
    (union+window as-of join vs DuckDB's native ASOF JOIN)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, ts="ts", by="user_id",
        right_cols=["event_id", "value"], tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_event_id"),
        F.round("asof_value", 2).alias("asof_value"),
    )


@query(
    "stats_value_by_type",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           round(avg(value), 4) AS avg_value,
           round(stddev_samp(value), 4) AS sd_value,
           round(var_samp(value), 4) AS var_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           round(quantile_cont(value, 0.5), 4) AS median_value,
           round(quantile_cont(value, 0.9), 4) AS p90_value
    FROM {_EV} events
    GROUP BY event_type
    """,
)
def stats_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance (sample) and exact
    interpolated percentiles — Spark `percentile` and DuckDB
    `quantile_cont` share the type-7 interpolation rule."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90_value"),
    )


@query(
    "stats_corr_value_k",
    oracle=f"""
    SELECT event_type,
           round(corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS corr_vk,
           round(covar_samp(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4)
             AS covar_vk
    FROM {_EV} events
    GROUP BY event_type
    """,
)
def stats_corr_value_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate stats between the value column and a JSON-extracted
    property (both engines: sample covariance / Pearson correlation)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return events.groupBy("event_type").agg(
        F.round(F.corr("value", k), 4).alias("corr_vk"),
        F.round(F.covar_samp("value", k), 4).alias("covar_vk"),
    )


@query("approx_distinct_users", doc="HLL approximate distinct (rows-only; "
                                    "error bound asserted in tests/test_advanced.py)")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the
    constant-memory path for distinct counting at 100 TB; exact distinct
    shuffles every key, HLL shuffles one sketch per partition."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@query("approx_quantiles_value", doc="t-digest style approximate quantiles "
                                     "(rows-only; error bound asserted in tests)")
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx — bounded-memory sketch quantiles vs the exact
    sort-based percentile (which at scale means a full shuffle)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile_approx("value", F.lit(0.5), F.lit(1000)), 4).alias("approx_median"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("exact_median"),
    )
