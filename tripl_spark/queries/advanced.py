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


def _approx_distinct_oracle() -> str:
    from tripl_spark.operators.sketches import (
        HLL_M,
        _HLL_VAL_BITS,
        _hll_est_sql,
        _POW2,
    )

    return rf"""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             CAST('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
      FROM tu
    ),
    parts AS (SELECT event_type, hv % {HLL_M} AS register, hv // {HLL_M} AS w FROM h),
    regs AS (
      SELECT event_type, register,
             max(CASE WHEN w = 0 THEN {_HLL_VAL_BITS + 1}
                      ELSE {_HLL_VAL_BITS + 1}
                           - len(list_filter({_POW2}, p -> p <= w))
                 END) AS r
      FROM parts GROUP BY 1, 2
    ),
    est AS (SELECT event_type, {_hll_est_sql()} AS est_users
            FROM regs GROUP BY event_type),
    exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(e.est_users, 2) + 0.0 AS approx_users,
           x.exact_users
    FROM est e JOIN exact x USING (event_type)
    """


@query("approx_distinct_users", oracle=_approx_distinct_oracle(),
       doc="HLL approximate distinct per event type, hash-gated at the "
           "register level (the sketch_hll_registers recipe per group; "
           "integer-exact harmonic sums) — converted from rows-only in "
           "r12; Spark's native approx_count_distinct stays covered by "
           "the error-bound test in tests/test_advanced.py")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type — the constant-memory
    path for distinct counting at 100 TB: exact distinct shuffles every
    key, the sketch shuffles ≤ m register rows per group. Uses the
    repo's SQL-replicable 64-register HLL (`hll_register_rho` +
    `_hll_est_agg`) rather than Spark's opaque-state
    `approx_count_distinct`, so the driver hash gates the estimate
    end-to-end; the exact count rides alongside for the error story."""
    from tripl_spark.operators.sketches import _hll_est_agg, hll_register_rho

    events = load_table(spark, sf_dir, "events")
    # NO pre-.distinct(): register max is duplicate-idempotent, so an
    # exact-distinct shuffle before sketching would be exactly the
    # full-key shuffle the sketch exists to avoid (r12 verdict finding;
    # plan-gated in tests/test_plan_quality.py).
    tu = events.select("event_type", "user_id")
    regs = (
        hll_register_rho(tu, F.col("user_id").cast("string"), ["event_type"])
        .groupBy("event_type", "register")
        .agg(F.max("r").alias("r"))
    )
    est = regs.groupBy("event_type").agg(
        (F.round(_hll_est_agg(), 2) + F.lit(0.0)).alias("approx_users")
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return est.join(exact, "event_type").select(
        "event_type", "approx_users", "exact_users"
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
