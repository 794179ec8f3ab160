"""Window functions, set operations, grouping sets, and event analytics.

These fill the reference's explicitly-absent categories (SURVEY.md §2.9:
no windows, no limit/top-k, no except/distinct, no numeric aggregation,
no streaming) with Spark-native implementations. The `events` table
doubles as the batch view of the streaming pipeline in
``tripl_spark.streaming`` — same transformations, same results.

Scale notes: windows partition by high-cardinality keys (user_id,
nation) so no single partition explodes; running totals use explicit
ROWS frames (RANGE frames with ties buffer entire peer groups);
sessionization is a lag + cumulative-flag-sum — one shuffle on user_id,
reused by both window steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table


@query(
    "top3_customers_per_nation",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, c_name, n_name, round(sum(o_totalprice), 2) AS total_spend
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name
    )
    SELECT n_name, c_custkey, c_name, total_spend, CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY n_name
                                       ORDER BY total_spend DESC, c_custkey) AS rk
          FROM spend)
    WHERE rk <= 3
    """,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: agg → row_number window → filter. The window
    partitions by nation (25 keys here, but the agg already reduced the
    data to one row per customer, so the skew surface is tiny)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = W.partitionBy("n_name").orderBy(F.desc("total_spend"), "c_custkey")
    return (
        spend.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spend", "rk")
    )


@query(
    "top5_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice,
           CAST(rk AS INT) AS price_rank
    FROM (SELECT *, rank() OVER (PARTITION BY p_brand
                                 ORDER BY p_retailprice DESC, p_partkey) AS rk
          FROM part)
    WHERE rk <= 5
    """,
)
def top5_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() window over a dimension table."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.withColumn("price_rank", F.rank().over(w))
        .filter(F.col("price_rank") <= 5)
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            "price_rank",
        )
    )


@query(
    "nation_year_rollup",
    oracle="""
    SELECT coalesce(n_name, 'ALL') AS n_name,
           coalesce(o_year, -1)    AS o_year,
           round(sum(o_totalprice), 2) AS total_price,
           count(*) AS n_orders
    FROM (SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey)
    GROUP BY ROLLUP (n_name, o_year)
    """,
)
def nation_year_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (hierarchical grouping sets): nation × year → nation → grand
    total. Spark plans this as a single Expand + one aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("o_year"), "o_totalprice")
    )
    return (
        base.rollup("n_name", "o_year")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "total_price",
            "n_orders",
        )
    )


@query(
    "order_status_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS open_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS fulfilled_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS pending_cnt
    FROM orders
    GROUP BY 1
    """,
)
def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide) as conditional aggregation — one pass, no
    `.pivot()` double-scan for value discovery."""
    orders = load_table(spark, sf_dir, "orders")

    def cnt(status: str) -> F.Column:
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0)).cast("long")

    return (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            cnt("O").alias("open_cnt"),
            cnt("F").alias("fulfilled_cnt"),
            cnt("P").alias("pending_cnt"),
        )
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (hash anti, no row inflation)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "churned_buyers_1995_vs_2001",
    oracle="""
    SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2001
    """,
)
def churned_buyers_1995_vs_2001(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers active in 1995 but not in 2001."""
    orders = load_table(spark, sf_dir, "orders")
    y1995 = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    y2001 = orders.filter(F.year("o_orderdate") == 2001).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return y1995.distinct().exceptAll(y2001.distinct())


@query(
    "order_count_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
    GROUP BY n_orders
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation (orders-per-customer histogram)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# events analytics (batch view of the streaming pipeline)
# ---------------------------------------------------------------------------


@query(
    "events_hourly_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    GROUP BY 1, 2
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch twin of the streaming
    windowed agg in tripl_spark.streaming — F.window keeps semantics
    identical if this moves to readStream)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_daily_active_users",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS dau,
           count(*) AS n_events
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    GROUP BY 1
    """,
)
def events_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation per day (Spark expands to a two-phase
    distinct agg automatically)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"), F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "events_running_total",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    WHERE user_id < 10
    """,
)
def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user — explicit ROWS frame (deterministic with
    the unique event_id tie-break; RANGE would buffer tied peers)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


@query(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → count. One shuffle on user_id serves the window and the agg."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_user_props_stats",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events GROUP BY user_id
    """,
)
def events_user_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON props column: extract → cast → aggregate
    (get_json_object runs JVM-side, no Python in the loop)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.avg(F.get_json_object("props", "$.k").cast("double")), 4).alias("avg_k"),
    )


@query(
    "events_type_share",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 4) AS share
    FROM events GROUP BY event_type
    """,
)
def events_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + unpartitioned analytic window (share-of-total)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "event_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(W.partitionBy()), 4).alias("share"),
    )


@query(
    "events_gapfill_hourly",
    # Gap-filled hourly series: the dense hour x event_type grid LEFT
    # JOINs the sparse aggregate; absent cells get n_events = 0 and a
    # NULL total carried forward by last_value IGNORE NULLS — both
    # engines agree on NULL semantics, and the LOCF runs over
    # 2-dp-rounded totals so summation-order noise can't leak through
    # the carry.
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM ev GROUP BY 1, 2
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM agg),
    spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM ev),
    grid AS (SELECT h, event_type FROM spine CROSS JOIN types),
    filled AS (
      SELECT g.h, g.event_type,
             coalesce(a.n_events, 0) AS n_events,
             a.total_value
      FROM grid g LEFT JOIN agg a ON a.h = g.h AND a.event_type = g.event_type
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
           CAST(n_events AS BIGINT) AS n_events, total_value,
           round(last_value(total_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS locf_value
    FROM filled
    """,
    doc="gap-filled hourly event series: dense time spine, zero-filled "
    "counts, last-observation-carried-forward totals — the "
    "hypertable gapfill/locf operator, fully hash-gated",
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event series with gaps FILLED: a dense hour × event_type
    spine (generated from the observed min/max hour) left-joins the
    sparse hourly aggregate; empty cells report n_events = 0, a NULL
    total, and a last-observation-carried-forward total (`locf_value`)
    — the gapfill + locf operator a time-series engine exposes, which
    naive GROUP BY silently omits (downstream charts/models need the
    zero rows to exist).

    Scale shape: the sparse aggregate is the usual map-side-combined
    hourly rollup (the only event-sized shuffle); the spine is
    hours × types rows — generated from a 1-row bounds aggregate,
    tiny at any corpus age — and the LOCF window partitions by
    event_type over spine-sized data, never raw events."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    bounds = agg.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    types = events.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    filled = grid.join(agg, ["h", "event_type"], "left").select(
        "h", "event_type",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        "total_value",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return filled.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n_events",
        "total_value",
        F.round(F.last("total_value", ignorenulls=True).over(w), 2).alias("locf_value"),
    )
