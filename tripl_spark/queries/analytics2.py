"""Second analytics batch: multi-dimensional aggregation (CUBE),
TF-IDF term scoring, and explicit set-operator queries — categories the
reference lacks entirely (SURVEY.md §2.9), supplied Spark-native with
exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

MAD_THRESHOLD = 3.5  # Iglewicz–Hoaglin modified-z cutoff
MAD_K = 0.6745  # standard-normal consistency constant


def daily_value_series(events: DataFrame) -> DataFrame:
    """(event_type, day 'yyyy-MM-dd', x double) — the day-grain value
    series every monitoring query runs over. The ONE corpus-sized
    shuffle of the family; day sums are exact DECIMAL so partial-merge
    order can't flip a bit before the cast to double. Shared by the
    CUSUM / autocorr / seasonal-naive / MAD batch queries and (via
    DECIMAL partials) the streaming monitor, so the determinism
    discipline lives in exactly one place."""
    return events.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"))


def robust_z(daily: DataFrame) -> DataFrame:
    """Input columns + (med, ad, mad, z) where z is the UNROUNDED
    Iglewicz–Hoaglin modified z-score MAD_K·(x−median)/MAD per
    event_type. Types whose MAD is 0 (zero dispersion — no robust
    scale) drop out, the documented guard. Thresholding must happen on
    this unrounded z (round only for display, after filtering) so the
    batch query, the streaming summary, and the alert feed agree on
    boundary days. Both medians are bounded per-type aggregates over
    day-level rows; the tiny med/mad tables broadcast back."""
    med = daily.groupBy("event_type").agg(
        F.percentile("x", F.lit(0.5)).alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .withColumn("z", MAD_K * (F.col("x") - F.col("med")) / F.col("mad"))
    )


@query(
    "events_cube_type_year",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(yr AS VARCHAR), 'ALL') AS yr,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (SELECT event_type, CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS yr, value
          FROM events)
    GROUP BY CUBE (event_type, yr)
    """,
)
def events_cube_type_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, year): all four grouping sets in one pass —
    Spark computes the lattice with a single shuffle (Expand + partial
    aggregation), not four scans. NULL grouping cells are labeled 'ALL'
    so the oracle compare is null-free."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.year("ts").alias("yr"), "value"
    )
    return (
        events.cube("event_type", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("yr"),
            "n_events",
            "total_value",
        )
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
            FROM documents)
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tf.term AS term,
             round(tf * ln(n_docs / df), 4) AS tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(tf * ln(n_docs / df), 4) DESC,
                                         tf.term) AS rk
      FROM tf, df, n WHERE tf.term = df.term
    )
    SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk
    FROM scored WHERE rk <= 3 AND doc_id < 100
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: term frequency per doc × ln(N/df), top-3 terms per
    document (output bounded to doc_id < 100; the scoring runs over the
    whole corpus). One explode → two aggregations → broadcast the
    (vocabulary-sized) df table back onto tf."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(n_docs / F.col("df")), 4).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 100))
    )


@query(
    "repeat_buyers_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT as a first-class operator: customers who ordered in
    both 1995 and 1996. Spark plans this as a distinct + semi-join
    (left_semi after aggregation) — no full cross-year shuffle of fact
    rows."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


@query(
    "lapsed_buyers_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def lapsed_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT as a first-class operator: 1995 buyers who did not return
    in 1996 (anti-join after distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)


@query(
    "events_moving_total_7d",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_ts,
             event_type,
             sum(CAST(value AS DECIMAL(18,6))) AS day_sum
      FROM events GROUP BY 1, 2, 3
    )
    SELECT day, event_type,
           round(CAST(sum(day_sum) OVER (
                   PARTITION BY event_type ORDER BY day_ts
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 2) AS total_7d,
           CAST(count(*) OVER (
                   PARTITION BY event_type ORDER BY day_ts
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_days_7d
    FROM daily
    """,
)
def events_moving_total_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): trailing 7-day
    totals per event type over the daily aggregate. The frame is bound
    by TIME — days missing from the data shrink the window, which a
    ROWS frame gets wrong. Day sums run in DECIMAL so the sliding sum
    is exact under any partitioning; the frame operates on epoch
    seconds (Spark's rangeBetween needs a numeric ordering key)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"),
        "event_type",
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("day_sum"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_s")
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "day",
        "event_type",
        F.round(F.sum("day_sum").over(w).cast("double"), 2).alias("total_7d"),
        F.count(F.lit(1)).over(w).alias("n_days_7d"),
    )


@query(
    "part_price_unpivot",
    oracle="""
    SELECT p_partkey, metric, round(val, 2) AS val
    FROM (
      SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS retail,
             CAST(p_size AS DOUBLE) AS size
      FROM part WHERE p_partkey < 200
    )
    UNPIVOT (val FOR metric IN (retail, size))
    """,
)
def part_price_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long reshape) as a first-class operator —
    `DataFrame.unpivot` plans an Expand node (each input row emits one
    row per measure, no shuffle, no join), the same melt primitive the
    triple encoder (`sources/melt.py`) builds on."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    wide = part.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retail"),
        F.col("p_size").cast("double").alias("size"),
    )
    return wide.unpivot("p_partkey", ["retail", "size"], "metric", "val").select(
        "p_partkey", "metric", F.round("val", 2).alias("val")
    )


@query(
    "events_sliding_hourly",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               - k * INTERVAL '15 minutes' AS ws,
             event_type, value
      FROM events, generate_series(0, 3) AS s(k))
    GROUP BY 1, 2
    """,
)
def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING window aggregation (1-hour window, 15-minute slide):
    every event lands in exactly 4 overlapping windows — `F.window`
    plans this as an Expand (4 rows per event) before one aggregation
    shuffle, the same fan-out the oracle makes explicit with
    generate_series. The batch twin of a streaming sliding-window agg;
    swap the source for readStream and the semantics hold."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH su AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS p_ts
      FROM events e JOIN su ON e.user_id = su.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > su.s_ts
      GROUP BY 1
    )
    SELECT strftime(date_trunc('day', s_ts), '%Y-%m-%d') AS cohort_day,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(sum(CASE WHEN p_ts IS NOT NULL
                          AND p_ts <= s_ts + INTERVAL 1 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_24h,
           round(sum(CASE WHEN p_ts IS NOT NULL
                           AND p_ts <= s_ts + INTERVAL 1 DAY
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS conv_rate
    FROM su LEFT JOIN pu ON su.user_id = pu.user_id
    GROUP BY 1
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (MATCH_RECOGNIZE-lite): signup → first purchase
    strictly after it, converted if within 24h, cohorted by signup day.
    The ordered-sequence condition compiles to two keyed aggregations
    and one join — each step is a per-user min, so the whole funnel is
    two shuffles on user_id regardless of corpus size (and with both
    aggregations keyed the same, AQE reuses the partitioning)."""
    events = load_table(spark, sf_dir, "events")
    su = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = (
        events.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    converted = F.col("p_ts").isNotNull() & (
        F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 DAY")
    )
    return (
        su.join(pu, "user_id", "left")
        .groupBy(
            F.date_format(F.date_trunc("day", "s_ts"), "yyyy-MM-dd").alias(
                "cohort_day"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(F.when(converted, 1).otherwise(0)).alias("n_converted_24h"),
            F.round(
                F.sum(F.when(converted, 1).otherwise(0)) * 1.0 / F.count(F.lit(1)),
                4,
            ).alias("conv_rate"),
        )
    )


@query(
    "events_retention_cohorts",
    # date_trunc('week') is ISO-Monday in both engines; week_offset is
    # an exact multiple of 7 days, so integral division is engine-safe.
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
      FROM events
    ),
    cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_wk, e.wk
      FROM e JOIN cohort c USING (user_id)
    )
    SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_wk, wk) // 7 AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity GROUP BY cohort_wk, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted in every subsequent week they return — the
    (cohort_week, week_offset) → n_users triangle every growth
    dashboard draws.

    Shuffle shape: the cohort table is one user-keyed aggregation; the
    activity join re-shuffles on user_id (AQE reuses the partitioning)
    and the cell aggregation shuffles distinct (user, cohort, week)
    rows — bounded by users × active weeks, far below raw events, and
    the per-cell counts partial-combine."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    cohort = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = e.join(cohort, "user_id").select("user_id", "cohort_wk", "wk").distinct()
    return (
        activity.groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(wk, cohort_wk) DIV 7").cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, sum(n) AS tot FROM t GROUP BY from_type)
    SELECT from_type, to_type, n, round(n * 1.0 / tot, 4) AS p
    FROM t JOIN tot USING (from_type)
    """,
    doc="first-order Markov transition matrix over per-user event "
    "sequences: counts and row-normalized probabilities per "
    "(from_type, to_type) — fully hash-gated",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over event types: for every user's
    time-ordered event sequence, count (previous → current) type
    transitions and row-normalize into transition probabilities — the
    behavioral model behind next-event prediction, funnel synthesis,
    and bot detection (uniform rows ≈ random clickers).

    Shuffle shape at 100 TB: ONE corpus shuffle on user_id for the lag
    window (per-user partitions are individually bounded by a user's
    activity — no dominant-key hazard analogous to the per-lang ntile,
    since the key is the high-cardinality user id); the transition
    count then partial-aggregates to |types|² rows and the
    row-normalizing totals table (≤ |types| rows) broadcasts back.
    Nothing after the lag window touches corpus-sized data."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type", "to_type", "n",
        F.round(F.col("n") * 1.0 / F.col("tot"), 4).alias("p"),
    )


AB_GROUP_A = "purchase"
AB_GROUP_B = "click"
Z_CRIT = 1.96  # two-sided 95%


@query(
    "events_ab_ztest",
    oracle=f"""
    WITH s AS (
      SELECT
        sum(CASE WHEN event_type = '{AB_GROUP_A}' THEN 1 ELSE 0 END) AS n_a,
        sum(CASE WHEN event_type = '{AB_GROUP_A}' THEN value END) AS sx_a,
        sum(CASE WHEN event_type = '{AB_GROUP_A}' THEN value * value END) AS sxx_a,
        sum(CASE WHEN event_type = '{AB_GROUP_B}' THEN 1 ELSE 0 END) AS n_b,
        sum(CASE WHEN event_type = '{AB_GROUP_B}' THEN value END) AS sx_b,
        sum(CASE WHEN event_type = '{AB_GROUP_B}' THEN value * value END) AS sxx_b
      FROM events WHERE event_type IN ('{AB_GROUP_A}', '{AB_GROUP_B}')
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(sx_a / n_a, 4) + 0.0 AS mean_a, round(sx_b / n_b, 4) + 0.0 AS mean_b,
           round((sx_a / n_a - sx_b / n_b)
                 / sqrt(((sxx_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
                        + ((sxx_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 4) + 0.0 AS z,
           abs((sx_a / n_a - sx_b / n_b)
               / sqrt(((sxx_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
                      + ((sxx_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b)) > {Z_CRIT}
             AS significant
    FROM s
    """,
    doc=f"Welch two-sample z-test of mean value, {AB_GROUP_A} vs "
    f"{AB_GROUP_B}: one zero-key aggregate pass, z at ±{Z_CRIT} — "
    "fully hash-gated",
)
def events_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B comparison of mean event value between two event types as a
    Welch (unequal-variance) z-test — the experimentation-platform
    primitive. Means and sample variances come from (n, Σx, Σx²)
    conditional sums so both engines evaluate the IDENTICAL formula
    (built-in variance aggregates use engine-specific numerically
    stable merges that differ in low bits).

    Scale shape: ONE zero-group-key aggregate over a scan with the
    event-type filter pushed down — map tasks each emit a single
    6-value partial, the final reduce merges #tasks rows. Nothing else
    moves; this is as cheap as a query gets at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    a, b = F.col("event_type") == AB_GROUP_A, F.col("event_type") == AB_GROUP_B
    v = F.col("value")
    s = events.filter(F.col("event_type").isin(AB_GROUP_A, AB_GROUP_B)).agg(
        F.sum(F.when(a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(a, v)).alias("sx_a"),
        F.sum(F.when(a, v * v)).alias("sxx_a"),
        F.sum(F.when(b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(b, v)).alias("sx_b"),
        F.sum(F.when(b, v * v)).alias("sxx_b"),
    )
    var_a = (F.col("sxx_a") - F.col("sx_a") * F.col("sx_a") / F.col("n_a")) / (F.col("n_a") - 1)
    var_b = (F.col("sxx_b") - F.col("sx_b") * F.col("sx_b") / F.col("n_b")) / (F.col("n_b") - 1)
    z = (F.col("sx_a") / F.col("n_a") - F.col("sx_b") / F.col("n_b")) / F.sqrt(
        var_a / F.col("n_a") + var_b / F.col("n_b")
    )
    return s.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        # `+ 0.0` everywhere a rounded value can be a tiny negative:
        # -0.0 vs +0.0 byte-hash differently between engines.
        (F.round(F.col("sx_a") / F.col("n_a"), 4) + F.lit(0.0)).alias("mean_a"),
        (F.round(F.col("sx_b") / F.col("n_b"), 4) + F.lit(0.0)).alias("mean_b"),
        (F.round(z, 4) + F.lit(0.0)).alias("z"),
        (F.abs(z) > Z_CRIT).alias("significant"),
    )


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
      FROM daily GROUP BY event_type
    ),
    z AS (
      SELECT d.event_type, d.day,
             (x - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)) AS z
      FROM daily d JOIN stats s ON d.event_type = s.event_type
      WHERE n > 1
    ),
    cusum AS (
      SELECT event_type, day,
             round(sum(z) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING), 4) + 0.0 AS cusum
      FROM z
    ),
    peak AS (
      SELECT event_type, day AS change_day, cusum AS peak_cusum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, day) AS rk,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
      FROM cusum
    )
    SELECT event_type, change_day, peak_cusum, n_days
    FROM peak WHERE rk = 1
    """,
    doc="CUSUM changepoint detection per event type: standardized "
    "cumulative-sum peak over the daily series — the shift-detection "
    "monitor; fully hash-gated",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection via the classic CUSUM statistic (Page
    1954): per event type, standardize the daily value series against
    its own mean/std, accumulate, and report the day where |CUSUM|
    peaks — the most likely mean-shift point (the peak of the CUSUM
    curve is the standard changepoint estimator). The monitoring
    primitive behind data-drift alarms on ingestion pipelines.

    Scale shape: ONE corpus shuffle to the (type, day) aggregate (day
    sums in DECIMAL so partial-merge order can't change the value);
    every window after that runs over the day-level relation — years
    of data × |types| rows, bounded regardless of corpus size. The
    per-type mean/std come from explicit (n, Σx, Σx²) sums so both
    engines evaluate the identical formula."""
    from pyspark.sql import Window

    daily = daily_value_series(load_table(spark, sf_dir, "events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1))
    z = (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.col("n") > 1)
        .select("event_type", "day", ((F.col("x") - mean) / std).alias("z"))
    )
    w_run = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = z.select(
        "event_type", "day",
        (F.round(F.sum("z").over(w_run), 4) + F.lit(0.0)).alias("cusum"),
    )
    w_peak = Window.partitionBy("event_type").orderBy(F.abs(F.col("cusum")).desc(), "day")
    return (
        cusum.select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("cusum").alias("peak_cusum"),
            F.row_number().over(w_peak).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n_days"),
        )
        .filter(F.col("rk") == 1)
        .select("event_type", "change_day", "peak_cusum", "n_days")
    )


@query(
    "events_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, x,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
             lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS x7
      FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(x, x1), 4) + 0.0 AS r_lag1,
           round(corr(x, x7), 4) + 0.0 AS r_lag7
    FROM lagged
    GROUP BY event_type
    """,
    doc="serial-dependence profile per event type: lag-1 and lag-7 "
    "(weekly) autocorrelation of the daily value series — one corpus "
    "shuffle to day grain, windows over bounded day-level rows only; "
    "fully hash-gated",
)
def events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily series at lag 1 (day-over-day
    persistence) and lag 7 (weekly seasonality) — the two numbers any
    ingestion-monitoring dashboard wants next to the CUSUM changepoint
    (`events_changepoint_cusum`): high r_lag7 says alarms must be
    seasonality-adjusted, near-zero r_lag1 says daily volume is noise.
    Pearson corr of (x_t, x_{t-k}) pairs is the standard sample ACF
    up to the mean-handling convention (corr demeans each side over
    the PAIRED subset; fine for monitoring, and exactly replicable).

    Scale shape: identical to the CUSUM query — ONE corpus-sized
    shuffle to the (type, day) aggregate with DECIMAL day sums (so
    partial-merge order can't flip a bit), then the lag window and the
    corr aggregate run over years x |types| day rows, bounded whatever
    the corpus size. corr inputs are bit-identical on both engines, so
    the 4-dp round is safe to hash."""
    daily = daily_value_series(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.round(F.corr("x", "x1"), 4) + F.lit(0.0)).alias("r_lag1"),
        (F.round(F.corr("x", "x7"), 4) + F.lit(0.0)).alias("r_lag7"),
    )


@query(
    "events_seasonal_naive_mape",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    pred AS (
      SELECT event_type, x,
             lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
      FROM daily
    )
    SELECT event_type,
           CAST(count(yhat) AS BIGINT) AS n_scored,
           round(avg(CASE WHEN yhat IS NOT NULL AND x <> 0
                          THEN abs(x - yhat) / abs(x) END), 4) AS mape,
           round(avg(CASE WHEN yhat IS NOT NULL AND abs(x) + abs(yhat) <> 0
                          THEN 2 * abs(x - yhat) / (abs(x) + abs(yhat)) END), 4)
             AS smape,
           round(avg(abs(x - yhat)), 4) AS mae
    FROM pred
    GROUP BY event_type
    """,
    doc="seasonal-naive forecast error per event type: predict each "
    "day's value with the value 7 days earlier; MAPE / sMAPE / MAE "
    "over the scored days — the baseline every real forecast must "
    "beat; fully hash-gated",
)
def events_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forecasting floor for the daily series: the seasonal-naive
    predictor (Hyndman & Athanasopoulos's benchmark method) forecasts
    x_t with x_{t-7}; the error profile pairs with
    `events_autocorr_daily` — a high r_lag7 predicts a low sMAPE here,
    and any model worth deploying must beat these numbers. MAPE skips
    zero-actual days, sMAPE skips zero-sum pairs (both conventions
    stated in the column math so the oracle replays them exactly).

    Scale shape: identical to the autocorr/CUSUM family — one corpus
    shuffle to DECIMAL-summed day grain, then the lag-7 window and the
    error aggregates run over bounded day-level rows."""
    daily = daily_value_series(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("event_type").orderBy("day")
    pred = daily.select(
        "event_type", "x", F.lag("x", 7).over(w).alias("yhat")
    )
    ape = F.when(
        F.col("yhat").isNotNull() & (F.col("x") != 0),
        F.abs(F.col("x") - F.col("yhat")) / F.abs(F.col("x")),
    )
    sape = F.when(
        F.col("yhat").isNotNull() & ((F.abs("x") + F.abs("yhat")) != 0),
        2 * F.abs(F.col("x") - F.col("yhat")) / (F.abs("x") + F.abs("yhat")),
    )
    return pred.groupBy("event_type").agg(
        F.count("yhat").cast("long").alias("n_scored"),
        F.round(F.avg(ape), 4).alias("mape"),
        F.round(F.avg(sape), 4).alias("smape"),
        F.round(F.avg(F.abs(F.col("x") - F.col("yhat"))), 4).alias("mae"),
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, quantile_cont(x, 0.5) AS med FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.x, m.med, abs(d.x - m.med) AS ad
      FROM daily d JOIN med m ON d.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type
    ),
    rz AS (
      SELECT dev.event_type, day, x,
             0.6745 * (x - med) / mad.mad AS z
      FROM dev JOIN mad ON dev.event_type = mad.event_type
      WHERE mad.mad > 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN abs(z) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies,
           round(max(abs(z)), 4) AS max_abs_z
    FROM rz
    GROUP BY event_type
    """,
    doc="robust outlier-day detection per event type: modified z-score "
    "(0.6745·(x−median)/MAD, Iglewicz–Hoaglin) over the daily series, "
    "|z| > 3.5 flags — the robust monitor that, unlike the CUSUM "
    "mean-shift detector, a single spike cannot poison; hash-gated",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third leg of the ingestion-monitoring family: CUSUM finds
    sustained mean SHIFTS, autocorr profiles seasonality, and this
    finds single anomalous DAYS — with median/MAD instead of mean/std
    so the estimator itself is not dragged by the outliers it hunts
    (the Iglewicz–Hoaglin modified z-score, threshold 3.5).

    Scale shape: one corpus shuffle to DECIMAL-summed day grain; the
    two medians are exact interpolated percentiles over bounded
    day-level rows per type (Spark `percentile` and DuckDB
    `quantile_cont` share the type-7 rule — the `stats_value_by_type`
    precedent), and the final flags are one more bounded aggregate."""
    daily = daily_value_series(load_table(spark, sf_dir, "events"))
    rz = robust_z(daily)
    return rz.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.abs("z") > MAD_THRESHOLD, 1).otherwise(0))
        .cast("long").alias("n_anomalies"),
        F.round(F.max(F.abs("z")), 4).alias("max_abs_z"),
    )


@query(
    "events_weekday_profile",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    tagged AS (
      SELECT event_type, isodow(d) AS dow, x FROM daily
    ),
    per_dow AS (
      SELECT event_type, CAST(dow AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS n_days,
             sum(x) AS sx
      FROM tagged GROUP BY event_type, dow
    ),
    tot AS (
      SELECT event_type, sum(sx) AS total, sum(n_days) AS nd
      FROM per_dow GROUP BY event_type
    )
    SELECT p.event_type, p.dow, p.n_days,
           round(p.sx / p.n_days, 4) AS mean_value,
           round((p.sx / p.n_days) / (t.total / t.nd), 4) AS seasonal_index
    FROM per_dow p JOIN tot t ON p.event_type = t.event_type
    """,
    doc="weekly seasonality profile per event type: day-of-week means "
    "and the seasonal index (dow mean / overall daily mean) — the "
    "decomposition companion to the lag-7 autocorrelation; windows "
    "never appear, everything is bounded aggregates; hash-gated",
)
def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative seasonal indices by day of week: index
    >1 marks systematically heavy days, and dividing a day's value by
    its index is the seasonal adjustment `events_changepoint_cusum` /
    `events_anomaly_mad` need when `events_autocorr_daily` reports
    weekly structure — the four queries compose into the standard
    monitor-decompose-adjust loop.

    Determinism: day sums in DECIMAL; per-dow means are sums of those
    exact doubles divided by integer counts, with ISO day-of-week
    (Mon=1) on both engines. Scale shape: one corpus shuffle to day
    grain, then two bounded aggregates (≤ 7 x |types| rows)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"))
    tagged = daily.select(
        "event_type", F.dayofweek("d").alias("dow_sun1"), "x"
    ).withColumn(  # Spark dayofweek: Sun=1..Sat=7 → ISO Mon=1..Sun=7
        "dow", F.when(F.col("dow_sun1") == 1, 7).otherwise(F.col("dow_sun1") - 1)
    )
    per_dow = tagged.groupBy("event_type", F.col("dow").cast("int").alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").alias("sx"),
    )
    tot = per_dow.groupBy("event_type").agg(
        F.sum("sx").alias("total"), F.sum("n_days").alias("nd")
    )
    return per_dow.join(F.broadcast(tot), "event_type").select(
        "event_type", "dow", "n_days",
        F.round(F.col("sx") / F.col("n_days"), 4).alias("mean_value"),
        F.round((F.col("sx") / F.col("n_days")) / (F.col("total") / F.col("nd")), 4)
          .alias("seasonal_index"),
    )


@query(
    "events_trend_ols",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01',
                       date_trunc('day', CAST(ts AS TIMESTAMP))) AS di,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(regr_slope(x, di), 4) + 0.0 AS slope,
           round(regr_intercept(x, di), 4) + 0.0 AS intercept,
           round(regr_r2(x, di), 4) AS r2
    FROM daily GROUP BY event_type
    """,
    doc="per-type linear trend of the daily value series (OLS slope / "
    "intercept / R² against the day index) via the engines' built-in "
    "regr_* aggregates — one corpus shuffle to day grain, then a "
    "bounded per-type aggregate; fully hash-gated",
)
def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear trend per event type: OLS of the daily DECIMAL-summed
    value series against the day index (days since a fixed epoch — the
    intercept is then anchored, not arbitrary). Both engines run their
    BUILT-IN regression aggregates (`regr_slope`/`regr_intercept`/
    `regr_r2`), which are single-pass sum-of-products forms — the same
    (n, Σx, Σy, Σxy, Σx², Σy²) partial-aggregation shape as the Welch
    z-test, so map-side combine applies and the shuffle after day
    grain is |types| rows. Complements `events_seasonal_naive_mape`
    (seasonality) and `events_changepoint_cusum` (level shifts) with
    the monotone-drift view."""
    daily = daily_value_series(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.datediff(F.to_date("day"), F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("di"),
        "x",
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.round(F.regr_slope("x", "di"), 4) + F.lit(0.0)).alias("slope"),
        (F.round(F.regr_intercept("x", "di"), 4) + F.lit(0.0)).alias("intercept"),
        F.round(F.regr_r2("x", "di"), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Population-stability-index drift between two time windows
# ---------------------------------------------------------------------------

PSI_BINS = 5  # fixed-width value bins per event type


@query(
    "events_psi_drift",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value,
             CASE WHEN day(ts) <= 15 THEN 'a' ELSE 'b' END AS w
      FROM events
    ),
    mm AS (SELECT event_type, min(value) AS mn, max(value) AS mx
           FROM e GROUP BY event_type),
    binned AS (
      SELECT e.event_type, w,
             CAST(coalesce(least(floor((value - mn) / nullif(mx - mn, 0)
                                       * {PSI_BINS}), {PSI_BINS - 1}), 0)
                  AS BIGINT) AS bin
      FROM e JOIN mm USING (event_type)
    ),
    counts AS (SELECT event_type, w, bin, CAST(count(*) AS BIGINT) AS n
               FROM binned GROUP BY event_type, w, bin),
    tot AS (SELECT event_type, w, sum(n) AS nt FROM counts
            GROUP BY event_type, w),
    grid AS (
      SELECT t.event_type, t.w, b.bin, t.nt
      FROM tot t CROSS JOIN (SELECT unnest(range({PSI_BINS})) AS bin) b
    ),
    dense AS (
      SELECT g.event_type, g.w, g.bin,
             (coalesce(c.n, 0) + 1) * 1.0 / (g.nt + {PSI_BINS}) AS p
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.w = c.w AND g.bin = c.bin
    ),
    pq AS (
      SELECT a.event_type, a.bin, a.p AS pa, b.p AS pb
      FROM dense a JOIN dense b
        ON a.event_type = b.event_type AND a.bin = b.bin
       AND a.w = 'a' AND b.w = 'b'
    )
    SELECT event_type,
           round(sum((pa - pb) * ln(pa / pb)), 4) + 0.0 AS psi
    FROM pq GROUP BY event_type
    """,
    doc=f"population stability index per event type between the first "
    f"and second half-month of the stream: {PSI_BINS} fixed-width "
    "value bins from per-type global min/max, Laplace-smoothed "
    "proportions, PSI = sum (p-q) ln(p/q) — the standard drift score "
    "(<0.1 stable, >0.25 drifted); all proportions derive from "
    "integer counts so both engines see identical doubles; fully "
    "hash-gated",
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI is the drift metric monitoring teams actually page on
    (credit-risk lineage, now standard for feature/label drift): bin
    a value's distribution in a reference window, compare the
    proportion vector in the current window. Complements the level
    detectors (`events_anomaly_mad` catches an outlier DAY;
    PSI catches a reshaped DISTRIBUTION at the same level —
    e.g. variance collapse after an upstream bug zeroes a field).

    Determinism: fixed-width bins from per-type global min/max (no
    quantile estimation), Laplace +1 smoothing so empty bins
    contribute finite terms, proportions derived from integer counts
    — both engines compute ln over bit-identical doubles. Scale
    shape: two map-side-combined aggregations (min/max, then
    (type, window, bin) counts — bounded keys), the PSI arithmetic
    runs over |types| x {PSI_BINS} x 2 rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= 15, "a").otherwise("b").alias("w"),
    )
    mm = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    span = F.when(F.col("mx") != F.col("mn"), F.col("mx") - F.col("mn"))
    binned = ev.join(F.broadcast(mm), "event_type").select(
        "event_type",
        "w",
        F.coalesce(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / span * PSI_BINS),
                F.lit(PSI_BINS - 1),
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("bin"),
    )
    counts = binned.groupBy("event_type", "w", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = counts.groupBy("event_type", "w").agg(F.sum("n").alias("nt"))
    bins = ev.sparkSession.range(PSI_BINS).select(F.col("id").alias("bin"))
    grid = tot.crossJoin(F.broadcast(bins))  # |types| x 2 x PSI_BINS rows
    dense = grid.join(counts, ["event_type", "w", "bin"], "left").select(
        "event_type",
        "w",
        "bin",
        (
            (F.coalesce(F.col("n"), F.lit(0)) + 1)
            * 1.0
            / (F.col("nt") + PSI_BINS)
        ).alias("p"),
    )
    a = dense.filter(F.col("w") == "a").select(
        "event_type", "bin", F.col("p").alias("pa")
    )
    b = dense.filter(F.col("w") == "b").select(
        "event_type", "bin", F.col("p").alias("pb")
    )
    return (
        a.join(b, ["event_type", "bin"])
        .groupBy("event_type")
        .agg(
            (
                F.round(
                    F.sum(
                        (F.col("pa") - F.col("pb"))
                        * F.log(F.col("pa") / F.col("pb"))
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("psi")
        )
    )
