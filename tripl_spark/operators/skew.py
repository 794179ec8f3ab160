"""Skew-mitigation operators: salted two-stage aggregation and a
salted fact⋈dim join.

Why these exist (the 100 TB story): a groupBy/join shuffles rows by
key hash, so one hot key (a viral user, an 'unknown' sentinel, a
default enum) lands an entire cluster's worth of rows on one reducer —
the stage runs at the speed of that single task. AQE's skew-join
splitting only helps sort-merge joins reading shuffle files; it does
nothing for hot aggregation keys, and nothing when a broadcast is too
big. Salting fixes both by construction:

* **Two-stage aggregation** — append a deterministic salt in
  ``[0, n)``, aggregate ``(key, salt)`` partials (the hot key now
  spreads over ``n`` reducers), then aggregate the ``n`` partial rows
  per key. The second shuffle moves only ``n × |keys|`` rows. Only
  algebraic aggregates (sum/count/min/max, and avg via sum+count)
  decompose this way — a median does not.
* **Salted join** — salt the fact side the same way, and explode each
  dim row into all ``n`` salt values so every fact row still finds its
  match; join on ``(key, salt)``. The dim side grows ``n``-fold, which
  is the price of splitting the hot key's probe rows across ``n``
  tasks.

Salts are ``pmod(xxhash64(tiebreaker), n)`` — deterministic (re-runs
and speculative retries agree, unlike ``F.rand``) and unrelated to the
join key (salting by a function of the key alone would re-create the
hot partition).

Both operators are pure plan rewrites: results are bit-identical to
the unsalted groupBy/join, which is exactly what their DuckDB oracles
(plain GROUP BY / plain JOIN) check.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, tiebreaker: str, n: int = DEFAULT_SALT_BUCKETS,
              salt_col: str = "_salt") -> DataFrame:
    """Append a deterministic salt in [0, n) derived from a high-card
    tiebreaker column (a row id — NOT the grouping key)."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(tiebreaker)), F.lit(n)))


def salted_agg(df: DataFrame, keys: Sequence[str], tiebreaker: str,
               sums: Sequence[str] = (), counts: bool = True,
               n: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Two-stage skew-proof aggregation: sum/count partials per
    (keys, salt), then merge the n partial rows per key group."""
    partial_aggs = [F.sum(c).alias(f"_p_sum_{c}") for c in sums]
    if counts:
        partial_aggs.append(F.count(F.lit(1)).alias("_p_cnt"))
    partial = with_salt(df, tiebreaker, n).groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"_p_sum_{c}").alias(f"sum_{c}") for c in sums]
    if counts:
        final_aggs.append(F.sum("_p_cnt").alias("cnt"))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
                tiebreaker: str, n: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Inner equi-join with the hot fact key spread over n tasks: the
    fact side gets a deterministic salt, the dim side is exploded to
    every salt value, and the join keys on (key, salt)."""
    salted_fact = with_salt(fact, tiebreaker, n)
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )
    joined = salted_fact.join(
        exploded_dim,
        (salted_fact[fact_key] == exploded_dim[dim_key])
        & (salted_fact["_salt"] == exploded_dim["_salt"]),
    )
    return joined.drop("_salt")


@query(
    "skew_salted_agg_events",
    oracle="""
    SELECT event_type, user_id,
           round(sum(value), 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type, user_id
    """,
)
def skew_salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, user_id) totals computed skew-proof: salt by
    event_id, partial-aggregate (key, salt), merge partials. The oracle
    is the plain GROUP BY — salting must not change a single value."""
    events = load_table(spark, sf_dir, "events")
    out = salted_agg(
        events, ["event_type", "user_id"], tiebreaker="event_id", sums=["value"]
    )
    return out.select(
        "event_type",
        "user_id",
        F.round("sum_value", 2).alias("sum_value"),
        "cnt",
    )


@query(
    "skew_salted_join_user_spend",
    oracle="""
    SELECT user_id, c_name,
           round(sum(value), 2) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY user_id, c_name
    """,
)
def skew_salted_join_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events⋈customer on the (potentially hot) user key, via the
    salted join: customer rows explode across all salts so every event
    row finds its match, then a salted two-stage rollup. Equivalent to
    the plain join+GROUP BY the oracle runs."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = salted_join(events, cust, "user_id", "c_custkey", tiebreaker="event_id")
    out = salted_agg(joined, ["user_id", "c_name"], tiebreaker="event_id", sums=["value"])
    return out.select(
        "user_id",
        "c_name",
        F.round("sum_value", 2).alias("total_value"),
        F.col("cnt").alias("n_events"),
    )
