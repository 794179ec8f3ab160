"""Recursive graph query with a WITH RECURSIVE oracle: transitive
closure by iterative DataFrame joins (tripl_spark.plans.graph) checked
against DuckDB's recursive CTE on the same edge set.

The graph: user u → floor(u/2) over the distinct users in events (a
binary-tree ancestry — deterministic, derived purely from data both
engines see). BFS first-visit depth == min recursion depth, which is
what the oracle aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.plans.graph import reachability
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table


@query(
    "graph_user_ancestry",
    oracle="""
    WITH RECURSIVE nodes AS (SELECT DISTINCT user_id FROM events),
    edges AS (SELECT user_id AS src, CAST(floor(user_id / 2) AS BIGINT) AS dst
              FROM nodes WHERE user_id > 0),
    reach AS (
      SELECT user_id AS root, user_id AS node, 0 AS depth FROM nodes WHERE user_id < 32
      UNION
      SELECT r.root, e.dst AS node, r.depth + 1 AS depth
      FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT root, node, CAST(min(depth) AS INT) AS depth
    FROM reach GROUP BY root, node
    """,
)
def graph_user_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure from 32 roots over the u → u//2 ancestry graph
    (iterative join + anti-join visited set + localCheckpoint)."""
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    edges = users.filter(F.col("user_id") > 0).select(
        F.col("user_id").alias("src"),
        F.floor(F.col("user_id") / 2).cast("long").alias("dst"),
    )
    roots = users.filter(F.col("user_id") < 32).select(F.col("user_id").alias("root"))
    return reachability(edges, roots).select(
        "root", "node", F.col("depth").cast("int").alias("depth")
    )
