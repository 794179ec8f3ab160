"""Fourth TPC-H batch — Q2, Q11, Q12, Q20, Q21, completing all 22.

The testdata has no partsupp table and lineitem lacks
shipmode/commitdate/receiptdate, so these are shape-preserving
adaptations (like Q9/Q16 in tpch3.py): the part-supplier relation is
derived from lineitem, and "late" means shipped long after the order
date. Each keeps the defining plan shape of its original — Q2's
correlated-min decorrelated to a window, Q11's scalar-subquery
threshold, Q12's conditional counts, Q20's nested IN + correlated
HAVING, Q21's EXISTS / NOT EXISTS pair turned into two per-order
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, round(ps_supplycost, 4) AS supplycost
    FROM part, ps, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 5 AND p_type = 'ECONOMY'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p_partkey
          AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'ASIA')
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted — partsupp derived as min unit price per
    (part, supplier) from lineitem): the cheapest ASIA supplier for each
    ECONOMY size-5 part. The correlated min subquery is decorrelated
    into a window min over the region-filtered candidates — one shuffle
    by partkey instead of a rescan per outer row, which is the only
    shape that survives at 100 TB. All dimension sides broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "ECONOMY")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # Broadcast INNER joins on the fact scan BEFORE the aggregation
    # (guide §3.2 shrink the big side, §2.4 plan each subtree once):
    # only ECONOMY size-5 parts and ASIA suppliers survive, and both
    # dim keys are unique (p_partkey / s_suppkey primary keys), so the
    # inner joins drop exactly the rows the r15 LEFT SEMI prefilters
    # dropped while adding none — and each dimension subtree is planned
    # and scanned exactly ONCE (the semi version re-planned part and
    # the supplier⋈nation⋈region tree a second time for the post-agg
    # attribute joins). The supplier attributes ride the group-by keys:
    # they are functionally dependent on ps_suppkey, so the groups, the
    # per-group min, the window min per partkey, and the final rows are
    # identical; the rows entering the shuffle are post-map-side-
    # aggregation (one candidate per group per partition), so the wider
    # key adds bytes only to the already-collapsed exchange.
    li_f = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    ).join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"))
    ps = li_f.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        "s_acctbal",
        "s_name",
        "n_name",
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    w = Window.partitionBy("ps_partkey")
    best = ps.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return best.select(
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "s_name",
        "n_name",
        F.col("ps_partkey").alias("p_partkey"),
        F.round("ps_supplycost", 4).alias("supplycost"),
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l_partkey AS partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT partkey, round(CAST(value AS DOUBLE), 2) AS value
    FROM val
    WHERE value * 1000 > (SELECT sum(value) FROM val)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted — part "stock value" is the summed extended
    price shipped by one nation's suppliers): parts whose value exceeds
    0.1% of the nation's total. Sums run in DECIMAL so the threshold
    compare is exact (float sums are order-dependent and would flip
    boundary rows between engines); the scalar total broadcasts back as
    a 1-row cross join, so the fact table is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
    )
    total = val.agg(F.sum("value").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("total"))
        .select("partkey", F.round(F.col("value").cast("double"), 2).alias("value"))
    )


@query(
    "q12_ship_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted — no shipmode column, so lines group by
    returnflag and "late" means shipped >60 days after ordering):
    conditional counts of urgent vs other order priorities among 1996
    late shipments. The shipdate range is a pushed-down parquet filter;
    only the late predicate needs the join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q20_seasonal_shippers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey
      HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate < TIMESTAMP '1997-01-01'
                      THEN l_quantity ELSE 0 END) > 0.3 * sum(l_quantity))
    """,
)
def q20_seasonal_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted — no partsupp availqty, so the correlated
    threshold compares a supplier's 1996 shipped quantity of red parts
    against 30% of their all-time total): nested IN subqueries become a
    broadcast semi-join (red parts into lineitem) feeding one grouped
    HAVING, then a semi-join back onto supplier. Quantities are integral
    doubles, so the sums are exact in any order."""
    li = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    in_1996 = (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    heavy = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)).alias("q96"),
            F.sum("l_quantity").alias("qall"),
        )
        .filter(F.col("q96") > 0.3 * F.col("qall"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND s_nationkey = n_nationkey
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT * FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted — "late" is shipping >90 days after the order
    date): suppliers who were the sole late shipper on a multi-supplier
    finished order. The EXISTS / NOT EXISTS pair is decorrelated into
    two per-order aggregates — distinct suppliers on the order (>1 ⟺
    another supplier exists) and distinct LATE suppliers (=1 ⟺ no other
    late supplier) — one extra shuffle each instead of two correlated
    rescans of lineitem per outer row."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # Join once, flag lateness per line, then compute both per-order
    # distinct-supplier counts as WINDOW aggregates over the same frame:
    # one scan of each table and one shuffle by l_orderkey (branching
    # into a separate groupBy would recompute the join subtree — Spark
    # does not share unreferenced common subplans).
    flagged = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    w = Window.partitionBy("l_orderkey")
    counted = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("nsupp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("nlate"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        counted.filter(F.col("is_late") & (F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(supp), counted.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
