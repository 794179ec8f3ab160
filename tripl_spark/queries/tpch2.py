"""Second TPC-H batch (Q13/Q15/Q17/Q22 adapted to available columns)
plus function-library showcase queries covering the scalar (string /
date / math) and window-function surfaces of SURVEY.md §2.7/§2.9 —
every expression mirrored exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer count distribution over a filtered LEFT join
    (customers with zero qualifying orders must appear — count(col)
    skips the nulls the outer join introduces)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18, 6))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The scalar
    subquery is a 1-row max AGGREGATE broadcast back onto the revenue
    view — every stage stays fully parallel (partial max per
    partition → 1 row), where the previous window-max put every
    supplier's revenue row through ONE task, growing with the supplier
    dimension. Cost bound: AQE dedupes the two identical revenue
    shuffles when stage creation lands in its reuse cache
    (ReusedExchange — opportunistic, scheduling-dependent); when it
    misses, the filtered scan+aggregate runs twice, still distributed
    and bounded at 2x — either way no serialized stage exists, which
    is the property the plan gate pins.

    The equality between the two branches is safe ONLY because the
    revenue sum runs in DECIMAL: a double sum is shuffle-order-
    dependent, and with the branches possibly computed twice, a value
    1 ULP apart across branches straddling a half-cent rounding
    boundary would make `total_revenue = max` match nothing. Decimal
    summation is exact and order-independent, so both branches (and
    the DuckDB oracle, which mirrors the cast) produce bit-identical
    values — SCALE.md's numeric-discipline rule applied to a
    self-join threshold."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(amount), 2).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = revenue.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("__mx")
    ).drop("__mx")
    return (
        top.join(F.broadcast(supp), top.supplier_no == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity orders vs the part's own average — the
    correlated subquery decorrelates into a per-part aggregate join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
    SELECT substr(c_name, 1, 10) AS cntrycode_proxy,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no phone column → name-prefix grouping;
    "inactive" = no orders since 2000, since this data's customers all
    have SOME order): above-average balances among inactive customers —
    global scalar aggregate broadcast + anti join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 1, 10).alias("cntrycode_proxy"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "window_functions_showcase",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(seq AS INT) AS seq,
           CAST(ntile4 AS INT) AS ntile4,
           round(pct_rank, 6) AS pct_rank,
           round(cd, 6) AS cd,
           round(prev_price, 2) AS prev_price,
           round(next_price, 2) AS next_price,
           round(first_price, 2) AS first_price
    FROM (
      SELECT o_orderkey, o_custkey,
             row_number()   OVER w AS seq,
             ntile(4)       OVER w AS ntile4,
             percent_rank() OVER w AS pct_rank,
             cume_dist()    OVER w AS cd,
             lag(o_totalprice)  OVER w AS prev_price,
             lead(o_totalprice) OVER w AS next_price,
             first_value(o_totalprice) OVER w AS first_price
      FROM orders
      WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    """,
)
def window_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic + offset window functions in one pass over one
    window definition (single shuffle on the partition key)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("seq"),
        F.ntile(4).over(w).alias("ntile4"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
    )


@query(
    "scalar_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 3, 6))                    AS prio_word,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0')              AS padded_key,
           regexp_extract(o_orderpriority, '([0-9])-', 1)          AS prio_num,
           translate(o_orderstatus, 'OFP', 'ofp')                  AS status_lc,
           CAST(year(o_orderdate) AS INT)                          AS o_year,
           CAST(month(o_orderdate) AS INT)                         AS o_month,
           CAST(dayofmonth(o_orderdate) AS INT)                    AS o_day,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d')     AS due_date,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT)       AS days_since_epoch_start,
           round(sqrt(o_totalprice), 4)                            AS price_sqrt,
           round(ln(o_totalprice), 4)                              AS price_ln,
           round(log10(o_totalprice), 4)                           AS price_log10,
           round(pow(o_totalprice, 0.25), 4)                       AS price_4rt,
           CAST(o_orderkey % 7 AS BIGINT)                          AS key_mod7,
           abs(CAST(o_orderkey AS BIGINT) - 1000)                  AS key_dist_1000
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar function coverage in one projection
    (pure map, codegen, zero shuffles)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 3, 6)).alias("prio_word"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded_key"),
        F.regexp_extract("o_orderpriority", r"([0-9])-", 1).alias("prio_num"),
        F.translate("o_orderstatus", "OFP", "ofp").alias("status_lc"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 4).alias("price_ln"),
        F.round(F.log10("o_totalprice"), 4).alias("price_log10"),
        F.round(F.pow("o_totalprice", F.lit(0.25)), 4).alias("price_4rt"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod7"),
        F.abs(F.col("o_orderkey").cast("long") - 1000).alias("key_dist_1000"),
    )
