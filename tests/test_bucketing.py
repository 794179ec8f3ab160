"""Bucketed co-located join: zero Exchange in the plan, identical
results to the shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.session import load_table
from tripl_spark.sources.bucketing import (
    ensure_database,
    explain_str,
    n_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_wh")
    ensure_database(spark, "buckdb", str(loc))
    write_bucketed(
        load_table(spark, sf_small, "orders"), "buckdb.orders_b", "o_orderkey", 8
    )
    write_bucketed(
        load_table(spark, sf_small, "lineitem"), "buckdb.lineitem_b", "l_orderkey", 8
    )
    yield "buckdb.orders_b", "buckdb.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS buckdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckdb.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buckdb")


def _joined(spark, orders_name, lineitem_name):
    orders = spark.table(orders_name)
    li = spark.table(lineitem_name)
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_totalprice"
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_name, lineitem_name = bucketed_tables
    # force the sort-merge path so the test exercises bucket co-location,
    # not a broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = _joined(spark, orders_name, lineitem_name)
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert n_exchanges(joined) == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_shuffled_join(spark, sf_small, bucketed_tables):
    orders_name, lineitem_name = bucketed_tables
    bucketed = _joined(spark, orders_name, lineitem_name)
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_totalprice"
    )
    assert bucketed.count() == plain.count()
    agg = lambda df: df.agg(  # noqa: E731
        F.round(F.sum("l_extendedprice"), 2).alias("s"),
        F.round(F.sum("o_totalprice"), 2).alias("t"),
    ).collect()[0]
    assert agg(bucketed) == agg(plain)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """The bucket layout is reused by aggregation too: groupBy on the
    bucket key needs no shuffle."""
    _, lineitem_name = bucketed_tables
    grouped = (
        spark.table(lineitem_name)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert n_exchanges(grouped) == 0, explain_str(grouped)
