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


def test_bucketed_minhash_index_join_skips_index_shuffle(spark, sf_small):
    """The incremental-dedup contract minhash_index documents: persist
    the corpus band index bucketed by (band_id, band_hash) and the
    per-shard candidate join re-reads it WITHOUT an Exchange on the
    index side — only the (small) shard side shuffles into the index's
    bucketing. Asserted structurally: in the bucketed plan the path
    from the index FileScan up to its band-key Sort contains no
    Exchange, while the identical plan over a plain parquet copy of
    the index must shuffle that same path."""
    from pyspark import StorageLevel

    from tripl_spark.operators.dedup import (
        match_against_index,
        minhash_index,
        shingle_sets,
    )
    from tripl_spark.session import load_table

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    shard = docs.filter(F.col("doc_id") >= 400)
    corpus_sets = shingle_sets(corpus).persist(StorageLevel.MEMORY_AND_DISK)

    spark.sql("CREATE DATABASE IF NOT EXISTS minhash_wh")
    idx = minhash_index(corpus)
    write_bucketed(idx, "minhash_wh.corpus_bands_b", ["band_id", "band_hash"], 8)
    # structurally-identical control: same index, same catalog read
    # path, just no bucket layout
    idx.write.format("parquet").mode("overwrite").saveAsTable(
        "minhash_wh.corpus_bands_p"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # max_bucket=None: a single candidate equi-join, so the ONE
        # Exchange the layouts differ by is attributable to the index
        # side of that join
        bucketed = match_against_index(
            corpus_sets, spark.table("minhash_wh.corpus_bands_b"), shard,
            max_bucket=None,
        )
        plain = match_against_index(
            corpus_sets, spark.table("minhash_wh.corpus_bands_p"), shard,
            max_bucket=None,
        )
        def index_path_has_exchange(df, table):
            # walk the simple-plan text from the index table's FileScan
            # line upward to the first Sort (the SMJ's input); report
            # whether an Exchange sits in between
            lines = explain_str(df, "simple").splitlines()
            scan = next(i for i, ln in enumerate(lines) if f"FileScan parquet {table}" in ln)
            for ln in reversed(lines[:scan]):
                if "Sort [" in ln:
                    return False
                if "Exchange" in ln:
                    return True
            return False

        plan = explain_str(bucketed)
        assert "Bucketed: true" in plan, plan
        assert not index_path_has_exchange(bucketed, "spark_catalog.minhash_wh.corpus_bands_b"), plan
        assert index_path_has_exchange(plain, "spark_catalog.minhash_wh.corpus_bands_p"), explain_str(plain)
        # and the layout changes nothing about the answer
        key = lambda df: sorted(  # noqa: E731
            (r.id_a, r.id_b, r.jaccard) for r in df.collect()
        )
        assert key(bucketed) == key(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS minhash_wh.corpus_bands_b")
        spark.sql("DROP TABLE IF EXISTS minhash_wh.corpus_bands_p")
        spark.sql("DROP DATABASE IF EXISTS minhash_wh")
        corpus_sets.unpersist()


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


def test_bucketed_semantic_index_join_skips_index_shuffle(spark, sf_small):
    """The incremental-semantic-dedup contract semantic_index
    documents: persist the (capped) cluster index bucketed by cid and
    the per-increment match join re-reads it WITHOUT an Exchange on
    the index side — only the (small) increment side shuffles into the
    index's bucketing. Same structural assertion as the MinHash index
    gate above."""
    from tripl_spark.operators.clustering import (
        kmeans_2iter_centroids,
        semantic_index,
        semantic_match_new,
    )

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = kmeans_2iter_centroids(emb).localCheckpoint(eager=True)
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    shard = emb.filter(F.col("vec_id") % 7 == 0)
    idx = semantic_index(corpus, cent)

    spark.sql("CREATE DATABASE IF NOT EXISTS sem_wh")
    write_bucketed(idx, "sem_wh.sem_index_b", "cid", 8)
    idx.write.format("parquet").mode("overwrite").saveAsTable("sem_wh.sem_index_p")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = semantic_match_new(shard, spark.table("sem_wh.sem_index_b"), cent)
        plain = semantic_match_new(shard, spark.table("sem_wh.sem_index_p"), cent)

        def index_path_has_exchange(df, table):
            lines = explain_str(df, "simple").splitlines()
            scan = next(
                i for i, ln in enumerate(lines) if f"FileScan parquet {table}" in ln
            )
            for ln in reversed(lines[:scan]):
                if "Sort [" in ln:
                    return False
                if "Exchange" in ln:
                    return True
            return False

        plan = explain_str(bucketed)
        assert "Bucketed: true" in plan, plan
        assert not index_path_has_exchange(
            bucketed, "spark_catalog.sem_wh.sem_index_b"
        ), plan
        assert index_path_has_exchange(
            plain, "spark_catalog.sem_wh.sem_index_p"
        ), explain_str(plain)
        key = lambda df: sorted(  # noqa: E731
            (r.new_id, r.corpus_id, r.cosine) for r in df.collect()
        )
        assert key(bucketed) == key(plain)
        assert len(key(bucketed)) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS sem_wh.sem_index_b")
        spark.sql("DROP TABLE IF EXISTS sem_wh.sem_index_p")
        spark.sql("DROP DATABASE IF EXISTS sem_wh")


def test_bucketed_facts_pull_join_has_no_exchange(spark):
    """TripleStore.dump_bucketed persists facts bucketed by the entity
    id — the key EVERY pull/match join chains on — so the classic
    pull shape (attribute A's rows joined to attribute B's rows on e)
    runs bucket-to-bucket with zero Exchange, and results match the
    in-memory store."""
    from tripl_spark.core.store import TripleStore

    docs = [
        {
            "x:id": f"d{i}",
            "x:name": f"name{i}",
            "x:type": "x.type:thing" if i % 2 else "x.type:other",
        }
        for i in range(60)
    ]
    ts = TripleStore(spark=spark)
    ts.assert_facts(docs, id_attrs=["x:id"])
    spark.sql("CREATE DATABASE IF NOT EXISTS facts_wh")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ts.dump_bucketed("facts_wh.facts_b", 4)
        facts = spark.table("facts_wh.facts_b")
        names = facts.filter(F.col("a") == "x:name").select("e", F.col("v_str").alias("nm"))
        types = facts.filter(F.col("a") == "x:type").select("e", F.col("v_str").alias("tp"))
        joined = names.join(types, "e")
        plan = explain_str(joined)
        assert "Bucketed: true" in plan, plan
        assert n_exchanges(joined) == 0, plan
        got = {(r.nm, r.tp) for r in joined.collect()}
        assert got == {
            (f"name{i}", "x.type:thing" if i % 2 else "x.type:other")
            for i in range(60)
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS facts_wh.facts_b")
        spark.sql("DROP DATABASE IF EXISTS facts_wh")
