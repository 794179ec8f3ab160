"""Contract tests for greedy sequence packing (the rows-only query):
the properties the DuckDB oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.packing import BUDGET, greedy_pack


@pytest.fixture(scope="module")
def toks(spark):
    import random

    rng = random.Random(11)
    rows = [(i, i % 4, rng.randrange(20, 400)) for i in range(200)]
    # one oversized doc: alone it exceeds the budget, must still pack
    rows.append((200, 0, BUDGET + 100))
    return spark.createDataFrame(rows, "doc_id long, shard long, n_tok long")


def test_no_overflow_except_oversized_docs(toks):
    packed = greedy_pack(toks)
    seqs = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tok").alias("total"), F.count(F.lit(1)).alias("n_docs")
    )
    bad = seqs.filter((F.col("total") > BUDGET) & (F.col("n_docs") > 1)).count()
    assert bad == 0
    # the oversized doc sits alone in its own sequence
    lone = packed.filter(F.col("doc_id") == 200).collect()[0]
    assert lone["seq_fill"] == BUDGET + 100


def test_complete_and_in_order(toks):
    packed = greedy_pack(toks).toPandas()
    assert len(packed) == 201 and packed["doc_id"].nunique() == 201
    # within a shard, seq_id is non-decreasing in doc_id order
    for _, grp in packed.groupby("shard"):
        s = grp.sort_values("doc_id")["seq_id"].tolist()
        assert s == sorted(s)


def test_deterministic_under_repartition(toks):
    a = greedy_pack(toks).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        greedy_pack(toks.repartition(13))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
