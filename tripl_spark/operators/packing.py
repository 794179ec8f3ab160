"""Sequence packing — grouping documents into fixed-token-budget
training sequences, the step between curation and tokenization in an
LLM data pipeline (documents are concatenated until the context window
is full; a fresh sequence starts when the next doc would overflow).

Two strategies, deliberately different in checkability:

* ``packing_bin_assign`` — *streaming offset packing*: documents are
  laid end-to-end in a deterministic order and a sequence boundary
  falls every BUDGET tokens; a document belongs to the sequence its
  FIRST token lands in, so bins can overflow by at most one document's
  tail. Pure window arithmetic (exclusive prefix sum), hence exactly
  DuckDB-oracled.
* ``packing_greedy`` — classic greedy first-fit-in-order with reset:
  never overflows (unless a single doc alone exceeds the budget).
  Sequential state per shard → ``applyInPandas``; correctness pinned by
  contract tests (no-overflow, completeness, determinism under
  repartition) instead of SQL.

Scale shape: packing is embarrassingly parallel across SHARDS (a hash
of doc_id); each shard is one window partition / one pandas group, so
100 TB fans out over shard count with no global state. The order
inside a shard is (doc_id) — deterministic, not content-dependent — so
re-runs produce identical sequences (reproducible training data).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.operators.text import BPE_ISH
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

BUDGET = 512
N_SHARDS = 32


def _with_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, shard, n_tok) — BPE-ish token counts (same pre-tokenizer
    as text_bpe_token_count) and the packing shard."""
    return docs.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH), F.lit(0)))
        .cast("long")
        .alias("n_tok"),
    )


@query(
    "packing_bin_assign",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, doc_id % {N_SHARDS} AS shard,
             CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT doc_id, shard, n_tok,
           CAST(floor(CAST(coalesce(sum(n_tok) OVER (
                  PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                / {BUDGET}.0) AS BIGINT) AS seq_id,
           CAST(coalesce(sum(n_tok) OVER (
                  PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             % {BUDGET} AS seq_offset
    FROM toks
    """,
)
def packing_bin_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming offset packing: per shard, docs are concatenated in
    doc_id order and seq_id = exclusive-prefix-sum ÷ budget (the
    sequence the document STARTS in). seq_offset is its start position
    within that sequence. One window per shard, no iteration."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    return _with_tokens(docs).select(
        "doc_id",
        "shard",
        "n_tok",
        F.floor(start / float(BUDGET)).cast("long").alias("seq_id"),
        (start % BUDGET).alias("seq_offset"),
    )


def greedy_pack(toks: DataFrame, budget: int = BUDGET) -> DataFrame:
    """Greedy first-fit-in-order packing with reset, per shard.
    Sequential scan state (running fill) can't be a window expression,
    so each shard is one pandas group — Arrow-batched, one shuffle on
    shard. Returns (doc_id, shard, n_tok, seq_id, seq_fill) where
    seq_fill is the sequence's fill AFTER this doc is placed."""
    schema = "doc_id long, shard long, n_tok long, seq_id long, seq_fill long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq, fill = 0, 0
        seq_ids, fills = [], []
        for t in pdf["n_tok"]:
            if fill > 0 and fill + t > budget:
                seq, fill = seq + 1, 0
            fill += t
            seq_ids.append(seq)
            fills.append(fill)
        pdf["seq_id"] = seq_ids
        pdf["seq_fill"] = fills
        return pdf[["doc_id", "shard", "n_tok", "seq_id", "seq_fill"]]

    return toks.groupBy("shard").applyInPandas(pack, schema)


@query(
    "packing_greedy",
    # The greedy state machine is sequential per shard, but over a
    # DETERMINISTIC order (doc_id), so a DuckDB recursive CTE can walk
    # the same order row-by-row and reproduce (seq_id, seq_fill)
    # exactly: recursion step rn -> rn+1 carries the running fill,
    # resetting when the next doc would overflow — the same transition
    # as greedy_pack's loop.
    oracle=rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, doc_id % {N_SHARDS} AS shard,
             CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS BIGINT) AS n_tok,
             row_number() OVER (PARTITION BY doc_id % {N_SHARDS} ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT doc_id, shard, n_tok, rn,
             CAST(0 AS BIGINT) AS seq_id, n_tok AS seq_fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.doc_id, t.shard, t.n_tok, t.rn,
             CASE WHEN p.seq_fill > 0 AND p.seq_fill + t.n_tok > {BUDGET}
                  THEN p.seq_id + 1 ELSE p.seq_id END AS seq_id,
             CASE WHEN p.seq_fill > 0 AND p.seq_fill + t.n_tok > {BUDGET}
                  THEN t.n_tok ELSE p.seq_fill + t.n_tok END AS seq_fill
      FROM toks t JOIN packed p ON t.shard = p.shard AND t.rn = p.rn + 1
    )
    SELECT doc_id, shard, n_tok, seq_id, seq_fill FROM packed
    """,
    doc="Greedy no-overflow sequence packing, hash-gated vs a DuckDB "
    "recursive-CTE replay of the same per-shard state machine; "
    "no-overflow/completeness/determinism also in tests/test_packing.py",
)
def packing_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit packing of documents into ≤512-token training
    sequences, sharded by doc_id hash."""
    docs = load_table(spark, sf_dir, "documents")
    return greedy_pack(_with_tokens(docs))
