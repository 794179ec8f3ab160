"""Cross-document substring (span) duplication: find documents that
share long verbatim token runs even when the documents as a whole are
different — the containment case MinHash whole-doc similarity misses
(a 50-token boilerplate block inside two otherwise-unrelated pages
barely moves whole-doc Jaccard but is exactly what training-data dedup
wants to catch; cf. the "Deduplicating Training Data Makes Language
Models Better" suffix-array formulation).

Spark-first shape (linear, no suffix array needed for fixed-width
spans):

1. tokenize once per document (one groupBy to a token array — the
   aggregation boundary stops Catalyst's projection collapse from
   inlining the tokenizer into every window, the trap documented at
   ``dedup.shingle_frame``);
2. explode window STARTS (stride-spaced), slice each W-token span and
   hash it to 60 bits — one row per span, corpus cost
   O(tokens / stride);
3. groupBy span hash, keep hashes seen in >1 distinct doc, expand the
   per-hash doc list to upper-triangle pairs (same bounded expansion
   as the LSH bucket stage, same degenerate-bucket cap);
4. aggregate pairs to (id_a, id_b, n_shared_spans).

The stride trades recall granularity for cost: stride == W//2
guarantees any verbatim run of >= 1.5·W tokens contains at least one
aligned shared window on both sides. At 100 TB the span frame is the
only large intermediate; it shuffles once on the 60-bit hash
(balanced by construction) and never materializes text — spans travel
as hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.dedup import DEFAULT_MAX_BUCKET, _pairs_from_buckets
from tripl_spark.queries.registry import query
from tripl_spark.session import eager_checkpoint, load_table

SPAN_TOKENS = 20
SPAN_STRIDE = 10


def span_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = SPAN_TOKENS,
    stride: int = SPAN_STRIDE,
) -> DataFrame:
    """(id, span_pos, span_hash) — 60-bit md5 hash of each stride-spaced
    W-token window (md5-prefix so DuckDB replicates it verbatim)."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
    ).filter(F.size("t") >= width)
    starts = F.sequence(
        F.lit(0), F.floor((F.size("t") - width) / stride).cast("int") * stride, F.lit(stride)
    )
    spans = toks.select(F.col(id_col), "t", F.explode(starts).alias("span_pos"))
    gram = F.array_join(F.slice("t", F.col("span_pos") + 1, width), " ")
    return spans.select(
        id_col,
        "span_pos",
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long").alias("span_hash"),
    )


def shared_span_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(id_a, id_b, n_shared_spans) for every doc pair sharing >= 1
    exact W-token span. The span frame is persisted for the duration
    of THIS call — it feeds the bucket stage AND both sides of the
    counting join; unpersisted, the tokenize+slice+hash pipeline would
    run three times — then unpersisted before returning: the (small)
    pair result is eagerly materialized via localCheckpoint, so no
    MEMORY_AND_DISK block outlives the call in a long-lived session
    (gated by tests/test_substring.py)."""
    from pyspark import StorageLevel

    sp = (
        span_hashes(docs, id_col)
        .select(id_col, "span_hash")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # reuse the LSH bucket-pair expansion: bucket key = the span hash
        bands = sp.select(
            id_col, F.lit(0).alias("band_id"), F.col("span_hash").cast("string").alias("band_hash")
        )
        pairs = _pairs_from_buckets(bands, id_col, max_bucket)
        # n_shared_spans: count distinct span hashes both docs contain
        a = sp.select(F.col(id_col).alias("id_a"), "span_hash")
        b = sp.select(F.col(id_col).alias("id_b"), "span_hash")
        return (
            pairs.join(a, "id_a")
            .join(b, ["id_b", "span_hash"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared_spans"))
            .transform(eager_checkpoint)
        )
    finally:
        sp.unpersist()


@query(
    "dedup_substring_spans",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, unnest(list_distinct([
               CAST('0x' || substring(md5(array_to_string(
                      t[i*{SPAN_STRIDE}+1 : i*{SPAN_STRIDE}+{SPAN_TOKENS}], ' ')), 1, 15)
                    AS BIGINT)
               for i in range(0, (len(t) - {SPAN_TOKENS}) // {SPAN_STRIDE} + 1)
             ])) AS span_hash
      FROM toks
      WHERE len(t) >= {SPAN_TOKENS}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared_spans
    FROM spans a JOIN spans b
      ON a.span_hash = b.span_hash AND a.doc_id < b.doc_id
    GROUP BY id_a, id_b
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing verbatim 20-token spans (stride 10), with the
    shared-span count — catches containment/boilerplate duplication
    whole-document similarity misses. Oracle enumerates the same
    windows in SQL; uncapped (the testdata has no degenerate span)."""
    docs = load_table(spark, sf_dir, "documents")
    return shared_span_pairs(docs, max_bucket=None)


# ---------------------------------------------------------------------------
# Document chunking (training-window preparation)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — overlapping fixed-token
    windows, the standard pre-tokenization chunking step. Chunk i
    covers tokens [i·stride, i·stride + width); generation continues
    while i·stride < len, so trailing tokens always land in a (shorter)
    final chunk and every token belongs to ≥1 chunk. Map-only: explode
    + slice inside whole-stage codegen, no shuffle at all — at 100 TB
    this runs at scan speed and its output partitioning inherits the
    input's."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
    ).filter(F.size("t") > 0)
    n_chunks = F.floor((F.size("t") - 1) / stride).cast("int") + 1
    out = toks.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "t",
    )
    chunk = F.slice("t", F.col("chunk_idx") * stride + 1, width)
    return out.select(
        id_col,
        "chunk_idx",
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@query(
    "text_chunking",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    )
    SELECT doc_id, chunk_idx,
           CAST(len(t[chunk_idx*{CHUNK_STRIDE}+1 : chunk_idx*{CHUNK_STRIDE}+{CHUNK_TOKENS}])
                AS BIGINT) AS n_tokens,
           array_to_string(t[chunk_idx*{CHUNK_STRIDE}+1 : chunk_idx*{CHUNK_STRIDE}+{CHUNK_TOKENS}],
                           ' ') AS chunk_text
    FROM (
      SELECT doc_id, t, unnest(range(0, (len(t) - 1) // {CHUNK_STRIDE} + 1)) AS chunk_idx
      FROM toks WHERE len(t) > 0
    )
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap over every document —
    zero-shuffle map-only plan (gated in tests/test_plan_quality.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs)
