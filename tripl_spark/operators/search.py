"""Full-text relevance search (BM25) over the ``documents`` table.

The reference has no text search of any kind (SURVEY.md §2.9); a
training-data platform needs at least term-level relevance ranking for
corpus exploration and targeted extraction. This is Okapi BM25
(Robertson & Zaragoza 2009) computed as a pure DataFrame pipeline and
oracled term-for-term against DuckDB.

Scale shape (the classic inverted-index-as-shuffle): the corpus
explodes to a token stream once; the *query-term filter is applied
before any shuffle*, so only postings for the query terms (a tiny
fraction of 100 TB) ever move. Document lengths are a per-doc count
(one shuffle on doc_id); corpus constants (N, avgdl) are one scalar
aggregate; the document-frequency table is per-query-term (rows ==
len(query)) and broadcasts. Nothing driver-side grows with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

K1 = 1.2
B = 0.75
TOP_K = 100
QUERY_TERMS = ["spark", "hash", "join", "dup"]


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """(doc_id, n_terms_matched, score) for every document matching at
    least one query term. idf is the BM25+ form ln(1 + (N-df+.5)/(df+.5))
    (always positive). N and avgdl are one tiny scalar aggregate —
    collected to the driver because they parameterize the expression;
    everything row-scaled stays distributed."""
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(col))), r"\s+")).alias("term"),
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    consts = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = consts["n"], consts["avgdl"]
    # postings for query terms only — the filter runs in the scan stage,
    # BEFORE the (doc, term) shuffle
    tf = (
        tok.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .select(
            id_col,
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
            ).alias("s"),
        )
    )
    return per_term.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum("s"), 4).alias("score"),
    )


@query(
    "search_bm25",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    consts AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ('spark', 'hash', 'join', 'dup')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
             round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
                       * (tf * ({K1} + 1))
                       / (tf + {K1} * (1 - {B} + {B} * dl / avgdl))), 4) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), consts
      GROUP BY doc_id
    ),
    top AS (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K})
    SELECT doc_id, n_terms_matched, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM top
    """,
)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} BM25 hits for the query "spark hash join dup"
    (``dup`` is the corpus's one rare term, so idf actually
    differentiates). The top-k is an ``orderBy().limit()`` — Spark
    plans TakeOrderedAndProject (per-partition heaps + driver merge of
    k rows), so no global sort ever materializes; the rank window then
    runs on k rows only. Rank is computed on the ROUNDED score with
    doc_id as tiebreak — deterministic on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, QUERY_TERMS)
    order = [F.col("score").desc(), F.col("doc_id")]
    top = scored.orderBy(*order).limit(TOP_K)
    return top.select(
        "doc_id",
        "n_terms_matched",
        "score",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval — Reciprocal Rank Fusion of lexical + dense lists
# ---------------------------------------------------------------------------

RRF_C = 60       # the canonical RRF constant (Cormack et al. 2009)
LIST_N = 100     # depth of each input ranking
FUSE_TOP = 50    # fused results returned
QUERY_VEC_ID = 0  # the dense query: embedding row 0 (vec_id aligns with
# doc_id across the synthetic tables, the same alignment the semantic
# curation pipelines rely on — operators/pipeline.py:157)


def _ranked_topn(df: DataFrame, score_col: str, id_col: str, n: int, rank_name: str) -> DataFrame:
    """Top-``n`` by (score desc, id) via ``orderBy().limit()`` —
    TakeOrderedAndProject, per-partition heaps, no global sort — then a
    rank window over the ``n`` surviving rows only."""
    order = [F.col(score_col).desc(), F.col(id_col)]
    top = df.orderBy(*order).limit(n)
    return top.select(
        id_col, F.row_number().over(Window.orderBy(*order)).cast("long").alias(rank_name)
    )


@query(
    "sim_hybrid_rrf",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    consts AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ('spark', 'hash', 'join', 'dup')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT doc_id,
             round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
                       * (tf * ({K1} + 1))
                       / (tf + {K1} * (1 - {B} + {B} * dl / avgdl))), 4) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), consts
      GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
      FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT {LIST_N})
    ),
    qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    cos AS (
      SELECT vec_id AS doc_id, round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) AS cosine
      FROM embeddings, qv WHERE vec_id <> {QUERY_VEC_ID}
    ),
    dense AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS dense_rank
      FROM (SELECT * FROM cos ORDER BY cosine DESC, doc_id LIMIT {LIST_N})
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id, lex_rank, dense_rank,
             round(coalesce(1.0 / ({RRF_C} + lex_rank), 0)
                   + coalesce(1.0 / ({RRF_C} + dense_rank), 0), 6) AS rrf_score
      FROM lex FULL JOIN dense ON lex.doc_id = dense.doc_id
    ),
    top AS (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {FUSE_TOP})
    SELECT doc_id, lex_rank, dense_rank, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
    FROM top
    """,
    doc=f"hybrid retrieval: RRF fusion (c={RRF_C}) of the BM25 lexical "
    f"top-{LIST_N} and the dense cosine top-{LIST_N} — both rankings "
    "and the fusion fully hash-gated",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    of a lexical and a dense ranking — the standard hybrid-search
    combiner (score = Σ_lists 1/(c + rank), c = 60): BM25 over the
    query terms fused with cosine similarity to the query embedding
    (``vec_id = {QUERY_VEC_ID}``; vec_id aligns with doc_id across the
    synthetic tables, cf. ``operators/pipeline.py:157``). Documents on
    only one list contribute that
    list's term alone — exactly RRF's missing-rank convention.

    Scale shape: each input ranking is corpus-scan → score →
    TakeOrderedAndProject (per-partition heaps, never a global sort);
    the fusion is a full outer join of two ≤ {LIST_N}-row frames and
    every rank window runs post-limit on bounded rows. The dense side
    broadcasts its 1-row query vector; the lexical side is the
    ``search_bm25`` shape (query-term filter BEFORE the postings
    shuffle). Nothing driver-side or single-task grows with the
    corpus."""
    from tripl_spark.operators.similarity import cosine

    docs = load_table(spark, sf_dir, "documents")
    lex = _ranked_topn(bm25_scores(docs, QUERY_TERMS), "score", "doc_id", LIST_N, "lex_rank")

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    cos = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("v"), F.col("qv")), 4).alias("cosine"),
        )
    )
    dense = _ranked_topn(cos, "cosine", "doc_id", LIST_N, "dense_rank")

    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round(
                F.coalesce(1.0 / (F.lit(RRF_C) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(RRF_C) + F.col("dense_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    order = [F.col("rrf_score").desc(), F.col("doc_id")]
    top = fused.orderBy(*order).limit(FUSE_TOP)
    return top.select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        "rrf_score",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
    )
