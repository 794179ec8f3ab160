"""Repetition-based quality filters (Gopher/C4-style) over ``documents``.

Web-scale training corpora are filtered on *intra-document repetition*:
a page whose most common word covers 20% of its tokens, or whose
trigrams are mostly duplicates, is boilerplate/spam (Rae et al. 2021
"Gopher" §A1.1 repetition rules; Raffel et al. 2020 "C4" heuristics).
The reference has no text analytics at all (SURVEY.md §2.9) — this is
a driver-mandated training-data extension.

Shape for 100 TB: everything is per-document map work plus gram-keyed
aggregation — the corpus is exploded into a gram stream (linear), the
per-(doc, gram) counts shuffle on (doc_id, gram) which is near-unique
(no skew), and the final per-doc rollup shuffles on doc_id once. No
joins, no driver-side state; AQE balances the gram stream.

Gram construction reuses the windowed-``lead`` form from
``operators/dedup.shingle_frame`` (NOT array higher-order functions —
projection collapse makes nested HOFs O(tokens²) per doc, see
SCALE.md), but keeps duplicate grams because repetition is exactly the
signal here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

# keep-thresholds (Gopher uses 0.2 for top-word character fraction and
# ~0.18/0.16 for top 2/3-gram fractions; the synthetic word-salad corpus
# has a tiny vocabulary, so thresholds are shifted up to stay selective
# rather than degenerate)
TOP_TOKEN_MAX = 0.12
TOP_BIGRAM_MAX = 0.08
DUP_TRIGRAM_MAX = 0.55


def gram_counts(docs: DataFrame, n: int, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """(id, g, cnt) — word n-gram occurrence counts per document,
    duplicates counted (unlike ``shingle_frame``, which dedupes).
    Tokenize once, reassemble grams with window ``lead`` (codegen), drop
    tail stubs, count. One shuffle for the lead window (by doc), one for
    the count (by doc+gram)."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.lower(F.col(col))), r"\s+")).alias("pos", "term"),
    )
    if n == 1:
        grams = toks.select(id_col, F.col("term").alias("g"))
    else:
        w = Window.partitionBy(id_col).orderBy("pos")
        leads = [F.lead("term", i).over(w) for i in range(1, n)]
        grams = (
            toks.select(id_col, F.concat_ws(" ", F.col("term"), *leads).alias("g"),
                        leads[-1].isNotNull().alias("_full"))
            .filter(F.col("_full"))
            .select(id_col, "g")
        )
    return grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("cnt"))


def _per_doc(counts: DataFrame, prefix: str) -> DataFrame:
    """Roll gram counts up to one row per doc: total grams, distinct
    grams, max single-gram count."""
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").alias(f"{prefix}_total"),
        F.count(F.lit(1)).alias(f"{prefix}_distinct"),
        F.max("cnt").alias(f"{prefix}_max"),
    )


@query(
    "text_repetition_filters",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    uni AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS uni_total,
             CAST(max(c) AS BIGINT) AS uni_max
      FROM (SELECT doc_id, t, count(*) AS c
            FROM (SELECT doc_id, t, unnest(t) AS g FROM toks)
            GROUP BY doc_id, t, g)
      GROUP BY doc_id, t
    ),
    bi AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS bi_total,
             CAST(max(c) AS BIGINT) AS bi_max
      FROM (SELECT doc_id, count(*) AS c
            FROM (SELECT doc_id,
                         unnest([array_to_string(t[i:i+1], ' ')
                                 for i in range(1, len(t))]) AS g
                  FROM toks)
            GROUP BY doc_id, g)
      GROUP BY doc_id
    ),
    tri AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS tri_total,
             CAST(count(*) AS BIGINT) AS tri_distinct
      FROM (SELECT doc_id, count(*) AS c
            FROM (SELECT doc_id,
                         unnest([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t) - 1)]) AS g
                  FROM toks)
            GROUP BY doc_id, g)
      GROUP BY doc_id
    )
    SELECT doc_id,
           uni_total AS n_tokens,
           round(uni_max * 1.0 / uni_total, 4) AS top_token_frac,
           round(bi_max * 1.0 / bi_total, 4) AS top_bigram_frac,
           round((tri_total - tri_distinct) * 1.0 / tri_total, 4) AS dup_trigram_frac,
           (round(uni_max * 1.0 / uni_total, 4) <= {TOP_TOKEN_MAX}
            AND round(bi_max * 1.0 / bi_total, 4) <= {TOP_BIGRAM_MAX}
            AND round((tri_total - tri_distinct) * 1.0 / tri_total, 4) <= {DUP_TRIGRAM_MAX})
             AS keep
    FROM uni JOIN bi USING (doc_id) JOIN tri USING (doc_id)
    """,
)
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: fraction of tokens
    that are the single most frequent token, fraction of bigram slots
    taken by the most frequent bigram, and the duplicated-trigram
    fraction (1 − distinct/total) — plus the combined keep flag. The
    keep decision is made on the ROUNDED metrics so the Spark and
    DuckDB threshold comparisons see identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    uni = _per_doc(gram_counts(docs, 1), "uni")
    bi = _per_doc(gram_counts(docs, 2), "bi")
    tri = _per_doc(gram_counts(docs, 3), "tri")
    top_token = F.round(F.col("uni_max") * 1.0 / F.col("uni_total"), 4)
    top_bigram = F.round(F.col("bi_max") * 1.0 / F.col("bi_total"), 4)
    dup_tri = F.round(
        (F.col("tri_total") - F.col("tri_distinct")) * 1.0 / F.col("tri_total"), 4
    )
    return (
        uni.join(bi, "doc_id").join(tri, "doc_id")
        .select(
            "doc_id",
            F.col("uni_total").alias("n_tokens"),
            top_token.alias("top_token_frac"),
            top_bigram.alias("top_bigram_frac"),
            dup_tri.alias("dup_trigram_frac"),
            (
                (top_token <= TOP_TOKEN_MAX)
                & (top_bigram <= TOP_BIGRAM_MAX)
                & (dup_tri <= DUP_TRIGRAM_MAX)
            ).alias("keep"),
        )
    )
