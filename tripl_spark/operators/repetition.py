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


# ---------------------------------------------------------------------------
# Token-entropy diversity filter
# ---------------------------------------------------------------------------

ENTROPY_MIN = 2.5  # nats; the synthetic corpus spans ~1.9-3.3, so the
# threshold actually separates (low-diversity docs are template/spam
# candidates — the signal the top-fraction rules above can miss when
# repetition is spread over a few alternating tokens)


@query(
    "text_token_entropy",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS g
      FROM documents
    ),
    tc AS (SELECT doc_id, g, count(*) AS c FROM toks GROUP BY doc_id, g),
    n AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
    e AS (
      SELECT tc.doc_id,
             CAST(max(n) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 4) + 0.0 AS entropy
      FROM tc JOIN n USING (doc_id) GROUP BY tc.doc_id
    )
    SELECT doc_id, n_tokens, n_distinct, entropy,
           CASE WHEN n_distinct > 1 THEN round(entropy / ln(n_distinct), 4) + 0.0
                ELSE 0.0 END AS evenness,
           entropy >= {ENTROPY_MIN} AS keep
    FROM e
    """,
    doc="Shannon token entropy + Pielou evenness per document with a "
    f"keep flag at {ENTROPY_MIN} nats — the lexical-diversity filter; "
    "fully hash-gated",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity filter: per-document Shannon entropy of the
    token distribution (nats) and Pielou evenness (entropy / ln
    distinct — 1.0 means perfectly even usage), keep-flagged at
    {ENTROPY_MIN} nats. Low-entropy documents are generated/template
    text whose repetition is SPREAD across a few alternating tokens —
    invisible to the single-gram top-fraction rules above, which is
    why C4/Gopher-style stacks carry both.

    Shuffle shape at 100 TB: identical to the repetition metrics —
    token stream (linear), one count shuffle keyed by (doc_id, token)
    (near-unique, no skew), one per-doc rollup keyed by doc_id; the
    entropy itself is a sum over the count rows joined to per-doc
    totals (AQE-sized broadcast at test scale, shuffle join at corpus
    scale on the same near-unique key). Map-only math, no windows, no
    driver state."""
    docs = load_table(spark, sf_dir, "documents")
    tc = gram_counts(docs, 1)
    n = tc.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    frac = F.col("cnt") * 1.0 / F.col("n")
    e = (
        tc.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            (F.round(-F.sum(frac * F.log(frac)), 4) + F.lit(0.0)).alias("entropy"),
        )
    )
    return e.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "entropy",
        F.when(
            F.col("n_distinct") > 1,
            F.round(F.col("entropy") / F.log(F.col("n_distinct")), 4) + F.lit(0.0),
        ).otherwise(F.lit(0.0)).alias("evenness"),
        (F.col("entropy") >= ENTROPY_MIN).alias("keep"),
    )
