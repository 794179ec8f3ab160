"""Tokenizer induction — learning a BPE merge table from the corpus,
the step that turns a curated corpus into a trainable token stream
(Sennrich et al. 2016).

Scale split (how real tokenizer trainers work, e.g. HF tokenizers):

* the CORPUS-scale work is exactly one pass — tokenize + ``groupBy
  (word)`` count. 100 TB of text collapses to a vocabulary-sized
  weighted word table (~10⁶–10⁷ rows), shuffled once on the word key.
* the MERGE loop then runs on that word table, which fits one node by
  orders of magnitude; distributing it would spend a shuffle per merge
  round for no win. We cap the table at ``MAX_VOCAB`` words by count
  (deterministic tiebreak) so the driver-side cost is bounded by
  construction, not by corpus size.

``tokenizer_first_merge`` — the first round's pair statistics — is a
pure DataFrame aggregation and fully DuckDB-oracled; the iterative
merge table is pinned by a golden test on the classic BPE example
corpus (tests/test_tokenizer.py).

Convention: pair frequencies count OVERLAPPING adjacent occurrences
(like HF's trainer); merges apply greedily left-to-right without
re-merging the just-built symbol in the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

TOP_PAIRS = 20
N_MERGES = 10
MAX_VOCAB = 100_000


def word_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """(term, cnt) — the one corpus-scale pass."""
    return (
        docs.select(F.explode(F.split(F.trim(F.lower(F.col(col))), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "tokenizer_first_merge",
    oracle=rf"""
    WITH wc AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
            FROM documents)
      GROUP BY term
    ),
    pairs AS (
      SELECT unnest([substring(term, i, 2) for i in range(1, length(term))]) AS pair,
             cnt
      FROM wc WHERE length(term) >= 2
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS weight,
           CAST(row_number() OVER (ORDER BY sum(cnt) DESC, pair) AS BIGINT) AS rk
    FROM pairs GROUP BY pair
    ORDER BY rk LIMIT {TOP_PAIRS}
    """,
)
def tokenizer_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 BPE pair statistics: adjacent character-pair frequencies
    weighted by word count, top {TOP_PAIRS}. The corpus is reduced to
    the word table first, so the pair explosion runs over the
    vocabulary, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    wc = word_counts(docs)
    pairs = (
        wc.filter(F.length("term") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr("transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))")
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("weight"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("weight"), "pair")
    return (
        pairs.select("pair", "weight", F.row_number().over(w).cast("long").alias("rk"))
        .orderBy("rk")
        .limit(TOP_PAIRS)
    )


def learn_bpe(wc_rows: list[tuple[str, int]], n_merges: int = N_MERGES) -> list[dict]:
    """Driver-side BPE merge loop over the (bounded) weighted word
    table. Returns [{rank, left, right, merged, weight}] — deterministic:
    argmax by (weight desc, (left, right) lexicographic)."""
    words: list[tuple[list[str], int]] = [(list(term), cnt) for term, cnt in wc_rows]
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        freq: dict[tuple[str, str], int] = {}
        for syms, cnt in words:
            for a, b in zip(syms, syms[1:]):
                freq[(a, b)] = freq.get((a, b), 0) + cnt
        if not freq:
            break
        (left, right), weight = min(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        new_words = []
        for syms, cnt in words:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, cnt))
        words = new_words
        merges.append(
            {"rank": rank, "left": left, "right": right, "merged": merged, "weight": weight}
        )
    return merges


@query(
    "tokenizer_bpe_merges",
    doc="Learned BPE merge table (rows-only; iterative — golden-tested "
    "on the classic BPE corpus in tests/test_tokenizer.py)",
)
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{N_MERGES} BPE merges learned from the corpus: one distributed
    word-count pass, then the driver-side merge loop on the top-
    {MAX_VOCAB} word table."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        word_counts(docs)
        .orderBy(F.desc("cnt"), "term")
        .limit(MAX_VOCAB)
        .collect()
    )
    merges = learn_bpe([(r["term"], r["cnt"]) for r in wc])
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["weight"]) for m in merges],
        "rank long, left string, right string, merged string, weight long",
    )
