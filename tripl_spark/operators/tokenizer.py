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
from tripl_spark.session import load_table, local_df

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

    # top-k FIRST (orderBy().limit() plans TakeOrderedAndProject —
    # per-partition heaps, no global sort of the pair table), then the
    # rank window runs over the k surviving rows only
    order = [F.desc("weight"), F.col("pair")]
    top = pairs.orderBy(*order).limit(TOP_PAIRS)
    return top.select(
        "pair", "weight",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rk"),
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
    "tokenizer_bpe_2merges",
    # Two merge rounds are pure arithmetic: round-1 pair stats are the
    # tokenizer_first_merge aggregation; applying the winning merge
    # greedily left-to-right IS SQL's literal replace() (non-overlapping,
    # left-to-right — the same scan learn_bpe does), with chr(1) as the
    # fused-symbol sentinel; round-2 stats then read 2-symbol windows of
    # the sentinel-ed strings, tie-breaking on the EXPANDED (left, right)
    # tuple exactly like the driver loop.
    oracle=rf"""
    WITH wc AS (
      -- the SAME MAX_VOCAB cap the Spark side applies before learning:
      -- without it the oracle would aggregate pair weights over the
      -- full vocabulary and diverge once a corpus exceeds the cap
      SELECT term, cnt FROM (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
              FROM documents)
        GROUP BY term
      ) ORDER BY cnt DESC, term LIMIT {MAX_VOCAB}
    ),
    p1 AS (
      SELECT pair, sum(cnt) AS weight FROM (
        SELECT unnest([substring(term, i, 2) for i in range(1, length(term))]) AS pair,
               cnt
        FROM wc WHERE length(term) >= 2
      ) GROUP BY pair
    ),
    m1 AS (SELECT pair, weight FROM p1 ORDER BY weight DESC, pair LIMIT 1),
    w2 AS (
      SELECT replace(term, (SELECT pair FROM m1), chr(1)) AS term2, cnt FROM wc
    ),
    p2 AS (
      SELECT replace(substring(pair2, 1, 1), chr(1), (SELECT pair FROM m1)) AS left2,
             replace(substring(pair2, 2, 1), chr(1), (SELECT pair FROM m1)) AS right2,
             sum(cnt) AS weight
      FROM (
        SELECT unnest([substring(term2, i, 2) for i in range(1, length(term2))]) AS pair2,
               cnt
        FROM w2 WHERE length(term2) >= 2
      ) GROUP BY left2, right2
    ),
    m2 AS (SELECT left2, right2, weight FROM p2 ORDER BY weight DESC, left2, right2 LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS rank,
           substring(pair, 1, 1) AS left, substring(pair, 2, 1) AS right,
           pair AS merged, CAST(weight AS BIGINT) AS weight
    FROM m1
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS rank, left2 AS left, right2 AS right,
           left2 || right2 AS merged, CAST(weight AS BIGINT) AS weight
    FROM m2
    """,
    doc="first two BPE merges, hash-gated: pair selection AND greedy "
    "merge application replayed in SQL (full loop stays in "
    "tokenizer_bpe_merges)",
)
def tokenizer_bpe_2merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first two learned BPE merges — same distributed word-count
    pass and driver merge loop as ``tokenizer_bpe_merges`` (bounded
    vocab table), fixed at n=2 so the oracle can replay both the pair
    argmax and the greedy merge application."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        word_counts(docs)
        .orderBy(F.desc("cnt"), "term")
        .limit(MAX_VOCAB)
        .collect()
    )
    merges = learn_bpe([(r["term"], r["cnt"]) for r in wc], n_merges=2)
    return local_df(
        spark,
        [(m["rank"], m["left"], m["right"], m["merged"], m["weight"]) for m in merges],
        "rank long, left string, right string, merged string, weight long",
    )


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
    return local_df(
        spark,
        [(m["rank"], m["left"], m["right"], m["merged"], m["weight"]) for m in merges],
        "rank long, left string, right string, merged string, weight long",
    )


VOCAB_SIZE = 20  # fixed-vocab size: below the corpus vocabulary (31
# distinct terms in the synthetic docs), so OOV rates are non-trivial


@query(
    "tokenizer_vocab_coverage",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS c FROM tok GROUP BY term
        ORDER BY c DESC, term LIMIT {VOCAB_SIZE}
      )
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) - count(v.term) AS BIGINT) AS n_oov,
           round((count(*) - count(v.term)) * 1.0 / count(*), 4) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (term)
    GROUP BY doc_id
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage evaluation: per-document out-of-vocabulary
    token counts under a fixed top-N corpus vocabulary — the metric a
    tokenizer/vocab choice is judged by before a training run (high
    OOV ⇒ the vocab truncates this slice of the corpus).

    Scale shape: the vocabulary is one corpus token pass (the same
    groupBy ``learn_bpe`` starts from) truncated to VOCAB_SIZE rows,
    which BROADCASTS back onto the token stream for the left join —
    the corpus shuffles once for the vocab count and once per
    doc-aggregation, never for membership."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "term")
        .limit(VOCAB_SIZE)
        .select("term", F.lit(1).alias("_in"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.count(F.lit(1)) - F.count("_in")).alias("n_oov"),
            F.round(
                (F.count(F.lit(1)) - F.count("_in")) * 1.0 / F.count(F.lit(1)), 4
            ).alias("oov_rate"),
        )
    )


# The m1/m2 BPE-learning CTE prefix, shared verbatim by every oracle
# that encodes under the learned merges (compression, trained
# fertility) — one definition so the learning semantics can never
# drift between them.
_BPE2_LEARN_CTES = rf"""
    wc AS (
      -- the SAME MAX_VOCAB cap the Spark side applies before learning:
      -- without it the oracle would aggregate pair weights over the
      -- full vocabulary and diverge once a corpus exceeds the cap
      SELECT term, cnt FROM (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
              FROM documents)
        GROUP BY term
      ) ORDER BY cnt DESC, term LIMIT {MAX_VOCAB}
    ),
    p1 AS (
      SELECT pair, sum(cnt) AS weight FROM (
        SELECT unnest([substring(term, i, 2) for i in range(1, length(term))]) AS pair,
               cnt
        FROM wc WHERE length(term) >= 2
      ) GROUP BY pair
    ),
    m1 AS (SELECT pair, weight FROM p1 ORDER BY weight DESC, pair LIMIT 1),
    w2 AS (
      SELECT replace(term, (SELECT pair FROM m1), chr(1)) AS term2, cnt FROM wc
    ),
    p2 AS (
      SELECT pair2, sum(cnt) AS weight FROM (
        SELECT unnest([substring(term2, i, 2) for i in range(1, length(term2))]) AS pair2,
               cnt
        FROM w2 WHERE length(term2) >= 2
      ) GROUP BY pair2
    ),
    m2 AS (
      SELECT pair2, weight FROM p2
      ORDER BY weight DESC,
               replace(substring(pair2, 1, 1), chr(1), (SELECT pair FROM m1)),
               replace(substring(pair2, 2, 1), chr(1), (SELECT pair FROM m1))
      LIMIT 1
    )"""


def learned_merge_literals(docs: DataFrame) -> tuple[str, str]:
    """(m1, m2-in-sentinel-space) — run the bounded BPE learning loop
    over the capped vocabulary table and return the two merge
    LITERALS for scan-side encoding: chr(1) stands for merge 1 inside
    merge 2, so greedy left-to-right `replace` IS the merge scan.
    The vocabulary collect is MAX_VOCAB-bounded (driver-safe at any
    corpus size); the literals broadcast for free as plan constants."""
    wc = (
        word_counts(docs)
        .orderBy(F.desc("cnt"), "term")
        .limit(MAX_VOCAB)
        .collect()
    )
    merges = learn_bpe([(r["term"], r["cnt"]) for r in wc], n_merges=2)
    m1 = merges[0]["left"] + merges[0]["right"]
    m2s = merges[1]["left"].replace(m1, "\x01") + merges[1]["right"].replace(m1, "\x01")
    return m1, m2s


def _bpe2_encode(term, m1: str, m2s: str):
    """Column expression: encode a word under the two learned merges
    (sentinel chars = fused symbols, so symbol count = length)."""
    return F.replace(
        F.replace(term, F.lit(m1), F.lit("\x01")), F.lit(m2s), F.lit("\x02")
    )


@query(
    "tokenizer_bpe2_compression",
    # Encode-side companion of tokenizer_bpe_2merges: the same m1/m2
    # learning CTEs, then every word of every document is encoded by
    # the two literal replaces (chr(1)/chr(2) sentinels = fused
    # symbols) and the per-doc symbol counts compare pre- vs
    # post-merge. Greedy left-to-right replace IS the merge scan.
    oracle=rf"""
    WITH {_BPE2_LEARN_CTES},
    doctok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    )
    SELECT doc_id,
           CAST(sum(length(term)) AS BIGINT) AS n_char_symbols,
           CAST(sum(length(replace(replace(term, (SELECT pair FROM m1), chr(1)),
                                   (SELECT pair2 FROM m2), chr(2)))) AS BIGINT)
             AS n_bpe2_symbols,
           round(sum(length(replace(replace(term, (SELECT pair FROM m1), chr(1)),
                                    (SELECT pair2 FROM m2), chr(2)))) * 1.0
                 / sum(length(term)), 4) AS compression
    FROM doctok GROUP BY doc_id
    """,
    doc="train->encode->measure under the first two learned BPE "
    "merges, hash-gated end-to-end: per-doc symbol counts before/"
    "after applying the merges the corpus itself selected",
)
def tokenizer_bpe2_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression measurement of the learned tokenizer: encode every
    document under the first two corpus-learned BPE merges and report
    per-doc symbol counts before/after — the metric a tokenizer is
    ultimately judged by (symbols per character).

    Scale shape: learning is the bounded driver loop over the
    vocabulary table (one corpus shuffle); encoding broadcasts the two
    merge literals into a map-only replace chain over the token
    stream — the corpus is scanned, never shuffled, for encoding. The
    sentinel trick (chr(1)/chr(2) = fused symbols) makes symbol count
    = string length on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    m1, m2s = learned_merge_literals(docs)
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    enc = _bpe2_encode(F.col("term"), m1, m2s)
    return tok.groupBy("doc_id").agg(
        F.sum(F.length("term")).cast("long").alias("n_char_symbols"),
        F.sum(F.length(enc)).cast("long").alias("n_bpe2_symbols"),
        F.round(F.sum(F.length(enc)) * 1.0 / F.sum(F.length("term")), 4).alias(
            "compression"
        ),
    )


@query(
    "tokenizer_fertility_by_lang",
    oracle=r"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text,
                ' ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+'))) AS BIGINT)
             AS n_bpe_tokens,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
             AS n_words,
           round(sum(len(regexp_extract_all(text,
                ' ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+'))) * 1.0
                 / sum(len(string_split_regex(trim(text), '\s+'))), 4)
             AS fertility
    FROM documents GROUP BY lang
    """,
    doc="corpus-level tokenizer fertility per language — "
    "sum(tokens)/sum(words), NOT the average of per-doc ratios (the "
    "correct corpus aggregate); one map-side-combined pass, |langs| "
    "output rows; fully hash-gated",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (tokens per word) aggregated PER LANGUAGE —
    the cross-lingual equity metric for a shared tokenizer: languages
    whose fertility is high pay more sequence length (and training
    cost) per word (cf. `text_bpe_token_count`, the per-doc view, and
    `tokenizer_vocab_coverage`). Corpus-level = Σtokens/Σwords, which
    weights by document length; averaging per-doc ratios would
    over-weight short docs. Scale shape: the regex counts are codegen
    scan expressions; one map-side-combined aggregation to |langs|
    rows — nothing else moves."""
    from tripl_spark.operators.text import BPE_ISH

    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(
        F.regexp_extract_all("text", F.lit(BPE_ISH), F.lit(0))
    ).cast("long")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return (
        docs.select("lang", n_bpe.alias("b"), n_words.alias("w"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("b").cast("long").alias("n_bpe_tokens"),
            F.sum("w").cast("long").alias("n_words"),
            F.round(F.sum("b") * 1.0 / F.sum("w"), 4).alias("fertility"),
        )
    )


@query(
    "tokenizer_trained_fertility_by_lang",
    oracle=rf"""
    WITH {_BPE2_LEARN_CTES},
    doctok AS (
      SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(replace(replace(term, (SELECT pair FROM m1), chr(1)),
                                   (SELECT pair2 FROM m2), chr(2)))) AS BIGINT)
             AS n_symbols,
           round(sum(length(replace(replace(term, (SELECT pair FROM m1), chr(1)),
                                    (SELECT pair2 FROM m2), chr(2)))) * 1.0
                 / count(*), 4) AS fertility
    FROM doctok GROUP BY lang
    """,
    doc="per-language fertility under the TRAINED tokenizer — "
    "symbols-per-word after applying the corpus-learned BPE merges "
    "(not the BPE-ish regex proxy): learning CTEs shared verbatim "
    "with tokenizer_bpe2_compression, encode = broadcast merge "
    "literals in a map-only replace chain, one combined aggregation "
    "to |langs| rows; fully hash-gated",
)
def tokenizer_trained_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`tokenizer_fertility_by_lang` measures the generic BPE-ish
    regex proxy; THIS is the metric for the tokenizer the corpus
    actually trained (VERDICT r8 item 9): fertility =
    Σ symbols / Σ words per language under the learned merges, so a
    language whose words the merges never fuse shows fertility ≈ mean
    word length while the merge-favored language compresses — the
    cross-lingual-equity readout used to size multilingual vocabs.
    Corpus-level ratio (length-weighted), same discipline as the
    regex twin.

    Scale shape: learning is the MAX_VOCAB-bounded driver loop over
    the vocabulary table (one corpus shuffle for word counts); the
    encode is the broadcast merge literals in a codegen replace chain
    over the token stream; one map-side-combined aggregation to
    |langs| rows. The corpus is scanned twice (learn, encode), never
    shuffled for encoding."""
    docs = load_table(spark, sf_dir, "documents")
    m1, m2s = learned_merge_literals(docs)
    tok = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    enc = _bpe2_encode(F.col("term"), m1, m2s)
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.length(enc)).cast("long").alias("n_symbols"),
        F.round(F.sum(F.length(enc)) * 1.0 / F.count(F.lit(1)), 4).alias(
            "fertility"
        ),
    )
