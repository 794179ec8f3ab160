"""Text-analysis operators for training-data pipelines, over the
``documents`` table: token counting, quality scoring, language ID,
document fingerprinting.

All four are pure ``pyspark.sql.functions`` expression pipelines — no
Python in the row loop, whole-stage-codegen friendly, and shuffle-free
(per-document map work). Each has an exact SQL replica as its DuckDB
oracle, so "correct" means "computes its spec bit-for-bit".

At 100 TB these run as map-only passes over the parquet scan; the only
care needed is column pruning (each reads text + doc_id only — check
ReadSchema) and avoiding regex catastrophes (the patterns here are
linear-time character classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

# language marker words → language tag, checked in deterministic order
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of"]),
    ("fr", ["le", "la", "et"]),
    ("de", ["der", "und", "die"]),
    ("es", ["el", "los", "y"]),
]

STOPWORDS = ["the", "a", "of", "and"]
PUNCT_CLASS = "[.,;:!?]"


def _tokens() -> F.Column:
    return F.split(F.trim(F.col("text")), r"\s+")


def _count_tokens_in(words: list[str]) -> F.Column:
    """# tokens that are one of ``words`` (JVM-side array filter)."""
    import functools

    def is_in(x: F.Column) -> F.Column:
        return functools.reduce(lambda acc, w: acc | (x == w), words[1:], x == words[0])

    return F.size(F.filter(_tokens(), is_in)).cast("long")


@query(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace_chars,
           round(length(regexp_replace(text, '\s+', '', 'g'))
                 * 1.0 / len(string_split_regex(trim(text), '\s+')), 4) AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + mean token length."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    nonspace = F.length(F.regexp_replace("text", r"\s+", "")).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        nonspace.alias("n_nonspace_chars"),
        F.round(nonspace * 1.0 / n_tokens, 4).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stop,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT)
               AS n_punct,
             CAST(length(text) AS BIGINT) AS n_chars_m
      FROM documents
    )
    SELECT doc_id, n_tokens,
           round(n_stop * 1.0 / n_tokens, 4)  AS stopword_ratio,
           round(n_punct * 1.0 / n_chars_m, 4) AS punct_ratio,
           round(0.5 * (n_stop * 1.0 / n_tokens)
                 + 0.3 * (1 - n_punct * 1.0 / n_chars_m)
                 + 0.2 * least(1.0, n_tokens / 100.0), 4) AS quality_score
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: stopword ratio + punctuation ratio +
    length saturation, combined into one score."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens()).cast("long")
    n_stop = _count_tokens_in(STOPWORDS)
    n_punct = (F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))).cast("long")
    n_chars = F.length("text").cast("long")
    stop_ratio = n_stop * 1.0 / n_tokens
    punct_ratio = n_punct * 1.0 / n_chars
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(
            0.5 * stop_ratio + 0.3 * (1 - punct_ratio)
            + 0.2 * F.least(F.lit(1.0), n_tokens / 100.0),
            4,
        ).alias("quality_score"),
    )


def quality_score_expr() -> F.Column:
    """The shared document-quality formula (stopword ratio +
    punctuation ratio + length saturation), 4-dp rounded — exactly
    ``text_quality_score``'s score column, factored out so every
    pipeline stage that filters or ranks on quality uses the one
    definition (and one oracle formula)."""
    n_tokens = F.size(_tokens()).cast("long")
    n_stop = _count_tokens_in(STOPWORDS)
    n_punct = (F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))).cast("long")
    n_chars = F.length("text").cast("long")
    return F.round(
        0.5 * (n_stop * 1.0 / n_tokens)
        + 0.3 * (1 - n_punct * 1.0 / n_chars)
        + 0.2 * F.least(F.lit(1.0), n_tokens / 100.0),
        4,
    )


def quality_score_sql(prefix: str = "") -> str:
    """The quality formula as an inline DuckDB expression over
    ``{prefix}text`` — the SQL twin of ``quality_score_expr``, so
    pipeline oracles interpolate the one formula instead of hand-copied
    blocks."""
    t = f"{prefix}text"
    return (
        f"round(0.5 * (len(list_filter(string_split_regex(trim({t}), '\\s+'),"
        f" x -> x IN ('the', 'a', 'of', 'and'))) * 1.0"
        f" / len(string_split_regex(trim({t}), '\\s+')))"
        f" + 0.3 * (1 - (length({t})"
        f" - length(regexp_replace({t}, '[.,;:!?]', '', 'g'))) * 1.0"
        f" / length({t}))"
        f" + 0.2 * least(1.0, len(string_split_regex(trim({t}), '\\s+')) / 100.0),"
        f" 4)"
    )


def contamination_pairs(
    docs: DataFrame, n: int = 3, min_shared: int = 5
) -> DataFrame:
    """(doc_id, bench_id, n_shared) — training docs (doc_id % 97 != 0)
    sharing >= min_shared distinct word n-grams with the held-out
    benchmark slice (doc_id % 97 == 0). The single definition of the
    contamination stage, shared by the standalone query and the
    decontamination pipeline.

    Grams join as 64-bit hashes, not strings: the broadcast table and
    the probe keys shrink ~4x and hash-compare (collision odds at
    corpus vocab sizes: ~1e-9); the benchmark gram set broadcasts, so
    the training corpus is scanned once and never shuffled."""
    from tripl_spark.operators.dedup import shingle_frame

    grams = shingle_frame(docs, n).select("doc_id", F.xxhash64("g").alias("gh"))
    bench = grams.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "gh"
    )
    train = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(bench), "gh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _lang_oracle() -> str:
    """Generate the DuckDB replica of the marker-count argmax."""
    cnt = {
        lang: f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"x -> x IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in LANG_MARKERS
    }
    cases = []
    for lang, _ in LANG_MARKERS:
        others = [f"{cnt[lang]} >= {cnt[o]}" for o, _ in LANG_MARKERS if o != lang]
        cases.append(f"WHEN {cnt[lang]} > 0 AND {' AND '.join(others)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'unknown' END"
    return f"""
    SELECT doc_id, lang AS actual_lang, {case_sql} AS pred_lang,
           (lang = {case_sql}) AS is_match
    FROM documents
    """


@query("text_lang_id", oracle=_lang_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count per-language marker tokens, argmax
    with deterministic tie order (first language listed wins ties)."""
    docs = load_table(spark, sf_dir, "documents")
    lowered = docs.withColumn("text", F.lower(F.col("text")))
    counts = {lang: _count_tokens_in(words) for lang, words in LANG_MARKERS}
    pred = F.lit("unknown")
    for lang, _ in reversed(LANG_MARKERS):
        others = [counts[o] for o, _ in LANG_MARKERS if o != lang]
        cond = (counts[lang] > 0)
        for o in others:
            cond = cond & (counts[lang] >= o)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    # reversed() + otherwise-chaining makes the FIRST listed language win
    # ties, matching the SQL CASE order.
    return lowered.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        pred.alias("pred_lang"),
        (F.col("lang") == pred).alias("is_match"),
    )


@query(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint: lowercase, collapse whitespace, md5 —
    the exact-dedup key that survives formatting noise."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


@query(
    "text_ngram_contamination",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, greatest(len(t) - 2, 1) + 1)]))
               AS g
      FROM toks
    )
    SELECT tr.doc_id AS doc_id, be.doc_id AS bench_id,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM (SELECT * FROM grams WHERE doc_id % 97 != 0) tr
    JOIN (SELECT * FROM grams WHERE doc_id % 97 = 0) be ON tr.g = be.g
    GROUP BY 1, 2
    HAVING count(*) >= 5
    """,
)
def text_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: which training docs share ≥5
    distinct word 3-grams with a held-out "benchmark" slice (doc_id %
    97 == 0 stands in for the eval set). The benchmark side is tiny by
    construction, so its gram set BROADCASTS and the scan over training
    grams never shuffles the corpus — the shape that matters when the
    training side is 100 TB. Reuses dedup's shingle builder
    (`shingle_frame`), oracled gram-for-gram against DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    return contamination_pairs(docs, n=3, min_shared=5)


@query(
    "text_unigram_logprob",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    freq AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT count(*) AS tt FROM tok)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln(c * 1.0 / tt)) / count(*), 4) AS avg_logprob
    FROM tok JOIN freq USING (term), tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality signal: each document's mean token log-
    probability under the corpus unigram distribution (the cheap
    stand-in for model-perplexity filtering). One explode pass builds
    the token stream; the vocabulary-sized frequency table broadcasts
    back onto it — the corpus is scanned twice, shuffled by token once
    (the frequency groupBy), never shuffled by document."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    # corpus token total as an in-plan broadcast scalar, not a driver
    # .count() at construction time (guide §5) — arithmetic unchanged
    totalf = tok.agg(F.count(F.lit(1)).alias("__tt"))
    return (
        tok.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(totalf))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.log(F.col("c") * 1.0 / F.col("__tt"))) / F.count(F.lit(1)), 4
            ).alias("avg_logprob"),
        )
    )


# GPT-2-style pre-tokenizer, simplified to the subset both Java regex
# (Spark) and RE2 (DuckDB) interpret identically: no lookarounds, no
# unicode property classes. Letter runs, digit runs (BPE-style capped
# at 3), punctuation runs — each optionally space-prefixed.
BPE_ISH = r" ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+"


@query(
    "text_bpe_token_count",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
           round(len(regexp_extract_all(text, '{BPE_ISH}'))
                 * 1.0 / len(string_split_regex(trim(text), '\s+')), 4)
             AS tokens_per_word
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-style pre-tokenizer regex (letter
    runs / capped digit runs / punctuation runs, space-absorbing) next
    to the whitespace word count — the tokens-per-word ratio is the
    standard cost estimator for LLM training data. Pure codegen regex,
    no tokenizer library, and the pattern is restricted to the
    Java-regex ∩ RE2 subset so the oracle is exact."""
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_ISH), F.lit(0))).cast("long")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_words.alias("n_words"),
        F.round(n_bpe * 1.0 / n_words, 4).alias("tokens_per_word"),
    )


BIGRAM_ALPHA = 0.5  # add-k smoothing constant

# Shared CTE chain ending in `{p}scored` = (doc_id, n_bigrams,
# avg_logprob): the corpus bigram LM replayed in SQL — reused by the
# text_bigram_logprob oracle, the CCNet-style perplexity-bucketing
# pipeline oracle below, and (prefixed, to avoid CTE-name collisions
# with the k-means chain) the full-curation pipeline oracle.
def bigram_scored_ctes(p: str = "") -> str:
    return rf"""
    {p}toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    {p}big AS (
      SELECT doc_id,
             unnest([ t[i] || ' ' || t[i+1] for i in range(1, len(t)) ]) AS bg
      FROM {p}toks
    ),
    {p}uni AS (
      SELECT unnest(t) AS term FROM {p}toks
    ),
    {p}c1 AS (SELECT term, count(*) AS c FROM {p}uni GROUP BY term),
    {p}c2 AS (SELECT bg, count(*) AS c FROM {p}big GROUP BY bg),
    {p}v AS (SELECT count(DISTINCT term) AS vsz FROM {p}uni),
    {p}scored AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(sum(ln(({p}c2.c + {BIGRAM_ALPHA})
                          / ({p}c1.c + {BIGRAM_ALPHA} * {p}v.vsz))) / count(*), 4)
               + 0.0 AS avg_logprob
      FROM {p}big
      JOIN {p}c2 USING (bg)
      JOIN {p}c1 ON {p}c1.term = string_split({p}big.bg, ' ')[1]
      CROSS JOIN {p}v
      GROUP BY doc_id
    )"""


BIGRAM_SCORED_CTES = bigram_scored_ctes()


def bigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — each document's mean add-k
    bigram log-likelihood under the corpus LM; the Spark twin of the
    ``scored`` relation in ``BIGRAM_SCORED_CTES``. Scale shape is in
    the ``text_bigram_logprob`` docstring (both count tables broadcast
    back onto the bigram stream)."""
    toks = docs.select("doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
    # guard: sequence(0, -1) runs DESCENDING in Spark, so a 1-token doc
    # would fabricate bigrams; DuckDB's range(1, 1) is empty
    big = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")
        ).alias("bg"),
    )
    uni = toks.select(F.explode("t").alias("term"))
    c1 = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    # the vocabulary size stays IN-PLAN as a broadcast 1-row frame (a
    # scalar-subquery shape) instead of a blocking driver .first() —
    # the old form ran a full tokenize+distinct job at DataFrame
    # CONSTRUCTION time, before the real query even started, in every
    # pipeline composing this LM (guide §5: the driver does no data
    # work; same treatment pagerank's dangling mass already got). The
    # arithmetic is unchanged: c1 + 0.5 * vsz in double either way.
    vszf = uni.agg(F.countDistinct("term").alias("__vsz"))
    prev = F.split(F.col("bg"), " ")[0]
    return (
        big.join(F.broadcast(c2), "bg")
        .withColumn("term", prev)
        .join(F.broadcast(c1), "term")
        .crossJoin(F.broadcast(vszf))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.round(
                F.sum(F.log((F.col("c2") + BIGRAM_ALPHA)
                            / (F.col("c1") + BIGRAM_ALPHA * F.col("__vsz"))))
                / F.count(F.lit(1)),
                4,
            ) + F.lit(0.0)).alias("avg_logprob"),
        )
    )


@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH {BIGRAM_SCORED_CTES}
    SELECT doc_id, n_bigrams, avg_logprob FROM scored
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM quality signal with add-k smoothing: each
    document's mean log p(w2 | w1) where p = (c(w1 w2) + a) /
    (c(w1) + a*V) over corpus counts — one step up the n-gram ladder
    from ``text_unigram_logprob`` and the cheap stand-in for
    perplexity-based filtering (CCNet-style).

    Shuffle shape at 100 TB: the bigram stream shuffles once to count
    bigrams and once per doc-aggregation; both count tables broadcast
    back onto the stream (vocabulary-sized, not corpus-sized). Docs
    with fewer than two tokens produce no bigrams and drop out on
    both engines."""
    return bigram_logprob_scores(load_table(spark, sf_dir, "documents"))


PPL_KEEP_BUCKETS = 2  # CCNet keeps head+middle, drops the tail third


@query(
    "pipeline_perplexity_buckets",
    # The scored relation is the gated bigram LM; bucketing is ntile(3)
    # per lang over (avg_logprob DESC, doc_id) — pure rank arithmetic,
    # identical on both engines (no float percentile interpolation to
    # diverge), with the 4-dp-rounded score making the order itself
    # engine-stable.
    oracle=f"""
    WITH {BIGRAM_SCORED_CTES},
    lbl AS (
      SELECT s.doc_id, d.lang, s.avg_logprob,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.avg_logprob DESC, s.doc_id) AS ppl_bucket
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, avg_logprob, CAST(ppl_bucket AS INT) AS ppl_bucket
    FROM lbl WHERE ppl_bucket <= {PPL_KEEP_BUCKETS}
    """,
    doc="CCNet-style perplexity bucketing: per-lang head/middle/tail "
    "thirds by bigram-LM score, tail dropped — fully hash-gated "
    "(LM training + scoring + bucketing in SQL)",
)
def pipeline_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based corpus filtering a la CCNet (Wenzek et al. 2020,
    arXiv:1911.00359): score every document under the corpus bigram
    LM, split each language into head/middle/tail thirds by score
    (ntile — best scores land in bucket 1), and keep head+middle.
    The standard pre-training cleanup step between dedup and mixing:
    the tail third is where boilerplate/garbled text concentrates.

    Scale shape: scoring is ``bigram_logprob_scores`` (count tables
    broadcast; the corpus never shuffles by doc for scoring); the
    per-lang ntile window shuffles only (doc_id, lang, score) rows,
    not text. ntile needs a global per-lang sort — at 100 TB with few
    languages that serializes the dominant language through one task,
    so the PRODUCTION path is ``pipeline_perplexity_bycutoff`` below
    (sampled score cutoffs broadcast into a scan-side bucket
    assignment — the CCNet paper's own approach; probe-measured flat
    vs this query's linear single-task growth, SCALE.md r7). The
    exact ntile stays registered because it is engine-reproducible
    rank arithmetic with no float-percentile interpolation to
    diverge — the oracle shape of the twin pair, with the agreement
    bound pinned in tests/test_ppl_cutoff.py."""
    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_logprob_scores(docs)
    lbl = scored.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
    return (
        lbl.select(
            "doc_id", "lang", "avg_logprob",
            F.ntile(3).over(w).alias("ppl_bucket"),
        )
        .filter(F.col("ppl_bucket") <= PPL_KEEP_BUCKETS)
    )


# ---------------------------------------------------------------------------
# Broadcast-cutoff bucketing — the PRODUCTION twin of the exact ntile
# ---------------------------------------------------------------------------
#
# ntile(3) OVER (PARTITION BY lang ...) puts a whole language through ONE
# sort task: at 100 TB a dominant web-corpus language (50-70% of docs) is
# billions of rows on one executor — the skewed-key window scale-killer.
# CCNet itself (Wenzek et al. 2020 §3.2) derives per-lang perplexity
# cutoffs from a SAMPLE and assigns buckets scan-side; this twin does the
# same with every step deterministic and SQL-replicable, so unlike a
# percentile_approx sketch it stays driver-hash-gatable:
#
#   1. md5-hash sample of (doc_id, lang, score) stubs — a scan filter;
#   2. hash-order cap of PPL_SAMPLE_CAP stubs per lang (stratum_quota —
#      WindowGroupLimit PARTIAL pushdown ships <= cap rows per lang per
#      map task, so the capping window never sees a skewed partition);
#   3. exact tercile ranks WITHIN the <= cap-row per-lang sample;
#   4. the <= |langs| cutoff rows broadcast; the corpus-sized relation
#      only ever passes a broadcast join + a CASE expression.
#
# Window work is bounded by cap x |langs| at ANY corpus size; rank error
# vs the exact ntile is O(1/sqrt(cap)) per boundary (the agreement bound
# test pins it empirically).

PPL_SAMPLE_PCT = 50   # md5-bucket stub sample rate (percent)
PPL_SAMPLE_CAP = 400  # max sampled stubs per lang feeding the cutoff rank


def perplexity_cutoffs(
    lbl: DataFrame, sample_pct: int = PPL_SAMPLE_PCT, cap: int = PPL_SAMPLE_CAP
) -> DataFrame:
    """Per-lang (c_hi, c_lo) score cutoffs at the sample's tercile
    ranks. Input needs (doc_id, lang, avg_logprob); output is one row
    per sampled lang — broadcast it into ``assign_ppl_buckets``."""
    from tripl_spark.operators.curation import deterministic_sample, stratum_quota

    samp = deterministic_sample(lbl.select("doc_id", "lang", "avg_logprob"),
                                "doc_id", sample_pct)
    capped = stratum_quota(samp, ["lang"], "doc_id", cap).drop("rk")
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
    ranked = capped.select(
        "lang", "avg_logprob",
        F.row_number().over(w).alias("srn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("sn"),
    )
    return ranked.groupBy("lang").agg(
        F.min(F.when(F.col("srn") == F.ceil(F.col("sn") / 3.0),
                     F.col("avg_logprob"))).alias("c_hi"),
        F.min(F.when(F.col("srn") == F.ceil(F.col("sn") * 2 / 3.0),
                     F.col("avg_logprob"))).alias("c_lo"),
    )


def assign_ppl_buckets(lbl: DataFrame, cuts: DataFrame) -> DataFrame:
    """Scan-side bucket assignment from broadcast cutoffs: 1 = head
    (score >= c_hi), 2 = middle, 3 = tail. A lang absent from the
    sample keeps everything (bucket 1) — low-resource languages are
    never tail-dropped on no evidence. Extra input columns pass
    through."""
    bucket = (
        F.when(F.col("c_hi").isNull(), F.lit(1))
        .when(F.col("avg_logprob") >= F.col("c_hi"), F.lit(1))
        .when(F.col("avg_logprob") >= F.col("c_lo"), F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        lbl.join(F.broadcast(cuts), "lang", "left")
        .withColumn("ppl_bucket", bucket)
        .drop("c_hi", "c_lo")
    )


def ppl_cutoff_sql(p: str = "") -> str:
    """The cutoff chain as CTEs over an existing ``{p}lbl(doc_id,
    lang, avg_logprob)`` CTE — exact SQL replica of
    ``perplexity_cutoffs`` (md5 sample ≡ deterministic_sample,
    hash-order cap ≡ stratum_quota, tercile ranks, group to one row
    per lang). Shared by every oracle that gates the twin."""
    h = "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
    return f"""
    {p}samp AS (
      SELECT doc_id, lang, avg_logprob, {h} AS h
      FROM {p}lbl
      WHERE {h} % 100 < {PPL_SAMPLE_PCT}
    ),
    {p}kept AS (
      SELECT doc_id, lang, avg_logprob
      FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                         ORDER BY h, doc_id) AS qrk
            FROM {p}samp)
      WHERE qrk <= {PPL_SAMPLE_CAP}
    ),
    {p}ranked AS (
      SELECT lang, avg_logprob,
             row_number() OVER (PARTITION BY lang
                                ORDER BY avg_logprob DESC, doc_id) AS srn,
             count(*) OVER (PARTITION BY lang) AS sn
      FROM {p}kept
    ),
    {p}cuts AS (
      SELECT lang,
             min(CASE WHEN srn = CAST(ceil(sn / 3.0) AS BIGINT)
                      THEN avg_logprob END) AS c_hi,
             min(CASE WHEN srn = CAST(ceil(sn * 2 / 3.0) AS BIGINT)
                      THEN avg_logprob END) AS c_lo
      FROM {p}ranked GROUP BY lang
    )"""


def ppl_bucket_case(l: str, c: str) -> str:
    """The scan-side CASE assigning a bucket from joined cutoffs."""
    return (
        f"CASE WHEN {c}.c_hi IS NULL THEN 1 "
        f"WHEN {l}.avg_logprob >= {c}.c_hi THEN 1 "
        f"WHEN {l}.avg_logprob >= {c}.c_lo THEN 2 ELSE 3 END"
    )


@query(
    "pipeline_perplexity_bycutoff",
    oracle=f"""
    WITH {BIGRAM_SCORED_CTES},
    lbl AS (
      SELECT s.doc_id, d.lang, s.avg_logprob
      FROM scored s JOIN documents d USING (doc_id)
    ),
    {ppl_cutoff_sql()}
    SELECT doc_id, lang, avg_logprob, CAST(ppl_bucket AS INT) AS ppl_bucket
    FROM (
      SELECT l.doc_id, l.lang, l.avg_logprob,
             {ppl_bucket_case('l', 'c')} AS ppl_bucket
      FROM lbl l LEFT JOIN cuts c ON l.lang = c.lang
    ) WHERE ppl_bucket <= {PPL_KEEP_BUCKETS}
    """,
    doc="CCNet perplexity bucketing, PRODUCTION shape: per-lang tercile "
    "cutoffs from a capped deterministic sample, broadcast into a "
    "scan-side bucket CASE — no per-lang window over the corpus; "
    "fully hash-gated (sample, cap, cutoffs and assignment in SQL)",
)
def pipeline_perplexity_bycutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production twin of ``pipeline_perplexity_buckets``: same
    head+middle keep-set contract, but bucket boundaries come from a
    bounded per-lang sample instead of an exact per-lang ntile sort —
    the shape that survives a dominant language at 100 TB (see the
    module comment above ``perplexity_cutoffs``). Both are registered:
    the exact ntile is the reproducible rank-arithmetic oracle, this
    is what a cluster actually runs; the agreement-bound test pins how
    far the two may drift."""
    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_logprob_scores(docs)
    lbl = scored.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "avg_logprob"
    )
    cuts = perplexity_cutoffs(lbl)
    return (
        assign_ppl_buckets(lbl, cuts)
        .filter(F.col("ppl_bucket") <= PPL_KEEP_BUCKETS)
        .select("doc_id", "lang", "avg_logprob", "ppl_bucket")
    )


ZIPF_TOP = 200  # fit over the top-K terms (the power-law head)


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH counts AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
            FROM documents)
      GROUP BY term
    ),
    top AS (SELECT term, c FROM counts ORDER BY c DESC, term LIMIT {ZIPF_TOP}),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk FROM top
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(c), ln(rk)), 4) + 0.0 AS zipf_slope,
           round(regr_r2(ln(c), ln(rk)), 4) AS r2
    FROM ranked
    """,
    doc=f"Zipf's-law fit over the corpus frequency head: OLS slope of "
    f"ln(freq) on ln(rank) for the top-{ZIPF_TOP} terms (a natural "
    "corpus should fit ~ -1) — term counts in one shuffle, head via "
    "TakeOrdered, regression over the bounded head; fully hash-gated",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic corpus-health statistic: natural language follows
    Zipf's law (freq ∝ rank^-s with s ≈ 1), and a corpus whose fitted
    slope or R² deviates hard usually means boilerplate flooding
    (slope flattens: many near-equal-frequency template terms) or
    deduplication failure — the diagnostic Rae et al. (Gopher) and
    kin run next to the quality filters. Fit is OLS of ln(c) on
    ln(rank) over the top-{ZIPF_TOP} head, both engines' regr_slope /
    regr_r2 over the identical integer counts.

    Scale shape: ONE term-count shuffle (map-side combined); the head
    selection is TakeOrderedAndProject (per-partition heaps, never a
    global sort of the vocabulary); the rank window and the regression
    see exactly {ZIPF_TOP} rows."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), "term").limit(ZIPF_TOP)
    ranked = top.select(
        "c", F.row_number().over(Window.orderBy(F.col("c").desc(), "term")).alias("rk")
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        (F.round(F.regr_slope(F.log("c"), F.log("rk")), 4) + F.lit(0.0)).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("c"), F.log("rk")), 4).alias("r2"),
    )


@query(
    "text_ttr_by_source",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT term) AS BIGINT) AS n_types,
           round(count(DISTINCT term) * 1.0 / count(*), 4) AS ttr
    FROM toks
    GROUP BY source
    """,
    doc="lexical diversity per source: type-token ratio (distinct "
    "terms / total terms) — boilerplate-heavy sources read low; one "
    "token shuffle with partial distinct aggregation; hash-gated",
)
def text_ttr_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per source — the quick lexical-diversity
    screen next to the Zipf fit (`text_zipf_fit`): template-flooded or
    under-deduplicated sources score low TTR because the same tokens
    repeat; a source whose TTR collapses between snapshots regressed.

    Scale shape: tokens explode map-side; count(distinct term) per
    source is Spark's standard two-phase distinct aggregate (partial
    distinct per partition before the shuffle), so the one shuffle
    carries (source, term) pairs — never raw text. NOTE the usual TTR
    caveat applies across corpus sizes (TTR falls with corpus length
    by construction); the comparison this query supports is
    between sources within one corpus snapshot."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types"),
        F.round(F.countDistinct("term") * 1.0 / F.count(F.lit(1)), 4).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# Gopher-style rule filter (Rae et al. 2021, published heuristics)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MIN_ALPHA = 0.8  # fraction of words containing a letter
GOPHER_MAX_SYMBOL = 0.1  # (#'#' + #'...') per word
GOPHER_MIN_STOP = 2  # distinct-occurrence stop-word floor


_GOPHER_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_words,
             length(regexp_replace(text, '\s+', '', 'g')) AS n_ch,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> regexp_matches(x, '[A-Za-z]')))
                  AS BIGINT) AS n_alpha,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3.0 AS n_ell,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x IN ('the', 'a', 'of', 'and')))
                  AS BIGINT) AS n_stopwords
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_words,
             round(n_ch * 1.0 / n_words, 4) AS mean_word_len,
             round(n_alpha * 1.0 / n_words, 4) AS alpha_word_ratio,
             round((n_hash + n_ell) / n_words, 4) AS symbol_ratio,
             n_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, symbol_ratio,
           n_stopwords,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
             AS wc_ok,
           (mean_word_len >= {GOPHER_MIN_MWL}
            AND mean_word_len <= {GOPHER_MAX_MWL}) AS mwl_ok,
           (alpha_word_ratio >= {GOPHER_MIN_ALPHA}) AS alpha_ok,
           (symbol_ratio <= {GOPHER_MAX_SYMBOL}) AS symbol_ok,
           (n_stopwords >= {GOPHER_MIN_STOP}) AS stop_ok,
           ((n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
            AND mean_word_len >= {GOPHER_MIN_MWL}
            AND mean_word_len <= {GOPHER_MAX_MWL}
            AND alpha_word_ratio >= {GOPHER_MIN_ALPHA}
            AND symbol_ratio <= {GOPHER_MAX_SYMBOL}
            AND n_stopwords >= {GOPHER_MIN_STOP}) AS passes
    FROM r
    """


@query(
    "text_gopher_rules",
    oracle=_GOPHER_ORACLE,
    doc="Gopher-style rule-based quality filter (word-count bounds, "
    "mean word length, alphabetic-word ratio, symbol ratio, stop-word "
    "floor) with per-rule flags + the combined pass verdict — the "
    "published heuristic battery; pure scan expressions, fully "
    "hash-gated (every flag computed from 4-dp-rounded ratios on "
    "both engines)",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher corpus-filter rule battery (Rae et al. 2021 §A1.1):
    unlike `text_quality_score`'s single blended score, production
    filters want per-RULE diagnostics — which rule killed a document
    drives both threshold tuning and per-source health dashboards
    (`curation` composes on `passes`; the flags are the observability
    columns). Every ratio is rounded to 4 dp BEFORE its threshold
    comparison so the boolean can never flip between engines on a
    last-bit double difference.

    Scale shape: pure codegen scan expressions over `text` — no
    shuffle, no UDF; the flags add nothing to the one corpus pass the
    quality score already costs."""
    return gopher_flag_frame(load_table(spark, sf_dir, "documents"))


def gopher_flag_frame(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """The per-document rule battery as a reusable projection — the
    registered query and the streaming quality monitor
    (`streaming/quality_stream.py`) share THIS definition so the
    maintained scorecard can never drift from the oracled flags.
    ``keep`` passes extra doc columns (e.g. source/lang) through."""
    toks = _tokens()
    n_words = F.size(toks).cast("long")
    mean_wl = F.round(
        F.length(F.regexp_replace("text", r"\s+", "")) * 1.0 / n_words, 4
    )
    alpha_ratio = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) * 1.0 / n_words,
        4,
    )
    n_hash = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("#"), F.lit(""))
    )
    n_ell = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    ) / 3.0
    symbol_ratio = F.round((n_hash + n_ell) / n_words, 4)
    n_stop = _count_tokens_in(STOPWORDS)
    base = docs.select(
        "doc_id",
        *keep,
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        symbol_ratio.alias("symbol_ratio"),
        n_stop.alias("n_stopwords"),
    )
    wc_ok = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    mwl_ok = (F.col("mean_word_len") >= GOPHER_MIN_MWL) & (
        F.col("mean_word_len") <= GOPHER_MAX_MWL
    )
    alpha_ok = F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA
    symbol_ok = F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL
    stop_ok = F.col("n_stopwords") >= GOPHER_MIN_STOP
    return base.select(
        "*",
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        alpha_ok.alias("alpha_ok"),
        symbol_ok.alias("symbol_ok"),
        stop_ok.alias("stop_ok"),
        (wc_ok & mwl_ok & alpha_ok & symbol_ok & stop_ok).alias("passes"),
    )


# THE battery precedence order — a document's drop reason is its FIRST
# failing rule in this order. One definition, shared by the batch drop
# ledger (`pipeline_drop_ledger`) and the streaming quality monitor's
# drop counters (`streaming/quality_stream.py`), so the two ledgers
# cannot disagree on why a document was dropped.
GOPHER_RULE_ORDER = ("wc_ok", "mwl_ok", "alpha_ok", "symbol_ok", "stop_ok")


def first_failing_rule() -> F.Column:
    """'rule_wc' / 'rule_mwl' / … for the first rule (battery order)
    a document fails over `gopher_flag_frame` columns; NULL when every
    rule passes."""
    expr = F.lit(None).cast("string")
    for r in reversed(GOPHER_RULE_ORDER):
        expr = F.when(~F.col(r), F.lit(f"rule_{r[:-3]}")).otherwise(expr)
    return expr


@query(
    "curation_gopher_scorecard",
    oracle=f"""
    WITH g AS ({_GOPHER_ORACLE})
    SELECT d.source, d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CASE WHEN g.passes THEN 1.0 ELSE 0.0 END), 4)
             AS pass_rate,
           round(avg(CASE WHEN g.wc_ok THEN 0.0 ELSE 1.0 END), 4)
             AS fail_wc,
           round(avg(CASE WHEN g.mwl_ok THEN 0.0 ELSE 1.0 END), 4)
             AS fail_mwl,
           round(avg(CASE WHEN g.alpha_ok THEN 0.0 ELSE 1.0 END), 4)
             AS fail_alpha,
           round(avg(CASE WHEN g.symbol_ok THEN 0.0 ELSE 1.0 END), 4)
             AS fail_symbol,
           round(avg(CASE WHEN g.stop_ok THEN 0.0 ELSE 1.0 END), 4)
             AS fail_stop
    FROM g JOIN documents d USING (doc_id)
    GROUP BY d.source, d.lang
    """,
    doc="per-(source, lang) Gopher scorecard: pass rate + per-rule "
    "failure rates over the rule battery — the corpus-health "
    "dashboard a filtering rollout is tuned against; one groupBy to "
    "|sources|x|langs| rows; fully hash-gated",
)
def curation_gopher_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observability rollup over `text_gopher_rules`: per
    (source, lang) stratum, what fraction passes and WHICH rule kills
    the failures — the view that tells you a crawl source regressed
    on symbol ratio vs a language the stop-word list simply doesn't
    cover (tune per-lang stop lists before dropping a language's
    corpus). Scale shape: the rule battery is the scan pass; this
    adds one doc_id-keyed join back to (source, lang) and one
    map-side-combined aggregation to strata-count rows."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    g = text_gopher_rules(spark, sf_dir)

    def fail_rate(c: str) -> F.Column:
        return F.round(
            F.avg(F.when(F.col(c), F.lit(0.0)).otherwise(F.lit(1.0))), 4
        )

    return (
        g.join(docs, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.avg(F.when(F.col("passes"), F.lit(1.0)).otherwise(F.lit(0.0))),
                4,
            ).alias("pass_rate"),
            fail_rate("wc_ok").alias("fail_wc"),
            fail_rate("mwl_ok").alias("fail_mwl"),
            fail_rate("alpha_ok").alias("fail_alpha"),
            fail_rate("symbol_ok").alias("fail_symbol"),
            fail_rate("stop_ok").alias("fail_stop"),
        )
    )


# ---------------------------------------------------------------------------
# Encoding-damage (mojibake) scan — the CCNet-style garbage-page signal
# ---------------------------------------------------------------------------

# Shared verbatim between engines (module-docstring pattern dialect):
# U+FFFD replacement chars (a decoder already gave up), C0 control
# chars that survive no sane text pipeline (tab/newline/CR excluded),
# and the UTF-8-decoded-as-cp1252 double-encoding digraphs, as a
# concrete alternation (no unicode ranges — zero dialect risk).
#
# The digraph table (widened r15 from 7 to the fuller Latin-1 +
# Windows-1252-punctuation set) is DERIVED from the clean target
# characters: each mojibake form is exactly
# target.encode('utf-8').decode('cp1252') — generating instead of
# hand-typing removes transcription risk on lookalike bytes. Targets
# whose mojibake would contain an INVISIBLE second byte are excluded
# on purpose: à→'Ã'+NBSP and í→'Ã'+SOFT HYPHEN can't ride a literal
# alternation embedded in SQL safely, and Á/” hit cp1252-undefined
# bytes (so real decoders never produce those digraphs at all). No
# alternative is a prefix of another (Ã-/Â-family length 2 with
# distinct second chars, â€-family length 3 with distinct third), so
# leftmost-first vs leftmost-longest engines agree.
_DOUBLE_ENC_TARGETS = "éèêëáâäãîïóôõöúûüçñßÉÈÊÀÄÖÜÇ’‘“–—…«»°"
_DOUBLE_ENC_DIGRAPHS: tuple[str, ...] = tuple(
    ch.encode("utf-8").decode("cp1252") for ch in _DOUBLE_ENC_TARGETS
)
MOJIBAKE_PATTERNS: list[tuple[str, str]] = [
    ("replacement", "�"),
    ("ctrl", r"[\x00-\x08\x0B\x0C\x0E-\x1F]"),
    ("double_enc", "|".join(_DOUBLE_ENC_DIGRAPHS)),
]

# Deterministic damage planting from doc_id (the corpus is clean ASCII
# word-salad): printable digraphs ride shared Python constants embedded
# in both engines; the unprintable classes pair python escapes with
# chr() of the same codepoints in SQL.
_MOJI_DOUBLE_SNIPPET = " cafÃ© â€œquoteâ€“"  # 3 double-enc hits


def _mojibake_text() -> F.Column:
    # coalesce BEFORE the concat: F.concat is NULL-propagating, so a
    # NULL text row would otherwise turn every per-class count into
    # size(NULL) = -1 and the clean bit into NULL (ADVICE r13) —
    # unreachable on the planted corpus but a trap on raw documents.
    # The rotating branch (doc_id % 3 == 0) plants exactly ONE digraph
    # chosen round-robin from the full table, so EVERY alternation
    # member fires somewhere in the corpus (coverage pinned in
    # tests/test_mojibake.py) — a digraph the pattern missed would
    # flip that doc's counts and the hash.
    did = F.col("doc_id")
    rot = F.element_at(
        F.array(*[F.lit(d) for d in _DOUBLE_ENC_DIGRAPHS]),
        (F.expr("doc_id div 3") % len(_DOUBLE_ENC_DIGRAPHS) + 1).cast("int"),
    )
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(did % 4 == 1, F.lit(_MOJI_DOUBLE_SNIPPET)).otherwise(F.lit("")),
        F.when(did % 5 == 2, F.lit(" bad�byte")).otherwise(F.lit("")),
        F.when(did % 6 == 3, F.lit(" ding\x07dong")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.concat(F.lit(" mix "), rot)).otherwise(F.lit("")),
    )


_MOJI_ROT_SQL = (
    "(["
    + ", ".join(f"'{d}'" for d in _DOUBLE_ENC_DIGRAPHS)
    + f"])[(doc_id // 3) % {len(_DOUBLE_ENC_DIGRAPHS)} + 1]"
)

_MOJI_ENRICH_SQL = f"""COALESCE(text, '')
      || CASE WHEN doc_id % 4 = 1 THEN '{_MOJI_DOUBLE_SNIPPET}' ELSE '' END
      || CASE WHEN doc_id % 5 = 2 THEN ' bad' || chr(65533) || 'byte' ELSE '' END
      || CASE WHEN doc_id % 6 = 3 THEN ' ding' || chr(7) || 'dong' ELSE '' END
      || CASE WHEN doc_id % 3 = 0 THEN ' mix ' || {_MOJI_ROT_SQL} ELSE '' END"""


@query(
    "text_mojibake_scan",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_MOJI_ENRICH_SQL} AS mt FROM documents)
    SELECT doc_id,
           {", ".join(
               f"CAST(len(regexp_extract_all(mt, '{pat}')) AS BIGINT) AS n_{name}"
               for name, pat in MOJIBAKE_PATTERNS)},
           CAST({" + ".join(
               f"len(regexp_extract_all(mt, '{pat}'))"
               for _, pat in MOJIBAKE_PATTERNS)} AS BIGINT) AS n_mojibake,
           ({" AND ".join(
               f"len(regexp_extract_all(mt, '{pat}')) = 0"
               for _, pat in MOJIBAKE_PATTERNS)}) AS clean
    FROM t
    """,
    doc="Encoding-damage scan over deterministically planted mojibake: "
    "per-class counts of U+FFFD replacement chars, stray C0 control "
    "chars, and UTF-8-as-Latin-1 double-encoding digraphs, plus a "
    "clean certificate — the CCNet-style garbage-page drop signal, "
    "fully hash-gated (patterns shared verbatim between engines)",
)
def text_mojibake_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only, zero shuffle: one scan with JVM regex counts inside
    codegen — the same cost class as the PII scrub. A page whose
    decoder emitted U+FFFD, whose bytes carry raw control chars, or
    whose text was UTF-8 decoded as Latin-1 ('cafÃ©') is encoding
    garbage a quality classifier never reliably recovers; pipelines
    drop or re-decode on these counts before any other filter runs."""
    docs = load_table(spark, sf_dir, "documents")
    mt = _mojibake_text()
    counts = [
        F.size(F.regexp_extract_all(mt, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in MOJIBAKE_PATTERNS
    ]
    scanned = docs.select("doc_id", *counts)
    total = None
    clean = None
    for name, _ in MOJIBAKE_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
        z = c == 0
        clean = z if clean is None else (clean & z)
    return scanned.select(
        "doc_id",
        *[f"n_{name}" for name, _ in MOJIBAKE_PATTERNS],
        total.cast("long").alias("n_mojibake"),
        clean.alias("clean"),
    )


def mojibake_prevalence_partials(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, lang, n_docs, docs_damaged, n_<class>...) long counters
    for one slice of documents — the ONE rollup definition shared by
    the registered batch query (`text_mojibake_prevalence`) and the
    streaming monitor (`streaming/mojibake_stream.py`), so the two
    surfaces cannot drift. NULL text coalesces to '' (0 per class)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    per_doc = docs.select(
        "source",
        "lang",
        *[
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
            for name, pat in MOJIBAKE_PATTERNS
        ],
    )
    total = None
    for name, _ in MOJIBAKE_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    return (
        per_doc.withColumn("__any", (total > 0).cast("long"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__any").cast("long").alias("docs_damaged"),
            *[
                F.sum(f"n_{name}").cast("long").alias(f"n_{name}")
                for name, _ in MOJIBAKE_PATTERNS
            ],
        )
    )


_MOJI_COUNT_COLS = [f"n_{name}" for name, _ in MOJIBAKE_PATTERNS]
_MOJI_SUM_SQL = " + ".join(
    f"len(regexp_extract_all(mt, '{pat}'))" for _, pat in MOJIBAKE_PATTERNS
)


@query(
    "text_mojibake_prevalence",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, lang, {_MOJI_ENRICH_SQL} AS mt
               FROM documents)
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN {_MOJI_SUM_SQL} > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_damaged,
           {", ".join(
               f"CAST(sum(len(regexp_extract_all(mt, '{pat}'))) AS BIGINT)"
               f" AS n_{name}"
               for name, pat in MOJIBAKE_PATTERNS)},
           round(sum(CASE WHEN {_MOJI_SUM_SQL} > 0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) + 0.0 AS damage_rate
    FROM t
    GROUP BY source, lang
    ORDER BY source, lang
    """,
    doc="Encoding-damage prevalence scorecard per (source, lang): docs "
    "touched, per-class totals, and the damage rate — the monitoring "
    "rollup over the mojibake scan definition; fully hash-gated",
)
def text_mojibake_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-table rollup of the encoding-damage signals:
    |sources|x|langs| rows, partial-aggregated map-side — the shape the
    streaming monitor maintains, so a crawl source whose decoder starts
    emitting garbage pages on a per-batch counter, not a nightly
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select("source", "lang", _mojibake_text().alias("text"))
    return (
        mojibake_prevalence_partials(enriched)
        .withColumn(
            "damage_rate",
            F.round(F.col("docs_damaged") * 1.0 / F.col("n_docs"), 4)
            + F.lit(0.0),
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# Unicode normalization scan (r14): the canonicalization pass that runs
# BEFORE any dedup or fingerprint — two byte-different spellings of the
# same text ('café' composed vs 'cafe' + combining acute, CRLF vs LF,
# NBSP vs space) must not defeat exact-hash dedup or split n-gram
# statistics. The line-ending and NBSP repairs are JVM regexp_replace
# (codegen, map-only); NFC composition has no Spark built-in, so it is
# the package's canonical example of the SANCTIONED Python escape
# hatch: an Arrow-batched pandas UDF (ArrowEvalPython in the plan —
# never row-at-a-time BatchEvalPython), oracled against DuckDB's
# native nfc_normalize so the two NFC implementations pin each other.
# The corpus is clean ASCII, so damage is PLANTED deterministically
# from doc_id (the mojibake/PII pattern) — combining accents, CRLF,
# NBSP — identically in both engines.

_NORM_COMBINING = " cafe\u0301 blase\u0301"  # NFC composes to café blasé


def _nonnfc_text() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(did % 4 == 1, F.lit(_NORM_COMBINING)).otherwise(F.lit("")),
        F.when(did % 5 == 2, F.lit(" line1\r\nline2")).otherwise(F.lit("")),
        F.when(did % 6 == 3, F.lit(" a\u00a0b")).otherwise(F.lit("")),
    )


_NORM_ENRICH_SQL = """COALESCE(text, '')
      || CASE WHEN doc_id % 4 = 1
              THEN ' cafe' || chr(769) || ' blase' || chr(769) ELSE '' END
      || CASE WHEN doc_id % 5 = 2
              THEN ' line1' || chr(13) || chr(10) || 'line2' ELSE '' END
      || CASE WHEN doc_id % 6 = 3
              THEN ' a' || chr(160) || 'b' ELSE '' END"""


def normalize_text(text: F.Column) -> F.Column:
    """CRLF→LF and NBSP→space JVM-side, then NFC composition via an
    Arrow-batched pandas UDF (unicodedata.normalize — the reference
    Python NFC, pinned to DuckDB's nfc_normalize by the driver hash
    gate on `text_normalize_scan`)."""
    # pandas is needed only when the UDF is actually built \u2014 importing
    # it here (next to the lazy pandas_udf import) keeps operators.text,
    # and therefore the whole query registry and CLI, importable
    # without pandas (ADVICE r14). pandas_udf resolves type hints at
    # definition time against the function's MODULE globals, where a
    # locally-imported pd doesn't exist (and `from __future__ import
    # annotations` stringifies inline hints anyway) \u2014 so the hints are
    # attached as real class objects instead of annotations syntax.
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    repaired = F.regexp_replace(
        F.regexp_replace(text, "\r\n", "\n"), "\u00a0", " "
    )

    def _nfc_fn(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    _nfc_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = pandas_udf(_nfc_fn, T.StringType())
    return _nfc(repaired)


@query(
    "text_normalize_scan",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NORM_ENRICH_SQL} AS mt FROM documents),
    n AS (SELECT doc_id, mt,
                 nfc_normalize(replace(replace(mt, chr(13) || chr(10),
                     chr(10)), chr(160), ' ')) AS norm
          FROM t)
    SELECT doc_id,
           CAST(len(mt) AS BIGINT) AS n_chars_raw,
           CAST(len(norm) AS BIGINT) AS n_chars_norm,
           CAST(len(regexp_extract_all(mt, chr(13) || chr(10))) AS BIGINT)
             AS n_crlf,
           CAST(len(regexp_extract_all(mt, chr(160))) AS BIGINT) AS n_nbsp,
           (norm <> mt) AS changed,
           md5(norm) AS norm_fp
    FROM n
    """,
    doc="Unicode canonicalization scan over deterministically planted "
    "damage (combining accents, CRLF, NBSP): NFC via Arrow-batched "
    "pandas UDF pinned to DuckDB's native nfc_normalize, line-ending "
    "and NBSP repair JVM-side, before/after lengths, changed flag, "
    "and an md5 fingerprint of the normalized text — fully hash-gated",
)
def text_normalize_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only: one scan, zero shuffle; the ONLY Python in the plan is
    the Arrow-batched NFC stage (plan-gated: ArrowEvalPython, never
    BatchEvalPython)."""
    docs = load_table(spark, sf_dir, "documents")
    mt = _nonnfc_text()
    norm = normalize_text(mt)
    return docs.select(
        "doc_id",
        F.length(mt).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.size(F.regexp_extract_all(mt, F.lit("\r\n"), F.lit(0)))
        .cast("long")
        .alias("n_crlf"),
        F.size(F.regexp_extract_all(mt, F.lit("\u00a0"), F.lit(0)))
        .cast("long")
        .alias("n_nbsp"),
        (norm != mt).alias("changed"),
        F.md5(norm).alias("norm_fp"),
    )
