"""PII scrubbing — the redaction stage every production training-data
pipeline runs before text reaches a model (emails, secret credentials,
SSN-shaped ids, credit-card numbers, phone numbers, IP addresses; the
C4/CCNet-style scrub, with a Luhn-checksum validity count for the card
class and a length+alphabet high-entropy proxy for the secret class).

Beyond-reference extension surface (the reference,
/root/reference/tripl/tripl.py, has no text processing at all); sits
next to `curation.curation_redacted_texts` (number/url normalization
for fingerprinting) but with per-class detection COUNTS and a
first-matching-class precedence, mirroring the drop-ledger discipline:
a token is counted for the FIRST class that claims it, so an
SSN-shaped id is never double-counted as a phone number.

Scale story (100 TB): detection and scrubbing are MAP-ONLY —
`regexp_extract_all` / `regexp_replace` run JVM-side inside
whole-stage codegen, no shuffle, no UDF; the plan is a single scan
however many executors fan out. The prevalence rollup shuffles
|sources|x|langs| counter rows (partial-aggregated map-side), the
same counter-table shape as the streaming quality monitor.

The regex constants are written once in Python and injected verbatim
into BOTH the Spark expressions and the DuckDB oracle SQL — the
pattern dialect is the Java-regex / RE2 intersection (character
classes, bounded repetition, word boundaries; no backrefs or
lookaround), so one string means the same thing in both engines and
the driver hash gate pins the full scrub semantics end to end.

The synthetic `documents` corpus is word-salad with no digits, so the
registered queries PLANT deterministic PII derived from `doc_id` —
identically on both sides — before scrubbing; the gates therefore
verify detection, precedence, and replacement on known-positive text
rather than vacuously passing on an all-zero corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

# Java-regex / RE2 intersection (see module docstring). Order IS the
# counting precedence: email first (its local part contains digit runs
# a later class could claim), then SSN-shaped ids, then phones, then
# IPv4. The phone pattern is GROUPED (optional country code, optional
# area group, then ddd + dddd with at most ONE bounded separator
# between groups) rather than a separator character class: an open
# class with space/dash bridges greedily across whitespace into
# whatever number follows (swallowing the first octet of an adjacent
# IP, matching 2020-01-01 as a phone) — the grouped form caps the
# digits and separators a match can span, so adjacent independent
# numbers mostly survive scrubbing intact and ISO dates never match
# (a bare 3+4-digit pair across ONE separator, e.g. '999 2000' inside
# '1999 2000', still matches — the acknowledged over-redaction bias);
# the trailing \b makes leftmost-first consume a bare digit run to its
# end instead of leaving a one-digit remnant. Any 7+ consecutive
# digits still match (over-redaction on bare numeric ids is the
# standard scrub bias).
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # secret credentials (r15, 6th class): high-entropy token runs —
    # prefixed API keys (sk-/pk-/key-/tok-/ghp-), 32+ hex digests, and
    # 40+ base64-ish runs with optional padding. Regexes can't measure
    # entropy, so LENGTH+alphabet is the standard production proxy
    # (over-redaction bias on very long plain tokens, same as bare
    # digit runs under phone). Must run AFTER email (a key pasted into
    # a mail address belongs to the address) and BEFORE the digit
    # classes: a hex digest whose tail happens to be 7+ decimal digits
    # would otherwise leak a bogus [PHONE] match — precedence, not the
    # pattern, is what prevents the double claim. \b guards hold on
    # both ends for the prefixed/hex branches (word-char edges); the
    # base64 branch's trailing '=' padding is self-delimiting.
    ("secret",
     r"\b(sk|pk|key|tok|ghp)-[A-Za-z0-9]{20,}\b"
     r"|\b[0-9a-fA-F]{32,}\b"
     r"|\b[A-Za-z0-9+/]{40,}={0,2}",
     "[SECRET]"),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[ID]"),
    # credit-card-shaped: 16 digits in 4 groups (spaces/dashes/none).
    # Scrubbing is shape-based (over-redaction bias: a non-Luhn 16-digit
    # id is scrubbed too); the separate `n_cc_luhn` column in
    # `text_pii_scrub` counts the Luhn-VALID subset — the detection
    # signal a triage dashboard keys on. Must precede phone (the phone
    # pattern would otherwise claim 3+4-digit fragments of a card).
    ("cc", r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b", "[CC]"),
    ("phone",
     r"(\+?[0-9]{1,2}[ .-]?)?(\(?[0-9]{3}\)?[ .-]?)?[0-9]{3}[ .-]?[0-9]{4}\b",
     "[PHONE]"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


_CC_PATTERN = next(p for n, p, _ in PII_CLASSES if n == "cc")


def _luhn_ok(c: Column) -> Column:
    """Whether one card-shaped candidate's digits pass the Luhn
    checksum — pure digit arithmetic over higher-order functions (JVM
    codegen, no UDF)."""
    digits = F.reverse(F.regexp_replace(c, "[ -]", ""))

    def term(i: Column) -> Column:
        d = digits.substr(i, F.lit(1)).cast("int")
        dbl = d * 2
        return F.when(i % 2 == 1, d).otherwise(
            F.when(dbl > 9, dbl - 9).otherwise(dbl)
        )

    vals = F.transform(F.sequence(F.lit(1), F.length(digits)), term)
    return F.aggregate(vals, F.lit(0), lambda a, x: a + x) % 10 == 0


def luhn_valid_count(text: Column) -> Column:
    """Count credit-card-shaped candidates whose digits pass the Luhn
    checksum. The same arithmetic is written in DuckDB SQL by
    `_luhn_count_sql`, and the driver hash gate on `text_pii_scrub`
    pins the two implementations to each other."""
    cands = F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(_CC_PATTERN), F.lit(0)
    )
    return F.size(F.filter(cands, _luhn_ok)).cast("long")


def _luhn_count_sql(tcol: str) -> str:
    """DuckDB twin of `luhn_valid_count` over column ``tcol``."""
    d = "CAST(reverse(regexp_replace(c, '[ -]', '', 'g'))[i] AS INT)"
    return (
        f"CAST(len(list_filter(regexp_extract_all({tcol}, '{_CC_PATTERN}'), "
        f"c -> list_sum([CASE WHEN i % 2 = 1 THEN {d} "
        f"ELSE CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END END "
        f"FOR i IN range(1, len(regexp_replace(c, '[ -]', '', 'g')) + 1)]) "
        f"% 10 = 0)) AS BIGINT)"
    )


def scrub_pii(text: Column) -> Column:
    """Redact every PII class in precedence order; map-only."""
    out = text
    for _, pat, token in PII_CLASSES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One count column per class under first-matching-class
    precedence: each class counts matches in the text AFTER all
    earlier classes were scrubbed out. NULL text coalesces to '' so a
    dirty stream contributes 0 per class, never -1 (Spark's legacy
    sizeOfNull would otherwise leak -1 into the prevalence counters)."""
    cols: list[Column] = []
    stage = F.coalesce(text, F.lit(""))
    for name, pat, token in PII_CLASSES:
        cols.append(
            F.size(F.regexp_extract_all(stage, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        stage = F.regexp_replace(stage, pat, token)
    return cols


def pii_prevalence_partials(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, lang, n_docs, docs_with_pii, n_<class>...) long
    counters for one slice of documents — the ONE rollup definition
    shared by the registered batch query (`text_pii_prevalence`) and
    the streaming monitor (`streaming/pii_stream.py`), so the two
    surfaces cannot drift. Integer counters only; rates are read-time
    views."""
    per_doc = docs.select("source", "lang", *pii_counts(F.col(text_col)))
    total = None
    for name, _, _ in PII_CLASSES:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    return (
        per_doc.withColumn("__any", (total > 0).cast("long"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__any").cast("long").alias("docs_with_pii"),
            *[
                F.sum(f"n_{name}").cast("long").alias(f"n_{name}")
                for name, _, _ in PII_CLASSES
            ],
        )
    )

# Deterministic PII planting from doc_id (see module docstring): the
# Spark expression and the SQL fragment below are the SAME definition,
# maintained together, so the gate compares scrubbers — not planters.
def _enriched_text() -> Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" reach user"), did.cast("string"),
                     F.lit("@example.com today")),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 1,
            # Luhn-valid exactly when the last digit is 1 (the classic
            # 4111... test number) — both branches exercised corpus-wide
            F.concat(F.lit(" card 4111 1111 1111 111"),
                     (did % 10).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" call +1 (555) 010-"),
                     F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" id 123-45-"),
                     F.lpad((did % 10000).cast("string"), 4, "0"),
                     F.lit(" host 10."), (did % 256).cast("string"),
                     F.lit(".0."), ((did * 7) % 256).cast("string")),
        ).otherwise(F.lit("")),
        # r15 secret class: a prefixed API key and a bare hex digest —
        # md5 is the cross-engine deterministic "high-entropy" source
        # (identical text in Spark and DuckDB for the same doc_id)
        F.when(
            did % 11 == 0,
            F.concat(F.lit(" token sk-"), F.md5(did.cast("string"))),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(F.lit(" digest "), F.md5((did * 3 + 1).cast("string"))),
        ).otherwise(F.lit("")),
    )


_ENRICH_SQL = """text
      || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)
              || '@example.com today' ELSE '' END
      || CASE WHEN doc_id % 3 = 1 THEN ' card 4111 1111 1111 111'
              || CAST(doc_id % 10 AS VARCHAR) ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' call +1 (555) 010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      || CASE WHEN doc_id % 7 = 0 THEN ' id 123-45-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
      || CASE WHEN doc_id % 11 = 0 THEN ' token sk-'
              || md5(CAST(doc_id AS VARCHAR)) ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN ' digest '
              || md5(CAST(doc_id * 3 + 1 AS VARCHAR)) ELSE '' END"""


def _scrub_stages_sql() -> tuple[str, str, list[str]]:
    """CTE chain applying the class precedence; returns (WITH-clause
    body, final text column name, count column names). Built from
    PII_CLASSES so the oracle can never drift from the Spark side."""
    sql = f"s0 AS (SELECT doc_id, source, lang, {_ENRICH_SQL} AS t0 FROM documents)"
    prev, tcol, counts = "s0", "t0", []
    for i, (name, pat, token) in enumerate(PII_CLASSES):
        nxt, ncol = f"s{i + 1}", f"n_{name}"
        # the Luhn-valid count rides the cc stage (same staged text the
        # cc class itself counts on — precedence-consistent)
        extra = (
            f"\n             {_luhn_count_sql(tcol)} AS n_cc_luhn,"
            if name == "cc"
            else ""
        )
        sql += f""",
    {nxt} AS (
      SELECT * EXCLUDE ({tcol}),
             CAST(len(regexp_extract_all({tcol}, '{pat}')) AS BIGINT) AS {ncol},{extra}
             regexp_replace({tcol}, '{pat}', '{token}', 'g') AS t{i + 1}
      FROM {prev})"""
        prev, tcol = nxt, f"t{i + 1}"
        counts.append(ncol)
    return sql, tcol, counts


_STAGES_SQL, _FINAL_T, _COUNT_COLS = _scrub_stages_sql()
_RESIDUAL_SQL = " AND ".join(
    f"len(regexp_extract_all({_FINAL_T}, '{pat}')) = 0" for _, pat, _ in PII_CLASSES
)
_SUM_SQL = " + ".join(_COUNT_COLS)


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH {_STAGES_SQL}
    SELECT doc_id, {", ".join(_COUNT_COLS)}, n_cc_luhn,
           CAST({_SUM_SQL} AS BIGINT) AS n_pii,
           md5({_FINAL_T}) AS scrub_fp,
           ({_RESIDUAL_SQL}) AS clean
    FROM {_FINAL_T.replace("t", "s")}
    """,
    doc="Per-document PII scrub over deterministically planted "
    "emails/ids/credit-cards/phones/IPs: per-class counts under "
    "first-matching precedence plus the Luhn-valid card count, md5 "
    "fingerprint of the redacted text, and a residual clean flag — "
    "fully hash-gated (regexes shared verbatim between engines; the "
    "Luhn arithmetic written once per engine, pinned by the gate)",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only scrub: one scan, JVM regex inside codegen, no shuffle.
    Counts use first-matching-class precedence (an SSN-shaped id is an
    id, not a phone number); `clean` certifies the redacted text has
    no residual match of ANY class — the invariant a downstream
    tokenizer relies on."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select("doc_id", _enriched_text().alias("t"))
    return pii_scrub_frame(enriched)


def pii_scrub_frame(enriched: DataFrame) -> DataFrame:
    """The scrub projection over a ``(doc_id, t)`` frame — ONE
    precedence-staged regex chain shared by counts, Luhn, scrub
    fingerprint and residual flag.

    The original composition ran TWO chains — the NULL-coalesced one
    for counts (`pii_counts`) and the raw one for the scrub fingerprint
    and Luhn stage (`scrub_pii`) — ~20 heavy regex passes per row. The
    two chains are equal on every non-NULL row (``_enriched_text`` is
    NULL iff ``text`` is NULL: ``concat`` is null-intolerant), so the
    raw chain is replaced by an explicit NULL branch over the coalesced
    one: 6 replaces + 6 counts + 1 rlike (guide §1.2 per-task work).
    NULL semantics are bit-identical by construction: scrub_fp/clean
    are NULL on NULL text exactly as ``md5(scrub_pii(NULL))`` /
    ``~NULL.rlike(...)`` were, counts coalesce to the empty string, and
    the Luhn stage sees '' either way (its old input coalesced too).
    Per-class counts ride ``regexp_count`` (same match enumeration as
    ``size(regexp_extract_all(...))``, no array materialization); the
    cc class keeps the extracted array because the Luhn filter reads
    the SAME candidates (one extract_all where count + Luhn each paid
    their own). Equality with the old composition — including a NULL
    text row — is pinned by tests/test_r15_opt.py."""
    is_null = F.col("t").isNull()
    cur = enriched.withColumn("s0", F.coalesce(F.col("t"), F.lit("")))
    count_cols: list[str] = []
    for i, (name, pat, token) in enumerate(PII_CLASSES):
        stage = F.col(f"s{i}")
        if name == "cc":
            # the Luhn count shares these candidates (same staged text
            # the cc class counts on — precedence-consistent)
            cur = cur.withColumn(
                "__cc_cands", F.regexp_extract_all(stage, F.lit(pat), F.lit(0))
            ).withColumn(f"n_{name}", F.size(F.col("__cc_cands")).cast("long"))
        else:
            cur = cur.withColumn(
                f"n_{name}", F.regexp_count(stage, F.lit(pat)).cast("long")
            )
        cur = cur.withColumn(f"s{i + 1}", F.regexp_replace(stage, pat, token))
        count_cols.append(f"n_{name}")
    final = F.col(f"s{len(PII_CLASSES)}")
    # residual clean flag: ONE alternation rlike over the scrubbed text
    # instead of six regexp_extract_all passes — "no match of any
    # class" ≡ "does not match (?:c1)|(?:c2)|…", and rlike stops at the
    # first hit where extract_all materialized every match of every
    # class (boolean is bit-identical so the oracle hash is unchanged)
    residual = ~final.rlike(
        "|".join(f"(?:{pat})" for _, pat, _ in PII_CLASSES)
    )
    total = None
    for name, _, _ in PII_CLASSES:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    return cur.select(
        "doc_id",
        *count_cols,
        F.size(F.filter(F.col("__cc_cands"), _luhn_ok))
        .cast("long")
        .alias("n_cc_luhn"),
        total.cast("long").alias("n_pii"),
        F.when(is_null, F.lit(None).cast("string"))
        .otherwise(F.md5(final))
        .alias("scrub_fp"),
        F.when(is_null, F.lit(None).cast("boolean"))
        .otherwise(residual)
        .alias("clean"),
    )


@query(
    "text_pii_prevalence",
    oracle=f"""
    WITH {_STAGES_SQL}
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN {_SUM_SQL} > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           {", ".join(f"CAST(sum({c}) AS BIGINT) AS {c}" for c in _COUNT_COLS)},
           round(sum(CASE WHEN {_SUM_SQL} > 0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) + 0.0 AS pii_rate
    FROM {_FINAL_T.replace("t", "s")}
    GROUP BY source, lang
    ORDER BY source, lang
    """,
    doc="PII prevalence scorecard per (source, lang): docs touched, "
    "per-class totals, and the PII rate — the monitoring rollup over "
    "the same scrub definition; fully hash-gated",
)
def text_pii_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-table rollup of the scrub signals: |sources|x|langs|
    rows, partial-aggregated map-side — the same shape the streaming
    quality monitor maintains, so a crawl source that starts leaking
    PII pages on a per-batch counter, not a nightly scan."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select("source", "lang", _enriched_text().alias("text"))
    return (
        pii_prevalence_partials(enriched)
        .withColumn(
            "pii_rate",
            F.round(F.col("docs_with_pii") * 1.0 / F.col("n_docs"), 4)
            + F.lit(0.0),
        )
        .orderBy("source", "lang")
    )


def _spans_oracle() -> str:
    """Per-class span branches from the SAME staged CTE chain the
    scrub oracle uses — class i reads t{i} in s{i}, precedence
    baked into the stage, never re-derived."""
    branches = []
    for i, (name, pat, _) in enumerate(PII_CLASSES):
        t = f"t{i}"
        branches.append(f"""
      SELECT doc_id, '{name}' AS pii_class,
             CAST(len(regexp_extract_all({t}, '{pat}')) AS BIGINT) AS n,
             CAST(length(regexp_replace({t}, '(?s)(?:{pat}).*$', ''))
                  AS BIGINT) AS first_off,
             array_to_string(regexp_extract_all({t}, '{pat}'), '|') AS spans
      FROM s{i}""")
    return f"""
    WITH {_STAGES_SQL},
    allspans AS ({" UNION ALL ".join(branches)})
    SELECT doc_id, pii_class, n, first_off, spans
    FROM allspans WHERE n > 0
    """


@query(
    "text_pii_spans",
    oracle=_spans_oracle(),
    doc="Per-document per-class PII span ledger: match count, byte "
    "offset of the first match, and the matched substrings themselves "
    "('|'-joined) — the audit artifact a redaction review reads "
    "(WHAT was scrubbed and WHERE, not just how many). One row per "
    "(doc, class) with at least one match; offsets and spans are "
    "into the precedence-staged text. Fully hash-gated",
)
def text_pii_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span extraction stays map-only: counts and spans ride
    `regexp_extract_all`; the first-match offset is `regexp_instr - 1`
    on the Spark side (finds the first match and stops) and, in the
    oracle, the length of the text with `(?s)(?:class).*$` stripped —
    the prefix BEFORE the leftmost match, an exact-arithmetic
    equivalent in DuckDB, which lacks regexp_instr (the two
    constructions agreeing IS part of what the hash gate checks).
    The 6 class branches are one `inline()` over a struct array, so
    the corpus is scanned ONCE, not once per class; output is tall
    (doc_id, pii_class, n, first_off, spans), filtered to classes
    that matched — at 100 TB the ledger is |matches|-sized, not
    |docs × classes|-sized. Plan-gated shuffle-free.

    Offsets are 0-based into the STAGE-i text (earlier classes
    already replaced by their tokens) — the same precedence the count
    columns use; a span never double-claims text an earlier class
    consumed."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select("doc_id", _enriched_text().alias("t"))
    # every regex rides COLUMNS of child projections instead of living
    # inside the inline() generator: Generate expressions get no
    # whole-stage-codegen subexpression elimination, so the original
    # generator-resident form re-evaluated each staged replace chain
    # per struct field — measured 5.2 s -> 1.4 s at sf0.1 for the
    # identical output (guide §1 empirical loop; §4 per-task work).
    # Stage i's text (earlier classes already replaced) is t{i}; the
    # per-class matches/offset are m{i}/o{i}; the generator then only
    # assembles literals and plain attributes.
    cur = enriched.select("doc_id", F.coalesce(F.col("t"), F.lit("")).alias("t0"))
    for i, (_, pat, token) in enumerate(PII_CLASSES[:-1]):
        cur = cur.withColumn(
            f"t{i + 1}", F.regexp_replace(F.col(f"t{i}"), pat, token)
        )
    for i, (_, pat, _) in enumerate(PII_CLASSES):
        stage = F.col(f"t{i}")
        cur = cur.withColumn(
            f"m{i}", F.regexp_extract_all(stage, F.lit(pat), F.lit(0))
        ).withColumn(
            f"o{i}", (F.regexp_instr(stage, F.lit(pat)) - 1).cast("long")
        )
    structs = [
        F.struct(
            F.lit(name).alias("pii_class"),
            F.size(F.col(f"m{i}")).cast("long").alias("n"),
            F.col(f"o{i}").alias("first_off"),
            F.array_join(F.col(f"m{i}"), "|").alias("spans"),
        )
        for i, (name, _, _) in enumerate(PII_CLASSES)
    ]
    return cur.select("doc_id", F.inline(F.array(*structs))).filter(
        F.col("n") > 0
    )
