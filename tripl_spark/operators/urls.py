"""URL curation — the provenance-keyed filter stage of a crawl-scale
training-data pipeline: parse each document's source URL, extract the
registered domain under a public-suffix rule, cap any one domain's
share of the corpus (domain quotas), and drop blocklisted
domains/TLDs with an explicit per-document reason ledger.

Beyond-reference extension surface (the reference,
/root/reference/tripl/tripl.py, has no URL handling at all); sits
next to the PII scrub and mojibake scan as the third
provenance-hygiene family: dedup asks "have we seen this text",
these ask "should this SOURCE contribute at all, and how much".

Scale story (100 TB): parsing and domain extraction are MAP-ONLY —
`parse_url` / `split` / `slice` run JVM-side inside whole-stage
codegen, no shuffle, no UDF; the plan is a single scan however many
executors fan out. The blocklist is a FEW-ROW dimension joined with
an explicit `broadcast()` (never a shuffle: at 100 TB a shuffled
join against a 2-row table would move the whole corpus). The quota
ranks within `reg_domain` — one shuffle keyed by domain; head
domains are the skew risk at crawl scale, which is why the quota
keeps rank metadata (a two-phase per-domain top-K — partial top-K
per partition, then merge — drops in behind the same output contract
when a single domain outgrows an executor). The prevalence rollup is
|domains| counter rows, partial-aggregated map-side, and is the ONE
rollup definition shared with the streaming domain monitor
(`streaming/url_stream.py`).

The synthetic `documents` corpus has no URL column, so the registered
queries PLANT a deterministic URL derived from `doc_id` — identically
in both engines (the Spark expression and the SQL fragment below are
the same definition, maintained together), so the driver hash gates
compare the parsers/filters, not the planters. The planted mix covers
the shapes the rules must distinguish: head domains behind multiple
subdomains (www./blog. share one registered domain), multi-label
public suffixes (.co.uk, .com.au), a wildcard-rule TLD (*.ck), a long
tail, a blocklisted TLD, a blocklisted exact domain, http-vs-https,
and tracking query params.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table, local_df

# public-suffix-lite RULE TABLE (r15 — replaces the r14 1-tuple): each
# row is (suffix, wildcard). A non-wildcard row names a 2-label public
# suffix exactly (co.uk, com.au, ...): hosts under it keep THREE
# labels. A wildcard row names a TLD whose every child label is itself
# a public suffix (the PSL's `*.ck` rule): any host `x.y.ck` has
# public suffix `y.ck`, so the registered domain again keeps three
# labels. The real public-suffix list is ~9k such rows (plus `!`
# exception rules, out of scope here) and rides a broadcast exactly
# like this table does in `attach_registered_domain` — the scan path
# consumes the TABLE, not a hardcoded expression, so swapping in the
# full PSL is a data change, not a code change.
PUBLIC_SUFFIX_RULES: list[tuple[str, bool]] = [
    ("co.uk", False),
    ("com.au", False),
    ("co.jp", False),
    ("github.io", False),
    ("ck", True),  # the PSL wildcard shape: *.ck
]
EXACT_SUFFIXES: tuple[str, ...] = tuple(
    s for s, w in PUBLIC_SUFFIX_RULES if not w
)
WILDCARD_TLDS: tuple[str, ...] = tuple(s for s, w in PUBLIC_SUFFIX_RULES if w)

BLOCKED_DOMAINS: list[tuple[str, str]] = [("badcorp.com", "blocked_domain")]
BLOCKED_TLDS: list[tuple[str, str]] = [("xyz", "blocked_tld")]

DOMAIN_QUOTA_K = 12  # max docs any one registered domain keeps


# -- deterministic URL planting (see module docstring) ---------------

# Spark-dialect twin of the Column chain below (CASE order, modulo
# arithmetic and casts identical); rendered as ONE F.expr parse
# instead of ~50 py4j expression-builder round trips per call site —
# the planted URL rides 8+ query constructions. No backslash or quote
# appears in any literal, so the text is parser-mode-independent.
_SPARK_HOST_SQL = """CASE
    WHEN doc_id % 10 <= 3 THEN concat('www.hub', CAST(doc_id % 3 AS STRING), '.com')
    WHEN doc_id % 10 <= 5 THEN concat('blog.hub', CAST(doc_id % 3 AS STRING), '.com')
    WHEN doc_id % 20 = 16 THEN concat('img.portal.gov', CAST(doc_id % 2 AS STRING), '.ck')
    WHEN doc_id % 10 = 6 THEN concat('m.news', CAST(doc_id % 5 AS STRING), '.co.uk')
    WHEN doc_id % 10 = 7 THEN concat('cdn.spam', CAST(doc_id % 4 AS STRING), '.xyz')
    WHEN doc_id % 20 = 18 THEN concat('www.shop', CAST(doc_id % 2 AS STRING), '.com.au')
    WHEN doc_id % 10 = 8 THEN concat('tail', CAST(doc_id % 97 AS STRING), '.net')
    ELSE 'tracker.ads.badcorp.com' END"""
_SPARK_URL_SQL = f"""concat(
    CASE WHEN doc_id % 11 = 5 THEN 'http' ELSE 'https' END,
    '://',
    {_SPARK_HOST_SQL},
    '/p/', CAST(doc_id AS STRING),
    CASE WHEN doc_id % 6 = 0 THEN concat('?utm_source=feed&id=', CAST(doc_id AS STRING))
         WHEN doc_id % 6 = 3 THEN concat('?id=', CAST(doc_id AS STRING))
         ELSE '' END)"""


def _url_col() -> Column:
    return F.expr(_SPARK_URL_SQL)


_URL_SQL = """CASE
        WHEN doc_id % 10 <= 3 THEN 'www.hub' || CAST(doc_id % 3 AS VARCHAR) || '.com'
        WHEN doc_id % 10 <= 5 THEN 'blog.hub' || CAST(doc_id % 3 AS VARCHAR) || '.com'
        WHEN doc_id % 20 = 16 THEN 'img.portal.gov' || CAST(doc_id % 2 AS VARCHAR) || '.ck'
        WHEN doc_id % 10 = 6 THEN 'm.news' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
        WHEN doc_id % 10 = 7 THEN 'cdn.spam' || CAST(doc_id % 4 AS VARCHAR) || '.xyz'
        WHEN doc_id % 20 = 18 THEN 'www.shop' || CAST(doc_id % 2 AS VARCHAR) || '.com.au'
        WHEN doc_id % 10 = 8 THEN 'tail' || CAST(doc_id % 97 AS VARCHAR) || '.net'
        ELSE 'tracker.ads.badcorp.com' END"""
_SCHEME_SQL = "CASE WHEN doc_id % 11 = 5 THEN 'http' ELSE 'https' END"
_QS_SQL = """CASE
        WHEN doc_id % 6 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
        WHEN doc_id % 6 = 3 THEN '?id=' || CAST(doc_id AS VARCHAR)
        ELSE '' END"""
_FULL_URL_SQL = (
    f"({_SCHEME_SQL}) || '://' || ({_URL_SQL}) || '/p/' "
    f"|| CAST(doc_id AS VARCHAR) || ({_QS_SQL})"
)


# -- parsing (the operator under test) --------------------------------

def _host_labels(host: Column) -> tuple[Column, Column, Column]:
    """(last1, last2, last3) label suffixes of a host, slice-clamped.
    Spark's slice(x, -2, 2) on a 1-element array is EMPTY (start before
    the array), while the oracle's list[-2:] clamps — a single-label
    host must stay itself."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last1 = F.element_at(parts, -1)
    last2 = F.concat_ws(".", F.slice(parts, F.greatest(F.lit(-2), -n), F.lit(2)))
    last3 = F.concat_ws(".", F.slice(parts, F.greatest(F.lit(-3), -n), F.lit(3)))
    return last1, last2, last3


def registered_domain(
    host: Column,
    exact: tuple[str, ...] = EXACT_SUFFIXES,
    wildcards: tuple[str, ...] = WILDCARD_TLDS,
) -> Column:
    """Registered domain under the public-suffix rule table as a pure
    EXPRESSION: the last two host labels, or three when the last two
    form an exact multi-label public suffix or the TLD carries a
    wildcard rule. JVM-side split/slice — no UDF.

    The rule set is compiled into the plan as literals, which is the
    right shape ONLY where a join cannot reach — inside higher-order
    lambdas (`text_outlink_scan` maps each extracted link in a
    `transform`) and single-scan fused pipelines; with the full ~9k-row
    PSL those paths explode links first and join like everything else.
    The scan path (`url_components`) consumes the rule TABLE through
    `attach_registered_domain`'s broadcast joins instead — same rows,
    same answer (pinned by tests/test_urls.py). Callers outside the
    planted universe can pass their own ``exact``/``wildcards``."""
    last1, last2, last3 = _host_labels(host)
    cond = F.lit(False)
    for suf in exact:
        cond = cond | (last2 == suf)
    for tld in wildcards:
        cond = cond | (last1 == tld)
    return F.when(cond, last3).otherwise(last2)


def suffix_rules_df(spark: SparkSession) -> DataFrame:
    """The public-suffix rule table as a broadcastable dimension —
    (suffix, wildcard) rows; the full PSL swaps in as data."""
    return local_df(spark, PUBLIC_SUFFIX_RULES, "suffix string, wildcard boolean")


def attach_registered_domain(df: DataFrame, host_col: str = "host") -> DataFrame:
    """Add ``reg_domain`` via TWO broadcast joins against the suffix
    rule table (exact rows keyed by the host's last two labels,
    wildcard rows by its TLD) — the scan path's scale shape: a ~9k-row
    PSL is a dimension, and a dimension rides a broadcast, never a
    literal baked into the plan. Zero shuffle: BroadcastHashJoin only
    (plan-gated in tests/test_plan_quality.py)."""
    # one selectExpr parse for the three label projections (the
    # Column chain cost ~30 py4j round trips per query construction);
    # '[.]' is the backslash-free spelling of the literal-dot split,
    # so the text parses identically in either parser mode
    parts = f"split(`{host_col}`, '[.]')"
    dim = suffix_rules_df(df.sparkSession)
    ex = F.broadcast(
        dim.filter(~F.col("wildcard")).select(F.col("suffix").alias("__ps_exact"))
    )
    wc = F.broadcast(
        dim.filter(F.col("wildcard")).select(F.col("suffix").alias("__ps_wild"))
    )
    return (
        df.selectExpr(
            "*",
            f"element_at({parts}, -1) AS __l1",
            f"concat_ws('.', slice({parts}, greatest(-2, -size({parts})), 2)) AS __l2",
            f"concat_ws('.', slice({parts}, greatest(-3, -size({parts})), 3)) AS __l3",
        )
        .join(ex, F.col("__l2") == F.col("__ps_exact"), "left")
        .join(wc, F.col("__l1") == F.col("__ps_wild"), "left")
        .withColumn(
            "reg_domain",
            F.when(
                F.col("__ps_exact").isNotNull() | F.col("__ps_wild").isNotNull(),
                F.col("__l3"),
            ).otherwise(F.col("__l2")),
        )
        .drop("__l1", "__l2", "__l3", "__ps_exact", "__ps_wild")
    )


def _reg_domain_sql(host: str) -> str:
    """The rule table's lookup semantics as a DuckDB expression —
    generated from PUBLIC_SUFFIX_RULES so the oracle can never drift
    from either Spark form (the IN lists are the same rows the
    broadcast dimension carries)."""
    ex = ", ".join(f"'{s}'" for s in EXACT_SUFFIXES)
    wc = ", ".join(f"'{s}'" for s in WILDCARD_TLDS)
    return (
        f"CASE WHEN array_to_string((string_split({host}, '.'))[-2:], '.') "
        f"IN ({ex}) "
        f"OR (string_split({host}, '.'))[-1] IN ({wc}) "
        f"THEN array_to_string((string_split({host}, '.'))[-3:], '.') "
        f"ELSE array_to_string((string_split({host}, '.'))[-2:], '.') END"
    )


def url_components(docs: DataFrame, url_col: Column) -> DataFrame:
    """doc_id + parsed URL columns; parse_url is a JVM built-in and the
    registered domain arrives via the broadcast suffix-table joins —
    the crawl-scale path never leaves codegen and never shuffles."""
    url = url_col
    host = F.parse_url(url, F.lit("HOST"))
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        url.alias("url"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("scheme"),
        host.alias("host"),
        F.element_at(F.split(host, r"\."), -1).alias("tld"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")).alias("qstring"),
    )
    return attach_registered_domain(base).select(
        "doc_id", "source", "lang", "n_chars", "url", "scheme", "host",
        "reg_domain", "tld", "path", "qstring",
    )


_HOST_SQL = f"regexp_extract({_FULL_URL_SQL}, '^([a-z]+)://([^/?#]+)([^?#]*)', 2)"
_COMPONENTS_SQL = f"""
    SELECT doc_id, source, lang, n_chars,
           {_FULL_URL_SQL} AS url,
           regexp_extract({_FULL_URL_SQL}, '^([a-z]+)://', 1) AS scheme,
           {_HOST_SQL} AS host,
           {_reg_domain_sql(_HOST_SQL)} AS reg_domain,
           (string_split({_HOST_SQL}, '.'))[-1] AS tld,
           regexp_extract({_FULL_URL_SQL}, '^([a-z]+)://([^/?#]+)([^?#]*)', 3) AS path,
           regexp_extract({_FULL_URL_SQL}, '\\?(.*)$', 1) AS qstring
    FROM documents"""


@query(
    "url_host_scan",
    oracle=f"""
    WITH u AS ({_COMPONENTS_SQL})
    SELECT doc_id, url, scheme, host, reg_domain, tld, path, qstring,
           (scheme = 'http') AS is_http,
           contains(qstring, 'utm_') AS has_tracking
    FROM u
    """,
    doc="URL parse + registered-domain extraction over deterministically "
    "planted crawl URLs: scheme/host/path/query via JVM parse_url, "
    "public-suffix-lite registered domain (co.uk takes 3 labels), "
    "http and tracking-param flags — map-only, fully hash-gated",
)
def url_host_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only, zero shuffle: one scan, all parsing inside
    whole-stage codegen (plan-gated in tests/test_plan_quality.py)."""
    docs = load_table(spark, sf_dir, "documents")
    u = url_components(docs, _url_col())
    return u.select(
        "doc_id", "url", "scheme", "host", "reg_domain", "tld", "path",
        "qstring",
        (F.col("scheme") == "http").alias("is_http"),
        F.col("qstring").contains("utm_").alias("has_tracking"),
    )


@query(
    "url_domain_quota",
    oracle=f"""
    WITH u AS ({_COMPONENTS_SQL})
    SELECT doc_id, reg_domain,
           CAST(row_number() OVER (PARTITION BY reg_domain
                ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk,
           (row_number() OVER (PARTITION BY reg_domain
                ORDER BY n_chars DESC, doc_id) <= {DOMAIN_QUOTA_K}) AS kept
    FROM u
    """,
    doc=f"Per-registered-domain quota: rank docs within each domain by "
    f"length (quality proxy) and keep the top {DOMAIN_QUOTA_K} — the "
    f"single-domain-flood guard (SEO farms, mirror sites) every "
    f"crawl-scale corpus applies before mixing",
)
def url_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE shuffle, keyed by reg_domain (the window partition). Head
    domains are the skew: the rank is emitted (not just the kept bit)
    so a two-phase top-K — per-partition partial top-K, then merge —
    can replace the window behind the same contract when one domain
    outgrows an executor; AQE skew-split covers the middle ground."""
    docs = load_table(spark, sf_dir, "documents")
    u = url_components(docs, _url_col())
    from pyspark.sql.window import Window

    w = Window.partitionBy("reg_domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    rk = F.row_number().over(w).cast("long")
    return u.select(
        "doc_id",
        "reg_domain",
        rk.alias("rk"),
        (rk <= DOMAIN_QUOTA_K).alias("kept"),
    )


@query(
    "url_blocklist_drops",
    oracle=f"""
    WITH u AS ({_COMPONENTS_SQL})
    SELECT u.doc_id, u.reg_domain,
           COALESCE(bd.reason, bt.reason) AS drop_reason,
           (bd.reason IS NULL AND bt.reason IS NULL) AS kept
    FROM u
    LEFT JOIN (VALUES {", ".join(f"('{d}', '{r}')" for d, r in BLOCKED_DOMAINS)})
         AS bd(dom, reason) ON u.reg_domain = bd.dom
    LEFT JOIN (VALUES {", ".join(f"('{t}', '{r}')" for t, r in BLOCKED_TLDS)})
         AS bt(tld, reason) ON u.tld = bt.tld
    """,
    doc="Blocklist filter with per-document drop ledger: exact "
    "registered-domain rules and TLD rules as broadcast dimension "
    "joins (domain rule wins), kept flag for the survivors — the "
    "provenance twin of pipeline_drop_ledger's content rules",
)
def url_blocklist_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two explicit `broadcast()` joins against few-row rule tables —
    at 100 TB a shuffled join here would move the whole corpus to
    meet 2 rows. Domain rule takes precedence via coalesce order."""
    docs = load_table(spark, sf_dir, "documents")
    u = url_components(docs, _url_col())
    bd = F.broadcast(
        local_df(u.sparkSession, BLOCKED_DOMAINS, "dom string, d_reason string")
    )
    bt = F.broadcast(
        local_df(u.sparkSession, BLOCKED_TLDS, "btld string, t_reason string")
    )
    return (
        u.join(bd, u.reg_domain == bd.dom, "left")
        .join(bt, u.tld == bt.btld, "left")
        .select(
            "doc_id",
            "reg_domain",
            F.coalesce("d_reason", "t_reason").alias("drop_reason"),
            (F.col("d_reason").isNull() & F.col("t_reason").isNull()).alias(
                "kept"
            ),
        )
    )


@query(
    "url_domain_quota_kept",
    oracle=f"""
    WITH u AS ({_COMPONENTS_SQL}),
    r AS (
      SELECT doc_id, reg_domain,
             CAST(row_number() OVER (PARTITION BY reg_domain
                  ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
      FROM u)
    SELECT doc_id, reg_domain, rk FROM r WHERE rk <= {DOMAIN_QUOTA_K}
    """,
    doc=f"The quota's production output shape: ONLY the kept top "
    f"{DOMAIN_QUOTA_K} per registered domain — filtering on the rank "
    f"lets Spark plan a PARTIAL WindowGroupLimit (each map task ships "
    f"k rows per domain to the exchange, not the whole domain), the "
    f"two-phase top-K the full-ledger variant documents",
)
def url_domain_quota_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors only. The rank filter is what unlocks the partial
    WindowGroupLimit (plan-gated): a head domain holding 20% of a
    100 TB crawl contributes k rows per map task to the shuffle
    instead of 20 TB through one task — this, not the window itself,
    is the quota's scale story."""
    docs = load_table(spark, sf_dir, "documents")
    u = url_components(docs, _url_col())
    from pyspark.sql.window import Window

    w = Window.partitionBy("reg_domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        u.select(
            "doc_id",
            "reg_domain",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= DOMAIN_QUOTA_K)
    )


def _gopher_quality_oracle() -> str:
    from tripl_spark.operators.text import _GOPHER_ORACLE

    return f"""
    WITH g AS ({_GOPHER_ORACLE}),
    u AS (SELECT doc_id, {_reg_domain_sql(_HOST_SQL)} AS reg_domain
          FROM documents),
    j AS (SELECT u.doc_id, u.reg_domain, g.passes, g.n_words
          FROM u JOIN g USING (doc_id)),
    r AS (SELECT doc_id, reg_domain, passes, n_words,
                 CAST(row_number() OVER (PARTITION BY reg_domain
                      ORDER BY passes DESC, n_words DESC, doc_id) AS BIGINT)
                   AS rk
          FROM j)
    SELECT doc_id, reg_domain, passes, n_words, rk
    FROM r WHERE rk <= {DOMAIN_QUOTA_K}
    """


@query(
    "url_domain_quota_quality",
    oracle=_gopher_quality_oracle(),
    doc=f"Quality-ordered domain quota: the top {DOMAIN_QUOTA_K} docs "
    "per registered domain ranked by the Gopher battery verdict first "
    "(passing docs beat failing ones), then word count — so a head "
    "domain's quota fills with its BEST documents, not its longest. "
    "Composes the URL axis with the quality battery in one scan + one "
    "domain-keyed shuffle; kept-only output planning the partial "
    "WindowGroupLimit",
)
def url_domain_quota_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`url_domain_quota_kept` ranked by curation quality instead of
    the n_chars proxy: order = (gopher passes DESC, n_words DESC,
    doc_id). The quality flags ride the SAME corpus scan that parses
    the URL (`gopher_flag_frame` is pure codegen expressions, the
    registered-domain lookup two broadcast joins), so quality-aware
    quota costs exactly what the length-proxy quota costs — ONE
    domain-keyed shuffle, and the rank filter keeps the partial
    WindowGroupLimit (each map task ships k rows per domain however
    hot the head domains run)."""
    from pyspark.sql.window import Window

    from tripl_spark.operators.text import gopher_flag_frame

    docs = load_table(spark, sf_dir, "documents")
    host = F.parse_url(_url_col(), F.lit("HOST"))
    flags = gopher_flag_frame(docs, keep=(host.alias("host"),))
    u = attach_registered_domain(flags)
    w = Window.partitionBy("reg_domain").orderBy(
        F.col("passes").desc(), F.col("n_words").desc(), F.col("doc_id")
    )
    return (
        u.select(
            "doc_id",
            "reg_domain",
            "passes",
            "n_words",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= DOMAIN_QUOTA_K)
    )


# -- canonical-URL dedup ----------------------------------------------
# A crawl sees the same page under many spellings: http vs https,
# tracking params, duplicate fetches. URL-level dedup canonicalizes
# (scheme dropped, tracking query params stripped, host lowercased by
# construction) and keeps ONE doc per canonical URL — it runs BEFORE
# content dedup because it needs no text at all. The planting below is
# SEPARATE from _url_col's: paths collide in blocks (doc_id // 9 with
# the host cycling doc_id % 3) so ~3-way duplicate groups exist by
# construction, while scheme (doc_id % 11) and tracking params
# (doc_id % 6) vary WITHIN a group — exactly the variance
# canonicalization must erase.

def _dup_url_col() -> Column:
    did = F.col("doc_id")
    scheme = F.when(did % 11 == 5, F.lit("http")).otherwise(F.lit("https"))
    qs = (
        F.when(did % 6 == 0,
               F.concat(F.lit("?utm_source=feed&utm_medium=rss")))
        .when(did % 6 == 3, F.lit("?utm_campaign=x"))
        .otherwise(F.lit(""))
    )
    return F.concat(
        scheme, F.lit("://www.hub"), (did % 3).cast("string"),
        F.lit(".com/a/"), F.floor(did / 9).cast("string"), qs,
    )


_DUP_URL_SQL = (
    "(CASE WHEN doc_id % 11 = 5 THEN 'http' ELSE 'https' END)"
    " || '://www.hub' || CAST(doc_id % 3 AS VARCHAR) || '.com/a/'"
    " || CAST(CAST(floor(doc_id / 9) AS BIGINT) AS VARCHAR)"
    " || (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&utm_medium=rss'"
    "          WHEN doc_id % 6 = 3 THEN '?utm_campaign=x' ELSE '' END)"
)


def canonical_url(url: Column) -> Column:
    """Scheme-insensitive, tracking-insensitive canonical form:
    host + path, with any ``utm_*`` query params dropped and remaining
    params kept (a real id param distinguishes pages; a campaign tag
    does not). JVM-side regex only — map-only at any scale."""
    hostpath = F.regexp_replace(url, r"^[a-z]+://", "")
    base = F.regexp_extract(hostpath, r"^([^?#]*)", 1)
    q = F.regexp_extract(hostpath, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    return F.when(F.size(kept) > 0,
                  F.concat(base, F.lit("?"), F.array_join(kept, "&"))
                  ).otherwise(base)


_CANON_SQL = (
    "CASE WHEN len(list_filter(string_split(regexp_extract("
    "regexp_replace(u, '^[a-z]+://', ''), '\\?([^#]*)', 1), '&'), "
    "p -> p <> '' AND NOT starts_with(p, 'utm_'))) > 0 "
    "THEN regexp_extract(regexp_replace(u, '^[a-z]+://', ''), "
    "'^([^?#]*)', 1) || '?' || array_to_string(list_filter("
    "string_split(regexp_extract(regexp_replace(u, '^[a-z]+://', ''), "
    "'\\?([^#]*)', 1), '&'), p -> p <> '' AND NOT starts_with(p, "
    "'utm_')), '&') "
    "ELSE regexp_extract(regexp_replace(u, '^[a-z]+://', ''), "
    "'^([^?#]*)', 1) END"
)


@query(
    "url_canonical_dedup",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_DUP_URL_SQL} AS u FROM documents),
    c AS (SELECT doc_id, {_CANON_SQL} AS canonical_url FROM u)
    SELECT doc_id, canonical_url,
           (doc_id = min(doc_id) OVER (PARTITION BY canonical_url))
             AS keeper,
           CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT)
             AS group_size
    FROM c
    """,
    doc="URL-level dedup over planted duplicate fetches: canonicalize "
    "(scheme dropped, utm_* tracking params stripped, real params "
    "kept), group by canonical form, keep the smallest doc_id — the "
    "zero-text dedup pass every crawl runs before content dedup",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization is map-only JVM regex; the dedup itself is ONE
    canonical-URL-keyed shuffle (the window). At crawl scale the
    canonical key is near-unique outside true duplicate groups, so
    AQE-coalesced hash partitions stay balanced — no head-key skew by
    construction (unlike domains, canonical URLs don't concentrate)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    c = docs.select(
        "doc_id", canonical_url(_dup_url_col()).alias("canonical_url")
    )
    w = Window.partitionBy("canonical_url")
    return c.select(
        "doc_id",
        "canonical_url",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keeper"),
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
    )


def domain_prevalence_partials(u: DataFrame) -> DataFrame:
    """(reg_domain, n_docs, n_http, n_tracking) long counters for one
    slice of parsed URLs — the ONE rollup definition shared by the
    registered batch query (`url_domain_prevalence`) and the streaming
    monitor (`streaming/url_stream.py`), so the two surfaces cannot
    drift. Integer counters only; shares are read-time views."""
    return u.groupBy("reg_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("scheme") == "http").cast("long"))
        .cast("long")
        .alias("n_http"),
        F.sum(F.col("qstring").contains("utm_").cast("long"))
        .cast("long")
        .alias("n_tracking"),
    )


@query(
    "url_domain_prevalence",
    oracle=f"""
    WITH u AS ({_COMPONENTS_SQL}),
    c AS (
      SELECT reg_domain,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN scheme = 'http' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_http,
             CAST(sum(CASE WHEN contains(qstring, 'utm_') THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tracking
      FROM u GROUP BY reg_domain)
    SELECT reg_domain, n_docs, n_http, n_tracking,
           round(n_docs * 1.0 / sum(n_docs) OVER (), 6) + 0.0 AS doc_share
    FROM c
    """,
    doc="Per-registered-domain corpus scorecard: doc counts, http and "
    "tracking-param counts, corpus share — the concentration signal "
    "domain quotas are tuned against; counters shared verbatim with "
    "the streaming domain monitor",
)
def url_domain_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|domains| counter rows, partial-aggregated map-side; the share
    view divides by a single broadcast total at read time."""
    docs = load_table(spark, sf_dir, "documents")
    u = url_components(docs, _url_col())
    c = domain_prevalence_partials(u)
    total = c.agg(F.sum("n_docs").alias("__total"))
    return (
        c.crossJoin(F.broadcast(total))
        .select(
            "reg_domain",
            "n_docs",
            "n_http",
            "n_tracking",
            (F.round(F.col("n_docs") * 1.0 / F.col("__total"), 6) + F.lit(0.0))
            .alias("doc_share"),
        )
    )


# -- outlink extraction ------------------------------------------------
# The text→URL bridge: pages REFERENCE urls, and link extraction is
# where anchor/link-graph pipelines start. Planted outlinks (the
# corpus text is URL-free word salad) are appended per doc_id in both
# engines; extraction + per-link registered-domain mapping runs
# entirely inside JVM higher-order functions — map-only.

_LINK_PATTERN = r"https?://[^\s]+"


def _outlinked_text() -> Column:
    did = F.col("doc_id")
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(did % 3 == 1,
               F.concat(F.lit(" see https://www.hub"),
                        (did % 3).cast("string"),
                        F.lit(".com/ref/"), did.cast("string"))
               ).otherwise(F.lit("")),
        F.when(did % 4 == 2,
               F.concat(F.lit(" img http://cdn.spam"),
                        (did % 4).cast("string"),
                        F.lit(".xyz/i/"), did.cast("string"),
                        F.lit(" plus https://tail"),
                        (did % 97).cast("string"), F.lit(".net/x"))
               ).otherwise(F.lit("")),
        F.when(did % 7 == 4,
               F.concat(F.lit(" ref https://m.news"),
                        (did % 5).cast("string"), F.lit(".co.uk/a"))
               ).otherwise(F.lit("")),
        F.when(did % 5 == 0,
               F.concat(F.lit(" code https://usr"),
                        (did % 7).cast("string"),
                        F.lit(".github.io/proj"))
               ).otherwise(F.lit("")),
    )


_OUTLINK_SQL = """COALESCE(text, '')
      || CASE WHEN doc_id % 3 = 1 THEN ' see https://www.hub'
              || CAST(doc_id % 3 AS VARCHAR) || '.com/ref/'
              || CAST(doc_id AS VARCHAR) ELSE '' END
      || CASE WHEN doc_id % 4 = 2 THEN ' img http://cdn.spam'
              || CAST(doc_id % 4 AS VARCHAR) || '.xyz/i/'
              || CAST(doc_id AS VARCHAR) || ' plus https://tail'
              || CAST(doc_id % 97 AS VARCHAR) || '.net/x' ELSE '' END
      || CASE WHEN doc_id % 7 = 4 THEN ' ref https://m.news'
              || CAST(doc_id % 5 AS VARCHAR) || '.co.uk/a' ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' code https://usr'
              || CAST(doc_id % 7 AS VARCHAR) || '.github.io/proj' ELSE '' END"""

_LINK_HOST = "regexp_extract(x, '^[a-z]+://([^/]+)', 1)"


@query(
    "text_outlink_scan",
    oracle=rf"""
    WITH t AS (SELECT doc_id, {_OUTLINK_SQL} AS mt FROM documents),
    l AS (SELECT doc_id,
                 regexp_extract_all(mt, 'https?://[^\s]+') AS links
          FROM t)
    SELECT doc_id,
           CAST(len(links) AS BIGINT) AS n_links,
           CAST(len(list_distinct(list_transform(links,
                x -> {_reg_domain_sql(_LINK_HOST)}))) AS BIGINT)
             AS n_domains,
           COALESCE(array_to_string(list_sort(list_distinct(
                list_transform(links,
                x -> {_reg_domain_sql(_LINK_HOST)}))), '|'), '') AS domains
    FROM l
    """,
    doc="Outlink extraction over deterministically planted in-text "
    "links: per-document link count, distinct registered-domain "
    "count, and the sorted domain list — where anchor/link-graph "
    "pipelines start; JVM higher-order functions end to end, "
    "map-only, fully hash-gated",
)
def text_outlink_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only, zero shuffle: regexp_extract_all → transform (per-link
    host → registered domain) → array_distinct/sort — all inside
    codegen'd higher-order functions; no explode, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    links = F.regexp_extract_all(_outlinked_text(), F.lit(_LINK_PATTERN), F.lit(0))
    doms = F.array_distinct(
        F.transform(
            links,
            lambda x: registered_domain(
                F.regexp_extract(x, "^[a-z]+://([^/]+)", 1)
            ),
        )
    )
    return docs.select(
        "doc_id",
        F.size(links).cast("long").alias("n_links"),
        F.size(doms).cast("long").alias("n_domains"),
        F.array_join(F.array_sort(doms), "|").alias("domains"),
    )


# -- crawl politeness -------------------------------------------------
# Fetch-RATE monitoring, the operational twin of the domain quota's
# volume cap: a crawler that hammers one host gets blocked (or worse,
# poisons the corpus with rate-limit error pages). The fetch log is
# the `events` table with the module's URL planting keyed by event_id
# — the same host universe as the document-side queries, so the two
# axes (what we keep vs how we fetched it) reconcile per host.

POLITENESS_MAX_HOURLY = 1  # planted-universe cap: hubs trip it, tails don't


@query(
    "url_crawl_politeness",
    oracle=f"""
    WITH e AS (SELECT event_id AS doc_id, ts FROM events),
    f AS (SELECT {_HOST_SQL} AS host, date_trunc('hour', ts) AS h FROM e),
    hh AS (SELECT host, h, CAST(count(*) AS BIGINT) AS c
           FROM f GROUP BY host, h),
    d AS (SELECT host,
                 CAST(sum(c) AS BIGINT) AS n_fetches,
                 CAST(count(*) AS BIGINT) AS n_hours,
                 CAST(max(c) AS BIGINT) AS max_hourly
          FROM hh GROUP BY host)
    SELECT host, {_reg_domain_sql("host")} AS reg_domain,
           n_fetches, n_hours, max_hourly,
           round(n_fetches * 1.0 / n_hours, 4) + 0.0 AS avg_hourly,
           (max_hourly > {POLITENESS_MAX_HOURLY}) AS over_limit
    FROM d
    """,
    doc="Host-level crawl politeness from the events fetch log: "
    "fetches, active hours, peak and mean hourly rate per host, and "
    "the over-limit flag — plus the registered domain so host-level "
    "hot spots roll up to the quota's key. Fully hash-gated",
)
def url_crawl_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two keyed aggregations — (host, hour) then host — both
    partial-aggregated map-side; the hour bucket bounds the first
    shuffle's keys at |hosts| x |hours| however large the log. The
    registered-domain broadcast joins attach AFTER the second
    aggregation, on |hosts| rows, not per fetch — at 100 TB of fetch
    log the PSL lookup costs |hosts|, the log is scanned exactly once,
    and nothing Python touches the plan."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("doc_id"), "ts"
    )
    host = F.parse_url(_url_col(), F.lit("HOST"))
    f = ev.select(
        host.alias("host"), F.date_trunc("hour", F.col("ts")).alias("h")
    )
    hh = f.groupBy("host", "h").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    d = hh.groupBy("host").agg(
        F.sum("c").cast("long").alias("n_fetches"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.max("c").cast("long").alias("max_hourly"),
    )
    return attach_registered_domain(d).select(
        "host",
        "reg_domain",
        "n_fetches",
        "n_hours",
        "max_hourly",
        (
            F.round(F.col("n_fetches") * 1.0 / F.col("n_hours"), 4)
            + F.lit(0.0)
        ).alias("avg_hourly"),
        (F.col("max_hourly") > POLITENESS_MAX_HOURLY).alias("over_limit"),
    )


# -- robots-rule filtering --------------------------------------------
# The crawl-side ANSWER to politeness monitoring: which fetched pages
# were we even allowed to keep? Robots semantics per the de-facto REP
# standard: per host, the matching rule with the LONGEST path prefix
# wins; on a length tie the ALLOW rule wins; no matching rule means
# allowed. The rule set is a dimension (a real crawler materializes
# ~one row per robots.txt directive), so it broadcasts — and the
# winner election runs INSIDE codegen over each doc's matched-rule
# array, so the corpus never shuffles for the verdict.

ROBOTS_RULES: list[tuple[str, str, bool, int]] = [
    ("tracker.ads.badcorp.com", "/", False, 1),
    ("www.hub0.com", "/p/1", False, 2),
    ("www.hub0.com", "/p/12", True, 3),  # longer prefix re-allows
    ("m.news0.co.uk", "/p/", False, 4),
    ("cdn.spam0.xyz", "/", False, 5),
    ("www.shop0.com.au", "/p/3", False, 6),
]

_ROBOTS_VALUES_SQL = ", ".join(
    f"('{h}', '{p}', {str(a).upper()}, {i})" for h, p, a, i in ROBOTS_RULES
)


def robots_rules_df(spark: SparkSession) -> DataFrame:
    """The robots dimension as per-host rule ARRAYS, broadcast-ready.
    Grouped driver-side (the rule set is a Python constant here; a
    real robots table would pay one dim-sized groupBy before the
    broadcast — never corpus-sized)."""
    by_host: dict[str, list] = {}
    for h, p, a, i in ROBOTS_RULES:
        by_host.setdefault(h, []).append((p, a, i))
    return F.broadcast(
        local_df(
            spark,
            list(by_host.items()),
            "rhost string, rules array<struct<"
            "prefix:string,allow:boolean,rule_id:bigint>>",
        )
    )


def robots_winner(path: Column, rules: Column) -> Column:
    """The REP election as a pure expression over a doc's matched-rule
    array: `filter()` keeps rules whose prefix matches the path,
    `array_sort()` with a comparator orders longest-prefix-first
    (allow breaking length ties, rule_id breaking the rest),
    `get(..., 0)` takes the winner struct or NULL — all inside
    whole-stage codegen, shared by the standalone filter and the
    admission pipeline so the two surfaces cannot drift."""
    matches = F.filter(rules, lambda r: path.startswith(r["prefix"]))

    def cmp(a: Column, b: Column) -> Column:
        return (
            F.when(F.length(a["prefix"]) > F.length(b["prefix"]), F.lit(-1))
            .when(F.length(a["prefix"]) < F.length(b["prefix"]), F.lit(1))
            .when(a["allow"] & ~b["allow"], F.lit(-1))
            .when(~a["allow"] & b["allow"], F.lit(1))
            .otherwise((a["rule_id"] - b["rule_id"]).cast("int"))
        )

    return F.get(F.array_sort(matches, cmp), 0)


# the same election in DuckDB, parameterized on the doc CTE name —
# shared by the standalone oracle and the admission pipeline's
_ROBOTS_WINNER_SQL = f"""
    m AS (SELECT d.doc_id, r.allow, r.rule_id,
                 row_number() OVER (PARTITION BY d.doc_id
                     ORDER BY length(r.prefix) DESC, r.allow DESC,
                              r.rule_id) AS rn
          FROM d JOIN (VALUES {_ROBOTS_VALUES_SQL})
                   AS r(rhost, prefix, allow, rule_id)
            ON d.host = r.rhost AND starts_with(d.path, r.prefix)),
    w AS (SELECT doc_id, rule_id, allow FROM m WHERE rn = 1)"""


@query(
    "url_robots_filter",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_HOST_SQL} AS host,
                      regexp_extract({_FULL_URL_SQL},
                          '^([a-z]+)://([^/?#]+)([^?#]*)', 3) AS path
               FROM documents),{_ROBOTS_WINNER_SQL}
    SELECT d.doc_id, d.host, d.path,
           CAST(w.rule_id AS BIGINT) AS rule_id,
           COALESCE(w.allow, TRUE) AS allowed
    FROM d LEFT JOIN w USING (doc_id)
    """,
    doc="Robots-rule filter with longest-prefix-match semantics "
    "(longest path prefix wins per host, allow wins length ties, "
    "no rule means allowed) over planted per-host directives — "
    "including a longer allow prefix nested under a deny, the shape "
    "that breaks naive first-match implementations. Emits the "
    "winning rule id per document for the audit trail. Fully "
    "hash-gated",
)
def url_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero corpus shuffle: the corpus is scanned once and joined to
    the |hosts-with-rules|-row broadcast (`robots_rules_df`); the
    winner is elected inside codegen (`robots_winner`) — no window,
    no aggregation, no per-rule corpus pass however many directives
    the rule set grows (per-doc work is |host's rules|, evaluated
    vectorized)."""
    docs = load_table(spark, sf_dir, "documents")
    url = _url_col()
    d = docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
    )
    per_host = robots_rules_df(spark)
    j = d.join(per_host, d.host == per_host.rhost, "left")
    best = robots_winner(F.col("path"), F.col("rules"))
    return j.select(
        "doc_id",
        "host",
        "path",
        best["rule_id"].alias("rule_id"),
        F.coalesce(best["allow"], F.lit(True)).alias("allowed"),
    )
