"""URL curation family (`operators/urls.py`): registered-domain
extraction, domain quotas, blocklist ledger, prevalence — semantics
pinned locally; the driver hash gates pin both engines to each other."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.operators.urls import (
    DOMAIN_QUOTA_K,
    registered_domain,
    url_components,
    _url_col,
)
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table

_ensure_loaded()


_PSL_CASES = [
    ("www.hub1.com", "hub1.com"),
    ("blog.hub1.com", "hub1.com"),          # subdomains collapse
    ("m.news3.co.uk", "news3.co.uk"),       # multi-label suffix: 3 labels
    ("www.shop1.com.au", "shop1.com.au"),   # r15 table row: com.au
    ("usr4.github.io", "usr4.github.io"),   # r15 table row: github.io
    ("img.portal.gov0.ck", "portal.gov0.ck"),  # r15 wildcard rule *.ck
    ("gov0.ck", "gov0.ck"),                 # wildcard: already a reg domain
    ("tracker.ads.badcorp.com", "badcorp.com"),  # deep subdomain chain
    ("hub1.com", "hub1.com"),               # already registered
    ("localhost", "localhost"),             # single label: unchanged
]


def test_registered_domain_public_suffix_rule(spark):
    df = spark.createDataFrame([(h,) for h, _ in _PSL_CASES], "host string")
    got = [r.rd for r in
           df.select(registered_domain(F.col("host")).alias("rd")).collect()]
    assert got == [want for _, want in _PSL_CASES]


def test_registered_domain_join_form_agrees_with_expression(spark):
    """The scan path's broadcast-join form (`attach_registered_domain`,
    the rule TABLE) and the lambda-path expression form must agree on
    every shape — one rule set, two physical forms (r15)."""
    from tripl_spark.operators.urls import attach_registered_domain

    df = spark.createDataFrame([(h,) for h, _ in _PSL_CASES], "host string")
    joined = {r.host: r.reg_domain
              for r in attach_registered_domain(df).collect()}
    assert joined == dict(_PSL_CASES)


def test_registered_domain_accepts_custom_rule_set(spark):
    """ADVICE r14: the suffix set is a parameter — callers outside the
    planted universe bring their own rules."""
    df = spark.createDataFrame([("a.b.custom",), ("x.y.zz",)], "host string")
    got = [r.rd for r in df.select(registered_domain(
        F.col("host"), exact=("b.custom",), wildcards=("zz",)).alias("rd")
    ).collect()]
    assert got == ["a.b.custom", "x.y.zz"]


def test_url_components_round_trip(spark, sf_small):
    u = url_components(load_table(spark, sf_small, "documents"), _url_col())
    row = u.filter(F.col("doc_id") == 0).collect()[0]
    # doc_id 0: %10=0 → www.hub0.com, %11≠5 → https, %6=0 → utm qstring
    assert row.url == "https://www.hub0.com/p/0?utm_source=feed&id=0"
    assert (row.scheme, row.host, row.reg_domain, row.tld) == (
        "https", "www.hub0.com", "hub0.com", "com")
    assert row.path == "/p/0" and row.qstring == "utm_source=feed&id=0"
    # every row re-assembles: url == scheme://host + path [+ ?qstring]
    bad = u.filter(
        F.col("url")
        != F.concat(
            F.col("scheme"), F.lit("://"), F.col("host"), F.col("path"),
            F.when(F.col("qstring") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("qstring"))
            ),
        )
    ).count()
    assert bad == 0


def test_domain_quota_caps_every_domain(spark, sf_small):
    q = REGISTRY["url_domain_quota"].fn(spark, sf_small)
    kept = q.filter("kept").groupBy("reg_domain").count().collect()
    assert all(r["count"] <= DOMAIN_QUOTA_K for r in kept)
    # head domains actually hit the cap (the quota bites)
    by_dom = {r.reg_domain: r["count"] for r in kept}
    assert by_dom["hub0.com"] == DOMAIN_QUOTA_K
    # rank is dense from 1 within each domain, ordered longest-first
    rows = sorted(
        (r for r in q.collect() if r.reg_domain == "hub0.com"),
        key=lambda r: r.rk,
    )
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.kept == (r.rk <= DOMAIN_QUOTA_K) for r in rows)


def test_blocklist_reasons_partition_the_planted_mix(spark, sf_small):
    d = REGISTRY["url_blocklist_drops"].fn(spark, sf_small)
    by_reason = {
        r.drop_reason: r["count"]
        for r in d.groupBy("drop_reason").count().collect()
    }
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    n_xyz = docs.filter(F.col("doc_id") % 10 == 7).count()
    n_bad = docs.filter(F.col("doc_id") % 10 == 9).count()
    assert by_reason.get("blocked_tld", 0) == n_xyz
    assert by_reason.get("blocked_domain", 0) == n_bad
    assert by_reason.get(None, 0) == n - n_xyz - n_bad
    # ledger discipline: kept == no reason, row count preserved
    assert d.count() == n
    assert d.filter("kept").count() == n - n_xyz - n_bad
    assert d.filter("kept AND drop_reason IS NOT NULL").count() == 0


def test_domain_prevalence_shares_sum_to_one(spark, sf_small):
    p = REGISTRY["url_domain_prevalence"].fn(spark, sf_small)
    rows = p.collect()
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-3
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, sf_small, "documents").count()
    # the planted head (hub0-2.com, 6/10 of docs over 3 domains) is
    # each ~20% of the corpus — the concentration the quota targets
    by_dom = {r.reg_domain: r for r in rows}
    for d in ("hub0.com", "hub1.com", "hub2.com"):
        assert 0.15 < by_dom[d].doc_share < 0.25


def test_canonical_url_known_examples(spark):
    from tripl_spark.operators.urls import canonical_url

    cases = [
        ("https://www.hub1.com/a/3", "www.hub1.com/a/3"),
        ("http://www.hub1.com/a/3", "www.hub1.com/a/3"),     # scheme erased
        ("https://www.hub1.com/a/3?utm_source=x&utm_medium=y",
         "www.hub1.com/a/3"),                                 # tracking erased
        ("https://www.hub1.com/a/3?id=7&utm_campaign=z",
         "www.hub1.com/a/3?id=7"),                            # real param kept
        ("https://www.hub1.com/a/3?utm_campaign=z&id=7",
         "www.hub1.com/a/3?id=7"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.c for r in
           df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_dedup_group_invariants(spark, sf_small):
    d = REGISTRY["url_canonical_dedup"].fn(spark, sf_small)
    rows = d.collect()
    n = load_table(spark, sf_small, "documents").count()
    assert len(rows) == n                      # ledger keeps every doc
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canonical_url, []).append(r)
    # the planting makes real duplicate groups (scheme/tracking variance
    # within a path block) — the dedup must actually bite
    assert any(len(g) > 1 for g in by_canon.values())
    for g in by_canon.values():
        assert all(r.group_size == len(g) for r in g)
        keepers = [r for r in g if r.keeper]
        assert len(keepers) == 1               # exactly one survivor
        assert keepers[0].doc_id == min(r.doc_id for r in g)


def test_provenance_pipeline_conservation_and_precedence(spark, sf_small):
    led = REGISTRY["pipeline_provenance_curation"].fn(spark, sf_small)
    rows = led.collect()
    docs = load_table(spark, sf_small, "documents")
    assert len(rows) == docs.count()            # every doc, exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    stages = {r.drop_stage for r in rows}
    # every stage fires on the planted corpus, and some docs survive
    assert {"blocked_domain", "blocked_tld", "domain_quota",
            "mojibake", "pii", None} <= stages
    # precedence: a blocked doc_id (%10 in {7,9}) never shows a
    # later-stage reason
    for r in rows:
        if r.doc_id % 10 == 7:
            assert r.drop_stage == "blocked_tld"
        if r.doc_id % 10 == 9:
            assert r.drop_stage == "blocked_domain"
        assert r.kept == (r.drop_stage is None)
    # quota consistency with the standalone query: among blocklist
    # survivors, fate 'domain_quota' <=> standalone rank > K
    quota = {r.doc_id: r.rk for r in
             REGISTRY["url_domain_quota"].fn(spark, sf_small).collect()}
    from tripl_spark.operators.urls import DOMAIN_QUOTA_K
    for r in rows:
        if r.doc_id % 10 in (7, 9):
            continue
        # note: standalone ranks over ALL docs, the pipeline over
        # blocklist survivors — but blocked hosts are distinct domains
        # (spam*.xyz, badcorp.com), so survivor ranks agree
        assert (r.drop_stage == "domain_quota") == (
            quota[r.doc_id] > DOMAIN_QUOTA_K
        ), r


def test_outlink_scan_known_examples(spark, sf_small):
    out = {r.doc_id: r for r in
           REGISTRY["text_outlink_scan"].fn(spark, sf_small).collect()}
    # doc 0: only the r15 github branch fires (0%3=0, 0%4=0, 0%7=0,
    # 0%5=0) — and the 3-label registered domain rides the table rule
    assert out[0].n_links == 1 and out[0].domains == "usr0.github.io"
    # doc 4: %3=1 (hub link) and %7=4 (news link) fire
    assert out[4].n_links == 2
    assert out[4].domains == "hub1.com|news4.co.uk"
    # doc 10: %3=1, %4=2 and %5=0 fire -> hub + (spam + tail) + github
    assert out[10].n_links == 4
    assert out[10].n_domains == 4
    assert "spam2.xyz" in out[10].domains and "tail10.net" in out[10].domains
    assert "usr3.github.io" in out[10].domains


# -- properties ---------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_label = st.text("abz09", min_size=1, max_size=4)
_param = st.one_of(
    st.tuples(st.sampled_from(["utm_source", "utm_medium", "utm_campaign"]),
              st.text("xy1", min_size=1, max_size=3)),
    st.tuples(st.text("abq", min_size=1, max_size=4),
              st.text("xy1", min_size=0, max_size=3)),
)
_url = st.builds(
    lambda scheme, labels, path, params: (
        scheme + "://" + ".".join(labels) + "/" + path
        + ("?" + "&".join(f"{k}={v}" for k, v in params) if params else "")
    ),
    st.sampled_from(["http", "https"]),
    st.lists(_label, min_size=1, max_size=4),
    st.text("abz09/", max_size=8),
    st.lists(_param, max_size=3),
)


@given(urls=st.lists(_url, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_canonical_url_idempotent_and_tracking_free(spark, urls):
    """canonical(canonical(u)) == canonical(u) for arbitrary URLs, and
    the canonical form never carries a utm_ param — the properties the
    dedup's correctness (stable grouping key) rests on. Re-canonicalize
    by prefixing a scheme (canonical forms are scheme-less)."""
    from tripl_spark.operators.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(F.concat(F.lit("https://"),
                               canonical_url(F.col("u")))).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, (r.c1, r.c2)
        assert "utm_" not in (r.c1.split("?", 1) + [""])[1]


@given(hosts=st.lists(st.lists(_label, min_size=1, max_size=5)
                      .map(".".join), min_size=1, max_size=10))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_registered_domain_total_and_suffix(spark, hosts):
    """registered_domain never NULLs/empties and always returns a
    dot-suffix of the host with at most 3 labels, for any host shape
    (single-label included)."""
    from tripl_spark.operators.urls import registered_domain

    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    for r in df.select("h", registered_domain(F.col("h")).alias("rd")).collect():
        assert r.rd, r
        assert ("." + r.h).endswith("." + r.rd), r
        assert 1 <= len(r.rd.split(".")) <= 3, r


def test_quality_quota_prefers_passing_docs(spark, sf_small):
    """`url_domain_quota_quality`'s ranking contract: within a
    domain, NO failing document may hold a rank above a passing one
    (the quota fills with the battery's survivors first), and every
    domain caps at DOMAIN_QUOTA_K."""
    from tripl_spark.operators.urls import DOMAIN_QUOTA_K
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["url_domain_quota_quality"].fn(spark, sf_small).collect()
    by_dom: dict = {}
    for r in rows:
        by_dom.setdefault(r.reg_domain, []).append(r)
    for dom, rs in by_dom.items():
        assert len(rs) <= DOMAIN_QUOTA_K, dom
        rs = sorted(rs, key=lambda r: r.rk)
        seen_fail = False
        for r in rs:
            if not r.passes:
                seen_fail = True
            else:
                assert not seen_fail, (dom, [x.rk for x in rs])
    # the planted corpus has both fates inside at least one hot domain
    assert any(
        len({r.passes for r in rs}) == 2 for rs in by_dom.values()
    ), "planting no longer exercises the pass-first ordering"


def test_robots_longest_prefix_override(spark, sf_small):
    """The REP election rules on planted docs: /p/12* re-ALLOWED under
    the /p/1* deny (longest prefix wins, the naive first-match
    killer), /p/10* stays denied, hosts with no rules default-allow
    with a NULL rule id, and the blanket '/' deny catches the tracker
    host."""
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = {r.doc_id: r for r in
            REGISTRY["url_robots_filter"].fn(spark, sf_small).collect()}
    assert rows[12].host == "www.hub0.com"
    assert rows[12].allowed and rows[12].rule_id == 3   # /p/12 allow wins
    assert rows[102].host == "www.hub0.com"
    assert not rows[102].allowed and rows[102].rule_id == 2  # /p/1 deny
    assert rows[120].allowed and rows[120].rule_id == 3  # /p/120 under /p/12
    assert rows[19].host == "tracker.ads.badcorp.com"
    assert not rows[19].allowed and rows[19].rule_id == 1  # blanket '/'
    assert rows[10].host == "www.hub1.com"
    assert rows[10].allowed and rows[10].rule_id is None  # no rules: default
