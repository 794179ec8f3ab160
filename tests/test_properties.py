"""Property-based equivalence tests (hypothesis): the custom operators
must agree with a trivially-correct reference implementation on
arbitrary small inputs — including degenerate ones (all-hot single key,
empty frames, boundary timestamps) that fixed fixtures miss.

Examples are kept small and the Spark work tiny so the whole module
stays in seconds; the value is the input-space coverage, not scale.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tripl_spark.operators.rangejoin import range_join
from tripl_spark.operators.skew import salted_agg, salted_join
from tripl_spark.plans.graph import connected_components

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key (few → hot keys common)
        st.integers(min_value=-50, max_value=50),  # value
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_st)
@settings(**SETTINGS)
def test_salted_agg_equals_plain_groupby(spark, rows):
    df = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(rows)], "id long, k long, v double"
    )
    salted = {
        (r.k): (r.sum_v, r.cnt)
        for r in salted_agg(df, ["k"], tiebreaker="id", sums=["v"], n=4)
        .withColumnRenamed("sum_v", "sum_v")
        .collect()
    }
    plain = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert salted == plain


@given(rows=rows_st)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, rows):
    fact = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(4)], "dk long, name string")
    salted = sorted(
        (r.id, r.name)
        for r in salted_join(fact, dim, "k", "dk", tiebreaker="id", n=3).collect()
    )
    plain = sorted(
        (r.id, r.name) for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    assert salted == plain


ts_rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),      # user key
        st.integers(min_value=0, max_value=7200),   # seconds offset (spans bins)
    ),
    min_size=1,
    max_size=25,
)


@given(rows=ts_rows_st)
@settings(**SETTINGS)
def test_range_join_equals_naive_inequality_join(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id long, k long, ts timestamp")
    left = df.select(F.col("id").alias("lid"), "k", "ts")
    right = df.select(F.col("id").alias("rid"), "k", "ts")
    got = sorted(
        (r.lid, r.rid)
        for r in range_join(left, right, ["k"], "ts", "ts", window_seconds=600)
        .select("lid", "rid")
        .collect()
    )
    want = sorted(
        (a_id, b_id)
        for (a_id, a_k, a_ts) in data
        for (b_id, b_k, b_ts) in data
        if a_k == b_k and a_ts < b_ts <= a_ts + dt.timedelta(seconds=600)
    )
    assert got == want


edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=15
)


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@given(edges=edges_st)
@settings(**SETTINGS)
def test_connected_components_equals_union_find(spark, edges):
    nodes = sorted({n for e in edges for n in e})
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.comp for r in connected_components(edf).collect()}
    assert got == _union_find_components(edges, nodes)


texts_st = st.lists(
    st.text(
        alphabet=st.sampled_from("ab cd"),  # spaces → multi-token docs
        min_size=0, max_size=120,
    ),
    min_size=1, max_size=8,
)


@given(texts=texts_st)
@settings(**SETTINGS)
def test_chunking_covers_every_token_within_width(spark, texts):
    from tripl_spark.operators.substring import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_documents(df, width=6, stride=4).collect()
    toks = {
        r.doc_id: (r.text or "").strip().lower().split()
        for r in df.collect()
    }
    # chunks reassemble to exactly the tokenized doc: chunk i starts at
    # i*stride; width bounded; concatenation of stride-prefixes + last
    # chunk == token stream
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in out:
        assert 1 <= r.n_tokens <= 6
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split()
    for doc_id, tokens in toks.items():
        # Spark's split on '\s+' of a whitespace-only/empty string gives
        # one empty token; chunk_documents filters size>0 frames
        expected = [t for t in " ".join(tokens).split()]
        if not expected:
            # split('\s+') on '' yields [''] (size 1) — a single
            # empty-string token chunk is emitted; accept either shape
            chunks = by_doc.get(doc_id, {})
            assert chunks == {} or list(chunks) == [0]
            continue
        chunks = by_doc[doc_id]
        n = len(expected)
        assert sorted(chunks) == list(range((n - 1) // 4 + 1))
        for i, ctoks in chunks.items():
            assert ctoks == expected[i * 4 : i * 4 + 6]


# -- mergeable quantile summary vs exact ranks on random data ----------------


@given(
    vals=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=120)
)
@settings(**SETTINGS)
def test_quantile_estimate_rank_bound_random(spark, vals):
    from tripl_spark.operators.sketches import Q_SAMPLES, Q_SHARDS, quantile_estimates

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "event_id long, value double"
    )
    est = {
        r.q: r.estimate
        for r in quantile_estimates(df, "value", "event_id", [0.5, 0.9]).collect()
    }
    s = sorted(float(v) for v in vals)
    n = len(s)
    import bisect

    for q, e in est.items():
        # the estimate is an actual data value whose global rank is
        # within the summary's rank-error bound of q*n
        lo, hi = bisect.bisect_left(s, e), bisect.bisect_right(s, e)
        slack = n / Q_SAMPLES + Q_SHARDS
        assert lo - slack <= q * n <= hi + slack, (q, e, lo, hi, n)


# -- datalog conjunctive queries vs brute-force evaluation -------------------
#
# Random store + random connected conjunctive pattern: TripleStore.q must
# agree with a trivially-correct driver-side evaluator over the same
# entity dicts; for the single-entity-variable subset it must also agree
# with match() (and pull on the matched ids round-trips the idents).

_ATTRS = ["x:n", "x:s"]
_VALS = {"x:n": [0, 1, 2], "x:s": ["p", "q"]}

entities_st = st.lists(
    st.tuples(
        st.sampled_from(_VALS["x:n"]),
        st.sampled_from(_VALS["x:s"]),
        st.integers(min_value=-1, max_value=5),  # ref target (clipped; -1 = none)
    ),
    min_size=2,
    max_size=6,
)

query_shape_st = st.tuples(
    st.sampled_from(_ATTRS),               # clause-0 attribute
    st.booleans(),                         # clause-0 value: constant or ?v
    st.integers(min_value=0, max_value=2),  # constant index
    st.booleans(),                         # add a ref hop?
    st.sampled_from(_ATTRS),               # hop clause attribute
    st.integers(min_value=0, max_value=1),  # hop constant index
)


def _naive_q(triples, clauses, find_vars):
    """Brute-force conjunctive evaluation over (e, a, v) tuples."""
    bindings = [{}]
    for e_t, a, v_t in clauses:
        nxt = []
        for b in bindings:
            for (te, ta, tv) in triples:
                if ta != a:
                    continue
                nb = dict(b)
                ok = True
                for term, actual in ((e_t, te), (v_t, tv)):
                    if isinstance(term, str) and term.startswith("?"):
                        if term in nb and nb[term] != actual:
                            ok = False
                        else:
                            nb[term] = actual
                    elif term != actual:
                        ok = False
                if ok:
                    nxt.append(nb)
        bindings = nxt
    return {tuple(b[v] for v in find_vars) for b in bindings}


@given(ents=entities_st, shape=query_shape_st)
@settings(**SETTINGS)
def test_datalog_q_equals_bruteforce_and_match(spark, ents, shape):
    from tripl_spark import TripleStore

    docs, triples = [], []
    for i, (n, s, ref) in enumerate(ents):
        doc = {"db:ident": f"e{i}", "x:n": n, "x:s": s}
        if 0 <= ref < len(ents):
            doc["x:ref"] = {"db:ident": f"e{ref}"}
            triples.append((f"e{i}", "x:ref", f"e{ref}"))
        triples += [(f"e{i}", "x:n", n), (f"e{i}", "x:s", s)]
        docs.append(doc)
    ts = TripleStore(default_cardinality="db.cardinality:one", spark=spark)
    ts.assert_facts(docs)

    a0, use_var, vi, hop, a1, vj = shape
    c0_val = _VALS[a0][vi % len(_VALS[a0])]
    clauses = [["?e", a0, "?v"] if use_var else ["?e", a0, c0_val]]
    find = ["?e", "?v"] if use_var else ["?e"]
    if hop:
        clauses += [["?e", "x:ref", "?f"], ["?f", a1, _VALS[a1][vj % len(_VALS[a1])]]]
        find.append("?f")
    got = set(ts.q({"find": find, "where": clauses}))
    assert got == _naive_q(triples, clauses, find)

    if not hop and not use_var:
        # single-entity-var constant pattern: q ≡ match, and pull on the
        # matched ids round-trips the idents
        eids = ts.match({a0: c0_val})
        assert {r[0] for r in got} == set(eids)
        pulled = ts.pull_many(["db:ident"], eids)
        assert {p["db:ident"] for p in pulled} == set(eids)


@given(texts=texts_st)
@settings(**SETTINGS)
def test_span_pairs_match_bruteforce(spark, texts):
    from tripl_spark.operators.substring import shared_span_pairs, span_hashes

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r.id_a, r.id_b) for r in shared_span_pairs(df).collect()}
    # brute-force reference with the DEFAULT width/stride
    from tripl_spark.operators.substring import SPAN_STRIDE, SPAN_TOKENS

    spans: dict[int, set[str]] = {}
    for i, t in enumerate(texts):
        toks = t.strip().lower().split()
        s = set()
        for start in range(0, max(len(toks) - SPAN_TOKENS, 0) + 1, SPAN_STRIDE):
            if start + SPAN_TOKENS <= len(toks):
                s.add(" ".join(toks[start : start + SPAN_TOKENS]))
        if len(toks) >= SPAN_TOKENS:
            spans[i] = s
    want = {
        (a, b)
        for a in spans
        for b in spans
        if a < b and spans[a] & spans[b]
    }
    assert got == want


# --- heavy hitters: lower bound + everywhere-exact on random corpora ---

hh_corpus_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # doc_id (drives the shard)
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f", "zz"]),
            min_size=1,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=30,
)


@given(corpus=hh_corpus_st)
@settings(**SETTINGS)
def test_heavy_hitter_merge_bounds_random(spark, corpus):
    """For ANY corpus/sharding: merged summary estimates never exceed
    the true count, and a term present in every shard's summary is
    estimated exactly. (Tiny vocab → every term survives each shard's
    top-k, so everywhere-present terms must be exact.)"""
    from tripl_spark.operators.sketches import (
        HH_SHARDS,
        _shard_of,
        heavy_hitter_merge,
        heavy_hitter_summaries,
    )

    tokens = spark.createDataFrame(
        [(i, t) for i, toks in corpus for t in toks], "doc_id long, term string"
    ).select(_shard_of(F.col("doc_id")).alias("shard"), "term")
    merged = {
        r.term: (r.hh_estimate, r.n_shards)
        for r in heavy_hitter_merge(heavy_hitter_summaries(tokens)).collect()
    }
    truth: dict[str, int] = {}
    shards: dict[str, set] = {}
    for r in tokens.collect():
        truth[r.term] = truth.get(r.term, 0) + 1
        shards.setdefault(r.term, set()).add(r.shard)
    n_shards_total = tokens.select("shard").distinct().count()
    assert set(merged) == set(truth)
    for term, (est, ns) in merged.items():
        assert est <= truth[term], term
        assert ns == len(shards[term]), term
        # vocab << HH_LOCAL_K: nothing is ever truncated, so exact
        assert est == truth[term], term
    assert n_shards_total <= HH_SHARDS


# --- datalog not/or ≡ brute force over generated stores/queries ------------


def _naive_bindings(triples, clauses, seed=None):
    """Positive-conjunction fold → list of binding dicts (optionally
    seeded with pre-bound variables, for negation sub-evaluation)."""
    bindings = [dict(seed or {})]
    for e_t, a, v_t in clauses:
        nxt = []
        for b in bindings:
            for (te, ta, tv) in triples:
                if ta != a:
                    continue
                nb = dict(b)
                ok = True
                for term, actual in ((e_t, te), (v_t, tv)):
                    if isinstance(term, str) and term.startswith("?"):
                        if term in nb and nb[term] != actual:
                            ok = False
                        else:
                            nb[term] = actual
                    elif term != actual:
                        ok = False
                if ok:
                    nxt.append(nb)
        bindings = nxt
    return bindings


def _naive_vars(clauses):
    return {t for c in clauses for t in c if isinstance(t, str) and t.startswith("?")}


def _naive_apply_not(triples, bindings, sub):
    """Drop bindings with a satisfying extension of the negated body."""
    nvars = _naive_vars(sub)
    out = []
    for b in bindings:
        seed = {k: v for k, v in b.items() if k in nvars}
        if not _naive_bindings(triples, sub, seed):
            out.append(b)
    return out


def _naive_full(triples, where, find_vars):
    """not/or-aware brute-force evaluator mirroring q_df's strata:
    positives+ors join first, negations anti-join after."""
    positives = [c for c in where if c[0] not in ("not", "or")]
    ors = [c for c in where if c[0] == "or"]
    nots = [list(c[1:]) for c in where if c[0] == "not"]
    bindings = _naive_bindings(triples, positives)
    for oc in ors:
        branch_rows = []
        for br in oc[1:]:
            sub = [list(x) for x in br[1:]] if br[0] == "and" else [list(br)]
            pos = [c for c in sub if c[0] != "not"]
            bb = _naive_bindings(triples, pos)
            for nc in (list(c[1:]) for c in sub if c[0] == "not"):
                bb = _naive_apply_not(triples, bb, nc)
            branch_rows.extend(bb)
        joined = []
        for b in bindings:
            for ob in branch_rows:
                if all(b.get(k, ob[k]) == ob[k] for k in ob):
                    joined.append({**b, **ob})
        bindings = joined
    for sub in nots:
        bindings = _naive_apply_not(triples, bindings, sub)
    return {tuple(b[v] for v in find_vars) for b in bindings}


_DLVALS = {"x:s": ["p", "q", "r"], "x:t": ["u", "v"]}

dl_entities_st = st.lists(
    st.tuples(st.sampled_from(_DLVALS["x:s"]), st.sampled_from(_DLVALS["x:t"])),
    min_size=2,
    max_size=6,
)

dl_shape_st = st.tuples(
    st.integers(min_value=0, max_value=2),  # or-branch-1 x:s constant
    st.integers(min_value=0, max_value=2),  # or-branch-2 x:s constant
    st.integers(min_value=0, max_value=1),  # not clause x:t constant
    st.booleans(),                          # negation inside or-branch-1?
    st.booleans(),                          # top-level not too?
)


@given(ents=dl_entities_st, shape=dl_shape_st)
@settings(**SETTINGS)
def test_datalog_not_or_equals_bruteforce(spark, ents, shape):
    from tripl_spark import TripleStore

    docs, triples = [], []
    for i, (s, t) in enumerate(ents):
        eid = f"e{i}"
        docs.append({"db:ident": eid, "x:s": s, "x:t": t})
        triples += [(eid, "x:s", s), (eid, "x:t", t)]
    ts = TripleStore(default_cardinality="db.cardinality:one", spark=spark)
    ts.assert_facts(docs)

    s1, s2, tneg, neg_in_or, top_not = shape
    c1, c2 = _DLVALS["x:s"][s1], _DLVALS["x:s"][s2]
    tv = _DLVALS["x:t"][tneg]
    br1 = (
        ["and", ["?e", "x:s", c1], ["not", ["?e", "x:t", tv]]]
        if neg_in_or
        else ["?e", "x:s", c1]
    )
    where = [["?e", "x:t", "?t"], ["or", br1, ["?e", "x:s", c2]]]
    if top_not:
        where.append(["not", ["?e", "x:t", tv]])
    find = ["?e", "?t"]
    got = set(ts.q({"find": find, "where": where}))
    want = _naive_full(triples, where, find)
    # engine binds entities/values through canonical keys then decodes;
    # entity vars come back as raw eids, value vars as raw strings —
    # same shapes as the naive tuples
    assert got == want


# --- id_attrs remap: batch-pruned ≡ unpruned reference -----------------------

_ids_st = st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=8)


@given(store_ids=_ids_st, batch_ids=_ids_st)
@settings(**SETTINGS)
def test_remap_pruning_equals_unpruned_reference(spark, store_ids, batch_ids):
    """The r8 semi-join pruning in remap_to_existing is semantics-free:
    for ANY overlap pattern between store identities and batch ids
    (disjoint, subset, duplicated ids), the pruned remap must equal the
    naive store-sized-mapping remap computed inline."""
    from tripl_spark.functions.ids import deterministic_eid_col
    from tripl_spark.sources.json_bulk import remap_to_existing

    existing = spark.createDataFrame(
        [(f"ent-{i}", "x:id", "string", f"id-{i}", None, None, 0)
         for i in set(store_ids)],
        "e string, a string, vtype string, v_str string, v_num double, "
        "v_bool boolean, t long",
    )
    batch = spark.createDataFrame(
        [(i, f"id-{i}") for i in batch_ids], "n long, val string"
    ).select(
        deterministic_eid_col("x:id", F.col("val")).alias("e"),
        F.lit("x:id").alias("a"), F.lit("string").alias("vtype"),
        F.col("val").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        F.lit(0).cast("long").alias("t"),
    )
    got = {(r.e, r.v_str) for r in
           remap_to_existing(batch, existing, ["x:id"]).collect()}
    # naive reference: full store mapping applied driver-side
    mapping = {
        r2.f: r2.e
        for r2 in existing.select(
            deterministic_eid_col("x:id", F.col("v_str")).alias("f"), "e"
        ).collect()
    }
    want = {(mapping.get(r.e, r.e), r.v_str) for r in batch.collect()}
    assert got == want
