"""Distributed pull (pull_df) must agree document-for-document with the
driver-side pull assembly."""

from __future__ import annotations

import json

import pytest

from tripl_spark import TripleStore, entity_cons


@pytest.fixture(scope="module")
def store(spark):
    schema = {
        "cft.seq:timepoint": {
            "db:valueType": "db.type:ref",
            "db:cardinality": "db.cardinality:many",
        },
        "cft.seq:subject": {"db:valueType": "db.type:ref"},
    }
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one", spark=spark)
    subject = entity_cons("cft.type:subject", "cft.subject")
    seq = entity_cons("cft.type:seq", "cft.seq")
    timepoint = entity_cons("cft.type:timepoint", "cft.timepoint")
    ts.assert_facts(
        [
            subject(id="QA255"),
            seq(id="s1", subject={"cft.subject:id": "QA255"}, seq="ACGT", n_reads=12,
                timepoint=[timepoint(id="d1"), timepoint(id="d2")]),
            seq(id="s2", subject={"cft.subject:id": "QA255"}, seq="GGCC", n_reads=7,
                timepoint=[timepoint(id="d1")]),
        ],
        id_attrs=["cft.subject:id", "cft.seq:id", "cft.timepoint:id"],
    )
    return ts


EXPR = [
    "cft.seq:id",
    "cft.seq:n_reads",
    {"cft.seq:timepoint": ["cft.timepoint:id"]},
    {"cft.seq:subject": ["cft.subject:id"]},
]


def test_pull_df_matches_driver_pull(store):
    pattern = {"cft:type": "cft.type:seq"}
    driver_docs = store.pull_many(EXPR, pattern)
    dist_rows = store.pull_df(EXPR, pattern).collect()
    dist_docs = [json.loads(r.doc) for r in dist_rows]
    key = lambda d: d.get("cft.seq:id") or ""
    assert sorted(dist_docs, key=key) == sorted(driver_docs, key=key)
    # typed values survive: ints stay ints
    assert isinstance(dist_docs[0]["cft.seq:n_reads"], int)


def test_pull_df_reverse_lookup(store):
    tp = sorted(store.match({"cft.timepoint:id": "d1"}))[0]
    out = json.loads(store.pull_df(
        ["cft.timepoint:id", "cft.seq:_timepoint"], [tp]
    ).collect()[0].doc)
    driver = store.pull(["cft.timepoint:id", "cft.seq:_timepoint"], tp)
    assert out == driver
    assert len(out["cft.seq:_timepoint"]) == 2


def test_pull_df_unknown_root_husk(store):
    out = json.loads(store.pull_df(EXPR, ["no-such-entity"]).collect()[0].doc)
    assert out == store.pull(EXPR, "no-such-entity")


def test_pull_df_wildcard_matches_driver(store):
    eid = sorted(store.match({"cft:type": "cft.type:seq"}))[0]
    dist = json.loads(store.pull_df(["*"], [eid]).collect()[0].doc)
    driver = store.pull(["*"], eid)
    assert dist == driver
    # refs stay unexpanded eid strings (Q10 semantics)
    assert isinstance(dist["cft.seq:subject"], str)


def test_pull_df_wildcard_plus_expanded_child(store):
    eid = sorted(store.match({"cft:type": "cft.type:seq"}))[0]
    expr = ["*", {"cft.seq:timepoint": ["cft.timepoint:id"]}]
    dist = json.loads(store.pull_df(expr, [eid]).collect()[0].doc)
    driver = store.pull(expr, eid)
    assert dist == driver
    # the explicit child is expanded, not left as a wildcard eid string
    assert all(isinstance(d, dict) for d in dist["cft.seq:timepoint"])


def test_pull_df_recursion_matches_driver_on_chain(spark):
    ts = TripleStore(
        schema={"node:parent": {"db:valueType": "db.type:ref"}},
        default_cardinality="db.cardinality:one",
        spark=spark,
    )
    ts.assert_facts(
        [
            {"db:ident": "n3", "node:name": "root"},
            {"db:ident": "n2", "node:name": "mid", "node:parent": "n3"},
            {"db:ident": "n1", "node:name": "leaf", "node:parent": "n2"},
        ]
    )
    expr = ["node:name", {"node:parent": "..."}]
    dist = json.loads(ts.pull_df(expr, ["n1"]).collect()[0].doc)
    driver = ts.pull(expr, "n1")
    assert dist == driver
    assert dist["node:parent"]["node:parent"]["node:name"] == "root"


def test_pull_df_recursion_cycle_stubs_like_driver(spark):
    """r15: '...' recursion on a cycle emits the DRIVER LOOP's
    ancestor-revisit ident stub (reference cycle rule, tripl.py:665-668)
    — not the r14 bounded unroll that kept looping to depth
    exhaustion. a→b→a stubs at the revisit of a."""
    ts = TripleStore(
        schema={"node:next": {"db:valueType": "db.type:ref"}},
        default_cardinality="db.cardinality:one",
        spark=spark,
    )
    ts.assert_facts(
        [
            {"db:ident": "a", "node:name": "a", "node:next": "b"},
            {"db:ident": "b", "node:name": "b", "node:next": "a"},
        ]
    )
    expr = ["node:name", {"node:next": "..."}]
    doc = json.loads(ts.pull_df(expr, ["a"]).collect()[0].doc)
    assert doc == ts.pull(expr, "a")
    assert doc["node:next"]["node:name"] == "b"
    assert doc["node:next"]["node:next"] == {"db:ident": "a"}


def test_pull_recursion_max_depth_fetch_truncation(spark):
    """The driver loop's ``max_depth`` rule is a FETCH property: nodes
    first reached past max_depth render as husks (requested attrs →
    null), but a node fetched via a SHORTER route still renders fully
    even when a longer path passes through it beyond max_depth. The
    distributed path must reproduce both sides (a naive level cutoff
    fails the second)."""
    ts = TripleStore(
        schema={"x:next": {"db:valueType": "db.type:ref",
                           "db:cardinality": "db.cardinality:many"}},
        default_cardinality="db.cardinality:one",
        spark=spark,
    )
    ts.assert_facts(
        [
            # chain root -> a1 .. a6, PLUS a shortcut root -> a5: a5/a6
            # are fetched at depth 1/2, so the long path renders fully
            # through depth 6 > max_depth
            {"db:ident": "root", "x:name": "root", "x:next": {"a1", "a5"}},
            {"db:ident": "a1", "x:name": "a1", "x:next": {"a2"}},
            {"db:ident": "a2", "x:name": "a2", "x:next": {"a3"}},
            {"db:ident": "a3", "x:name": "a3", "x:next": {"a4"}},
            {"db:ident": "a4", "x:name": "a4", "x:next": {"a5"}},
            {"db:ident": "a5", "x:name": "a5", "x:next": {"a6"}},
            {"db:ident": "a6", "x:name": "a6"},
            # pure chain root2 -> b1 .. b6: b5 is first reached at depth
            # 5 > max_depth -> unfetched -> husk, recursion stops there
            {"db:ident": "root2", "x:name": "root2", "x:next": {"b1"}},
            {"db:ident": "b1", "x:name": "b1", "x:next": {"b2"}},
            {"db:ident": "b2", "x:name": "b2", "x:next": {"b3"}},
            {"db:ident": "b3", "x:name": "b3", "x:next": {"b4"}},
            {"db:ident": "b4", "x:name": "b4", "x:next": {"b5"}},
            {"db:ident": "b5", "x:name": "b5", "x:next": {"b6"}},
            {"db:ident": "b6", "x:name": "b6"},
        ]
    )
    expr = ["x:name", {"x:next": "..."}]
    drv = ts.pull_many(expr, ["root", "root2"], max_depth=4, distributed=False)
    dst = ts.pull_many(expr, ["root", "root2"], max_depth=4, distributed=True)
    assert dst == drv
    # the shortcut keeps the deep chain alive: walking the LONG path
    # root->a1->..->a5 (depth 5 > max_depth) still renders a5 and a6
    # fully, because both were fetched at depth 1/2 via the shortcut
    d = drv[0]
    for _ in range(5):  # a1 a2 a3 a4 a5
        kids = {k.get("x:name"): k for k in d["x:next"]}
        d = kids[min(k for k in kids if k is not None)]
    assert d["x:name"] == "a5"
    assert d["x:next"][0]["x:name"] == "a6"
    # the pure chain husks at b5 (first reached at depth 5 > 4)
    d = drv[1]
    for _ in range(4):  # b1 b2 b3 b4
        d = d["x:next"][0]
    assert d["x:name"] == "b4"
    assert d["x:next"][0] == {"x:name": None, "x:next": []}  # husk


def test_pull_paths_max_path_rows_guard(spark):
    """The r15 size guard: a path expansion whose output tree exceeds
    ``max_path_rows`` RAISES loudly (truncation would be a silently
    wrong answer)."""
    import pytest as _pytest

    from tripl_spark.plans.pull_df import pull_json_paths_df

    ts = TripleStore(
        schema={"x:kid": {"db:valueType": "db.type:ref",
                          "db:cardinality": "db.cardinality:many"}},
        default_cardinality="db.cardinality:one",
        spark=spark,
    )
    # binary-sharing DAG: every level doubles the PATH count while the
    # node count stays 2/level — the exact shape the guard exists for
    docs = [{"db:ident": "l0a", "x:kid": {"l1a", "l1b"}},
            {"db:ident": "l0b", "x:kid": {"l1a", "l1b"}}]
    for lvl in range(1, 6):
        for tag in ("a", "b"):
            d = {"db:ident": f"l{lvl}{tag}"}
            if lvl < 5:
                d["x:kid"] = {f"l{lvl + 1}a", f"l{lvl + 1}b"}
            docs.append(d)
    ts.assert_facts(docs)
    roots = spark.createDataFrame([("l0a",)], "e string")
    with _pytest.raises(RuntimeError, match="max_path_rows"):
        pull_json_paths_df(
            ts.current_facts(), ts.registry, ["db:ident", {"x:kid": "..."}],
            roots, max_path_rows=10,
        ).collect()
    # and the same expansion under the default budget is simply correct
    drv = ts.pull_many(["db:ident", {"x:kid": "..."}], ["l0a"],
                       distributed=False)
    dst = ts.pull_many(["db:ident", {"x:kid": "..."}], ["l0a"],
                       distributed=True)
    assert dst == drv


def test_pull_json_df_rejects_recursion(spark):
    """The bottom-up assembly no longer carries a divergent recursion
    mode — '...' must be routed to the path-keyed assembly."""
    import pytest as _pytest

    from tripl_spark.plans.pull_df import pull_json_df

    ts = TripleStore(spark=spark)
    ts.assert_facts([{"db:ident": "e1", "x:v": 1}])
    roots = spark.createDataFrame([("e1",)], "e string")
    with _pytest.raises(ValueError, match="recursion"):
        pull_json_df(ts.current_facts(), ts.registry,
                     ["x:v", {"x:kid": "..."}], roots)


def test_pull_df_string_escaping(spark):
    ts = TripleStore(spark=spark)
    nasty = 'he said "hi"\n\ttab\\slash'
    ts.assert_facts([{"db:ident": "e1", "x:text": nasty}])
    out = json.loads(ts.pull_df(["x:text"], ["e1"]).collect()[0].doc)
    assert out["x:text"] == [nasty]


@pytest.fixture(scope="module")
def readme_store(spark):
    """The EXACT reference README walkthrough dataset
    (/root/reference/README.md:179-205): three seqs sharing timepoints
    through a card-many ref, one subject-only entity, one extra
    description attr."""
    schema = {
        "cft.seq:timepoint": {
            "db:valueType": "db.type:ref",
            "db:cardinality": "db.cardinality:many",
        },
        "cft.seq:subject": {"db:valueType": "db.type:ref"},
    }
    ts = TripleStore(
        schema=schema, default_cardinality="db.cardinality:one", spark=spark
    )
    subject = entity_cons("cft.type:subject", "cft.subject")
    seq = entity_cons("cft.type:seq", "cft.seq")
    timepoint = entity_cons("cft.type:timepoint", "cft.timepoint")
    ts.assert_facts(
        [
            subject(id="QA255"),
            subject(id="QA344"),
            seq(
                id="QA255-092.Vh",
                seq="AGCGGTGAGCTGA",
                timepoint=[timepoint(id="seed-sample"), timepoint(id="dpi1204")],
                **{"cft:description": "seed sequence for patient QA255"},
            ),
            seq(
                id="15423-1",
                seq="AGCGGTGAGCTGA",
                timepoint=[timepoint(id="dpi234"), timepoint(id="dpi1204")],
            ),
            seq(id="1534-2", seq="AGCGGTGAGCTGA", timepoint=[timepoint(id="L1")]),
        ],
        id_attrs=["cft.timepoint:id", "cft.seq:id", "cft.subject:id"],
    )
    return ts


def test_readme_walkthrough_pull_df_golden(readme_store):
    """README.md:209-224 golden output, through the DISTRIBUTED pull."""
    expr = ["db:ident", "cft.seq:id", {"cft.seq:timepoint": ["cft.timepoint:id"]}]
    eids = sorted(readme_store.match({"cft:type": "cft.type:seq"}))
    docs = [json.loads(r.doc) for r in readme_store.pull_df(expr, eids).collect()]
    by_id = {d["cft.seq:id"]: d for d in docs}
    assert set(by_id) == {"QA255-092.Vh", "15423-1", "1534-2"}
    golden = {  # the README's printed pull_data, as id → timepoint-id set
        "1534-2": ["L1"],
        "15423-1": ["dpi1204", "dpi234"],
        "QA255-092.Vh": ["dpi1204", "seed-sample"],
    }
    for sid, tps in golden.items():
        got = sorted(t["cft.timepoint:id"] for t in by_id[sid]["cft.seq:timepoint"])
        assert got == tps
    # distributed docs must equal the driver-side assembly byte-for-byte
    driver = readme_store.pull_many(expr, {"cft:type": "cft.type:seq"})
    key = lambda d: d["cft.seq:id"]
    assert sorted(docs, key=key) == sorted(driver, key=key)


def test_readme_walkthrough_pull_df_reverse_wildcard(readme_store):
    """README.md:237-239 reverse lookup with '*' children, distributed."""
    expr = ["cft.timepoint:id", {"cft.seq:_timepoint": ["*"]}]
    eids = sorted(readme_store.match({"cft:type": "cft.type:timepoint"}))
    docs = [json.loads(r.doc) for r in readme_store.pull_df(expr, eids).collect()]
    driver = readme_store.pull_many(expr, {"cft:type": "cft.type:timepoint"})
    key = lambda d: d["cft.timepoint:id"]
    assert sorted(docs, key=key) == sorted(driver, key=key)
    by_tp = {d["cft.timepoint:id"]: d for d in docs}
    # dpi1204 is shared by two seqs; their full ('*') docs come back
    parents = by_tp["dpi1204"]["cft.seq:_timepoint"]
    assert sorted(p["cft.seq:id"] for p in parents) == ["15423-1", "QA255-092.Vh"]
    assert all(p["cft.seq:seq"] == "AGCGGTGAGCTGA" for p in parents)


# --------------------------------------------------------------------------
# pull_many's scale switch: past PULL_DISTRIBUTED_THRESHOLD roots the
# assembly runs on the cluster (pull_df JSON) — pinned equal to the
# driver loop, for arbitrary graphs.
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_graph = st.fixed_dictionaries(
    {
        "parents": st.lists(
            st.fixed_dictionaries(
                {
                    "name": st.one_of(st.none(), st.text("ab", min_size=1, max_size=3)),
                    "scores": st.lists(
                        st.integers(0, 9), min_size=0, max_size=3, unique=True
                    ),
                    "kids": st.lists(st.integers(0, 3), min_size=0, max_size=3,
                                     unique=True),
                }
            ),
            min_size=1,
            max_size=5,
        ),
    }
)


def _build_store(spark, parents):
    schema = {
        "t:kid": {"db:valueType": "db.type:ref",
                  "db:cardinality": "db.cardinality:many"},
        "t:score": {"db:cardinality": "db.cardinality:many"},
    }
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one",
                     spark=spark)
    kid_ids = sorted({k for p in parents for k in p["kids"]})
    docs = [{"k:id": f"kid-{k}", "db:ident": f"kid-{k}"} for k in kid_ids]
    for i, p in enumerate(parents):
        d = {"db:ident": f"par-{i}", "t:id": f"par-{i}"}
        if p["name"] is not None:
            d["t:name"] = p["name"]
        if p["scores"]:
            d["t:score"] = set(p["scores"])
        if p["kids"]:
            d["t:kid"] = {f"kid-{k}" for k in p["kids"]}
        docs.append(d)
    ts.assert_facts(docs)
    return ts, [f"par-{i}" for i in range(len(parents))]


@given(g=_graph)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pull_many_distributed_equals_driver_assembly(spark, g):
    """The equivalence property behind the scale switch: for arbitrary
    graphs (missing attrs, shared children, empty multi-values), BOTH
    assembly paths produce identical nested documents — so flipping
    `distributed` (what the threshold does automatically) can never
    change a result."""
    ts, roots = _build_store(spark, g["parents"])
    for expr in (
        ["t:name", "t:score", {"t:kid": ["k:id"]}],
        ["*"],
        ["t:name", {"t:kid": ["k:id", "k:_kid"]}],
    ):
        drv = ts.pull_many(expr, roots, distributed=False)
        dst = ts.pull_many(expr, roots, distributed=True)
        assert drv == dst, (expr, drv, dst)


# Hypothesis graphs that can be CYCLIC: parents may reference other
# parents through a card-one ref. The auto-switch (threshold forced to
# 1) must equal the driver loop on every such graph — since r13 BOTH
# shapes take the cluster path (the path-keyed assembly emits the
# driver loop's ancestor-revisit ident stubs itself; no fallback).
_maybe_cyclic = st.fixed_dictionaries(
    {
        "parents": st.lists(
            st.fixed_dictionaries(
                {
                    "name": st.text("ab", min_size=1, max_size=2),
                    "next": st.one_of(st.none(), st.integers(0, 4)),
                    "kids": st.lists(st.integers(0, 2), max_size=2, unique=True),
                }
            ),
            min_size=1,
            max_size=5,
        ),
    }
)


def _build_maybe_cyclic(spark, parents):
    schema = {
        "t:next": {"db:valueType": "db.type:ref"},
        "t:kid": {"db:valueType": "db.type:ref",
                  "db:cardinality": "db.cardinality:many"},
    }
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one",
                     spark=spark)
    kid_ids = sorted({k for p in parents for k in p["kids"]})
    docs = [{"db:ident": f"kid-{k}", "k:id": f"kid-{k}"} for k in kid_ids]
    for i, p in enumerate(parents):
        d = {"db:ident": f"par-{i}", "t:name": p["name"]}
        if p["next"] is not None and p["next"] < len(parents):
            d["t:next"] = f"par-{p['next']}"
        if p["kids"]:
            d["t:kid"] = {f"kid-{k}" for k in p["kids"]}
        docs.append(d)
    ts.assert_facts(docs)
    return ts, [f"par-{i}" for i in range(len(parents))]


@given(g=_maybe_cyclic)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pull_many_auto_switch_safe_on_any_graph(spark, g):
    """The nested auto-switch property: with the threshold forced to 1,
    the default path must equal the driver loop on EVERY graph —
    including self-loops and ref cycles, which the path-keyed assembly
    stubs exactly like the driver loop (no fallback since r13; '...'
    recursion included since r15). The forced distributed path is the
    same assembly and must agree too."""
    ts, roots = _build_maybe_cyclic(spark, g["parents"])
    ts.PULL_DISTRIBUTED_THRESHOLD = 1
    for expr in (
        ["t:name", {"t:next": ["t:name", {"t:kid": ["k:id"]}]}],
        ["t:name", {"t:next": ["t:name", {"t:next": ["t:name"]}]}],
        # reverse traversal re-enters the parent — revisits through
        # the reverse edge must stub identically
        ["t:name", {"t:next": ["t:name", {"t:_next": ["t:name"]}]}],
        # wildcard + bare reverse at NESTED positions of a cyclic
        # graph: node-local components render path-independently even
        # when sibling paths stub
        ["*", {"t:next": ["*", "t:_next", {"t:kid": ["*"]}]}],
        # '...' recursion (r15): re-enters the ROOT expression at every
        # t:next hop; on cyclic graphs the ancestor-revisit stub rule
        # must land on exactly the driver loop's nodes
        ["t:name", {"t:next": "..."}],
        ["t:name", {"t:kid": ["k:id"]}, {"t:next": "..."}],
        # recursion one level down: the nested '...' still re-enters
        # the ROOT (reference rule), not the inner sub-expression
        ["t:name", {"t:next": ["t:name", {"t:next": "..."}]}],
    ):
        drv = ts.pull_many(expr, roots, distributed=False)
        auto = ts.pull_many(expr, roots)
        forced = ts.pull_many(expr, roots, distributed=True)
        assert auto == drv, (expr, auto, drv)
        assert forced == drv, (expr, forced, drv)


def test_distributed_emits_driver_cycle_stubs(spark):
    """Deterministic pin of the r13 revisit-complete assembly (the r12
    gate's divergence is GONE): on a 2-cycle a<->b, auto and forced
    distributed both return the driver loop's document, including the
    ancestor ident stub — cluster-side, no fallback."""
    schema = {"t:next": {"db:valueType": "db.type:ref"}}
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one",
                     spark=spark)
    ts.assert_facts(
        [
            {"db:ident": "a", "t:name": "a", "t:next": "b"},
            {"db:ident": "b", "t:name": "b", "t:next": "a"},
        ]
    )
    ts.PULL_DISTRIBUTED_THRESHOLD = 1
    expr = ["t:name", {"t:next": ["t:name", {"t:next": ["t:name"]}]}]
    drv = ts.pull_many(expr, ["a"], distributed=False)
    # depth-2 child of the root 'a' is 'a' again -> ancestor stub
    assert drv[0]["t:next"]["t:next"] == {"db:ident": "a"}
    assert ts.pull_many(expr, ["a"]) == drv
    assert ts.pull_many(expr, ["a"], distributed=True) == drv


def test_path_stub_semantics_exactness(spark):
    """The path-keyed assembly stubs exactly on the driver's condition
    (node in ITS OWN ancestor path): chains and diamonds expand fully,
    self-loops stub at depth 1, a 2-cycle reachable at depth 3 stubs
    only when the expression is deep enough to complete the revisit,
    and reverse traversal back to the parent stubs too."""
    schema = {
        "t:next": {"db:valueType": "db.type:ref"},
        "t:kid": {"db:valueType": "db.type:ref",
                  "db:cardinality": "db.cardinality:many"},
    }
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one",
                     spark=spark)
    ts.assert_facts(
        [
            # chain: c1 -> c2 -> c3
            {"db:ident": "c1", "t:next": "c2"},
            {"db:ident": "c2", "t:next": "c3"},
            {"db:ident": "c3", "t:name": "end"},
            # diamond: d0 -> {d1, d2} -> d3 (shared child, no revisit)
            {"db:ident": "d0", "t:kid": {"d1", "d2"}},
            {"db:ident": "d1", "t:next": "d3"},
            {"db:ident": "d2", "t:next": "d3"},
            {"db:ident": "d3", "t:name": "sink"},
            # self-loop
            {"db:ident": "s", "t:name": "loop", "t:next": "s"},
            # 2-cycle reachable only at depth 3+: r -> x -> y -> x
            {"db:ident": "r", "t:next": "x"},
            {"db:ident": "x", "t:next": "y"},
            {"db:ident": "y", "t:next": "x"},
        ]
    )

    def both(expr, roots):
        drv = ts.pull_many(expr, roots, distributed=False)
        dst = ts.pull_many(expr, roots, distributed=True)
        assert dst == drv, (expr, roots, dst, drv)
        return dst

    deep2 = ["t:name", {"t:next": ["t:name", {"t:next": ["t:name"]}]}]
    (chain,) = both(deep2, ["c1"])              # chain: full expansion
    assert chain["t:next"]["t:next"]["t:name"] == "end"
    (dia,) = both([{"t:kid": [{"t:next": ["t:name"]}]}], ["d0"])
    assert [k["t:next"]["t:name"] for k in dia["t:kid"]] == ["sink", "sink"]
    (loop,) = both(["t:name", {"t:next": ["t:name"]}], ["s"])
    assert loop["t:next"] == {"db:ident": "s"}  # self-loop stubs at once
    # x -> y -> x: the depth-2 child of x is x again -> stub
    (xdoc,) = both(deep2, ["x"])
    assert xdoc["t:next"]["t:next"] == {"db:ident": "x"}
    # from r the cycle needs depth 3; deep2 stops short -> no stub
    (rdoc,) = both(deep2, ["r"])
    assert rdoc["t:next"]["t:next"]["t:name"] is None  # y, expanded
    deep3 = ["t:name", {"t:next": deep2}]
    (rdoc3,) = both(deep3, ["r"])
    assert rdoc3["t:next"]["t:next"]["t:next"] == {"db:ident": "x"}
    # reverse traversal revisits the parent -> stubs there too
    (revd,) = both([{"t:next": [{"t:_next": ["t:name"]}]}], ["c1"])
    assert revd["t:next"]["t:_next"] == [{"db:ident": "c1"}]


def test_path_key_injective_for_nul_byte_eids(spark):
    """ADVICE r13 regression: the paths assembly's identity is a
    \\x00-delimited composite (parent key, slot, child). With RAW eid
    components, eids containing the separator alias distinct paths —
    here ``p → "0\\x00c"`` and ``"p\\x000" → "c"`` build the SAME
    level-2 key, merging the two grandchildren's child-fragment groups
    (each would receive BOTH leaves). base64-coded components keep the
    key injective for any eid byte content; the distributed assembly
    must match the driver loop exactly."""
    schema = {"t:kid": {"db:valueType": "db.type:ref",
                        "db:cardinality": "db.cardinality:many"}}
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one",
                     spark=spark)
    ga, gb = "0\x00c", "c"
    ts.assert_facts(
        [
            {"db:ident": "r", "t:name": "root", "t:kid": {"p", "p\x000"}},
            {"db:ident": "p", "t:name": "pa", "t:kid": {ga}},
            {"db:ident": "p\x000", "t:name": "pb", "t:kid": {gb}},
            {"db:ident": ga, "t:name": "ga", "t:kid": {"leaf-a"}},
            {"db:ident": gb, "t:name": "gb", "t:kid": {"leaf-b"}},
            {"db:ident": "leaf-a", "t:name": "la"},
            {"db:ident": "leaf-b", "t:name": "lb"},
        ]
    )
    expr = ["t:name", {"t:kid": ["t:name", {"t:kid": [
        "t:name", {"t:kid": ["t:name"]}]}]}]
    drv = ts.pull_many(expr, ["r"], distributed=False)
    dst = ts.pull_many(expr, ["r"], distributed=True)
    assert dst == drv
    # each grandchild keeps exactly ITS leaf — a merged fragment group
    # would hand both grandchildren both leaves
    leaves = {
        gk["t:name"]: [leaf["t:name"] for leaf in gk["t:kid"]]
        for pk in drv[0]["t:kid"]
        for gk in pk["t:kid"]
    }
    assert leaves == {"ga": ["la"], "gb": ["lb"]}


def test_pull_many_threshold_auto_switch(spark):
    """At >= PULL_DISTRIBUTED_THRESHOLD roots the default path flips to
    cluster-side assembly and stays result-identical — for EVERY
    expression shape since r15 ('...' recursion included; no shape is
    held back on the driver loop any more)."""
    schema = {"t:kid": {"db:valueType": "db.type:ref"}}
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one",
                     spark=spark)
    ts.assert_facts(
        [{"db:ident": f"e-{i}", "t:name": f"n{i % 7}"} for i in range(20)]
    )
    ts.PULL_DISTRIBUTED_THRESHOLD = 10  # instance override for the test
    roots = [f"e-{i}" for i in range(20)]
    auto = ts.pull_many(["t:name"], roots)  # 20 >= 10 -> distributed
    drv = ts.pull_many(["t:name"], roots, distributed=False)
    assert auto == drv
    assert ts._expr_has_recur([{"t:kid": "..."}])
    assert not ts._expr_has_recur(["t:name", {"t:kid": ["t:name"]}])


def test_pull_df_preserves_duplicate_roots_any_shape(store):
    """REGRESSION (r13 review): the row contract — one output row per
    roots row, duplicates included — must not depend on which assembly
    the expression shape selects (flat -> bottom-up, nested ->
    path-keyed)."""
    eid = sorted(store.match({"cft:type": "cft.type:seq"}))[0]
    for expr in (["cft.seq:id"], EXPR):
        rows = store.pull_df(expr, [eid, eid]).collect()
        assert len(rows) == 2, expr
        assert rows[0].doc == rows[1].doc
