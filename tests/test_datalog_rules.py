"""Recursive datalog rules (semi-naive fixpoint): ancestor closure and
same-generation, checked against driver-side references."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.plans.datalog import eval_rules, facts_with_rules, q_df


def _parent_facts(spark, pairs):
    rows = [
        (c, "parent", "ref", p, None, None, 0)
        for c, p in pairs
    ]
    return spark.createDataFrame(
        rows,
        "e string, a string, vtype string, v_str string, v_num double, "
        "v_bool boolean, t long",
    )


ANCESTOR_RULES = [
    (["?x", "anc", "?y"], [["?x", "parent", "?y"]]),
    (["?x", "anc", "?y"], [["?x", "parent", "?z"], ["?z", "anc", "?y"]]),
]


def _closure(pairs):
    parent = {}
    for c, p in pairs:
        parent.setdefault(c, set()).add(p)
    out = set()

    def walk(start, node):
        for p in parent.get(node, ()):
            if (start, p) not in out:
                out.add((start, p))
                walk(start, p)

    for c in list(parent):
        walk(c, c)
    return out


def test_ancestor_closure_on_chain_and_fork(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "c"), ("y", "z")]
    facts = _parent_facts(spark, pairs)
    anc = eval_rules(facts, ANCESTOR_RULES)["anc"]
    got = {(r.e, r.v) for r in anc.collect()}
    assert got == _closure(pairs)


def test_derived_predicate_usable_in_query(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    extended = facts_with_rules(_parent_facts(spark, pairs), ANCESTOR_RULES)
    rows = q_df(
        extended, {"find": ["?who"], "where": [["?who", "anc", "d"]]}
    ).collect()
    assert {r["?who"] for r in rows} == {"s:a", "s:b", "s:c"}


def test_same_generation_rule(spark):
    # sg(X,Y) :- parent(X,P), parent(Y,P)       (siblings/cousins base)
    # sg(X,Y) :- parent(X,P1), sg(P1,P2), parent(Y,P2)
    pairs = [("a1", "p1"), ("a2", "p1"), ("b1", "p2"), ("p1", "g"), ("p2", "g")]
    rules = [
        (["?x", "sg", "?y"], [["?x", "parent", "?p"], ["?y", "parent", "?p"]]),
        (
            ["?x", "sg", "?y"],
            [
                ["?x", "parent", "?p1"],
                ["?p1", "sg", "?p2"],
                ["?y", "parent", "?p2"],
            ],
        ),
    ]
    sg = eval_rules(_parent_facts(spark, pairs), rules)["sg"]
    got = {(r.e, r.v) for r in sg.collect()}
    # a1/a2 share p1; p1/p2 share g; so a1,a2 are same-generation with b1
    assert ("a1", "a2") in got and ("a1", "b1") in got and ("a2", "b1") in got
    assert ("p1", "p2") in got
    assert ("a1", "g") not in got and ("a1", "p1") not in got


def test_store_q_with_rules(spark):
    from tripl_spark.core.store import TripleStore

    store = TripleStore(spark=spark)
    store.assert_facts(
        [
            {"db:ident": "a", "fam:parent": {"db:ident": "b"}},
            {"db:ident": "b", "fam:parent": {"db:ident": "c"}},
        ],
    )
    # resolve idents to eids driver-side for the rule base attribute
    rules = [
        (["?x", "anc", "?y"], [["?x", "fam:parent", "?y"]]),
        (["?x", "anc", "?y"], [["?x", "fam:parent", "?z"], ["?z", "anc", "?y"]]),
    ]
    rows = store.q(
        {"find": ["?x", "?y"], "where": [["?x", "anc", "?y"]]}, rules=rules
    )
    eid = {i: next(iter(store.match({"db:ident": i}))) for i in "abc"}
    assert set(rows) == {
        (eid["a"], eid["b"]),
        (eid["b"], eid["c"]),
        (eid["a"], eid["c"]),
    }


def test_derived_clause_same_var_is_intra_row_equality(spark):
    """A derived-predicate clause with the same variable in BOTH
    positions inside a rule body must bind only self-pairs —
    previously _derived_clause_df silently dropped the e==v constraint
    and bound the variable to v alone, admitting every reach target."""
    from tripl_spark.core.store import TripleStore
    from tripl_spark.plans import datalog

    ts = TripleStore()
    ts.assert_facts([
        {"db:ident": "a", "g:to": {"db:ident": "b"}},
        {"db:ident": "b", "g:to": {"db:ident": "a"}},
        {"db:ident": "c", "g:to": {"db:ident": "d"}},
        {"db:ident": "d", "g:to": {"db:ident": "e"}},
    ])
    rules = [
        (["?x", "reach", "?y"], [["?x", "g:to", "?y"]]),
        (["?x", "reach", "?y"], [["?x", "g:to", "?z"], ["?z", "reach", "?y"]]),
        # cycle members' outgoing edges: the body's ["?x","reach","?x"]
        # is the derived same-var clause under test — without the
        # intra-row equality, ?x would bind every reach TARGET (incl.
        # d), wrongly admitting (d, e)
        (["?x", "cyc_out", "?y"], [["?x", "reach", "?x"], ["?x", "g:to", "?y"]]),
    ]
    rel = datalog.eval_rules(ts.current_facts(), rules)
    pairs = sorted((r.e, r.v) for r in rel["cyc_out"].collect())
    assert pairs == [("a", "b"), ("b", "a")]
    # and the query path over the same self-clause agrees
    rows = ts.q({"find": "?x", "where": [["?x", "reach", "?x"]]}, rules=rules)
    assert sorted(r[0] for r in rows) == ["a", "b"]


def test_or_over_derived_and_base_predicates(spark):
    # 'or' composes with rule-derived predicates: a branch over the
    # derived 'anc' relation unions with a branch over base 'parent'
    pairs = [("a", "b"), ("b", "c"), ("y", "z")]
    extended = facts_with_rules(_parent_facts(spark, pairs), ANCESTOR_RULES)
    rows = q_df(
        extended,
        {"find": ["?who"],
         "where": [["or", ["?who", "anc", "c"], ["?who", "parent", "z"]]]},
    ).collect()
    assert {r["?who"] for r in rows} == {"s:a", "s:b", "s:y"}


def test_not_over_derived_predicate(spark):
    # stratified negation over a derived relation: parents that are NOT
    # ancestors of d
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("y", "z")]
    extended = facts_with_rules(_parent_facts(spark, pairs), ANCESTOR_RULES)
    rows = q_df(
        extended,
        {"find": ["?who"],
         "where": [["?who", "parent", "?kid"],
                   ["not", ["?who", "anc", "d"]]]},
    ).collect()
    assert {r["?who"] for r in rows} == {"s:y"}


def _tagged_facts(spark, pairs, tags):
    rows = [(c, "parent", "ref", p, None, None, 0) for c, p in pairs]
    rows += [(n, "tag", "string", t, None, None, 0) for n, t in tags]
    return spark.createDataFrame(
        rows,
        "e string, a string, vtype string, v_str string, v_num double, "
        "v_bool boolean, t long",
    )


def test_rule_body_with_or_clause(spark):
    # link(x, y) :- parent(x, y) is covered by edges; the OR lets a
    # rule body accept either of two base attributes
    rows = [("a", "parent", "ref", "b", None, None, 0),
            ("c", "spouse", "ref", "d", None, None, 0)]
    facts = spark.createDataFrame(
        rows,
        "e string, a string, vtype string, v_str string, v_num double, "
        "v_bool boolean, t long",
    )
    rules = [(["?x", "link", "?y"],
              [["or", ["?x", "parent", "?y"], ["?x", "spouse", "?y"]]])]
    link = eval_rules(facts, rules)["link"]
    assert {(r.e, r.v) for r in link.collect()} == {("a", "b"), ("c", "d")}


def test_rule_body_with_base_negation_in_recursion(spark):
    # ancestor closure that never passes THROUGH a blocked node: the
    # negation (base attribute) applies inside every semi-naive round
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    facts = _tagged_facts(spark, pairs, [("c", "blocked")])
    rules = [
        (["?x", "anc", "?y"],
         [["?x", "parent", "?y"], ["not", ["?x", "tag", "blocked"]]]),
        (["?x", "anc", "?y"],
         [["?x", "parent", "?z"], ["?z", "anc", "?y"],
          ["not", ["?z", "tag", "blocked"]]]),
    ]
    anc = eval_rules(facts, rules)["anc"]
    got = {(r.e, r.v) for r in anc.collect()}
    # c->d dropped (c blocked as source); b->c survives (b not blocked)
    # and a->c derives through b; nothing reaches d
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}


def test_rule_body_rejects_negated_derived_predicate(spark):
    import pytest

    facts = _parent_facts(spark, [("a", "b")])
    rules = [
        (["?x", "anc", "?y"], [["?x", "parent", "?y"]]),
        (["?x", "weird", "?y"],
         [["?x", "parent", "?y"], ["not", ["?x", "anc", "?y"]]]),
    ]
    with pytest.raises(ValueError, match="non-stratifiable"):
        eval_rules(facts, rules)


def test_rule_body_rejects_derived_predicate_in_or(spark):
    import pytest

    facts = _parent_facts(spark, [("a", "b")])
    rules = [
        (["?x", "anc", "?y"], [["?x", "parent", "?y"]]),
        (["?x", "weird", "?y"],
         [["or", ["?x", "parent", "?y"], ["?x", "anc", "?y"]]]),
    ]
    with pytest.raises(ValueError, match="derived predicate"):
        eval_rules(facts, rules)


def test_aggregate_over_derived_relation(spark):
    # the r8 composition gate: a find-aggregate grouping OVER the
    # recursive rule's derived predicate — count of ancestors per
    # descendant vs the driver-side closure
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "c"), ("y", "z")]
    extended = facts_with_rules(_parent_facts(spark, pairs), ANCESTOR_RULES)
    rows = q_df(
        extended,
        {"find": ["?d", ["count", "?a"]], "where": [["?d", "anc", "?a"]]},
    ).collect()
    got = {r["?d"][2:]: r["count_a"] for r in rows}
    want: dict[str, int] = {}
    for d, _a in _closure(pairs):
        want[d] = want.get(d, 0) + 1
    assert got == want


def test_store_q_aggregate_with_rules(spark):
    # the same composition through the TripleStore.q public API
    from tripl_spark.core.store import TripleStore

    store = TripleStore(spark=spark)
    store.assert_facts(
        [
            {"db:ident": "a", "fam:parent": {"db:ident": "b"}},
            {"db:ident": "b", "fam:parent": {"db:ident": "c"}},
        ],
    )
    rules = [
        (["?x", "anc", "?y"], [["?x", "fam:parent", "?y"]]),
        (["?x", "anc", "?y"], [["?x", "fam:parent", "?z"], ["?z", "anc", "?y"]]),
    ]
    rows = store.q(
        {"find": ["?x", ["count", "?y"]], "where": [["?x", "anc", "?y"]]},
        rules=rules,
    )
    eid = {i: next(iter(store.match({"db:ident": i}))) for i in "ab"}
    assert set(rows) == {(eid["a"], 2), (eid["b"], 1)}
