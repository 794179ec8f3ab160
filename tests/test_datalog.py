"""Datalog query tests over the cft fixture and typed values."""

from __future__ import annotations

import pytest

from tripl_spark import TripleStore, entity_cons


@pytest.fixture(scope="module")
def store(spark):
    ts = TripleStore(default_cardinality="db.cardinality:one", spark=spark)
    subject = entity_cons("cft.type:subject", "cft.subject")
    seq = entity_cons("cft.type:seq", "cft.seq")
    ts.assert_facts(
        [
            subject(id="QA255", age=31),
            subject(id="QA344", age=45),
            seq(id="s1", subject={"cft.subject:id": "QA255"}, len=12),
            seq(id="s2", subject={"cft.subject:id": "QA255"}, len=20),
            seq(id="s3", subject={"cft.subject:id": "QA344"}, len=9),
        ],
        id_attrs=["cft.subject:id", "cft.seq:id"],
    )
    return ts


def test_single_var_find(store):
    rows = store.q(
        {"find": "?id",
         "where": [["?s", "cft:type", "cft.type:seq"], ["?s", "cft.seq:id", "?id"]]}
    )
    assert [r[0] for r in rows] == ["s1", "s2", "s3"]


def test_join_through_graph(store):
    rows = store.q(
        {"find": ["?sid", "?subj_id"],
         "where": [["?s", "cft.seq:id", "?sid"],
                   ["?s", "cft.seq:subject", "?subj"],
                   ["?subj", "cft.subject:id", "?subj_id"]]}
    )
    assert sorted(rows) == [("s1", "QA255"), ("s2", "QA255"), ("s3", "QA344")]


def test_constant_entity_and_numeric_binding(store):
    rows = store.q(
        {"find": ["?sid", "?len"],
         "where": [["?s", "cft.seq:len", "?len"], ["?s", "cft.seq:id", "?sid"]],
         "sort": "?len"}
    )
    assert rows == [("s3", 9), ("s1", 12), ("s2", 20)]
    assert isinstance(rows[0][1], int)


def test_take(store):
    rows = store.q(
        {"find": "?sid",
         "where": [["?s", "cft.seq:id", "?sid"]],
         "sort": "?sid", "take": 2}
    )
    assert [r[0] for r in rows] == ["s1", "s2"]


def test_unbound_find_raises(store):
    with pytest.raises(ValueError, match="not bound"):
        store.q({"find": "?nope", "where": [["?s", "cft.seq:id", "s1"]]})


def test_variable_attribute_with_value_constant(store):
    # formerly NotImplementedError; now: which attrs hold "s1" anywhere
    rows = store.q({"find": "?a", "where": [["?s", "?a", "s1"]]})
    assert [r[0] for r in rows] == ["cft.seq:id"]


def test_variable_attribute_lists_entity_attrs(store):
    # [?e, ?a, ?v] with e ground: enumerate the entity's attributes
    eid = sorted(store.match({"cft.seq:id": "s1"}))[0]
    rows = store.q({"find": "?a", "where": [[eid, "?a", "?v"]]})
    attrs = {r[0] for r in rows}
    assert {"cft:type", "cft.seq:id", "cft.seq:subject", "cft.seq:len", "db:ident"} <= attrs


def test_variable_attribute_joins_across_clauses(store):
    # which attributes hold the value 12 anywhere? (attr var + value const)
    rows = store.q({"find": "?a", "where": [["?e", "?a", 12]]})
    assert [r[0] for r in rows] == ["cft.seq:len"]


def test_variable_attribute_cross_entity_join(store):
    # entities sharing ANY attribute with value equal to s1's len:
    # ?a binds through both clauses (a genuine attr-var join)
    rows = store.q(
        {"find": ["?a", "?id2"],
         "where": [["?e1", "cft.seq:id", "s1"],
                   ["?e1", "?a", "?v"],
                   ["?e2", "?a", "?v"],
                   ["?e2", "cft.seq:id", "?id2"]]}
    )
    # s1 shares cft:type with s2/s3 (and every attr with itself)
    pairs = {(r[0], r[1]) for r in rows}
    assert ("cft:type", "s2") in pairs and ("cft:type", "s3") in pairs


def test_disjoint_clauses_raise_without_opt_in(store):
    # two clauses sharing no variable plan a cartesian product of
    # independent binding sets — almost always a typo'd variable, and a
    # plan bomb at scale, so it raises unless explicitly allowed
    q = {"find": ["?sid", "?age"],
         "where": [["?s", "cft.seq:id", "?sid"],
                   ["?p", "cft.subject:age", "?age"]]}
    with pytest.raises(ValueError, match="shares no variable"):
        store.q(q)
    rows = store.q({**q, "allow_product": True})
    assert len(rows) == 3 * 2  # full product: 3 seqs x 2 subjects


def test_ground_existence_clause_still_allowed(store):
    # a fully-ground clause is an existence check (one-row frame); its
    # variable-free product is the sanctioned semijoin shape, not a bomb
    eid = sorted(store.match({"cft.seq:id": "s1"}))[0]
    rows = store.q(
        {"find": "?sid",
         "where": [[eid, "cft.seq:id", "s1"], ["?s", "cft.seq:id", "?sid"]]}
    )
    assert [r[0] for r in rows] == ["s1", "s2", "s3"]
    # and when the ground clause fails, the conjunction is empty
    rows = store.q(
        {"find": "?sid",
         "where": [[eid, "cft.seq:id", "nope"], ["?s", "cft.seq:id", "?sid"]]}
    )
    assert rows == []


def test_sort_by_card_many_numeric_attribute(spark):
    # card-many numeric attr: the per-entity representative is the TYPED
    # minimum (9 < 12), not the lexicographic canonical-key min (which
    # would pick 12 because 'n:12.0' < 'n:9.0')
    ts = TripleStore(default_cardinality="db.cardinality:many", spark=spark)
    ts.assert_facts(
        [
            {"db:ident": "d1", "x:name": "d1", "x:score": [12, 9]},
            {"db:ident": "d2", "x:name": "d2", "x:score": [10]},
        ]
    )
    rows = ts.q(
        {"find": ["?e", "?name"],
         "where": [["?e", "x:name", "?name"]],
         "sort": "x:score"}
    )
    # d1's representative score is 9 -> d1 sorts before d2 (10)
    assert [r[1] for r in rows] == ["d1", "d2"]


def test_sort_by_attribute(store):
    # the sketch's literal 'sort': 'db:ident' (tripl.py:583): order
    # results by an ATTRIBUTE of the first find var's entity
    rows = store.q(
        {"find": ["?s", "?len"],
         "where": [["?s", "cft:type", "cft.type:seq"], ["?s", "cft.seq:len", "?len"]],
         "sort": "cft.seq:len"}
    )
    assert [r[1] for r in rows] == [9, 12, 20]
    # and with take (the sketch pairs them)
    rows = store.q(
        {"find": ["?s", "?len"],
         "where": [["?s", "cft:type", "cft.type:seq"], ["?s", "cft.seq:len", "?len"]],
         "sort": "cft.seq:len", "take": 2}
    )
    assert [r[1] for r in rows] == [9, 12]


def test_connected_but_reordered_clauses_fold_without_error(spark):
    """A conjunction whose clauses are connected only through a LATER
    clause must evaluate (folding follows connectivity, not written
    order) — only a genuinely disconnected set raises."""
    import pytest

    from tripl_spark.core.store import TripleStore

    ts = TripleStore()
    ts.assert_facts([
        {"db:ident": "a1", "x:a": "y1"},
        {"db:ident": "y1", "x:b": "z1"},
    ])
    # where[1] shares nothing with where[0]'s vars; where[2] connects them
    rows = ts.q({
        "find": ["?e", "?z"],
        "where": [
            ["?e", "x:a", "?y"],
            ["?w", "x:b", "?z"],
            ["?y", "x:b", "?z"],
        ],
    })
    assert len(rows) == 1
    # truly disconnected still raises
    with pytest.raises(ValueError, match="cartesian product"):
        ts.q({
            "find": ["?e", "?w"],
            "where": [["?e", "x:a", "?y"], ["?w", "x:b", "?v"]],
        })


# -- find aggregates (Datomic-style, r6) ------------------------------------


@pytest.fixture(scope="module")
def agg_store(spark):
    from tripl_spark.core.store import TripleStore

    ts = TripleStore(spark=spark)
    ts.assert_facts(
        [
            {"x:id": "a", "x:type": "x.type:thing", "x:score": 3},
            {"x:id": "b", "x:type": "x.type:thing", "x:score": 5},
            {"x:id": "c", "x:type": "x.type:other", "x:score": 9},
            {"x:id": "d", "x:type": "x.type:other", "x:score": 1},
            {"x:id": "e", "x:type": "x.type:other"},  # no score
        ],
        id_attrs=["x:id"],
    )
    return ts


def test_datalog_count_per_group(agg_store):
    got = agg_store.q(
        {"find": ["?t", ["count", "?e"]], "where": [["?e", "x:type", "?t"]]}
    )
    assert got == [("x.type:other", 3), ("x.type:thing", 2)]


def test_datalog_global_aggregates(agg_store):
    assert agg_store.q(
        {"find": [["count", "?e"]], "where": [["?e", "x:type", "x.type:other"]]}
    ) == [(3,)]
    assert agg_store.q(
        {"find": [["count-distinct", "?t"]], "where": [["?e", "x:type", "?t"]]}
    ) == [(2,)]


def test_datalog_typed_min_max_sum_avg(agg_store):
    got = agg_store.q(
        {
            "find": ["?t", ["min", "?s"], ["max", "?s"], ["sum", "?s"], ["avg", "?s"]],
            "where": [["?e", "x:type", "?t"], ["?e", "x:score", "?s"]],
        }
    )
    # numeric TYPED ordering: min of {1, 9} is 1 (the raw canonical
    # keys would sort '1' < '9' here, but 'n:9.0' < 'n:12.0' is the
    # trap this guards); entity 'e' has no score and drops out of the
    # ?s clause on both groups' counts
    assert got == [
        ("x.type:other", 1, 9, 10.0, 5.0),
        ("x.type:thing", 3, 5, 8.0, 4.0),
    ]


def test_datalog_aggregate_rejects_bad_specs(agg_store):
    with pytest.raises(ValueError, match="bad find aggregate"):
        agg_store.q({"find": [["median", "?e"]], "where": [["?e", "x:type", "?t"]]})
    with pytest.raises(ValueError, match="sort only by group variables"):
        agg_store.q(
            {
                "find": ["?t", ["count", "?e"]],
                "where": [["?e", "x:type", "?t"]],
                "sort": "?e",
            }
        )


def test_datalog_aggregate_with_take(agg_store):
    got = agg_store.q(
        {
            "find": ["?t", ["count", "?e"]],
            "where": [["?e", "x:type", "?t"]],
            "sort": "?t",
            "take": 1,
        }
    )
    assert got == [("x.type:other", 3)]


# -- negation (`not` clauses, r6) -------------------------------------------


@pytest.fixture(scope="module")
def neg_store(spark):
    from tripl_spark.core.store import TripleStore

    ts = TripleStore(spark=spark)
    ts.assert_facts(
        [
            {"x:id": "a", "x:type": "x.type:thing", "x:tag": "keep"},
            {"x:id": "b", "x:type": "x.type:thing"},
            {"x:id": "c", "x:type": "x.type:other", "x:tag": "keep"},
        ],
        id_attrs=["x:id"],
    )
    return ts


def test_datalog_not_single_clause(neg_store):
    got = neg_store.q(
        {
            "find": ["?i"],
            "where": [
                ["?e", "x:type", "x.type:thing"],
                ["?e", "x:id", "?i"],
                ["not", ["?e", "x:tag", "keep"]],
            ],
        }
    )
    assert got == [("b",)]


def test_datalog_not_sub_conjunction(neg_store):
    # exclude only entities that are things AND tagged (a alone);
    # b is an untagged thing, c a tagged non-thing — both survive
    got = neg_store.q(
        {
            "find": ["?i"],
            "where": [
                ["?e", "x:id", "?i"],
                ["not", ["?e", "x:type", "x.type:thing"], ["?e", "x:tag", "keep"]],
            ],
        }
    )
    assert got == [("b",), ("c",)]


def test_datalog_not_unanchored_raises(neg_store):
    with pytest.raises(ValueError, match="shares no variable"):
        neg_store.q(
            {
                "find": ["?i"],
                "where": [["?e", "x:id", "?i"], ["not", ["?z", "x:tag", "keep"]]],
            }
        )


def test_datalog_not_composes_with_aggregates(neg_store):
    got = neg_store.q(
        {
            "find": [["count", "?e"]],
            "where": [["?e", "x:id", "?i"], ["not", ["?e", "x:tag", "keep"]]],
        }
    )
    assert got == [(1,)]


# -- disjunction (`or` clauses, r6) -----------------------------------------


def test_datalog_or_single_clauses(neg_store):
    got = neg_store.q(
        {
            "find": ["?i"],
            "where": [
                ["?e", "x:id", "?i"],
                ["or", ["?e", "x:tag", "keep"], ["?e", "x:type", "x.type:other"]],
            ],
        }
    )
    assert got == [("a",), ("c",)]


def test_datalog_or_with_and_branch(neg_store):
    # branch 1: other AND tagged keep (c); branch 2: thing without a
    # tag can't be expressed positively — use an id literal instead
    got = neg_store.q(
        {
            "find": ["?i"],
            "where": [
                ["?e", "x:id", "?i"],
                ["or",
                 ["and", ["?e", "x:type", "x.type:other"], ["?e", "x:tag", "keep"]],
                 ["?e", "x:id", "b"]],
            ],
        }
    )
    assert got == [("b",), ("c",)]


def test_datalog_or_mismatched_branches_raise(neg_store):
    with pytest.raises(ValueError, match="must bind the same variables"):
        neg_store.q(
            {
                "find": ["?i"],
                "where": [
                    ["?e", "x:id", "?i"],
                    ["or", ["?e", "x:tag", "keep"], ["?z", "x:tag", "keep"]],
                ],
            }
        )


def test_datalog_or_composes_with_not_and_aggregates(neg_store):
    got = neg_store.q(
        {
            "find": [["count", "?e"]],
            "where": [
                ["?e", "x:id", "?i"],
                ["or", ["?e", "x:tag", "keep"], ["?e", "x:tag", "hot"]],
                ["not", ["?e", "x:type", "x.type:other"]],
            ],
        }
    )
    assert got == [(1,)]  # only 'a' (thing + keep); 'c' is other


def test_datalog_or_rejects_negated_branch(neg_store):
    with pytest.raises(ValueError, match="bad 'or' branch"):
        neg_store.q(
            {
                "find": ["?i"],
                "where": [
                    ["?e", "x:id", "?i"],
                    ["or", ["?e", "x:tag", "keep"], ["not", ["?e", "x:tag", "hot"]]],
                ],
            }
        )


# -- r7: not-inside-or, 'with', validation, falsy sort ----------------------


def test_datalog_not_inside_or_and_group(neg_store):
    # branch 1: tag=keep AND NOT type=other -> {a}; branch 2: id=b -> {b}
    got = neg_store.q(
        {
            "find": ["?i"],
            "where": [
                ["?e", "x:id", "?i"],
                ["or",
                 ["and", ["?e", "x:tag", "keep"],
                  ["not", ["?e", "x:type", "x.type:other"]]],
                 ["?e", "x:id", "b"]],
            ],
        }
    )
    assert sorted(r[0] for r in got) == ["a", "b"]


def test_datalog_or_branch_only_negation_rejected(neg_store):
    with pytest.raises(ValueError, match="ONLY a negation"):
        neg_store.q(
            {
                "find": ["?i"],
                "where": [
                    ["?e", "x:id", "?i"],
                    ["or", ["?e", "x:tag", "keep"],
                     ["and", ["not", ["?e", "x:tag", "hot"]]]],
                ],
            }
        )


def test_datalog_malformed_not_raises(neg_store):
    # a 'not' whose sub-clause is not [e, a, v] must raise, never be
    # silently parsed as a positive triple with entity literal "not"
    with pytest.raises(ValueError, match="bad 'not' clause"):
        neg_store.q(
            {
                "find": ["?i"],
                "where": [
                    ["?e", "x:id", "?i"],
                    ["not", ["?e", "x:tag"]],
                ],
            }
        )


def test_datalog_product_guard_reports_clause_repr(neg_store):
    # the error must show the offending clause itself (indices into the
    # reordered positives+ors list would mislead)
    with pytest.raises(ValueError, match=r"\['\?z', 'x:tag', '\?t'\]"):
        neg_store.q(
            {
                "find": ["?i", "?t"],
                "where": [
                    ["?e", "x:id", "?i"],
                    ["?z", "x:tag", "?t"],
                ],
            }
        )


@pytest.fixture(scope="module")
def with_store(spark):
    from tripl_spark.core.store import TripleStore

    ts = TripleStore(spark=spark)
    ts.assert_facts(
        [
            {"x:id": "p", "x:score": 5},
            {"x:id": "q", "x:score": 5},
            {"x:id": "r", "x:score": 3},
        ],
        id_attrs=["x:id"],
    )
    return ts


def test_datalog_with_distinguishes_entities_in_sum(with_store):
    q_base = {
        "find": [["sum", "?v"]],
        "where": [["?e", "x:score", "?v"]],
    }
    # set semantics: equal scores from different entities collapse
    assert with_store.q(q_base) == [(8.0,)]
    # Datomic's :with escape — one tuple per entity before aggregating
    assert with_store.q({**q_base, "with": ["?e"]}) == [(13.0,)]
    # string form accepted too
    assert with_store.q({**q_base, "with": "?e"}) == [(13.0,)]


def test_datalog_with_unbound_var_raises(with_store):
    with pytest.raises(ValueError, match="'with' variables"):
        with_store.q(
            {
                "find": [["sum", "?v"]],
                "where": [["?e", "x:score", "?v"]],
                "with": ["?zzz"],
            }
        )


def test_datalog_aggregate_falsy_sort_is_deterministic(with_store):
    # 'sort': [] must behave like absent sort (default group ordering),
    # not silently skip BOTH orderings
    q_dict = {
        "find": ["?v", ["count", "?e"]],
        "where": [["?e", "x:score", "?v"]],
        "sort": [],
    }
    got = with_store.q(q_dict)
    assert got == [(3, 1), (5, 2)]


def test_datalog_with_gives_bag_semantics_on_non_aggregate(with_store):
    # Datomic's :with on a NON-aggregate query suppresses duplicate
    # elimination across distinct with-tuples: the two entities scoring
    # 5 each contribute a row
    q_dict = {"find": ["?v"], "where": [["?e", "x:score", "?v"]]}
    assert with_store.q(q_dict) == [(3,), (5,)]
    got = with_store.q({**q_dict, "with": ["?e"]})
    assert sorted(got) == [(3,), (5,), (5,)]
