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


def test_variable_attribute_unsupported(store):
    with pytest.raises(NotImplementedError):
        store.q({"find": "?a", "where": [["?s", "?a", "s1"]]})
