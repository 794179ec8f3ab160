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


def test_pull_df_rejects_wildcard_and_recursion(store):
    with pytest.raises(NotImplementedError):
        store.pull_df(["*"], ["x"])
    with pytest.raises(NotImplementedError):
        store.pull_df([{"cft.seq:timepoint": "..."}], ["x"])


def test_pull_df_string_escaping(spark):
    ts = TripleStore(spark=spark)
    nasty = 'he said "hi"\n\ttab\\slash'
    ts.assert_facts([{"db:ident": "e1", "x:text": nasty}])
    out = json.loads(ts.pull_df(["x:text"], ["e1"]).collect()[0].doc)
    assert out["x:text"] == [nasty]
