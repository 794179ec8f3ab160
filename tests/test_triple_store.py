"""Layer A (triple engine) golden tests — FIXTURES.md §A, derived from
the reference README walkthrough (/root/reference/README.md:166-250) and
SURVEY.md Appendix A quirk register."""

from __future__ import annotations

import json

import pytest

from tripl_spark import TripleStore, entity_cons


@pytest.fixture(scope="module")
def cft_store(spark):
    """The README flagship dataset (README.md:179-205)."""
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
                id="QA255-gDNA-seq1",
                subject={"cft.subject:id": "QA255"},
                seq="AGCGGTGAGCTGA",
                timepoint=[timepoint(id="dpi1204"), timepoint(id="dpi234")],
            ),
            seq(
                id="QA255-gDNA-seq2",
                subject={"cft.subject:id": "QA255"},
                seq="AGCGGTGAGCTGA",
                timepoint=[timepoint(id="dpi1204")],
            ),
            seq(
                id="QA344-gDNA-seq1",
                subject={"cft.subject:id": "QA344"},
                seq="GGCAGTGAGCTGA",
                timepoint=[timepoint(id="dpi234")],
            ),
        ],
        id_attrs=["cft.timepoint:id", "cft.seq:id", "cft.subject:id"],
    )
    return ts


def test_match_seq_type(cft_store):
    assert len(cft_store.match({"cft:type": "cft.type:seq"})) == 3


def test_shared_timepoint_resolves_to_one_entity(cft_store):
    assert len(cft_store.match({"cft.timepoint:id": "dpi1204"})) == 1


def test_match_nested_pattern(cft_store):
    # graph join through a declared ref attr (crashes in the reference — Q3)
    eids = cft_store.match(
        {"cft:type": "cft.type:seq", "cft.seq:subject": {"cft.subject:id": "QA255"}}
    )
    assert len(eids) == 2


def test_match_in_list(cft_store):
    # IN semantics (Q11)
    eids = cft_store.match({"cft.seq:id": ["QA255-gDNA-seq1", "QA344-gDNA-seq1"]})
    assert len(eids) == 2


def test_pull_nested(cft_store):
    # README.md:209-224 golden shape
    out = cft_store.pull_many(
        ["db:ident", "cft.seq:id", {"cft.seq:timepoint": ["cft.timepoint:id"]}],
        {"cft:type": "cft.type:seq"},
    )
    by_id = {d["cft.seq:id"]: d for d in out}
    assert set(by_id) == {"QA255-gDNA-seq1", "QA255-gDNA-seq2", "QA344-gDNA-seq1"}
    tps = by_id["QA255-gDNA-seq1"]["cft.seq:timepoint"]
    assert sorted(tp["cft.timepoint:id"] for tp in tps) == ["dpi1204", "dpi234"]
    assert [tp["cft.timepoint:id"] for tp in by_id["QA255-gDNA-seq2"]["cft.seq:timepoint"]] == [
        "dpi1204"
    ]
    # default card-one → scalar values, not sets (Q1: we honor the default)
    assert isinstance(by_id["QA255-gDNA-seq1"]["cft.seq:id"], str)


def test_pull_reverse_lookup(cft_store):
    # README.md:237-239: seqs pointing at timepoint dpi1204 → 2 parents
    out = cft_store.pull_many(
        ["cft.timepoint:id", {"cft.seq:_timepoint": ["cft.seq:id"]}],
        {"cft.timepoint:id": "dpi1204"},
    )
    assert len(out) == 1
    parents = out[0]["cft.seq:_timepoint"]
    assert sorted(p["cft.seq:id"] for p in parents) == ["QA255-gDNA-seq1", "QA255-gDNA-seq2"]


def test_pull_wildcard_refs_unexpanded(cft_store):
    # Q10: '*' emits raw eids for ref attrs
    eid = sorted(cft_store.match({"cft.seq:id": "QA255-gDNA-seq1"}))[0]
    doc = cft_store.pull(["*"], eid)
    assert doc["cft.seq:seq"] == "AGCGGTGAGCTGA"
    tp_val = doc["cft.seq:timepoint"]
    assert isinstance(tp_val, list) and all(isinstance(v, str) for v in tp_val)


def test_pull_bare_reverse_lookup(cft_store):
    eid = sorted(cft_store.match({"cft.timepoint:id": "dpi1204"}))[0]
    doc = cft_store.pull(["cft.timepoint:id", "cft.seq:_timepoint"], eid)
    stubs = doc["cft.seq:_timepoint"]
    assert len(stubs) == 2 and all("db:ident" in s for s in stubs)


def test_entity_api(cft_store):
    ent = cft_store.entity({"cft.seq:id": "QA255-gDNA-seq1"})
    assert ent["cft.seq:seq"] == "AGCGGTGAGCTGA"
    subj = ent["cft.seq:subject"]
    assert subj["cft.subject:id"] == "QA255"
    # reverse lookup from timepoint to seqs
    tp = cft_store.entity({"cft.timepoint:id": "dpi1204"})
    assert len(tp["cft.seq:_timepoint"]) == 2
    # __contains__ with underscore attr name (Q9 fix)
    assert "cft.seq:seq" in ent


def test_card_one_last_write_wins(cft_store):
    # Q2: re-asserting a card-one attr displaces the old value
    ts = cft_store
    eids = ts.assert_facts([{"cft.subject:id": "QA255", "cft.subject:species": "human"}],
                           id_attrs=["cft.subject:id"])
    ts.assert_facts([{"cft.subject:id": "QA255", "cft.subject:species": "martian"}],
                    id_attrs=["cft.subject:id"])
    doc = ts.pull(["cft.subject:species"], eids[0])
    assert doc["cft.subject:species"] == "martian"


def test_dump_load_roundtrip(cft_store, spark, tmp_path):
    path = str(tmp_path / "dump.json")
    cft_store.dump(path)
    with open(path) as fp:
        data = json.load(fp)
    assert "db:schema" in data  # schema persisted with the data
    ts2 = TripleStore.load(path, spark=spark)
    assert ts2.default_cardinality == "db.cardinality:one"  # settings recovered
    assert len(ts2.match({"cft:type": "cft.type:seq"})) == 3
    out = ts2.pull_many(
        ["cft.seq:id", {"cft.seq:timepoint": ["cft.timepoint:id"]}],
        {"cft:type": "cft.type:seq"},
    )
    assert len(out) == 3


def test_idempotent_reassert(spark):
    ts = TripleStore(spark=spark)
    docs = [{"x:id": "a", "x:tags": ["t1", "t2"]}]
    ts.assert_facts(docs, id_attrs=["x:id"])
    n1 = ts.current_facts(cache=False).count()
    ts.assert_facts(docs, id_attrs=["x:id"])
    n2 = ts.current_facts(cache=False).count()
    assert n1 == n2


def test_recursion_cycle_stub(spark):
    # FIXTURES A4: two entities pointing at each other; '...' must terminate
    ts = TripleStore(spark=spark)
    ts.assert_facts(
        [
            {"db:ident": "a", "g:name": "A", "g:next": "b"},
            {"db:ident": "b", "g:name": "B", "g:next": "a"},
        ]
    )
    doc = ts.pull(["g:name", {"g:next": "..."}], "a")
    # a → b → stub(a)
    b = doc["g:next"][0]
    assert b["g:name"] == ["B"]
    stub = b["g:next"][0]
    assert stub == {"db:ident": "a"}


def test_retract(spark):
    ts = TripleStore(spark=spark)
    ts.assert_facts([{"db:ident": "e1", "x:color": "red"}])
    assert ts.match({"x:color": "red"}) == {"e1"}
    ts.retract_fact(("e1", "x:color", "red"))
    assert ts.match({"x:color": "red"}) == set()


def test_lazy_ref_pull(spark):
    # value equals an existing eid, no schema → pull through it
    ts = TripleStore(spark=spark)
    ts.assert_facts(
        [
            {"db:ident": "n1", "p:name": "child"},
            {"db:ident": "n2", "p:kid": "n1"},
        ]
    )
    doc = ts.pull([{"p:kid": ["p:name"]}], "n2")
    assert doc["p:kid"][0]["p:name"] == ["child"]


def test_entity_write_through(spark):
    from tripl_spark.core.schema import CARD_ONE
    from tripl_spark.core.store import TripleStore

    store = TripleStore(
        schema={"x:name": {"db:cardinality": CARD_ONE}}, spark=spark
    )
    store.assert_fact({"db:ident": "e1", "x:name": "old", "x:tag": "t0"})
    ent = store.entity("e1")

    ent["x:name"] = "new"          # card-one: displaces
    assert ent["x:name"] == "new"
    ent.add("x:tag", "t1")         # card-many: accumulates
    assert sorted(ent["x:tag"]) == ["t0", "t1"]
    ent.retract("x:tag", "t0")
    assert ent["x:tag"] == ["t1"]
    # the write went to the STORE, not just the view
    fresh = store.entity("e1")
    assert fresh["x:name"] == "new"
