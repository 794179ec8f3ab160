"""Distributed bulk JSON ingestion: eid parity with the driver-side
flattener, nested/array handling, idempotence, and remap-to-existing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tripl_spark import TripleStore
from tripl_spark.core.flatten import deterministic_eid
from tripl_spark.functions.ids import uuid5_py
from tripl_spark.sources.json_bulk import flatten_docs_df

DOCS = [
    {"x:id": "a1", "x:name": "Alpha", "x:score": 7,
     "x:tags": ["t1", "t2"],
     "x:child": {"y:id": "c1", "y:name": "Child1"}},
    {"x:id": "a2", "x:name": "Beta", "x:score": 9,
     "x:kids": [{"y:id": "c2"}, {"y:id": "c3"}]},
]


@pytest.fixture(scope="module")
def docs_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("bulk") / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in DOCS))
    return spark.read.json(str(p))


def test_eid_parity_with_driver_flattener():
    assert deterministic_eid("x:id", "a1") == uuid5_py("tripl:x:id=a1")


def test_bulk_flatten_rows(spark, docs_df):
    rows = flatten_docs_df(docs_df, id_attrs=["x:id", "y:id"]).collect()
    by_attr: dict[str, list] = {}
    for r in rows:
        by_attr.setdefault(r.a, []).append(r)
    a1 = deterministic_eid("x:id", "a1")
    assert {r.v_str for r in by_attr["x:name"] if r.e == a1} == {"Alpha"}
    assert {r.v_str for r in by_attr["x:tags"]} == {"t1", "t2"}
    # nested child carries deterministic id + ref from parent
    c1 = deterministic_eid("y:id", "c1")
    ref = [r for r in by_attr["x:child"] if r.e == a1]
    assert len(ref) == 1 and ref[0].v_str == c1 and ref[0].vtype == "ref"
    # array of structs: two distinct children
    kid_refs = {r.v_str for r in by_attr["x:kids"]}
    assert kid_refs == {deterministic_eid("y:id", "c2"), deterministic_eid("y:id", "c3")}
    # int typed
    assert {int(r.v_num) for r in by_attr["x:score"]} == {7, 9}


def test_bulk_matches_driver_path(spark, docs_df):
    """Same docs through both write paths → same compacted facts."""
    ts_driver = TripleStore(spark=spark)
    ts_driver.assert_facts(DOCS, id_attrs=["x:id", "y:id"])
    ts_bulk = TripleStore(spark=spark)
    ts_bulk.assert_docs_df(docs_df, id_attrs=["x:id", "y:id"])

    def canon(ts):
        return sorted(
            (r.e, r.a, r.vtype, r.v_str, r.v_num, r.v_bool)
            for r in ts.current_facts(cache=False).collect()
            if not (r.e == "db:schema" or r.e.startswith("db"))
        )

    assert canon(ts_driver) == canon(ts_bulk)


def test_bulk_ingest_idempotent(spark, docs_df):
    ts = TripleStore(spark=spark)
    ts.assert_docs_df(docs_df, id_attrs=["x:id", "y:id"])
    n1 = ts.current_facts(cache=False).count()
    ts.assert_docs_df(docs_df, id_attrs=["x:id", "y:id"])
    n2 = ts.current_facts(cache=False).count()
    assert n1 == n2


def test_bulk_remaps_to_existing_explicit_ident(spark, docs_df):
    """An entity pre-asserted with an explicit ident must absorb bulk
    facts that identify it by id_attr."""
    ts = TripleStore(spark=spark)
    ts.assert_facts([{"db:ident": "my-explicit-id", "x:id": "a1", "x:extra": "kept"}])
    ts.assert_docs_df(docs_df, id_attrs=["x:id", "y:id"])
    eids = ts.match({"x:id": "a1"})
    assert eids == {"my-explicit-id"}
    doc = ts.pull(["x:name", "x:extra"], "my-explicit-id")
    assert doc["x:name"] == ["Alpha"] and doc["x:extra"] == ["kept"]


def test_bulk_query_through_store(spark, docs_df):
    ts = TripleStore(spark=spark)
    ts.assert_docs_df(docs_df, id_attrs=["x:id", "y:id"])
    out = ts.pull_many(
        ["x:name", {"x:kids": ["y:id"]}], {"x:id": "a2"}
    )
    assert len(out) == 1
    assert sorted(k["y:id"][0] for k in out[0]["x:kids"]) == ["c2", "c3"]


def test_remap_prunes_mapping_to_batch_eids(spark, docs_df):
    """The store-derived eid mapping must shrink to the batch's minted
    eids BEFORE broadcasting (r8): entities unrelated to the batch must
    not affect the result, and the physical plan must show the pruning
    semi-join feeding a broadcast — never a store-sized broadcast."""
    from pyspark.sql import functions as F

    from tripl_spark.core.store import TripleStore
    from tripl_spark.sources.json_bulk import flatten_docs_df, remap_to_existing

    ts = TripleStore(spark=spark)
    # one matching entity + a crowd of irrelevant ones
    ts.assert_facts(
        [{"db:ident": "target", "x:id": "a1"}]
        + [{"db:ident": f"noise-{i}", "x:id": f"zz{i}"} for i in range(50)]
    )
    rows = flatten_docs_df(docs_df, id_attrs=["x:id", "y:id"])
    out = remap_to_existing(rows, ts.facts_df(), ["x:id", "y:id"])
    # the one overlapping id rewrites; nothing else leaks in
    es = {r.e for r in out.select("e").distinct().collect()}
    assert "target" in es
    assert not any(e.startswith("noise-") for e in es)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "BroadcastExchange" in plan, plan
