"""Parameter-sweep provenance (sources/nest.py) — the SCons-free
re-expression of the reference's tripl.nestly: ident-chain parity with
the reference formula (nestly.py:244-250), label coercion (X3),
metadata callables (X2), provenance ingest (S11), nest-level
aggregation (A3), and the metadata.json sink format (S12)."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from tripl_spark import TripleStore
from tripl_spark.sources.nest import (
    AGGREGATE_ATTR,
    ROOT_NS,
    NestFile,
    NestSweep,
    default_label,
)


def build_sweep():
    sweep = NestSweep(name="base", base_namespace="run")
    sweep.add("model", ["gpt-a", "gpt-b"], metadata={"family": "decoder"})
    sweep.add(
        "seed",
        lambda c: [1, 2] if c["model"] == "gpt-a" else [7],
        metadata=lambda c, v: {"parity": "odd" if v % 2 else "even"},
        full_dump=True,
    )

    @sweep.add_target(name="ckpt")
    def ckpt(outdir, c):
        return NestFile(os.path.join(outdir, "model.ckpt"), sources=["data.txt"])

    @sweep.add_target(name="_scratch")
    def scratch(outdir, c):
        return "hidden"

    sweep.expand()
    return sweep


def test_default_label_matches_reference_semantics():
    # nestly.py:139-147 verbatim behavior
    assert default_label("x") == "x"
    assert default_label({"id": 3}) == "3"
    assert default_label(4) == "4"
    assert default_label(4.5) == "4.5"
    with pytest.raises(Exception):
        default_label([1])


def test_ident_chain_matches_reference_formula():
    sweep = build_sweep()
    controls = sweep._expanded
    # reference chain (nestly.py:244-250): root = uuid3(URL_NS, ns);
    # per level: uuid3(uuid3(parent_ident, level_name), label(value))
    root = uuid.uuid3(ROOT_NS, "run.base")
    model_a = uuid.uuid3(uuid.uuid3(root, "model"), "gpt-a")
    seed_1 = uuid.uuid3(uuid.uuid3(model_a, "seed"), "1")
    by_level = {}
    for c in controls:
        by_level.setdefault(c["_level"], []).append(c)
    assert by_level["base"][0]["run.base.db:ident"] == root
    assert any(c["run.model.db:ident"] == model_a for c in by_level["model"])
    assert any(c["run.seed.db:ident"] == seed_1 for c in by_level["seed"])
    # re-expansion mints identical idents (the reproducibility point)
    again = build_sweep()._expanded
    assert {str(c[k]) for c in controls for k in c if str(k).endswith("db:ident")} == {
        str(c[k]) for c in again for k in c if str(k).endswith("db:ident")
    }


def test_callable_nestable_and_metadata_callable():
    sweep = build_sweep()
    seeds = [c for c in sweep._expanded if c["_level"] == "seed"]
    # callable nestable: gpt-a → seeds 1,2; gpt-b → seed 7 (3 leaves)
    assert sorted(c["seed"] for c in seeds) == [1, 2, 7]
    # X2: metadata callable evaluated with (control, value)
    docs = {d["run.seed:id"]: d for d in sweep.docs() if d["tripl:type"] == "run.seed"}
    assert docs["1"]["run.seed:parity"] == "odd"
    assert docs["7"]["run.seed:parity"] == "odd"
    assert docs["2"]["run.seed:parity"] == "even"


def test_docs_provenance_shape():
    sweep = build_sweep()
    docs = sweep.docs()
    seed1 = next(d for d in docs if d.get("run.seed:id") == "1")
    # S11: file target became a file entity chained off the level ident
    ck = seed1["run.seed:ckpt"]
    expected_ident = uuid.uuid3(
        uuid.UUID(seed1["db:ident"]), ck["tripl.file:path"]
    )
    assert ck["db:ident"] == str(expected_ident)
    assert ck["tripl.file:sources"] == [{"tripl.file:path": "data.txt"}]
    # hidden targets omitted (nestly.py:384-385)
    assert "run.seed:_scratch" not in seed1
    # parent ref present
    assert "db:ident" in seed1["run.seed:model"]
    # A3: the model level sees no aggregate (not full_dump), the seed
    # level is a leaf; aggregation shows up on full_dump parents
    model_a = next(d for d in docs if d.get("run.model:id") == "gpt-a")
    assert model_a["run.model:family"] == "decoder"


def test_full_dump_aggregation_on_parents():
    sweep = NestSweep(name="base", base_namespace="agg")
    sweep.add("model", ["m1"], full_dump=True)
    sweep.add("seed", [1, 2])
    sweep.expand()
    docs = sweep.docs()
    model = next(d for d in docs if d["tripl:type"] == "agg.model")
    # A3: children aggregated under the full_dump parent
    aggregated = {d["db:ident"] for d in model[AGGREGATE_ATTR]}
    seeds = {d["db:ident"] for d in docs if d["tripl:type"] == "agg.seed"}
    assert aggregated == seeds and len(seeds) == 2


def test_ingest_into_store_and_pull(spark):
    sweep = build_sweep()
    ts = TripleStore(
        schema={"run.seed:model": {"db:valueType": "db.type:ref"}},
        default_cardinality="db.cardinality:one",
        spark=spark,
    )
    sweep.ingest(ts)
    # provenance facts are queryable like any other entities
    seeds = ts.pull_many(
        ["run.seed:id", "run.seed:parity", {"run.seed:model": ["run.model:id"]}],
        {"tripl:type": "run.seed"},
    )
    by_id = {d["run.seed:id"]: d for d in seeds}
    assert set(by_id) == {"1", "2", "7"}
    assert by_id["7"]["run.seed:model"]["run.model:id"] == "gpt-b"
    # idempotent re-ingest: same idents → same entity count
    n = len(ts.match({"tripl:type": "run.seed"}))
    sweep.ingest(ts)
    assert len(ts.match({"tripl:type": "run.seed"})) == n


def test_dump_metadata_sink_roundtrip(spark, tmp_path):
    sweep = build_sweep()
    paths = sweep.dump_metadata(str(tmp_path))
    assert all(os.path.exists(p) for p in paths)
    # reference sink format: a JSON LIST holding the doc (nestly.py:58-59)
    with open(paths[0]) as fp:
        payload = json.load(fp)
    assert isinstance(payload, list) and len(payload) == 1
    # the files round-trip through the store's multi-file loader (S2+S12)
    ts = TripleStore(spark=spark)
    for p in paths:
        ts.assert_facts(json.load(open(p)), id_attrs=[])
    assert len(ts.match({"tripl:type": "run.seed"})) == 3


def test_full_dump_with_ancestor_targets():
    # regression: a parent level with targets + a full_dump child used
    # to KeyError when the child's doc rendered the parent's full doc
    sweep = NestSweep(name="base", base_namespace="rt")
    sweep.add("model", ["m1", "m2"])

    @sweep.add_target(name="cfg")
    def cfg(outdir, c):
        return f"cfg-{c['model']}"

    sweep.add("seed", [1, 2], full_dump=True)
    sweep.expand()
    docs = sweep.docs()
    seed_docs = [d for d in docs if d["tripl:type"] == "rt.seed"]
    assert len(seed_docs) == 4
    # the embedded full parent doc carries the parent's target value
    for d in seed_docs:
        parent = d["rt.seed:model"]
        assert parent["rt.model:cfg"] == f"cfg-{parent['rt.model:id']}"
