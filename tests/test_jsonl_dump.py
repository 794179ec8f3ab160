"""Distributed JSONL dump/load (sources/jsonl_dump.py): the scale-path
replacement for the reference's driver-bound dump/load
(/root/reference/tripl/tripl.py:536-558).

Fidelity bar: the union of parsed JSONL lines must equal the
driver-side ``to_dict()`` EAV index *as parsed JSON* (semantic
equality — value lists compared as multisets with exact types), and a
dump → load round trip must reproduce the store: same ``to_dict``,
same pull results, same schema registry state.
"""

from __future__ import annotations

import glob
import json

import pytest

from tripl_spark.core.store import TripleStore
from tripl_spark.functions.namespaces import entity_cons


def _canon(index: dict) -> dict:
    """Sort value lists by (type name, str) — to_dict's own ordering."""
    return {
        e: {a: sorted(vs, key=lambda v: (type(v).__name__, str(v))) for a, vs in avs.items()}
        for e, avs in index.items()
    }


def _read_lines_index(path: str) -> dict:
    out: dict = {}
    for fn in glob.glob(f"{path}/part-*"):
        with open(fn) as fp:
            for line in fp:
                if not line.strip():
                    continue
                obj = json.loads(line)
                assert len(obj) == 1, "one entity per line"
                for e, avs in obj.items():
                    assert e not in out, f"entity {e} split across lines"
                    out[e] = avs
    return out


@pytest.fixture(scope="module")
def torture_store(spark):
    """Every value type plus JSON-hostile strings and multi-values."""
    ts = TripleStore(spark=spark)
    ts.assert_facts(
        [
            {
                "db:ident": 'we"ird\\id',
                "t:int": 2,
                "t:float": 2.5,
                "t:tiny": 1e-07,
                "t:accum": 0.1 + 0.2,  # 0.30000000000000004
                "t:bool": True,
                "t:none": None,
                "t:str": 'quote " backslash \\ newline \n unicode é',
                "t:many": [3, 1, 2],
                "t:mixed": [1, "1", 2.0, False],
            },
            {"db:ident": "plain", "t:ref": {"db:ident": "child", "t:x": 1}},
        ]
    )
    return ts


def test_lines_match_driver_dump(torture_store, tmp_path):
    path = str(tmp_path / "dump_jsonl")
    torture_store.dump_jsonl(path)
    lines_index = _read_lines_index(path)
    driver_index = torture_store.to_dict()
    assert _canon(lines_index) == _canon(driver_index)
    # exact types survive rendering: 2 is int, 2.0/2.5 are float
    row = lines_index['we"ird\\id']
    assert row["t:int"] == [2] and isinstance(row["t:int"][0], int)
    assert row["t:float"] == [2.5] and isinstance(row["t:float"][0], float)
    assert row["t:tiny"] == [1e-07]
    assert row["t:accum"] == [0.1 + 0.2]
    assert sorted(row["t:mixed"], key=str) == sorted([1, "1", 2.0, False], key=str)
    assert any(isinstance(v, float) and v == 2.0 for v in row["t:mixed"])


def test_roundtrip_store(torture_store, tmp_path, spark):
    path = str(tmp_path / "rt")
    torture_store.dump_jsonl(path)
    back = TripleStore.load_jsonl(path, spark=spark)
    assert _canon(back.to_dict()) == _canon(torture_store.to_dict())


def test_roundtrip_preserves_schema_and_pull(spark, tmp_path):
    schema = {
        "cft.seq:timepoint": {
            "db:valueType": "db.type:ref",
            "db:cardinality": "db.cardinality:many",
        }
    }
    ts = TripleStore(schema=schema, default_cardinality="db.cardinality:one", spark=spark)
    seq = entity_cons("cft.type:seq", "cft.seq")
    timepoint = entity_cons("cft.type:timepoint", "cft.timepoint")
    ts.assert_facts(
        [seq(id="s1", timepoint=[timepoint(id="d1"), timepoint(id="d2")])],
        id_attrs=["cft.seq:id", "cft.timepoint:id"],
    )
    path = str(tmp_path / "sch")
    ts.dump_jsonl(path)
    back = TripleStore.load_jsonl(path, spark=spark)
    # settings + declarations restored from in-dump schema triples
    assert back.registry.default_cardinality == "db.cardinality:one"
    assert back.registry.attrs["cft.seq:timepoint"]["db:valueType"] == "db.type:ref"
    expr = ["cft.seq:id", {"cft.seq:timepoint": ["cft.timepoint:id"]}]
    orig = ts.pull_many(expr, {"cft:type": "cft.type:seq"})
    rt = back.pull_many(expr, {"cft:type": "cft.type:seq"})
    def canon(docs):
        return sorted(
            json.dumps(d, sort_keys=True, default=sorted) for d in docs
        )
    assert canon(rt) == canon(orig)


def test_dump_deterministic(torture_store, tmp_path):
    p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    torture_store.dump_jsonl(p1)
    torture_store.dump_jsonl(p2)
    lines = lambda p: sorted(
        line for fn in glob.glob(f"{p}/part-*") for line in open(fn)
    )
    assert lines(p1) == lines(p2)
