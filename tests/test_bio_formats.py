"""FASTA/Newick source tests (SURVEY.md §2.1 S9/S10)."""

from __future__ import annotations

import pytest

from tripl_spark import TripleStore
from tripl_spark.sources.bio_formats import (
    fasta_df,
    ingest_newick,
    ingest_seqs,
    parse_fasta,
    parse_newick,
)

FASTA = """>seq1 first sequence
ACGTACGT
ACGT
>seq2
GGGCCC
>seq3 third one
TTTT
"""

NEWICK = "((A:0.1,B:0.2)AB:0.05,C:0.3)root;"


@pytest.fixture()
def fasta_file(tmp_path):
    p = tmp_path / "test.fasta"
    p.write_text(FASTA)
    return str(p)


def test_parse_fasta_pure():
    recs = parse_fasta(FASTA)
    assert [r["id"] for r in recs] == ["seq1", "seq2", "seq3"]
    assert recs[0]["seq"] == "ACGTACGTACGT"  # multi-line joined
    assert recs[0]["description"] == "first sequence"
    assert recs[1]["description"] == ""


def test_ingest_seqs_reference_shape(fasta_file, spark):
    doc = ingest_seqs(fasta_file)
    seqs = doc["bio.seq:set"]
    assert len(seqs) == 3
    ts = TripleStore(spark=spark)
    ts.assert_facts([doc], id_attrs=["bio.seq:id"])
    assert len(ts.match({"bio.seq:id": ["seq1", "seq2", "seq3"]})) == 3


def test_fasta_df_distributed(fasta_file, spark):
    rows = {r.seq_id: r for r in fasta_df(spark, fasta_file).collect()}
    assert set(rows) == {"seq1", "seq2", "seq3"}
    assert rows["seq1"].seq == "ACGTACGTACGT"
    assert rows["seq1"].description == "first sequence"
    assert rows["seq2"].description == ""


def test_parse_newick():
    tree = parse_newick(NEWICK)
    assert tree["bio.clade:name"] == "root"
    kids = tree["bio.clade:clades"]
    assert len(kids) == 2
    ab = next(k for k in kids if k.get("bio.clade:name") == "AB")
    assert ab["bio.clade:branch_length"] == 0.05
    leaves = sorted(c["bio.clade:name"] for c in ab["bio.clade:clades"])
    assert leaves == ["A", "B"]


def test_newick_roundtrip_through_store(tmp_path, spark):
    p = tmp_path / "t.nwk"
    p.write_text(NEWICK)
    ts = TripleStore(spark=spark)
    ts.assert_facts([ingest_newick(str(p))])
    # recursive pull over the clade graph
    root = sorted(ts.match({"bio.clade:name": "root"}))[0]
    doc = ts.pull(["bio.clade:name", {"bio.clade:clades": "..."}], root)
    names = set()

    def walk(d):
        if isinstance(d, dict):
            for v in d.get("bio.clade:name", []) or []:
                names.add(v)
            for c in d.get("bio.clade:clades", []) or []:
                walk(c)

    walk(doc)
    assert names == {"root", "AB", "A", "B", "C"}


def test_parse_newick_malformed():
    with pytest.raises(ValueError):
        parse_newick("((A,B);")
