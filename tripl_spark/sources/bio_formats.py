"""FASTA and Newick ingestion (reference ``nestly.ingest_seqs`` /
``ingest_newick``, /root/reference/tripl/nestly.py:62-83).

The reference shells out to Biopython; this container has no Bio, so
the parsers here are small pure-Python implementations of the same
formats (they ARE the spec: FASTA = ``>id desc`` header lines + sequence
lines; Newick = parenthesized tree with ``name:length`` labels). If
Biopython is present it is preferred (import-try), keeping behavior
identical on richer installs.

Output shapes match the reference:

* ``ingest_seqs(path)`` → ``{'bio.seq:set': [{'bio.seq:id', 'bio.seq:seq',
  'bio.seq:description'}, ...]}``
* ``ingest_newick(path)`` → recursive clade entities
  ``{'bio.clade:name', 'bio.clade:branch_length', 'bio.clade:clades': [...]}``

Scale path: ``fasta_df`` parses FASTA distributed — files land as whole
records via a custom line-grouping over ``spark.read.text`` (FASTA
records are '>'-delimited; the grouping is a running-count window on
header lines, shuffle-partitioned by record id). Newick trees are
single-document objects; they flatten through the normal doc path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

try:  # pragma: no cover - not installed in this container
    from Bio import SeqIO as _SeqIO  # type: ignore
except ImportError:
    _SeqIO = None


def parse_fasta(text: str) -> list[dict[str, str]]:
    """Minimal FASTA parser: returns [{'id', 'description', 'seq'}, ...]."""
    records: list[dict[str, str]] = []
    header: str | None = None
    chunks: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if header is not None:
                records.append(_fasta_record(header, chunks))
            header, chunks = line[1:], []
        elif header is not None:
            chunks.append(line)
    if header is not None:
        records.append(_fasta_record(header, chunks))
    return records


def _fasta_record(header: str, chunks: list[str]) -> dict[str, str]:
    parts = header.split(None, 1)
    return {
        "id": parts[0],
        "description": parts[1] if len(parts) > 1 else "",
        "seq": "".join(chunks),
    }


def ingest_seqs(filename: str) -> dict[str, Any]:
    """Reference-shaped FASTA ingest (nestly.py:62-64)."""
    if _SeqIO is not None:  # pragma: no cover
        records = [
            {"id": r.id, "description": r.description, "seq": str(r.seq)}
            for r in _SeqIO.parse(filename, "fasta")
        ]
    else:
        with open(filename) as fh:
            records = parse_fasta(fh.read())
    return {
        "bio.seq:set": [
            {
                "bio.seq:id": r["id"],
                "bio.seq:seq": r["seq"],
                "bio.seq:description": r["description"],
            }
            for r in records
        ]
    }


def fasta_df(spark: SparkSession, path: str) -> DataFrame:
    """Distributed FASTA parse → DataFrame(seq_id, description, seq).

    spark.read.text → header-flag running count assigns each line its
    record id → groupBy record id reassembles sequences. The running
    count is an unpartitioned window (one ordering pass) — fine up to
    ~10^8 lines; beyond that, per-split mapPartitions stitching (parse
    each split locally, repair the one record cut at each boundary)
    removes the global sort. The reassembly shuffle is keyed by record
    id: balanced regardless of file size.
    """
    lines = spark.read.text(path).withColumn(
        "line_id", F.monotonically_increasing_id()
    )
    w = W.orderBy("line_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    tagged = lines.withColumn(
        "rec",
        F.sum(F.when(F.col("value").startswith(">"), 1).otherwise(0)).over(w),
    ).filter(F.trim("value") != "")
    return (
        tagged.groupBy("rec")
        .agg(
            F.max(F.when(F.col("value").startswith(">"),
                         F.expr("substring(value, 2)"))).alias("header"),
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.when(~F.col("value").startswith(">"),
                                                       F.struct("line_id", "value"))))
                .getField("value")
            ).alias("seq"),
        )
        .select(
            # F.get (not getItem): a header with no description splits to a
            # 1-element array, and ANSI mode makes out-of-bounds getItem throw
            F.get(F.split(F.col("header"), r"\s+", 2), 0).alias("seq_id"),
            F.coalesce(F.get(F.split(F.col("header"), r"\s+", 2), 1), F.lit("")).alias(
                "description"
            ),
            "seq",
        )
    )


# -- Newick ----------------------------------------------------------------


def parse_newick(text: str) -> dict[str, Any]:
    """Recursive-descent Newick parser → nested clade dict."""
    s = text.strip().rstrip(";")
    pos = 0

    def node() -> dict[str, Any]:
        nonlocal pos
        clades: list[dict[str, Any]] = []
        if pos < len(s) and s[pos] == "(":
            pos += 1
            clades.append(node())
            while pos < len(s) and s[pos] == ",":
                pos += 1
                clades.append(node())
            if pos >= len(s) or s[pos] != ")":
                raise ValueError(f"unbalanced newick at {pos}")
            pos += 1
        start = pos
        while pos < len(s) and s[pos] not in ",();":  # ':' stays: labels are name:length
            pos += 1
        label = s[start:pos]
        name, _, length = label.partition(":")
        out: dict[str, Any] = {}
        if name:
            out["bio.clade:name"] = name
        if length:
            out["bio.clade:branch_length"] = float(length)
        if clades:
            out["bio.clade:clades"] = clades
        return out

    result = node()
    if pos != len(s):
        raise ValueError(f"trailing newick input at {pos}: {s[pos:]!r}")
    return result


def ingest_newick(filename: str) -> dict[str, Any]:
    """Reference-shaped Newick ingest (nestly.py:67-83): the tree as one
    nested document (flattens to clade entities via assert_facts)."""
    with open(filename) as fh:
        return parse_newick(fh.read())
