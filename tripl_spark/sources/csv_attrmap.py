"""CSV → entity-dict ingestion via user attribute maps
(reference ``bio.load_csv``, /root/reference/tripl/bio.py:82-138).

The attribute map renames/selects CSV columns, nests sub-entities, and
tags types. We implement the *documented* semantics — the docstring's
expected output at bio.py:115-125 — which the shipped code doesn't
actually produce (it emits ``ns:key`` instead of ``ns.key`` and a
literal ``tripl:type: ns`` tag; compare bio.py:68-77 with its own
docstring):

* key ``'T:attr'`` → ``'{ns}.T:attr'`` (e.g. ``seq:id`` → ``toy.seq:id``);
* each map level gets ``'{ns}:type': '{ns}.type:T'`` where ``T`` is the
  level's entity-type prefix (the commented-out homogeneity assertion at
  bio.py:79 confirms one prefix per level);
* a string value names a CSV column — missing columns yield None;
* a list of dicts nests sub-entities.

Two paths:

* ``load_csv`` — pure-Python generator, file handle in, dict docs out
  (API parity; compose with ``TripleStore.assert_facts``).
* ``csv_docs_df`` — the scale path: ``spark.read.csv`` + one nested
  ``struct`` select, producing the same documents as DataFrame rows
  entirely JVM-side (no Python per row).
"""

from __future__ import annotations

import csv
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _level_type(attr_map: dict[str, Any]) -> str | None:
    prefixes = {k.split(":")[0] for k in attr_map if ":" in k}
    return sorted(prefixes)[0] if prefixes else None


def _ns_key(key: str, ns: str | None) -> str:
    return f"{ns}.{key}" if ns and ":" in key else key


def transform_row(row: dict[str, Any], attr_map: dict[str, Any], ns: str | None = None) -> dict[str, Any]:
    """Apply an attribute map to one CSV row dict."""
    out: dict[str, Any] = {}
    for key, spec in attr_map.items():
        if isinstance(spec, list):
            out[_ns_key(key, ns)] = [transform_row(row, sub, ns) for sub in spec]
        elif isinstance(spec, dict):
            out[_ns_key(key, ns)] = [transform_row(row, spec, ns)]
        else:
            out[_ns_key(key, ns)] = row.get(spec)
    if ns:
        t = _level_type(attr_map)
        if t:
            out[f"{ns}:type"] = f"{ns}.type:{t}"
    return out


def load_csv(fp: str, attr_map: dict[str, Any], ns: str | None = None):
    """Yield entity dicts for each CSV row (reference API parity)."""
    with open(fp) as fh:
        for row in csv.DictReader(fh):
            yield transform_row(row, attr_map, ns)


def _map_to_struct(attr_map: dict[str, Any], ns: str | None) -> list[F.Column]:
    cols: list[F.Column] = []
    for key, spec in attr_map.items():
        name = _ns_key(key, ns)
        if isinstance(spec, list):
            cols.append(
                F.array(*[F.struct(*_map_to_struct(sub, ns)) for sub in spec]).alias(name)
            )
        elif isinstance(spec, dict):
            cols.append(F.array(F.struct(*_map_to_struct(spec, ns))).alias(name))
        else:
            cols.append(F.col(spec).cast("string").alias(name) if spec else F.lit(None).alias(name))
    if ns:
        t = _level_type(attr_map)
        if t:
            cols.append(F.lit(f"{ns}.type:{t}").alias(f"{ns}:type"))
    return cols


def csv_docs_df(
    spark: SparkSession, path: str, attr_map: dict[str, Any], ns: str | None = None
) -> DataFrame:
    """Distributed variant: the same document shape as nested columns.

    Missing columns become NULL literals (checked against the header so
    the plan doesn't fail analysis). Selection/renaming is pure Catalyst
    projection — pushdown prunes unreferenced CSV columns.
    """
    raw = spark.read.csv(path, header=True)
    have = set(raw.columns)

    def patch(m: dict[str, Any]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for k, v in m.items():
            if isinstance(v, list):
                out[k] = [patch(x) for x in v]
            elif isinstance(v, dict):
                out[k] = patch(v)
            else:
                out[k] = v if v in have else None
        return out

    return raw.select(*_map_to_struct(patch(attr_map), ns))
