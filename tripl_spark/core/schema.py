"""Schema registry: dynamic, optional, stored-as-data attribute metadata.

The reference stores schema as triples on attribute-named entities under
``db:schema`` / ``db:attributes`` and interprets two meta-attributes:
``db:cardinality`` and ``db:valueType: db.type:ref``
(/root/reference/tripl/tripl.py:281-297, 363-373, 389-417). We keep the
same representation (schema rows live in the facts DataFrame so dumps
include them) but additionally cache the interpreted flags driver-side —
the schema is an attribute catalog, small by construction, and the
match/pull planners consult it per-attribute while building plans.

Divergence (SURVEY.md Q1, deliberate): ``default_cardinality`` applies to
ALL attrs, declared or not — the reference's guard made the default a
no-op for undeclared attrs, contradicting its own README golden output.
"""

from __future__ import annotations

from typing import Any

from tripl_spark.functions.namespaces import reverse_lookup

CARD_ONE = "db.cardinality:one"
CARD_MANY = "db.cardinality:many"
REF_TYPE = "db.type:ref"


def base_schema(ident_attr: str) -> list[dict[str, Any]]:
    """Bootstrap meta-schema (parity: reference tripl.py:281-297)."""
    return [
        {
            ident_attr: "db:schema",
            "db:attributes": [
                {ident_attr: "db:cardinality", "db:cardinality": CARD_ONE},
                {ident_attr: "db:valueType", "db:cardinality": CARD_ONE},
                {ident_attr: "db.schema:attributes", "db:cardinality": CARD_MANY,
                 "db:valueType": REF_TYPE},
                {ident_attr: "db.schema:types", "db:cardinality": CARD_MANY,
                 "db:valueType": REF_TYPE},
                {ident_attr: "db.refs:lazy", "db:cardinality": CARD_ONE},
                {ident_attr: "db.cardinality:default", "db.cardinality": CARD_ONE},
            ],
        }
    ]


class SchemaRegistry:
    """Driver-side interpreted view of the schema triples.

    ``attrs`` maps attr name → {"db:cardinality": ..., "db:valueType": ...}.
    Mutations go through ``declare`` so the cache and the facts encoding
    can't drift.
    """

    def __init__(
        self,
        ident_attr: str = "db:ident",
        default_cardinality: str = CARD_MANY,
        lazy_refs: bool = True,
    ) -> None:
        self.ident_attr = ident_attr
        self.default_cardinality = default_cardinality
        self.lazy_refs = lazy_refs
        self.attrs: dict[str, dict[str, Any]] = {}

    def declare(self, attr: str, attr_schema: dict[str, Any]) -> None:
        entry = self.attrs.setdefault(attr, {})
        for k, v in attr_schema.items():
            entry[k] = v

    def declare_schema(self, schema: dict[str, dict[str, Any]]) -> None:
        for attr, attr_schema in schema.items():
            self.declare(attr, attr_schema)

    # -- interpreted flags (planner queries) --------------------------------

    def cardinality(self, attr: str) -> str:
        entry = self.attrs.get(attr)
        if entry and "db:cardinality" in entry:
            return entry["db:cardinality"]
        return self.default_cardinality

    def card_one(self, attr: str) -> bool:
        if reverse_lookup(attr):
            return False  # reverse lookups are always multi-valued
        if attr == "db:cardinality":
            return True
        return self.cardinality(attr) == CARD_ONE

    def ref_attr(self, attr: str) -> bool:
        fwd = reverse_lookup(attr)
        if fwd:
            return self.ref_attr(fwd)
        entry = self.attrs.get(attr)
        return bool(entry) and entry.get("db:valueType") == REF_TYPE

    def card_one_attrs(self) -> list[str]:
        """All attrs explicitly declared cardinality-one."""
        return sorted(
            a for a, s in self.attrs.items() if s.get("db:cardinality") == CARD_ONE
        )

    def declared_many_attrs(self) -> list[str]:
        return sorted(
            a for a, s in self.attrs.items() if s.get("db:cardinality") == CARD_MANY
        )
