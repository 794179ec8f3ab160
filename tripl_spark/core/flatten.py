"""Document → triple flattening with entity resolution (the write path).

Ports the *intent* of the reference recursion ``assert_facts →
assert_fact → _assert_dict → _resolve_eid / _assert_val(s) →
_assert_triple`` (/root/reference/tripl/tripl.py:515-533, 502-513,
483-494, 457-481, 446-455, 419-431):

* nested dicts become sub-entities and are replaced by their eid;
* lists fan out to multiple triples (order discarded — set semantics);
* ``id_attrs`` act as unique keys: a doc carrying one resolves to the
  existing entity with that (attr, value), memoized per transaction;
* entities without an ident get a generated one, self-asserted.

Divergences (deliberate, for distribution):

* id-attr entities get **deterministic** ids — ``uuid5(URL_NS,
  "tripl:" + attr + "=" + value)`` — instead of the reference's
  ``uuid1``. A pure function of the identifying fact needs no
  coordination across executors and makes re-ingest idempotent
  (the reference's own nestly module pioneers this with uuid3:
  /root/reference/tripl/nestly.py:242-249, docs/vision.md:62).
* every triple carries a monotonic ``t`` so cardinality-one
  last-write-wins is a deterministic read-side rule rather than the
  reference's (broken, SURVEY.md Q2) in-place displacement.
* explicit ident values are stringified consistently (the reference
  asserts the raw value but keys the entity by ``str(value)``).

Each produced row is ``(e, a, vtype, v_str, v_num, v_bool, t)`` with
vtype ∈ {str, int, float, bool, ref, null}; refs and strings both live
in ``v_str`` so generic value equality is a single-column comparison.
"""

from __future__ import annotations

import uuid
import warnings
from dataclasses import dataclass, field
from typing import Any

from tripl_spark.core.schema import SchemaRegistry
from tripl_spark.functions.namespaces import some

FACT_COLUMNS = ("e", "a", "vtype", "v_str", "v_num", "v_bool", "t")

_ID_NS = uuid.NAMESPACE_URL


def deterministic_eid(attr: str, value: Any) -> str:
    """Pure-function entity id for an identifying (attr, value) fact."""
    return str(uuid.uuid5(_ID_NS, f"tripl:{attr}={value}"))


def typed_value(value: Any, is_ref: bool) -> tuple[str, str | None, float | None, bool | None]:
    """Encode a scalar into (vtype, v_str, v_num, v_bool)."""
    if value is None:
        return ("null", None, None, None)
    if isinstance(value, bool):  # before int: bool is an int subclass
        return ("bool", None, None, value)
    if isinstance(value, int):
        return ("int", None, float(value), None)
    if isinstance(value, float):
        return ("float", None, value, None)
    if isinstance(value, uuid.UUID):
        return ("ref" if is_ref else "str", str(value), None, None)
    if isinstance(value, bytes):
        return ("ref" if is_ref else "str", value.decode("utf-8", "replace"), None, None)
    if isinstance(value, str):
        return ("ref" if is_ref else "str", value, None, None)
    raise TypeError(f"unsupported triple value type: {type(value).__name__}: {value!r}")


def decode_value(vtype: str, v_str: str | None, v_num: float | None, v_bool: bool | None) -> Any:
    """Inverse of typed_value (for pull/dump output)."""
    if vtype == "null":
        return None
    if vtype == "bool":
        return v_bool
    if vtype == "int":
        return int(v_num)
    if vtype == "float":
        return v_num
    return v_str  # str | ref


@dataclass
class FlattenResult:
    rows: list[tuple] = field(default_factory=list)
    root_eids: list[str] = field(default_factory=list)
    next_t: int = 0


def collect_id_pairs(docs: Any, id_attrs: list[str] | None) -> set[tuple[str, Any]]:
    """Pre-scan a doc batch for every (id_attr, value) pair (recursing
    into sub-entities) so the store can resolve existing entities with
    ONE lookup per transaction instead of one per doc."""
    pairs: set[tuple[str, Any]] = set()
    if not id_attrs:
        return pairs
    id_set = set(id_attrs)

    def scan(obj: Any) -> None:
        if isinstance(obj, dict):
            for a, v in obj.items():
                if a in id_set and not isinstance(v, (dict, list)):
                    pairs.add((a, v))
                scan(v)
        elif isinstance(obj, list):
            for item in obj:
                scan(item)

    scan(docs)
    return pairs


class Flattener:
    """One transaction's flattening state (memo + t counter)."""

    def __init__(
        self,
        registry: SchemaRegistry,
        id_attrs: list[str] | None = None,
        memo: dict[tuple[str, Any], str] | None = None,
        t0: int = 0,
    ) -> None:
        self.registry = registry
        self.id_attrs = list(id_attrs or [])
        self.memo = memo if memo is not None else {}
        self.t = t0
        self.rows: list[tuple] = []

    # -- id resolution (reference _resolve_eid, tripl.py:457-481) ----------

    def _resolve_eid(self, doc: dict[str, Any]) -> str:
        ident_attr = self.registry.ident_attr
        ident_val = some(doc.get(ident_attr))
        if self.id_attrs:
            id_facts = {
                a: self.memo.get((a, doc[a]))
                for a in self.id_attrs
                if a in doc and not isinstance(doc[a], (dict, list))
            }
            if ident_val is not None:
                if any(e is not None and e != str(ident_val) for e in id_facts.values()):
                    warnings.warn("Conflicting values in _resolve_eid!")
                eid = str(ident_val)
            else:
                found = {e for e in id_facts.values() if e is not None}
                if len(found) > 1:
                    warnings.warn("Conflicting values in _resolve_eid (2)!")
                if found:
                    eid = sorted(found)[0]
                elif id_facts:
                    # deterministic: derive from the first id attr present
                    a = next(iter(sorted(id_facts)))
                    eid = deterministic_eid(a, doc[a])
                else:
                    eid = str(uuid.uuid4())
            for a in id_facts:
                self.memo[(a, doc[a])] = eid
        else:
            eid = str(ident_val) if ident_val is not None else str(uuid.uuid4())
        return eid

    # -- recursion (reference _assert_dict / _assert_val, tripl.py:446-494) -

    def _emit(self, e: str, a: str, value: Any) -> None:
        vtype, v_str, v_num, v_bool = typed_value(value, is_ref=self.registry.ref_attr(a))
        self.rows.append((e, a, vtype, v_str, v_num, v_bool, self.t))
        self.t += 1

    def _assert_val(self, e: str, a: str, value: Any) -> None:
        if isinstance(value, dict):
            value = self.flatten_doc(value)
            vtype = "ref"
            self.rows.append((e, a, vtype, value, None, None, self.t))
            self.t += 1
            return
        if hasattr(value, "ident") and hasattr(value, "store"):  # Entity view
            value = value.ident
            self.rows.append((e, a, "ref", str(value), None, None, self.t))
            self.t += 1
            return
        self._emit(e, a, value)

    def flatten_doc(self, doc: dict[str, Any]) -> str:
        eid = self._resolve_eid(doc)
        ident_attr = self.registry.ident_attr
        for a, v in doc.items():
            if isinstance(v, (list, tuple, set)):
                for item in v:
                    self._assert_val(eid, a, item)
            elif a == ident_attr:
                self._emit(eid, a, str(v) if v is not None else v)
            else:
                self._assert_val(eid, a, v)
        if not doc.get(ident_attr):
            self._emit(eid, ident_attr, eid)
        return eid

    def flatten_docs(self, docs: list[dict[str, Any]]) -> FlattenResult:
        roots = [self.flatten_doc(d) for d in docs]
        return FlattenResult(rows=self.rows, root_eids=roots, next_t=self.t)
