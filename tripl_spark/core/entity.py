"""Entity — lazy read-only view of one entity
(reference /root/reference/tripl/tripl.py:150-267).

A convenience wrapper, not a distributed primitive: it snapshots the
entity's facts with one filtered scan and answers key lookups from that
driver-side cache (``refresh()`` re-reads — honest semantics instead of
the reference's pretend-liveness over a mutable in-process index,
SURVEY.md §7.3.5).

Bug-fix ports: reverse lookups and ``pull(expr, Entity)`` use ``.ident``
(the reference crashes on a phantom ``.eid`` — Q8); ``__contains__``
strips only the leading underscore of the name part (the reference
strips every ``_`` — Q9).
"""

from __future__ import annotations

from typing import Any

from tripl_spark.functions.namespaces import reverse_lookup, some


class Entity:
    def __init__(self, store: Any, ident: str, namespace: str | None = None) -> None:
        self._store = store
        self.ident = str(ident)
        self._attrs: dict[str, list[Any]] | None = None
        self.namespace = namespace or some(self._cache().get("tripl:type"))

    # compat alias for code that used the reference's intended attribute
    @property
    def store(self) -> Any:
        return self._store

    def _cache(self) -> dict[str, list[Any]]:
        if self._attrs is None:
            self.refresh()
        return self._attrs  # type: ignore[return-value]

    def refresh(self) -> "Entity":
        """Re-snapshot this entity's facts from the store."""
        from pyspark.sql import functions as F

        from tripl_spark.core.flatten import decode_value

        rows = (
            self._store.current_facts()
            .filter(F.col("e") == self.ident)
            .select("a", "vtype", "v_str", "v_num", "v_bool")
            .collect()
        )
        attrs: dict[str, list[Any]] = {}
        for row in rows:
            attrs.setdefault(row.a, []).append(
                decode_value(row.vtype, row.v_str, row.v_num, row.v_bool)
            )
        for a in attrs:
            attrs[a] = sorted(attrs[a], key=lambda v: (type(v).__name__, str(v)))
        self._attrs = attrs
        return self

    # -- mapping surface ----------------------------------------------------

    def __getitem__(self, key: str) -> Any:
        if self.namespace and ":" not in key:
            return self[self.namespace + ":" + key]
        fwd = reverse_lookup(key)
        if fwd:
            rows = self._store.match({fwd: self.ident}) if (
                self._store.registry.ref_attr(fwd) or self._store.lazy_refs
            ) else set()
            return [Entity(self._store, e) for e in sorted(rows)]
        vals = self._cache().get(key)
        if vals and (
            self._store.registry.ref_attr(key)
            or (self._store.lazy_refs and self._all_entities(vals))
        ):
            results: Any = [Entity(self._store, v) for v in vals]
        else:
            results = vals
        if self._store.registry.card_one(key):
            return some(results)
        return results

    def _all_entities(self, vals: list[Any]) -> bool:
        if not all(isinstance(v, str) for v in vals):
            return False
        from pyspark.sql import functions as F

        facts = self._store.current_facts()
        n = (
            facts.filter(F.col("e").isin([str(v) for v in vals]))
            .select("e")
            .distinct()
            .count()
        )
        return n == len(set(vals))

    def get(self, key: str, default: Any = None) -> Any:
        return self[key] or default

    def get_in(self, keys: list[str], default: Any = None) -> Any:
        if len(keys) == 0:
            return self
        if len(keys) == 1:
            return self.get(keys[0])
        key_result = self.get(keys[0])

        def sub_results(x: Any) -> Any:
            return x.get_in(keys[1:]) or []

        if isinstance(key_result, list):
            result: Any = [sv for x in key_result for sv in sub_results(x)]
        elif key_result:
            result = sub_results(key_result)
        else:
            result = []
        return result or default

    def some(self, key: str, default: Any = None) -> Any:
        return some(self[key], default=default)

    def some_in(self, keys: list[str], default: Any = None) -> Any:
        return some(self.get_in(keys), default=default)

    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        if self.namespace and ":" not in key:
            return self[self.namespace + ":" + key]
        return self[key]

    def __contains__(self, key: str) -> bool:
        if key in self._cache():
            return True
        fwd = reverse_lookup(str(key))
        if fwd:
            return bool(self._store.registry.ref_attr(fwd))
        return False

    def __len__(self) -> int:
        return len(self._cache())

    def keys(self) -> list[str]:
        ks = list(self._cache().keys())
        ident_attr = self._store.ident_attr
        if ident_attr not in ks:
            return [ident_attr] + ks
        return ks

    def to_dict(self) -> dict[str, Any]:
        return self._store.pull(["*"], self.ident)

    def __repr__(self) -> str:
        prefix = self.namespace + ":" if self.namespace else ""
        return prefix + str({k: self._cache().get(k) for k in self.keys()})


    # -- write-through (the reference's Entity is read-only, tripl.py:617;
    #    §2.9 lists entity writes as absent — provided here) ----------------

    def __setitem__(self, key: str, value: Any) -> None:
        """Assert (entity, key, value) through to the store. Cardinality
        semantics are the store's: card-one attributes displace on read
        (LWW by t), card-many accumulate. The local cache refreshes so
        the write is immediately visible on this view."""
        self._store.assert_fact((self.ident, key, value))
        self._attrs = None

    def add(self, key: str, value: Any) -> "Entity":
        """Fluent alias of ``entity[key] = value``."""
        self[key] = value
        return self

    def retract(self, key: str, value: Any) -> "Entity":
        """Retract one (entity, key, value) fact and refresh."""
        self._store.retract_fact((self.ident, key, value))
        self._attrs = None
        return self
