"""Parameter-sweep provenance (the reference's `tripl.nestly` module,
re-expressed without SCons).

The reference couples three ideas to the SCons build system
(`/root/reference/tripl/nestly.py`): (1) nested parameter sweeps whose
control dicts accumulate level by level, (2) DETERMINISTIC entity
idents per nest level — a uuid3 chain seeded by the parent's ident
(`nestly.py:244-250`), so re-running a sweep re-mints the same ids, and
(3) per-level `metadata.json` sinks (`nestly.py:412-466`) that a later
`tripl join` ingests into the store. None of that needs a build
system — it's a provenance data model — so this module implements the
same semantics as a plain API:

* ``NestSweep.add(name, nestable, ...)`` — nest levels; ``nestable``
  is a list or a callable of the control dict (nestly-core semantics).
* ``add_target(name, fn, ...)`` — per-leaf outputs; `_`-prefixed
  targets are hidden from metadata exactly like the reference
  (`nestly.py:384-385`); ``metadata`` may be a callable of
  ``(control, value)`` — the reference's metadata-callable hook
  (`nestly.py:343`, X2).
* ``default_label`` — the reference's label coercion verbatim
  (`nestly.py:139-147`, X3).
* ``docs()`` — one provenance document per (level, control): namespaced
  attrs, ``db:ident``/``tripl:type``, parent refs (full docs under
  ``full_dump``, ident stubs otherwise — `nestly.py:393-404`), file
  targets as `{'db:ident': uuid3(level_ident, path),
  'tripl.file:path': ...}` entities (`nestly.py:335-341`), and child
  aggregation under ``tripl.nestly:aggregate`` for ``full_dump``
  levels (`nestly.py:125-132`, A3).
* ``dump_metadata(root)`` / ``ingest(store)`` — the metadata sink: the
  reference's one-doc-JSON-list file format (`nestly.py:58-59`), and
  direct ingestion into a ``TripleStore``.

Deliberate divergence (recorded): the reference mints the ROOT ident
with ``uuid.uuid1()`` (`nestly.py:183-186`) — time/MAC-dependent, so
two runs of the same sweep get different roots. We use
``uuid3(NAMESPACE_URL, root_namespace)`` — the same fallback the
reference itself uses when the parent ident is absent
(`nestly.py:246-247`) — making the whole chain reproducible, which is
the module's stated point.

Scale note: a sweep definition is metadata-sized (thousands of leaves,
not billions) and lives driver-side by nature, like the reference. The
value at 100 TB is downstream: the minted provenance facts land in the
distributed store and JOIN against data tables (which run produced
which shard), and re-runs minting identical idents make provenance
ingestion idempotent under the store's set semantics.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

ROOT_NS = uuid.NAMESPACE_URL
AGGREGATE_ATTR = "tripl.nestly:aggregate"


def default_label(x: Any) -> str:
    """Reference label coercion (`nestly.py:139-147`): str → itself,
    dict → str of its 'id', numbers → str, anything else raises."""
    if isinstance(x, str):
        return x
    if isinstance(x, dict):
        return str(x.get("id"))
    if isinstance(x, (int, float)):
        return str(x)
    raise Exception(f"Not able to label {type(x)} object {x}")


def _has_namespace(name: str) -> bool:
    return len(name.split(":")) > 1


@dataclass
class NestFile:
    """A file output of a target — the stand-in for the reference's
    SCons node values (`nestly.py:334-341`): becomes a
    ``tripl.file:path`` entity with an ident derived from the owning
    nest level's ident."""

    path: str
    sources: list[str] = field(default_factory=list)


@dataclass
class _Level:
    name: str
    namespace: str
    nestable: Any  # list | Callable[[dict], list] | None for root
    metadata: Any = None
    label_func: Callable[[Any], str] = default_label
    id_attrs: list[str] = field(default_factory=list)
    full_dump: bool = False
    parent: str | None = None
    targets: list[str] = field(default_factory=list)

    @property
    def ident_attr(self) -> str:
        return self.namespace + ".db:ident"


@dataclass
class _Target:
    name: str
    fn: Callable[[str, dict], Any]
    metadata: Any = None
    omit: bool = False


class NestSweep:
    """SCons-free `NestWrap`: define nest levels and targets, expand to
    control dicts with deterministic ident chains, emit provenance
    docs, dump/ingest metadata."""

    def __init__(self, name: str = "base", base_namespace: str | None = None,
                 metadata: Any = None, namespace: str | None = None,
                 id_attrs: list[str] | None = None) -> None:
        ns = namespace or name
        ns = (base_namespace + "." if base_namespace else "") + ns
        self.base_namespace = base_namespace
        self.levels: dict[str, _Level] = {
            name: _Level(name=name, namespace=ns, nestable=None,
                         metadata=metadata, id_attrs=id_attrs or [])
        }
        self.order: list[str] = [name]
        self.targets: dict[str, _Target] = {}
        self.current = name

    # -- sweep definition ---------------------------------------------------

    def add(self, name: str, nestable: Any, namespace: str | None = None,
            metadata: Any = None, label_func: Callable[[Any], str] = default_label,
            id_attrs: list[str] | None = None, full_dump: bool = False) -> None:
        ns = namespace or name
        ns = (self.base_namespace + "." if self.base_namespace else "") + ns
        parent = self.levels[self.current]
        self.levels[name] = _Level(
            name=name, namespace=ns, nestable=nestable, metadata=metadata,
            label_func=label_func,
            id_attrs=(id_attrs or []) + parent.id_attrs,
            full_dump=full_dump, parent=self.current,
        )
        self.order.append(name)
        self.current = name

    def add_target(self, name: str | None = None, metadata: Any = None,
                   omit_metadata: bool = False):
        def deco(fn: Callable[[str, dict], Any]):
            real = name or fn.__name__
            self.targets[real] = _Target(
                name=real, fn=fn, metadata=metadata,
                omit=omit_metadata or real.startswith("_"),
            )
            self.levels[self.current].targets.append(real)
            return fn

        return deco

    # -- expansion ----------------------------------------------------------

    def _ident(self, parent_ident: uuid.UUID | None, level: _Level, value: Any) -> uuid.UUID:
        """The reference's ident chain (`nestly.py:244-250`):
        uuid3(uuid3(parent_ident, level_name), label(value)); root falls
        back to uuid3(NAMESPACE_URL, namespace)."""
        if parent_ident is None:
            parent_ident = uuid.uuid3(ROOT_NS, level.namespace)
        attr_uuid = uuid.uuid3(parent_ident, level.name)
        return uuid.uuid3(attr_uuid, level.label_func(value))

    def expand(self, outdir: str = ".") -> list[dict]:
        """Cross-product the nest levels into control dicts. Each dict
        carries every level's value, its ``{ns}.db:ident``, and
        ``_outdir`` (label-path directory, as nestly lays trees out)."""
        root = self.levels[self.order[0]]
        root_ident = uuid.uuid3(ROOT_NS, root.namespace)
        controls: list[dict] = [
            {root.ident_attr: root_ident, "_outdir": outdir, "_level": root.name}
        ]
        for lname in self.order[1:]:
            level = self.levels[lname]
            parent_ident_attr = self.levels[level.parent].ident_attr
            nxt: list[dict] = []
            for c in controls:
                values = level.nestable(c) if callable(level.nestable) else level.nestable
                for v in values:
                    c2 = dict(c)
                    c2[lname] = v
                    c2[level.ident_attr] = self._ident(
                        c[parent_ident_attr], level, v
                    )
                    c2["_outdir"] = os.path.join(c["_outdir"], level.label_func(v))
                    c2["_level"] = lname
                    nxt.append(c2)
            controls = nxt
        # run targets of each level at its own depth; values are ALSO
        # recorded per (level, ident) so metadata_doc can translate a
        # parent's targets while holding a CHILD control (the full_dump
        # recursion — child controls never ran ancestor targets)
        by_level: list[dict] = []
        self._target_values: dict[tuple[str, uuid.UUID], dict] = {}
        for lname in self.order:
            level = self.levels[lname]
            seen: set[uuid.UUID] = set()
            for c in self._controls_at(controls, lname):
                ident = c[level.ident_attr]
                if ident in seen:
                    continue
                seen.add(ident)
                vals: dict = {}
                for tname in level.targets:
                    c[tname] = vals[tname] = self.targets[tname].fn(c["_outdir"], c)
                self._target_values[(lname, ident)] = vals
                by_level.append(c)
        self._expanded = by_level
        return by_level

    def _controls_at(self, leaf_controls: list[dict], lname: str) -> list[dict]:
        """Project leaf controls up to the given level (dedup on the
        level ident happens in the caller)."""
        idx = self.order.index(lname)
        keep_levels = self.order[: idx + 1]
        out = []
        for c in leaf_controls:
            # controls are accumulated top-down, so a leaf control IS a
            # superset of its ancestors'; trim values from deeper levels
            drop = {n for n in self.order[idx + 1:]}
            drop |= {self.levels[n].ident_attr for n in self.order[idx + 1:]}
            proj = {k: v for k, v in c.items() if k not in drop}
            # outdir at this level's depth
            depth = idx  # root contributes no path segment
            parts = c["_outdir"].split(os.sep)
            base_depth = len(parts) - (len(self.order) - 1)
            proj["_outdir"] = os.sep.join(parts[: base_depth + depth]) or "."
            proj["_level"] = lname
            out.append(proj)
        return out

    # -- metadata docs (the S11 provenance documents) ----------------------

    def _namespaced(self, level: _Level, attr: str) -> str:
        if _has_namespace(attr):
            return attr
        return level.namespace + ":" + attr

    def _translate_target(self, level: _Level, level_ident: uuid.UUID,
                          target: _Target, c: dict, v: Any) -> Any:
        if isinstance(v, list):
            return [self._translate_target(level, level_ident, target, c, x) for x in v]
        if isinstance(v, NestFile):
            # file entity, ident chained off the level (`nestly.py:335-341`)
            v = {
                "db:ident": str(uuid.uuid3(level_ident, v.path)),
                "tripl.file:path": v.path,
                "tripl.file:sources": [{"tripl.file:path": p} for p in v.sources],
            }
        meta = target.metadata(c, v) if callable(target.metadata) else (target.metadata or {})
        if isinstance(v, dict):
            v = dict(v)
            v.update(meta)
            return v
        if meta:
            meta = dict(meta)
            meta["tripl.nestly.target:value"] = v
            return meta
        return v

    def metadata_doc(self, c: dict, lname: str | None = None) -> dict:
        """The reference's `_translated_metadata_dict`
        (`nestly.py:353-408`): namespaced level attrs + metadata +
        visible targets + ident/type + parent refs."""
        lname = lname or c["_level"]
        level = self.levels[lname]
        ident = c[level.ident_attr]
        nest_val = c.get(lname, {})
        meta = level.metadata(c, nest_val) if callable(level.metadata) else (level.metadata or {})

        d: dict = {}
        if level.parent is not None:  # root has no swept value
            d[level.namespace + ":id"] = (
                nest_val.get(level.namespace + ":id")
                if isinstance(nest_val, dict) and level.namespace + ":id" in nest_val
                else level.label_func(nest_val)
            )
        if isinstance(nest_val, dict):
            d.update({self._namespaced(level, a): v for a, v in nest_val.items()})
        d.update({self._namespaced(level, a): v for a, v in (meta or {}).items()})
        # target values come from the per-(level, ident) record, NOT the
        # control dict: when the full_dump recursion renders an ANCESTOR
        # doc it holds a child control that never ran parent targets
        tvals = getattr(self, "_target_values", {}).get((lname, ident), {})
        for tname in level.targets:
            t = self.targets[tname]
            if t.omit:
                continue
            value = tvals[tname] if tname in tvals else c[tname]
            d[self._namespaced(level, tname)] = self._translate_target(
                level, ident, t, c, value
            )
        d["db:ident"] = str(ident)
        d["tripl:type"] = level.namespace

        # parent refs: full docs under full_dump, ident stubs otherwise.
        # Key = this level's namespace + parent level NAME — the
        # reference's `_namespaced(parent_nest_level)` resolution at
        # dump time (`nestly.py:393-404`, `:294-303`).
        p = level.parent
        while p is not None:
            plevel = self.levels[p]
            key = level.namespace + ":" + plevel.name
            if level.full_dump:
                d[key] = self.metadata_doc(c, p)
            else:
                d[key] = {"db:ident": str(c[plevel.ident_attr])}
            p = plevel.parent
        return d

    def docs(self) -> list[dict]:
        """All provenance docs (every level × every control), children
        aggregated under ``tripl.nestly:aggregate`` for full_dump
        levels (`nestly.py:125-132`)."""
        assert hasattr(self, "_expanded"), "call expand() first"
        by_ident: dict[str, dict] = {}
        children: dict[str, list[dict]] = {}
        for c in self._expanded:
            level = self.levels[c["_level"]]
            doc = self.metadata_doc(c)
            by_ident[doc["db:ident"]] = doc
            if level.parent is not None:
                pident = str(c[self.levels[level.parent].ident_attr])
                children.setdefault(pident, []).append(doc)
        for c in self._expanded:
            level = self.levels[c["_level"]]
            if level.full_dump or level.parent is None:
                ident = str(c[level.ident_attr])
                if ident in children:
                    by_ident[ident][AGGREGATE_ATTR] = [
                        {"db:ident": d["db:ident"]} for d in children[ident]
                    ]
        return list(by_ident.values())

    # -- sinks (S12) --------------------------------------------------------

    def dump_metadata(self, root: str, file_name: str = "metadata.json") -> list[str]:
        """Write one `[doc]` JSON file per control directory — the
        reference's sink format (`nestly.py:58-59`: a LIST holding the
        single doc), ready for ``TripleStore.loads`` / `tripl join`."""
        paths = []
        for c in self._expanded:
            doc = self.metadata_doc(c)
            out_dir = os.path.join(root, c["_outdir"]) if c["_outdir"] != "." else root
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, file_name)
            with open(path, "w") as fp:
                json.dump([doc], fp, indent=4, default=str)
            paths.append(path)
        return paths

    def ingest(self, store) -> None:
        """Assert every provenance doc into a ``TripleStore``."""
        store.assert_facts(self.docs(), id_attrs=[])
