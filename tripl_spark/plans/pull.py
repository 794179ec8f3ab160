"""Pull-expression compiler — the reference's recursive graph projection
(``pull``/``pull_many``, /root/reference/tripl/tripl.py:627-740)
re-expressed as level-wise DataFrame joins.

A pull expression is a list of:

* plain attrs (``'cft.seq:id'``) — emit the entity's values;
* ``'*'`` — all attrs, refs left unexpanded (SURVEY.md Q10);
* bare reverse attrs (``'ns:_attr'``) — ident-stub dicts of entities
  pointing at this one;
* dict patterns (``{'cft.seq:timepoint': [...]}``) — forward/reverse
  graph joins with a nested sub-expression; ``'...'`` recurses with the
  whole base expression.

Execution model (Spark-first): the *traversal* is distributed — each
expression position joins the facts frame against the frontier of
parent nodes (forward: ``facts.e == frontier.node``; reverse:
``facts.v_str == frontier.node``), exactly the join shape SURVEY.md
§7.4 sketches. Frontiers are deduplicated node sets, so shared children
(diamonds) are fetched once no matter how many parents reach them, and
the recursion loop carries a global fetched-set so cyclic graphs
terminate. The final *re-nesting into Python documents* is driver-side
assembly over the collected rows — pull's contract is "return nested
dicts", i.e. a driver-resident result by definition; only the part that
scales with data size (traversal) runs on the cluster.

Semantic port decisions (SURVEY.md Appendix A):

* Q5: cycle short-circuit emits ``{'db:ident': eid}`` (the reference
  char-splits the eid into a set).
* Q6: cycle detection is per-root; we refine it to *ancestor-path*
  cycles, so diamonds (two siblings sharing a child) expand fully on
  both sides instead of depending on dict iteration order. The
  reference's in-code comment ("Only track recursion points … all else
  statically terminates", tripl.py:711) states this intent; its shipped
  DFS-visited-set behavior is order-dependent.
* Q4: ``'*'`` and bare reverse lookups work (dead under py3 in the
  reference due to filter() exhaustion).
* unknown/non-entity nodes pulled through a dict pattern yield a husk
  dict (requested attrs → None) instead of the reference's
  AttributeError crash.
* multi-values are canonical **sorted lists** (reference: unordered
  sets; Q12 — tests canonicalize anyway, JSON dumps need lists).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tripl_spark.core.flatten import decode_value
from tripl_spark.core.schema import SchemaRegistry
from tripl_spark.session import local_df
from tripl_spark.functions.namespaces import reverse_lookup

RECUR = "..."

_NODE_SCHEMA = T.StructType([T.StructField("node", T.StringType(), False)])


@dataclass
class PullPos:
    """One position in the pull-expression tree."""

    pos: int
    plain: list[str] = field(default_factory=list)
    bare_reverse: list[str] = field(default_factory=list)
    wildcard: bool = False
    # (attr as written, forward-attr if reverse else None, child position or RECUR)
    children: list[tuple[str, str | None, "PullPos | str"]] = field(default_factory=list)


def compile_expr(expr: list[Any], _positions: list | None = None) -> PullPos:
    positions = _positions if _positions is not None else []
    node = PullPos(pos=len(positions))
    positions.append(node)
    for item in expr:
        if isinstance(item, dict):
            for attr, sub in item.items():
                fwd = reverse_lookup(attr)
                child = RECUR if sub == RECUR else compile_expr(sub, positions)
                node.children.append((attr, fwd, child))
        elif item == "*":
            node.wildcard = True
        elif isinstance(item, str) and reverse_lookup(item):
            node.bare_reverse.append(item)
        else:
            node.plain.append(item)
    return node


class PullRun:
    """One pull execution: distributed fetch + driver-side assembly."""

    def __init__(
        self,
        spark: SparkSession,
        facts: DataFrame,
        registry: SchemaRegistry,
        root_expr: PullPos,
        max_depth: int = 20,
    ) -> None:
        self.spark = spark
        self.facts = facts
        self.registry = registry
        self.root_expr = root_expr
        self.max_depth = max_depth
        # fetched data, keyed by node (shared across positions needing same shape)
        self.attrs: dict[tuple[int, str], dict[str, list[Any]]] = {}
        self.fwd_edges: dict[tuple[int, str, str], list[str]] = {}
        self.rev_edges: dict[tuple[int, str, str], list[str]] = {}
        self._fetched: set[tuple[int, str]] = set()

    # ------------------------------------------------------------- fetch --

    def fetch(self, roots: list[str]) -> None:
        queue: list[tuple[PullPos, list[str], int]] = [(self.root_expr, roots, 0)]
        while queue:
            pos, nodes, depth = queue.pop(0)
            nodes = [n for n in nodes if (pos.pos, n) not in self._fetched]
            if not nodes or depth > self.max_depth:
                continue
            self._fetched.update((pos.pos, n) for n in nodes)
            nodes_df = F.broadcast(
                local_df(self.spark, [(n,) for n in nodes], _NODE_SCHEMA)
            )
            self._fetch_attrs(pos, nodes_df)
            child_frontiers = self._fetch_edges(pos, nodes_df, nodes)
            for child_pos, frontier in child_frontiers:
                target = self.root_expr if child_pos == RECUR else child_pos
                queue.append((target, frontier, depth + 1))

    def _fetch_attrs(self, pos: PullPos, nodes_df: DataFrame) -> None:
        base = self.facts.join(nodes_df, self.facts.e == F.col("node"), "inner")
        if not pos.wildcard:
            if not pos.plain:
                base = None
            else:
                base = base.filter(F.col("a").isin(pos.plain))
        if base is not None:
            for row in base.select("e", "a", "vtype", "v_str", "v_num", "v_bool").collect():
                val = decode_value(row.vtype, row.v_str, row.v_num, row.v_bool)
                self.attrs.setdefault((pos.pos, row.e), {}).setdefault(row.a, []).append(val)

    def _fetch_edges(
        self, pos: PullPos, nodes_df: DataFrame, nodes: list[str]
    ) -> list[tuple[Any, list[str]]]:
        fwd_attrs = [a for a, fwd, _ in pos.children if fwd is None]
        rev_attrs = [fwd for _, fwd, _ in pos.children if fwd is not None] + [
            reverse_lookup(a) for a in pos.bare_reverse
        ]
        frontiers: list[tuple[Any, list[str]]] = []
        if fwd_attrs:
            rows = (
                self.facts.filter(F.col("a").isin(fwd_attrs))
                .join(nodes_df, self.facts.e == F.col("node"), "inner")
                .select("e", "a", "v_str")
                .collect()
            )
            for row in rows:
                if row.v_str is not None:
                    self.fwd_edges.setdefault((pos.pos, row.e, row.a), []).append(row.v_str)
        if rev_attrs:
            rows = (
                self.facts.filter(F.col("a").isin(rev_attrs))
                .join(nodes_df, self.facts.v_str == F.col("node"), "inner")
                .select("e", "a", "v_str")
                .collect()
            )
            for row in rows:
                self.rev_edges.setdefault((pos.pos, row.v_str, row.a), []).append(row.e)
        # child frontiers, deduped + sorted for determinism
        for attr, fwd, child in pos.children:
            children: set[str] = set()
            for n in nodes:
                if fwd is None:
                    children.update(self.fwd_edges.get((pos.pos, n, attr), []))
                else:
                    children.update(self.rev_edges.get((pos.pos, n, fwd), []))
            frontiers.append((child, sorted(children)))
        return frontiers

    # ---------------------------------------------------------- assemble --

    def _collapse(self, attr: str, values: list[Any] | None) -> Any:
        if values is None:
            return None
        if self.registry.card_one(attr):
            return values[0] if values else None
        return values

    @staticmethod
    def _sort_key(v: Any) -> tuple:
        # numbers sort numerically (9 before 10), everything else by
        # string. NOTE: for multi-value attrs of a SINGLE type this
        # yields the same order as sort_array in the distributed
        # pull_df path; for HETEROGENEOUSLY-typed value sets the two
        # paths order across types differently (this key groups by
        # type tag, pull_df sorts by null-ordering + JSON fragment) —
        # a documented divergence, since mixed-type card-many values
        # have no reference-sanctioned order to begin with (the
        # reference returns an unordered set, SURVEY.md §0.2).
        if isinstance(v, bool):
            return ("bool", 0.0, str(v))
        if isinstance(v, (int, float)):
            return ("num", float(v), "")
        return (type(v).__name__, 0.0, str(v))

    def _ident_stub(self, node: str) -> dict[str, Any]:
        return {self.registry.ident_attr: self._collapse(self.registry.ident_attr, [node])}

    def assemble(self, pos: PullPos, node: str, ancestors: tuple[str, ...] = ()) -> dict[str, Any]:
        if node in ancestors:
            return {self.registry.ident_attr: node}  # cycle stub (Q5 fixed)
        anc = ancestors + (node,)
        node_attrs = self.attrs.get((pos.pos, node), {})
        out: dict[str, Any] = {}
        for attr in pos.plain:
            vals = node_attrs.get(attr)
            out[attr] = self._collapse(attr, sorted(vals, key=self._sort_key) if vals else vals)
        if pos.wildcard:
            for attr, vals in node_attrs.items():
                if attr not in out:
                    out[attr] = self._collapse(attr, sorted(vals, key=self._sort_key))
        for attr in pos.bare_reverse:
            fwd = reverse_lookup(attr)
            kids = sorted(self.rev_edges.get((pos.pos, node, fwd), []))
            out[attr] = [self._ident_stub(k) for k in kids]
        for attr, fwd, child in pos.children:
            if fwd is None:
                kids = sorted(self.fwd_edges.get((pos.pos, node, attr), []))
            else:
                kids = sorted(self.rev_edges.get((pos.pos, node, fwd), []))
            child_pos = self.root_expr if child == RECUR else child
            results: list[Any] = [self.assemble(child_pos, k, anc) for k in kids]
            out[attr] = self._collapse(attr, results)
        return out


def pull_many_plan(
    spark: SparkSession,
    facts: DataFrame,
    registry: SchemaRegistry,
    expr: list[Any],
    roots: list[str],
    max_depth: int = 20,
) -> list[dict[str, Any]]:
    tree = compile_expr(expr)
    run = PullRun(spark, facts, registry, tree, max_depth=max_depth)
    run.fetch(roots)
    return [run.assemble(tree, r) for r in roots]
