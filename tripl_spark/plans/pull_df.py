"""Distributed pull: nested documents assembled ON THE CLUSTER as JSON,
one row per root — the scale path next to ``plans/pull.py``'s
driver-side assembly (whose output is a Python object and therefore
driver-resident by contract).

Bottom-up over the compiled expression tree: each position produces a
frame ``(node, fragment)`` per expression component — plain attrs as a
map of rendered value arrays, each child/reverse attr as a rendered
JSON fragment with children sorted by eid (the driver path's ordering).
A position's document is one full-outer-join fold of its component
frames plus string splicing; total cost is one aggregation per
component per level, keyed by node id, independent of result size.
String escaping rides on ``to_json`` (never hand-escaped).

``'*'`` wildcards render every attr present on the node (refs
unexpanded, per the driver path's Q10 semantics); extra keys are
emitted in sorted-attr order (canonical — the driver path's dict order
is collection-order). ``'...'`` recursion is BOUNDED here: the root
expression is unrolled ``recur_depth`` times and deeper nodes render as
``{ident: eid}`` stubs — the distributed analog of the driver path's
``max_depth``/cycle-stub rule (cycles expand until depth runs out
instead of stubbing at first revisit). Bare reverse lookups are
supported.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripl_spark.core.schema import SchemaRegistry
from tripl_spark.functions.namespaces import reverse_lookup
from tripl_spark.plans.pull import RECUR, PullPos, compile_expr


def pull_json_df(
    facts: DataFrame,
    registry: SchemaRegistry,
    expr: list[Any],
    roots: DataFrame,
    recur_depth: int = 4,
) -> DataFrame:
    """roots(e) → (e, doc) with doc a JSON document string."""
    tree = compile_expr(expr)
    tree = _expand_recursion(tree, tree, recur_depth, registry.ident_attr)
    docs = _position_docs(facts, registry, tree)
    return roots.join(docs, roots.e == docs.node, "left").select(
        "e",
        F.coalesce(F.col("json"), F.lit(_husk_json(tree, registry))).alias("doc"),
    )


# Path-frontier size past which ancestor_revisit_exists stops proving
# and conservatively reports a revisit (caller falls back to the driver
# loop). The frontier counts PATHS, not nodes — dense diamond fan-out
# can square it per level — so the cap bounds detection cost on
# adversarial DAGs while staying far above any sane document graph.
REVISIT_FRONTIER_CAP = 10_000_000


def ancestor_revisit_exists(
    facts: DataFrame,
    tree: PullPos,
    roots: DataFrame,
    frontier_cap: int = REVISIT_FRONTIER_CAP,
) -> bool:
    """Does any traversal path from a root revisit its own ancestor?

    This is EXACTLY the driver loop's cycle-stub condition
    (``plans/pull.py`` ``PullRun.assemble``: ``node in ancestors``) —
    when it never fires, the driver assembly is path-independent and
    provably equal to this module's bottom-up assembly, so
    ``pull_many`` may auto-switch nested expressions to the cluster
    path. Checked by a level-wise path-BFS over the expression's dict
    children (bare reverse lookups render ident stubs without
    recursing, so they can't revisit): each frontier row carries its
    ancestor path; one aggregate per expression level reports a hit.
    Levels are bounded by the (finite) expression depth; ``'...'``
    recursion returns True up front (its bounded-unroll semantics
    diverge regardless). Returns True conservatively when the path
    frontier exceeds ``frontier_cap``.
    """
    positions: dict[int, PullPos] = {}

    def _walk(p: PullPos) -> bool:
        positions[p.pos] = p
        for _, _, c in p.children:
            if c == RECUR or not _walk(c):
                return False
        return True

    if not _walk(tree):
        return True
    frontier = roots.select(
        F.col("e").alias("node"),
        F.lit(tree.pos).alias("pos"),
        F.array(F.col("e")).alias("path"),
    )
    while True:
        parts: list[DataFrame] = []
        for p in positions.values():
            if not p.children:
                continue
            sub = frontier.filter(F.col("pos") == p.pos)
            for attr, fwd, child in p.children:
                if fwd is None:
                    edges = facts.filter(
                        (F.col("a") == attr) & F.col("v_str").isNotNull()
                    ).select(F.col("e").alias("node"), F.col("v_str").alias("child"))
                else:
                    edges = facts.filter(
                        (F.col("a") == fwd) & F.col("v_str").isNotNull()
                    ).select(F.col("v_str").alias("node"), F.col("e").alias("child"))
                parts.append(
                    sub.join(edges, "node").select(
                        F.col("child").alias("node"),
                        F.lit(child.pos).alias("pos"),
                        # parent's path = the driver's `ancestors` tuple
                        F.array_contains(F.col("path"), F.col("child")).alias(
                            "revisit"
                        ),
                        F.concat(F.col("path"), F.array(F.col("child"))).alias(
                            "next_path"
                        ),
                    )
                )
        if not parts:
            return False  # only terminal positions left
        nxt = parts[0]
        for fr in parts[1:]:
            nxt = nxt.unionByName(fr)
        # LIMIT cap+1 BEFORE materializing: it bounds the rows this
        # level ever produces (a single join step can amplify a
        # <=cap frontier by the store's max fan-out — the cap must
        # bound the work, not just observe it after the fact), and
        # localCheckpoint truncates lineage so level k's aggregate
        # doesn't re-execute levels 1..k-1's joins.
        nxt = nxt.limit(frontier_cap + 1).localCheckpoint(eager=True)
        stats = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.max(F.col("revisit").cast("int")), F.lit(0)).alias("hit"),
        ).collect()[0]
        if stats.hit:
            return True
        if stats.n == 0:
            return False
        if stats.n > frontier_cap:
            return True  # limit truncated: conservatively a revisit
        frontier = nxt.select("node", "pos", F.col("next_path").alias("path"))


def _expand_recursion(
    root: PullPos, pos: PullPos, depth: int, ident_attr: str
) -> PullPos:
    """Unroll ``'...'`` markers: each re-enters the ROOT expression (the
    reference's recursion rule) up to ``depth`` times; exhausted depth
    renders the node as an ident stub."""
    new = PullPos(
        pos=pos.pos,
        plain=list(pos.plain),
        bare_reverse=list(pos.bare_reverse),
        wildcard=pos.wildcard,
    )
    for attr, fwd, child in pos.children:
        if child == RECUR:
            sub = (
                PullPos(pos=-1, plain=[ident_attr])
                if depth <= 0
                else _expand_recursion(root, root, depth - 1, ident_attr)
            )
        else:
            sub = _expand_recursion(root, child, depth, ident_attr)
        new.children.append((attr, fwd, sub))
    return new


def _esc(s: str) -> str:
    return json.dumps(s)[1:-1]


def _quoted(col: F.Column) -> F.Column:
    """JSON string literal (quoted + escaped) of a string column, or the
    bare token 'null'. to_json does the escaping: {"x":"..."} → strip
    the 5-char prefix and trailing brace."""
    wrapped = F.to_json(F.struct(col.alias("x")), {"ignoreNullFields": "false"})
    return wrapped.substr(F.lit(6), F.length(wrapped) - F.lit(6))


def _value_fragment() -> F.Column:
    """One typed fact value → JSON token string."""
    return (
        F.when(F.col("vtype") == "null", F.lit("null"))
        .when(F.col("vtype") == "bool",
              F.when(F.col("v_bool"), F.lit("true")).otherwise(F.lit("false")))
        .when(F.col("vtype") == "int", F.col("v_num").cast("long").cast("string"))
        .when(F.col("vtype") == "float", F.col("v_num").cast("string"))
        .otherwise(_quoted(F.col("v_str")))
    )


def _husk_json(pos: PullPos, registry: SchemaRegistry) -> str:
    """Document for a node with no facts — mirrors the driver husk:
    plain attrs → null, reverse lookups → [], children by cardinality."""
    out = "{"
    parts = [f'"{_esc(a)}":null' for a in pos.plain]
    parts += [f'"{_esc(a)}":[]' for a in pos.bare_reverse]
    for a, _, _ in pos.children:
        parts.append(f'"{_esc(a)}":' + ("null" if registry.card_one(a) else "[]"))
    return out + ",".join(parts) + "}"


def _collect_children(frame: DataFrame, out_col: str) -> DataFrame:
    """(node, child, cjson) → (node, out_col: array<json> sorted by child)."""
    return frame.groupBy("node").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("child"), F.col("cjson")))),
            lambda s: s.getField("cjson"),
        ).alias(out_col)
    )


def _position_docs(facts: DataFrame, registry: SchemaRegistry, pos: PullPos) -> DataFrame:
    """(node, json) for every node with any facts at this position."""
    # component frames: (frame keyed by node, fragment column name)
    frames: list[DataFrame] = []
    # how to render each attr at final assembly: (attr, kind, colname, card_one)
    render_plan: list[tuple[str, str, str | None]] = []

    if pos.plain or pos.wildcard:
        src = facts if pos.wildcard else facts.filter(F.col("a").isin(pos.plain))
        rows = src.select(
            F.col("e").alias("node"),
            "a",
            F.struct(
                F.when(F.col("vtype").isin("int", "float"), F.col("v_num")).alias("__n"),
                F.when(~F.col("vtype").isin("int", "float"), _value_fragment())
                .otherwise(F.lit(None)).alias("__s"),
                _value_fragment().alias("frag"),
            ).alias("v"),
        )
        per_attr = rows.groupBy("node", "a").agg(
            F.transform(
                F.array_sort(F.collect_list("v")), lambda s: s.getField("frag")
            ).alias("frags")
        )
        plain = per_attr.groupBy("node").agg(
            F.map_from_entries(F.collect_list(F.struct("a", "frags"))).alias("__plain")
        )
        frames.append(plain)
        for a in pos.plain:
            render_plan.append((a, "plain", None))
        if pos.wildcard:
            render_plan.append(("*", "wild", None))

    for i, attr in enumerate(pos.bare_reverse):
        fwd = reverse_lookup(attr)
        ident = registry.ident_attr
        stub = (
            F.concat(F.lit(f'{{"{_esc(ident)}":'), _quoted(F.col("child")), F.lit("}"))
            if registry.card_one(ident)
            else F.concat(F.lit(f'{{"{_esc(ident)}":['), _quoted(F.col("child")), F.lit("]}"))
        )
        kids = (
            facts.filter(F.col("a") == fwd)
            .select(F.col("v_str").alias("node"), F.col("e").alias("child"))
            .withColumn("cjson", stub)
        )
        col = f"__rev{i}"
        frames.append(_collect_children(kids, col))
        render_plan.append((attr, "rev", col))

    for i, (attr, fwd, child) in enumerate(pos.children):
        child_docs = _position_docs(facts, registry, child).withColumnRenamed(
            "node", "__cn"
        )
        if fwd is None:
            edges = facts.filter((F.col("a") == attr) & F.col("v_str").isNotNull()).select(
                F.col("e").alias("node"), F.col("v_str").alias("child")
            )
        else:
            edges = facts.filter((F.col("a") == fwd) & F.col("v_str").isNotNull()).select(
                F.col("v_str").alias("node"), F.col("e").alias("child")
            )
        husk = _husk_json(child, registry)
        joined = edges.join(child_docs, edges.child == F.col("__cn"), "left").select(
            "node", "child", F.coalesce(F.col("json"), F.lit(husk)).alias("cjson")
        )
        col = f"__child{i}"
        frames.append(_collect_children(joined, col))
        render_plan.append((attr, "child", col))

    if not frames:
        raise ValueError("empty pull expression")

    result = frames[0]
    for fr in frames[1:]:
        fr = fr.withColumnRenamed("node", "__n2")
        data_cols = [c for c in result.columns if c != "node"]
        result = result.join(fr, result.node == F.col("__n2"), "full").select(
            F.coalesce(F.col("node"), F.col("__n2")).alias("node"),
            *data_cols,
            *[c for c in fr.columns if c != "__n2"],
        )

    parts: list[F.Column] = []
    for attr, kind, col in render_plan:
        key = F.lit(f'"{_esc(attr)}":')
        if kind == "wild":
            parts.append(_wildcard_segment(pos, registry))
            continue
        if kind == "plain":
            vals = F.element_at(F.col("__plain"), attr)
            if registry.card_one(attr):
                rendered = F.coalesce(F.element_at(vals, 1), F.lit("null"))
            else:
                rendered = F.when(vals.isNull(), F.lit("null")).otherwise(
                    F.concat(F.lit("["), F.array_join(vals, ","), F.lit("]"))
                )
        elif kind == "rev":
            rendered = F.concat(
                F.lit("["), F.array_join(F.coalesce(F.col(col), F.array()), ","), F.lit("]")
            )
        else:  # child
            if registry.card_one(attr):
                rendered = F.coalesce(F.element_at(F.col(col), 1), F.lit("null"))
            else:
                rendered = F.concat(
                    F.lit("["),
                    F.array_join(F.coalesce(F.col(col), F.array()), ","),
                    F.lit("]"),
                )
        parts.append(F.concat(key, rendered))

    body = F.concat_ws(",", *parts)
    return result.select(
        "node", F.concat(F.lit("{"), body, F.lit("}")).alias("json")
    )


def _wildcard_segment(pos: PullPos, registry: SchemaRegistry) -> F.Column:
    """Render every attr in the ``__plain`` map not already emitted
    explicitly, in sorted-attr order, collapsing per schema cardinality.
    NULL (skipped by concat_ws) when nothing extra is present."""
    excluded = sorted(
        set(pos.plain) | {a for a, fwd, _ in pos.children if fwd is None}
    )
    # NULL __plain (node reached only via child/rev frames) propagates to
    # NULL entries → size NULL → the whole segment renders NULL (skipped)
    entries = F.array_sort(F.map_entries(F.col("__plain")))
    if excluded:
        entries = F.filter(entries, lambda e: ~e.getField("key").isin(*excluded))

    declared_one = registry.card_one_attrs()
    declared_many = registry.declared_many_attrs()

    def is_card_one(key: F.Column) -> F.Column:
        # mirror SchemaRegistry.cardinality(): declared wins, else default
        if registry.default_cardinality == "db.cardinality:one":
            return ~key.isin(*declared_many) if declared_many else F.lit(True)
        return key.isin(*declared_one) if declared_one else F.lit(False)

    def render(e: F.Column) -> F.Column:
        vals = e.getField("value")
        one = F.coalesce(F.element_at(vals, 1), F.lit("null"))
        many = F.concat(F.lit("["), F.array_join(vals, ","), F.lit("]"))
        return F.concat(
            _quoted(e.getField("key")),
            F.lit(":"),
            F.when(is_card_one(e.getField("key")), one).otherwise(many),
        )

    joined = F.array_join(F.transform(entries, render), ",")
    return F.when(F.size(entries) > 0, joined).otherwise(F.lit(None))
