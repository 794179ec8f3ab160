"""Distributed pull: nested documents assembled ON THE CLUSTER as JSON,
one row per root — the scale path next to ``plans/pull.py``'s
driver-side assembly (whose output is a Python object and therefore
driver-resident by contract). Two assemblies share one render core:

* ``pull_json_df`` — BOTTOM-UP over the compiled expression tree: each
  position produces a frame ``(node, fragment)`` per expression
  component — plain attrs as a map of rendered value arrays, each
  child/reverse attr as a rendered JSON fragment with children sorted
  by eid (the driver path's ordering). A position's document is one
  full-outer-join fold of its component frames plus string splicing;
  total cost is one aggregation per component per level, keyed by node
  id, independent of result size (shared children render ONCE).
  Path-independent by construction, so it is the driver-equal choice
  for FLAT expressions and the only distributed option for ``'...'``
  recursion, which it BOUNDS: the root expression is unrolled
  ``recur_depth`` times and deeper nodes render as ``{ident: eid}``
  stubs — the distributed analog of the driver path's ``max_depth``
  rule (cycles expand until depth runs out instead of stubbing at
  first revisit).
* ``pull_json_paths_df`` (r13) — PATH-KEYED: reproduces the driver
  loop's ancestor-revisit cycle-stub rule exactly, making nested
  expressions driver-identical on ANY store, cyclic included. See its
  docstring.

String escaping rides on ``to_json`` (never hand-escaped). ``'*'``
wildcards render every attr present on the node (refs unexpanded, per
the driver path's Q10 semantics); extra keys are emitted in
sorted-attr order (canonical — the driver path's dict order is
collection-order). Bare reverse lookups are supported.
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


def pull_json_paths_df(
    facts: DataFrame,
    registry: SchemaRegistry,
    expr: list[Any],
    roots: DataFrame,
) -> DataFrame:
    """roots(e) → (e, doc): cluster-side assembly with the driver
    loop's EXACT cycle-stub semantics — a child that appears in its own
    ancestor path renders as ``{ident: eid}`` (reference cycle rule,
    tripl.py:665-668, ported per SURVEY Q5/Q6) and is not expanded.
    Valid for any non-``'...'`` expression on ANY store, cyclic or not,
    so ``pull_many``'s auto-switch needs no per-store safety precheck
    (r12 ran a detection BFS and then fell back to the driver loop on
    cyclic stores — paying the traversal twice; this assembles on the
    first and only pass).

    Two phases, both level-wise over the (finite) expression depth:

    * **expand** — each path row ``(key, node, pos, path)`` joins the
      facts frame per dict child; the child's ``revisit`` bit is
      ``array_contains(path, child)`` (the driver's ``node in
      ancestors``), and stubbed rows do not expand further. ``key`` is
      the path identity (parent key ⊕ child slot ⊕ child node — unique
      because facts have set semantics; eid components are
      base64-coded so the composite stays injective even for eids
      containing the ``\\x00`` separator byte), so diamonds and
      repeated subtrees stay distinct exactly as the driver loop walks
      them.
      ``localCheckpoint`` per level truncates lineage.
    * **assemble** — deepest level first: render each row's node-local
      components (plain attrs / wildcard / bare reverse — all keyed by
      node, path-independent), splice in child fragments grouped from
      the level below by ``(parent key, slot)`` sorted by child eid,
      and collapse per schema cardinality; revisit rows render the
      ident stub instead.

    Cost: the path-row count is the OUTPUT tree size — the same object
    the driver loop materializes one Python dict at a time; here each
    level is one join + one aggregation, distributed. A path's length
    is bounded by expression depth, so no frontier cap is needed (and
    truncation would be a wrong answer, not a safeguard).
    """
    tree = compile_expr(expr)
    # each expression position lives at exactly ONE depth — expansion
    # and assembly touch only that level's positions
    by_depth: dict[int, list[PullPos]] = {}

    def _walk(p: PullPos, d: int) -> None:
        by_depth.setdefault(d, []).append(p)
        for _, _, c in p.children:
            if c == RECUR:
                raise ValueError(
                    "pull_json_paths_df does not take '...' recursion; "
                    "use pull_json_df's bounded unroll"
                )
            _walk(c, d + 1)

    _walk(tree, 0)

    # one path tree per DISTINCT root; duplicates rejoin at the end so
    # the row contract (one output row per roots row) matches
    # pull_json_df whatever the expression shape
    lvl = roots.select(
        F.base64(F.encode(F.col("e"), "UTF-8")).alias("key"),
        F.lit(None).cast("string").alias("parent_key"),
        F.lit(-1).alias("slot"),
        F.col("e").alias("node"),
        F.lit(tree.pos).alias("pos"),
        F.lit(False).alias("revisit"),
        F.array(F.col("e")).alias("path"),
    ).dropDuplicates(["key"])
    levels: list[DataFrame] = [lvl.localCheckpoint(eager=True)]
    for depth in range(0, max(by_depth)) if len(by_depth) > 1 else []:
        parts: list[DataFrame] = []
        for p in by_depth[depth]:
            if not p.children:
                continue
            sub = levels[-1].filter((F.col("pos") == p.pos) & ~F.col("revisit"))
            for slot, (attr, fwd, child) in enumerate(p.children):
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
                        # eid components ride base64-coded so the
                        # \x00-delimited composite is injective for ANY
                        # eid byte content — a raw eid containing \x00
                        # could alias two distinct (parent, slot, child)
                        # paths and merge their child-fragment groups
                        # (ADVICE r13); base64 alphabet never collides
                        # with the separator and the digit slot
                        F.concat_ws(
                            "\x00",
                            F.col("key"),
                            F.lit(str(slot)),
                            F.base64(F.encode(F.col("child"), "UTF-8")),
                        ).alias("key"),
                        F.col("key").alias("parent_key"),
                        F.lit(slot).alias("slot"),
                        F.col("child").alias("node"),
                        F.lit(child.pos).alias("pos"),
                        # the driver's `node in ancestors`
                        F.array_contains(F.col("path"), F.col("child")).alias(
                            "revisit"
                        ),
                        F.concat(F.col("path"), F.array(F.col("child"))).alias(
                            "path"
                        ),
                    )
                )
        if not parts:
            break
        nxt = parts[0]
        for fr in parts[1:]:
            nxt = nxt.unionByName(fr)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        levels.append(nxt)

    ident = registry.ident_attr
    stub = F.concat(
        F.lit(f'{{"{_esc(ident)}":'), _quoted(F.col("node")), F.lit("}")
    )
    # child fragments grouped from the level below: (parent_key, slot) →
    # array of child JSON sorted by child eid (the driver's sorted(kids))
    child_frags: DataFrame | None = None
    for depth in range(len(levels) - 1, -1, -1):
        lvl = levels[depth]
        docs_parts: list[DataFrame] = []
        # stub rows were never expanded, so they have no child
        # fragments and their node components don't matter: render the
        # (position-independent) ident stub in ONE frame per level,
        # skipping every component/fragment join below. Depth 0 rows
        # are roots (revisit is statically false) — no stub frame and
        # no filter there at all.
        if depth > 0:
            docs_parts.append(
                lvl.filter(F.col("revisit")).select(
                    "parent_key", "slot", "node", stub.alias("json")
                )
            )
        for p in by_depth[depth]:
            live = F.col("pos") == p.pos
            if depth > 0:
                live = live & ~F.col("revisit")
            frame = lvl.filter(live).select(
                "key", "parent_key", "slot", "node"
            )
            child_cols: list[str] = []
            for slot in range(len(p.children)):
                col = f"__child{slot}"
                if child_frags is not None:
                    cf = child_frags.filter(F.col("__cslot") == slot).select(
                        F.col("__ckey").alias("__ck"), F.col("__arr").alias(col)
                    )
                    frame = frame.join(
                        cf, frame.key == F.col("__ck"), "left"
                    ).drop("__ck")
                else:
                    frame = frame.withColumn(
                        col, F.lit(None).cast("array<string>")
                    )
                child_cols.append(col)
            frame = _attach_node_components(facts, registry, p, frame)
            rendered = _render_doc(p, registry, child_cols)
            docs_parts.append(
                frame.select("parent_key", "slot", "node", rendered.alias("json"))
            )
        lvl_docs = docs_parts[0]
        for fr in docs_parts[1:]:
            lvl_docs = lvl_docs.unionByName(fr)
        if depth == 0:
            docs0 = lvl_docs.select(
                F.col("node").alias("__root"), F.col("json").alias("doc")
            )
            return roots.join(
                docs0, roots["e"] == F.col("__root"), "left"
            ).select("e", "doc")
        child_frags = lvl_docs.groupBy(
            F.col("parent_key").alias("__ckey"), F.col("slot").alias("__cslot")
        ).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("node"), F.col("json")))),
                lambda s: s.getField("json"),
            ).alias("__arr")
        )
    raise AssertionError("unreachable: levels[0] always returns")


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


def _node_component_frames(
    facts: DataFrame, registry: SchemaRegistry, pos: PullPos
) -> list[DataFrame]:
    """This position's PATH-INDEPENDENT component frames, each keyed by
    ``node``: the ``__plain`` rendered-value map (plain attrs and/or
    wildcard) and one ``__rev{i}`` stub array per bare reverse lookup.
    Shared by the bottom-up and the path-keyed assemblies."""
    frames: list[DataFrame] = []
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
        frames.append(
            per_attr.groupBy("node").agg(
                F.map_from_entries(F.collect_list(F.struct("a", "frags"))).alias("__plain")
            )
        )
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
        frames.append(_collect_children(kids, f"__rev{i}"))
    return frames


def _attach_node_components(
    facts: DataFrame, registry: SchemaRegistry, pos: PullPos, frame: DataFrame
) -> DataFrame:
    """Left-join a ``node``-carrying frame with this position's
    component frames (the path-keyed assembly's analog of the bottom-up
    full-outer fold; missing components render as the husk)."""
    for comp in _node_component_frames(facts, registry, pos):
        comp = comp.withColumnRenamed("node", "__n2")
        frame = frame.join(comp, frame["node"] == F.col("__n2"), "left").drop("__n2")
    return frame


def _render_doc(
    pos: PullPos, registry: SchemaRegistry, child_cols: list[str]
) -> F.Column:
    """JSON document expression over a frame carrying this position's
    component columns plus one (nullable) fragment-array column per
    dict child. NULL components collapse to the husk rendering (plain →
    null, reverse → [], children per cardinality)."""
    parts: list[F.Column] = []
    for attr in pos.plain:
        vals = F.element_at(F.col("__plain"), attr)
        if registry.card_one(attr):
            rendered = F.coalesce(F.element_at(vals, 1), F.lit("null"))
        else:
            rendered = F.when(vals.isNull(), F.lit("null")).otherwise(
                F.concat(F.lit("["), F.array_join(vals, ","), F.lit("]"))
            )
        parts.append(F.concat(F.lit(f'"{_esc(attr)}":'), rendered))
    if pos.wildcard:
        parts.append(_wildcard_segment(pos, registry))
    for i, attr in enumerate(pos.bare_reverse):
        rendered = F.concat(
            F.lit("["),
            F.array_join(F.coalesce(F.col(f"__rev{i}"), F.array()), ","),
            F.lit("]"),
        )
        parts.append(F.concat(F.lit(f'"{_esc(attr)}":'), rendered))
    for (attr, _, _), col in zip(pos.children, child_cols):
        if registry.card_one(attr):
            rendered = F.coalesce(F.element_at(F.col(col), 1), F.lit("null"))
        else:
            rendered = F.concat(
                F.lit("["),
                F.array_join(F.coalesce(F.col(col), F.array()), ","),
                F.lit("]"),
            )
        parts.append(F.concat(F.lit(f'"{_esc(attr)}":'), rendered))
    body = F.concat_ws(",", *parts)
    return F.concat(F.lit("{"), body, F.lit("}"))


def _position_docs(facts: DataFrame, registry: SchemaRegistry, pos: PullPos) -> DataFrame:
    """(node, json) for every node with any facts at this position —
    the bottom-up assembly: each position renders ONCE per node (shared
    children collapse), recursion over the expression tree."""
    frames = _node_component_frames(facts, registry, pos)
    child_cols: list[str] = []
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
        child_cols.append(col)

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

    return result.select(
        "node", _render_doc(pos, registry, child_cols).alias("json")
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
