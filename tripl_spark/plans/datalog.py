"""Datalog-style conjunctive queries — the reference SKETCHES this API
in comments and never implements it (/root/reference/tripl/tripl.py:
571-587: ``{'find': ..., 'where': [...], 'take': 20, 'sort': ...}``).
We implement the sketched surface over the facts frame:

    q(store, {"find": ["?seq", "?tp"],
              "where": [["?seq", "cft:type", "cft.type:seq"],
                        ["?seq", "cft.seq:timepoint", "?tp"]],
              "sort": "?seq", "take": 20})

Each ``where`` clause [e, a, v] (constants or ``?vars``) compiles to a
filtered scan of facts projected onto its variables; the conjunction is
a fold of joins on shared variables — classic worst-case-optimal-less
binder, but Catalyst reorders the equi-join chain and broadcasts small
clause results, which covers the practical cases. Variables bind
through a canonical value key (``s:``/``n:``/``b:`` prefixed) so an
entity-position variable can join a value-position variable (eids are
string values — the lazy-ref property). The ``rules`` recursion from
the sketch is implemented too (``eval_rules`` /
``facts_with_rules``): semi-naive fixpoint evaluation of recursive
rules, delta-driven so each round joins only newly-derived tuples.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripl_spark.plans.match import value_predicate
from tripl_spark.session import eager_checkpoint


def _is_var(term: Any) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _vkey_of_value() -> F.Column:
    """The canonical value key — ONE definition, shared with the
    store's compaction keys (late import: store itself imports this
    module for ``q``)."""
    from tripl_spark.core.store import _vkey_col

    return _vkey_col()


def _clause_df(facts: DataFrame, clause: list[Any]) -> tuple[DataFrame, list[str]]:
    e_term, attr, v_term = clause
    df = facts
    # position → binding expression; constants become filters. A
    # variable ATTRIBUTE binds the attr name as a string value (so it
    # can join entity/value variables through the canonical key) — note
    # such a clause scans every attribute: the `a` filter that usually
    # becomes a partition-pruning predicate is absent by construction.
    exprs: list[tuple[str, F.Column]] = []
    if _is_var(e_term):
        exprs.append((e_term, F.concat(F.lit("s:"), F.col("e"))))
    else:
        df = df.filter(F.col("e") == str(e_term))
    if _is_var(attr):
        exprs.append((attr, F.concat(F.lit("s:"), F.col("a"))))
    else:
        df = df.filter(F.col("a") == attr)
    if _is_var(v_term):
        exprs.append((v_term, _vkey_of_value()))
    else:
        df = df.filter(value_predicate([v_term]))
    cols: dict[str, F.Column] = {}
    for var, expr in exprs:
        if var in cols:  # same var twice in one clause → intra-row equality
            df = df.filter(cols[var] == expr)
        else:
            cols[var] = expr
    if not cols:  # fully ground clause: existence check — ONE row at
        # most (a re-asserted triple appears N times in a non-compacted
        # frame; without the limit each copy would cross-join into the
        # bound set, multiplying every binding N-fold)
        return df.limit(1).select(F.lit(1).alias("__exists")), ["__exists"]
    out = df.select(*[c.alias(v) for v, c in cols.items()])
    return out, [v for v in cols]


def _fold_clause_dfs(
    clause_dfs: list[tuple[DataFrame, list[str]]],
    clauses: list[list[Any]] | None = None,
    allow_product: bool = False,
) -> tuple[DataFrame, set[str]]:
    """Conjunction of clause frames: fold of equi-joins on shared vars.

    Clauses are folded in CONNECTIVITY order, not written order: after
    each join, the next clause is the first remaining one that shares a
    variable with the bound set (conjunction is order-independent, so
    this changes only the plan, never the result). A clause set where
    NO remaining clause connects is a genuine cartesian product of
    independent binding sets — valid datalog semantics, but in practice
    almost always a typo'd variable name, and at scale a plan bomb —
    so it RAISES unless the query opts in with ``allow_product=True``
    (exception: fully-ground existence-check clauses, whose one-row
    ``__exists`` frame is a cheap broadcast semijoin-shaped product by
    design)."""
    remaining = list(enumerate(clause_dfs))
    bound: DataFrame | None = None
    bound_vars: set[str] = set()
    while remaining:
        if bound is None:
            idx, (cdf, cvars) = remaining.pop(0)
            bound, bound_vars = cdf, set(cvars)
            continue
        pick = next(
            (
                k
                for k, (_, (_, cv)) in enumerate(remaining)
                if any(v in bound_vars for v in cv)
            ),
            0,  # nothing connects: fall through to the product guard
        )
        idx, (cdf, cvars) = remaining.pop(pick)
        shared = [v for v in cvars if v in bound_vars]
        if shared:
            renamed = cdf
            for v in shared:
                renamed = renamed.withColumnRenamed(v, f"__r_{v}")
            cond = None
            for v in shared:
                c = bound[v] == renamed[f"__r_{v}"]
                cond = c if cond is None else (cond & c)
            bound = bound.join(renamed, cond).drop(*[f"__r_{v}" for v in shared])
        else:
            is_exists = "__exists" in cvars or bound_vars == {"__exists"}
            if not (allow_product or is_exists):
                # report the clause ITSELF, never a positional index —
                # clauses arrive reordered (positives first, then ors)
                # so an index would point at the wrong element of the
                # user's original where list
                at = f" {clauses[idx]!r}" if clauses else ""
                raise ValueError(
                    f"datalog clause{at} shares no variable with any "
                    f"connected clause (bound: {sorted(bound_vars)}) — "
                    "this plans a cartesian product of independent "
                    "binding sets; check for a typo'd variable, or pass "
                    "'allow_product': True to run it anyway"
                )
            bound = bound.crossJoin(cdf)
        bound_vars |= set(cvars)
    assert bound is not None
    return bound, bound_vars


_AGG_FNS = {"count", "count-distinct", "min", "max", "sum", "avg"}


def _agg_expr(fn: str, var: str, name: str) -> F.Column:
    """One find-aggregate over a canonical-key binding column.
    min/max use the TYPED ordering (numbers numerically) and return
    canonical keys; sum/avg decode the numeric payload (non-numeric
    bindings contribute NULL, i.e. are skipped — the sane Datomic-ish
    semantics for a heterogeneous value column)."""
    col = F.col(var)
    if fn == "count":
        return F.count(col).alias(name)
    if fn == "count-distinct":
        return F.countDistinct(col).alias(name)
    if fn == "min":
        return F.min_by(col, _sort_key_expr(col)).alias(name)
    if fn == "max":
        return F.max_by(col, _sort_key_expr(col)).alias(name)
    num = F.when(col.startswith("n:"), F.substring(col, 3, 64).cast("double"))
    return (F.sum(num) if fn == "sum" else F.avg(num)).alias(name)


def _is_not_clause(c: Any) -> bool:
    """True for a well-formed ["not", [e,a,v], ...] clause. A clause
    that STARTS with "not" but carries a malformed sub-clause raises
    instead of silently parsing as a positive triple with entity
    literal "not" (the same validation the 'or' branch gets)."""
    if not (isinstance(c, (list, tuple)) and len(c) >= 2 and c[0] == "not"):
        return False
    bad = [sc for sc in c[1:] if not (isinstance(sc, (list, tuple)) and len(sc) == 3)]
    if bad:
        raise ValueError(
            f"bad 'not' clause {c!r}: every sub-clause must be a "
            f"3-element [e, a, v] list, got {bad[0]!r}"
        )
    return True


def _is_or_clause(c: Any) -> bool:
    return isinstance(c, (list, tuple)) and len(c) >= 2 and c[0] == "or"


def _apply_negation(
    facts: DataFrame,
    bound: DataFrame,
    bound_vars: set[str],
    sub: list[list[Any]],
    allow_product: bool = False,
) -> DataFrame:
    """Anti-join ``bound`` against a negated sub-conjunction: the sub
    folds like a normal body, projects onto the variables it shares
    with the bound set (variables appearing only inside the ``not``
    are existential within it), and anti-joins. Raises on unanchored
    negation — shared with top-level ``not`` and ``not`` inside an
    ``or``-branch ``and`` group, so both strata use identical
    semantics."""
    ndf, nvars = _fold_clause_dfs(
        [_clause_df(facts, sc) for sc in sub],
        clauses=sub,
        allow_product=allow_product,
    )
    shared = [v for v in nvars if v in bound_vars]
    if not shared:
        raise ValueError(
            f"'not' sub-conjunction {sub!r} shares no variable with the "
            "positive clauses — unanchored negation would negate "
            "everything or nothing; bind at least one common variable"
        )
    proj = ndf.select(*shared).distinct()
    for v in shared:
        proj = proj.withColumnRenamed(v, f"__n_{v}")
    cond = None
    for v in shared:
        c = bound[v] == proj[f"__n_{v}"]
        cond = c if cond is None else (cond & c)
    return bound.join(proj, cond, "left_anti")


def _or_clause_df(facts: DataFrame, c: list[Any]) -> tuple[DataFrame, list[str]]:
    """["or", branch, ...] — each branch is a clause [e, a, v] or an
    ["and", clause, ...] group. Every branch folds independently and
    must bind the SAME variable set (the Datomic rule — otherwise the
    union would fabricate NULL bindings); the unioned binding relation
    then joins into the outer conjunction exactly like a clause.

    An ``and`` group may contain ``["not", [e,a,v], ...]`` members:
    the branch's positive clauses fold first, then each negation
    anti-joins the branch's binding set (stratified WITHIN the branch
    — the same two-stratum evaluation the top level uses, so
    ``or``/``not`` nesting keeps Datomic's semantics). A branch that
    is ONLY a negation is rejected: it binds no variables, so it can
    neither satisfy the same-variables rule nor anchor the anti-join."""
    branches = []
    for br in c[1:]:
        if isinstance(br, (list, tuple)) and len(br) >= 2 and br[0] == "and":
            sub = [list(sc) for sc in br[1:]]
        else:
            sub = [list(br)]
        neg_subs = [list(sc[1:]) for sc in sub if _is_not_clause(sc)]
        pos = [sc for sc in sub if not _is_not_clause(sc)]
        if not all(isinstance(sc, list) and len(sc) == 3 for sc in pos):
            raise ValueError(
                f"bad 'or' branch {br!r}: each branch must be a [e, a, v] "
                "clause, a ['not', [e, a, v], ...] inside an 'and' group, "
                "or an ['and', clause, ...] group"
            )
        if not pos:
            raise ValueError(
                f"bad 'or' branch {br!r}: a branch cannot be ONLY a "
                "negation — it binds no variables (wrap it in an 'and' "
                "with at least one positive clause to anchor it)"
            )
        bdf, bvars = _fold_clause_dfs(
            [_clause_df(facts, sc) for sc in pos], clauses=pos
        )
        for nsub in neg_subs:
            bdf = _apply_negation(facts, bdf, bvars, nsub)
        branches.append((bdf, frozenset(bvars)))
    var_sets = {vs for _, vs in branches}
    if len(var_sets) != 1:
        raise ValueError(
            f"'or' branches must bind the same variables, got "
            f"{sorted(sorted(vs) for vs in var_sets)}"
        )
    cols = sorted(var_sets.pop())
    out = branches[0][0].select(*cols)
    for bdf, _ in branches[1:]:
        out = out.unionByName(bdf.select(*cols))
    return out.distinct(), cols


def q_df(facts: DataFrame, query: dict[str, Any]) -> DataFrame:
    where = query.get("where") or []
    if not where:
        raise ValueError("datalog query needs at least one where clause")
    find = query["find"]
    raw_find = [find] if isinstance(find, str) else list(find)
    # Datomic-style find aggregates: an element may be ["count", "?e"],
    # ["min"|"max"|"sum"|"avg"|"count-distinct", "?v"]. Plain vars
    # become the group keys; aggregation runs over the DISTINCT binding
    # tuples (the engine's set semantics — a fact asserted twice is one
    # binding, so counts are entity/value counts, not fact counts).
    group_vars = [f for f in raw_find if isinstance(f, str)]
    agg_specs: list[tuple[str, str, str]] = []
    for f in raw_find:
        if isinstance(f, str):
            continue
        if not (isinstance(f, (list, tuple)) and len(f) == 2 and f[0] in _AGG_FNS
                and _is_var(f[1])):
            raise ValueError(f"bad find aggregate {f!r}: expected [fn, ?var] "
                             f"with fn in {sorted(_AGG_FNS)}")
        fn, v = f
        agg_specs.append((fn, v, f"{fn.replace('-', '_')}_{v[1:]}"))
    find_vars = group_vars + [v for _, v, _ in agg_specs]

    # Datomic-style negation: ["not", clause, ...] elements are
    # evaluated AFTER every positive clause (stratified — over the
    # base facts, or base+derived when rules extended them). The
    # sub-conjunction folds like a normal body, then anti-joins the
    # bound set on the variables it shares with it; variables
    # appearing only inside the `not` are existential within it.
    positives = [c for c in where if not (_is_not_clause(c) or _is_or_clause(c))]
    ors = [c for c in where if _is_or_clause(c)]
    negatives = [list(c[1:]) for c in where if _is_not_clause(c)]
    if not positives and not ors:
        raise ValueError("datalog query needs at least one positive where clause")

    clause_dfs = [_clause_df(facts, c) for c in positives]
    clause_dfs += [_or_clause_df(facts, c) for c in ors]
    bound, bound_vars = _fold_clause_dfs(
        clause_dfs,
        clauses=positives + ors,
        allow_product=bool(query.get("allow_product")),
    )
    for sub in negatives:
        bound = _apply_negation(
            facts, bound, bound_vars, sub,
            allow_product=bool(query.get("allow_product")),
        )

    missing = [v for v in find_vars if v not in bound_vars]
    if missing:
        raise ValueError(f"find variables not bound by any clause: {missing}")

    # Datomic's :with escape hatch — extra tuple-distinguishing
    # variables excluded from the output. For aggregates: sum/avg run
    # over DISTINCT (group ∪ agg ∪ with) binding tuples, so ``'with':
    # ['?e']`` keeps one tuple per entity where plain set semantics
    # would collapse equal values. For non-aggregate queries it gives
    # Datomic's BAG semantics: one output row per distinct
    # (find ∪ with) binding, so duplicate find-projections survive.
    with_ = query.get("with") or []
    with_vars = [with_] if isinstance(with_, str) else list(with_)
    bad_with = [w for w in with_vars if not (_is_var(w) and w in bound_vars)]
    if bad_with:
        raise ValueError(
            f"'with' variables must be ?vars bound by a where clause, got {bad_with}"
        )

    if agg_specs:
        tuple_vars = list(dict.fromkeys(
            group_vars + [v for _, v, _ in agg_specs] + with_vars
        ))
        rows = bound.select(*tuple_vars).distinct()
        aggs = [_agg_expr(fn, v, name) for fn, v, name in agg_specs]
        out = rows.groupBy(*group_vars).agg(*aggs) if group_vars else rows.agg(*aggs)
        # aggregates are functionally determined by the group keys, so
        # group-key ordering is total; sort/take below operate on the
        # group vars exactly as in the non-aggregate path. A falsy
        # 'sort' ([], None, "") means "no explicit sort" → default
        # group-key ordering, keeping output deterministic run to run.
        find_vars = group_vars
        if not query.get("sort") and group_vars:
            out = out.orderBy(*[_binding_sort_key(v) for v in group_vars])
        take = query.get("take")
        sort = query.get("sort")
        if sort:
            sorts = sort if isinstance(sort, list) else [sort]
            bad = [s for s in sorts if not (_is_var(s) and s in group_vars)]
            if bad:
                raise ValueError(
                    f"aggregate queries sort only by group variables, got {bad}"
                )
            out = out.orderBy(*[_binding_sort_key(s) for s in sorts])
        if take:
            return out.limit(int(take))
        return out

    if with_vars:
        # bag semantics: distinct over (find ∪ with), then project the
        # with-vars away — duplicates per distinct with-tuple remain
        tuple_vars = list(dict.fromkeys(find_vars + with_vars))
        out = bound.select(*tuple_vars).distinct().select(*find_vars)
    else:
        out = bound.select(*find_vars).distinct()
    sort = query.get("sort")
    if sort:
        sort_cols = []
        extra = []
        for s in sort if isinstance(sort, list) else [sort]:
            if _is_var(s):
                sort_cols.append(_binding_sort_key(s))
            else:
                # ATTRIBUTE sort — the reference sketch's literal
                # ``'sort': 'db:ident'`` (tripl.py:583): order by that
                # attribute of the FIRST find variable's entity. One
                # value per entity so card-many attrs can't duplicate
                # result rows; the representative is min_by the TYPED
                # key (numbers numerically), not the lexicographic min
                # of the canonical string — 'n:9.0' beats 'n:12.0'.
                # NOTE: the anchor must be entity-valued; if find_vars[0]
                # binds plain values the left join finds no attribute
                # rows and those rows sort as nulls-first.
                anchor = find_vars[0]
                scol = f"__sort_{len(extra)}"
                vk = _vkey_of_value()
                sv = (
                    facts.filter(F.col("a") == s)
                    .groupBy(F.concat(F.lit("s:"), F.col("e")).alias("__se"))
                    .agg(F.min_by(vk, _sort_key_expr(vk)).alias(scol))
                )
                out = out.join(sv, out[anchor] == sv["__se"], "left").drop("__se")
                extra.append(scol)
                sort_cols.append(_binding_sort_key(scol))
        out = out.orderBy(*sort_cols)
        if extra:
            out = out.select(*find_vars)
    take = query.get("take")
    if take:
        if not sort:
            # deterministic LIMIT: without this, WHICH rows survive the
            # take would vary with partitioning/AQE run to run
            out = out.orderBy(*[_binding_sort_key(v) for v in find_vars])
        out = out.limit(int(take))
    return out


def _sort_key_expr(col: F.Column) -> F.Column:
    """Type-aware ordering for a canonical-key expression: numbers
    numerically, everything else by its key string (the raw 'n:12.0'
    key would sort lexicographically and put 9 after 20)."""
    is_num = col.startswith("n:")
    return F.struct(
        F.when(is_num, F.lit(0)).otherwise(F.lit(1)).alias("k"),
        F.when(is_num, F.substring(col, 3, 64).cast("double")).alias("n"),
        col.alias("s"),
    )


def _binding_sort_key(var: str) -> F.Column:
    return _sort_key_expr(F.col(var))


def decode_binding(vkey: str | None) -> Any:
    """Canonical value key → Python value (for q()'s driver-side rows)."""
    if vkey is None or vkey == "z":
        return None
    tag, _, rest = vkey.partition(":")
    if tag == "n":
        f = float(rest)
        return int(f) if f.is_integer() else f
    if tag == "b":
        return rest == "True"
    return rest


def decode_cell(x: Any) -> Any:
    """Driver-row decode: canonical-key strings decode through
    ``decode_binding``; aggregate outputs (count/sum/avg numbers) pass
    through untouched."""
    return decode_binding(x) if isinstance(x, str) or x is None else x


def q(store: Any, query: dict[str, Any]) -> list[tuple]:
    """Run a datalog query against a TripleStore → list of binding
    tuples (ordered by 'sort' if given, else by all find vars for
    determinism). Find elements may be aggregates ([fn, ?var]) — the
    output columns then follow q_df's group-vars-then-aggregates
    order."""
    df = q_df(store.current_facts(), query)
    has_agg = not all(isinstance(f, str) for f in (
        [query["find"]] if isinstance(query["find"], str) else query["find"]
    ))
    if not query.get("sort") and not has_agg:
        # presentation order (take is already deterministic inside q_df;
        # aggregate queries come back group-key-ordered already)
        df = df.orderBy(*df.columns)
    cols = df.columns
    return [tuple(decode_cell(row[c]) for c in cols) for row in df.collect()]


# -- recursive rules (semi-naive) -------------------------------------------


def _derived_clause_df(
    rel: DataFrame, clause: list[Any]
) -> tuple[DataFrame, list[str]]:
    """A body clause over a derived predicate: rel is its (e, v) pair
    set; bindings use the same canonical keys as base clauses —
    including the two base-clause edge shapes: the same variable in
    both positions is an intra-row equality, and a fully-ground clause
    is a one-row ``__exists`` check (the shapes ``_clause_df`` handles
    at lines 72-78)."""
    e_term, _pred, v_term = clause
    df = rel
    cols: dict[str, F.Column] = {}
    if _is_var(e_term):
        cols[e_term] = F.concat(F.lit("s:"), F.col("e"))
    else:
        df = df.filter(F.col("e") == str(e_term))
    if _is_var(v_term):
        if v_term in cols:  # same var twice → intra-row equality
            df = df.filter(F.col("e") == F.col("v"))
        else:
            cols[v_term] = F.concat(F.lit("s:"), F.col("v"))
    else:
        df = df.filter(F.col("v") == str(v_term))
    if not cols:  # fully ground: existence check, one row at most
        return df.limit(1).select(F.lit(1).alias("__exists")), ["__exists"]
    return df.select(*[c.alias(n) for n, c in cols.items()]), list(cols)


def _strip_s(col: F.Column) -> F.Column:
    return F.substring(col, 3, 1 << 20)


def eval_rules(
    facts: DataFrame,
    rules: list[tuple[list[Any], list[list[Any]]]],
    max_iters: int = 30,
) -> dict[str, DataFrame]:
    """Fixpoint of recursive datalog rules — the part of the reference's
    sketched API (tripl.py:571-587 mentions ``rules``) it never built.

    Each rule is (head, body): head ``[?x, pred, ?y]`` (vars only, attr
    constant), body a list of clauses over base attributes or derived
    predicates. Evaluation is SEMI-NAIVE: after seeding with the
    non-recursive rules, each round re-evaluates recursive bodies with
    the last round's DELTA substituted into the first recursive
    predicate occurrence — so round N's joins touch only newly-derived
    tuples, not the whole relation (the difference between O(paths) and
    O(paths × diameter) total work). Rounds checkpoint like the other
    iterative plans. Linear recursion (one recursive clause per body)
    is evaluated exactly; additional recursive occurrences see the
    accumulated relation, which still reaches the same fixpoint for
    monotone rules, just possibly in more rounds.

    Rule bodies may contain ``["or", ...]`` and ``["not", ...]``
    clauses over BASE attributes: the ``or`` binding relation is built
    once per evaluation (no derived predicates inside branches — the
    delta-substitution semantics of a recursive disjunct are not
    implemented), and negation anti-joins each variant's positive fold
    (negation over a DERIVED predicate is rejected: negation through
    recursion is non-stratifiable — the standard datalog restriction).

    Returns {pred: DataFrame(e, v)} of derived pairs."""
    preds = {head[1] for head, _ in rules}
    known: dict[str, DataFrame] = {}
    delta: dict[str, DataFrame] = {}

    def _split_body(body):
        pos = [c for c in body if not (_is_not_clause(c) or _is_or_clause(c))]
        ors = [c for c in body if _is_or_clause(c)]
        negs = [list(c[1:]) for c in body if _is_not_clause(c)]
        for oc in ors:
            for br in oc[1:]:
                sub = br[1:] if br and br[0] == "and" else [br]
                for sc in sub:
                    inner = sc[1:] if sc and sc[0] == "not" else [sc]
                    if any(
                        isinstance(c, (list, tuple)) and len(c) == 3
                        and c[1] in preds for c in inner
                    ):
                        raise ValueError(
                            f"'or' branch {br!r} references a derived "
                            "predicate — disjunction over recursive "
                            "predicates is not supported in rule bodies"
                        )
        for sub in negs:
            if any(sc[1] in preds for sc in sub):
                raise ValueError(
                    f"'not' {sub!r} negates a derived predicate — "
                    "negation through recursion is non-stratifiable; "
                    "negate base attributes only"
                )
        return pos, ors, negs

    split = [(head, _split_body(body)) for head, body in rules]

    def eval_body(parts, use_delta: bool) -> list[DataFrame]:
        """All bound frames for this body; with use_delta, one variant
        per recursive POSITIVE clause position substituted with delta.
        or-clauses fold in as extra binding relations; negations
        anti-join each variant after its fold."""
        pos, ors, negs = parts
        rec_positions = [i for i, c in enumerate(pos) if c[1] in preds]
        or_frames = [_or_clause_df(facts, c) for c in ors]

        def frames(dpos: int | None):
            return [
                _derived_clause_df(
                    delta[c[1]] if i == dpos else known[c[1]], c
                )
                if c[1] in preds
                else _clause_df(facts, c)
                for i, c in enumerate(pos)
            ] + or_frames

        variant_frames = (
            [frames(None)]
            if not use_delta or not rec_positions
            else [frames(dpos) for dpos in rec_positions]
        )
        out = []
        for v in variant_frames:
            bound, bvars = _fold_clause_dfs(v)
            for sub in negs:
                bound = _apply_negation(facts, bound, bvars, sub)
            out.append(bound)
        return out

    def head_pairs(head: list[Any], bound: DataFrame) -> DataFrame:
        e_var, _pred, v_var = head
        return bound.select(
            _strip_s(F.col(e_var)).alias("e"), _strip_s(F.col(v_var)).alias("v")
        ).distinct()

    # seed: non-recursive rules only (recursion = a derived predicate
    # in a POSITIVE clause; or/not clauses were validated base-only)
    for head, parts in split:
        if any(c[1] in preds for c in parts[0]):
            continue
        pairs = head_pairs(head, eval_body(parts, use_delta=False)[0])
        pred = head[1]
        known[pred] = (
            pairs if pred not in known else known[pred].union(pairs).distinct()
        )
    for pred in preds:
        if pred not in known:
            spark = facts.sparkSession
            from tripl_spark.session import local_df

            known[pred] = local_df(spark, [], "e string, v string")
        known[pred] = known[pred].transform(eager_checkpoint)
        delta[pred] = known[pred]

    for _round in range(max_iters):
        new: dict[str, DataFrame] = {}
        for head, parts in split:
            if not any(c[1] in preds for c in parts[0]):
                continue
            pred = head[1]
            for bound in eval_body(parts, use_delta=True):
                pairs = head_pairs(head, bound)
                new[pred] = pairs if pred not in new else new[pred].union(pairs)
        progressed = False
        for pred in preds:
            if pred not in new:
                delta[pred] = known[pred].limit(0)
                continue
            fresh = (
                new[pred]
                .distinct()
                .join(
                    known[pred]
                    .withColumnRenamed("e", "__e")
                    .withColumnRenamed("v", "__v"),
                    (F.col("e") == F.col("__e")) & (F.col("v") == F.col("__v")),
                    "left_anti",
                )
                .transform(eager_checkpoint)
            )
            delta[pred] = fresh
            if not fresh.isEmpty():
                progressed = True
                known[pred] = known[pred].union(fresh).transform(eager_checkpoint)
        if not progressed:
            break
    else:  # max_iters exhausted with fresh tuples still arriving
        import warnings

        warnings.warn(
            f"eval_rules stopped after max_iters={max_iters} rounds "
            "WITHOUT reaching a fixpoint — the returned derived "
            "relations are truncated (deep recursion needs a larger "
            "max_iters; each semi-naive round extends linear "
            "derivations by one hop)",
            RuntimeWarning,
            stacklevel=2,
        )
    return known


def facts_with_rules(
    facts: DataFrame,
    rules: list[tuple[list[Any], list[list[Any]]]],
) -> DataFrame:
    """facts ∪ derived-predicate rows (as ref triples, t=0) — so a
    plain datalog query can use derived predicates in its where
    clauses."""
    out = facts
    for pred, rel in eval_rules(facts, rules).items():
        derived = rel.select(
            F.col("e"),
            F.lit(pred).alias("a"),
            F.lit("ref").alias("vtype"),
            F.col("v").alias("v_str"),
            F.lit(None).cast("double").alias("v_num"),
            F.lit(None).cast("boolean").alias("v_bool"),
            F.lit(0).cast("long").alias("t"),
        )
        out = out.unionByName(derived)
    return out
