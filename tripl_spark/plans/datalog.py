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
the sketch stays unimplemented here too; ``plans/graph.reachability``
covers recursive reachability.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripl_spark.plans.match import value_predicate


def _is_var(term: Any) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _vkey_of_value() -> F.Column:
    return (
        F.when(F.col("vtype") == "null", F.lit("z"))
        .when(F.col("vtype").isin("int", "float"),
              F.concat(F.lit("n:"), F.col("v_num").cast("string")))
        .when(F.col("vtype") == "bool",
              F.concat(F.lit("b:"),
                       F.when(F.col("v_bool"), F.lit("True")).otherwise(F.lit("False"))))
        .otherwise(F.concat(F.lit("s:"), F.col("v_str")))
    )


def _clause_df(facts: DataFrame, clause: list[Any]) -> tuple[DataFrame, list[str]]:
    e_term, attr, v_term = clause
    if _is_var(attr):
        raise NotImplementedError("variable attribute positions are not supported")
    df = facts.filter(F.col("a") == attr)
    cols: dict[str, F.Column] = {}
    if _is_var(e_term):
        cols[e_term] = F.concat(F.lit("s:"), F.col("e"))
    else:
        df = df.filter(F.col("e") == str(e_term))
    if _is_var(v_term):
        cols[v_term] = _vkey_of_value()
    else:
        df = df.filter(value_predicate([v_term]))
    if not cols:  # fully ground clause: existence check → empty-schema row
        cols["__exists"] = F.lit(1)
    out = df.select(*[c.alias(v) for v, c in cols.items()])
    return out, [v for v in cols]


def q_df(facts: DataFrame, query: dict[str, Any]) -> DataFrame:
    where = query.get("where") or []
    if not where:
        raise ValueError("datalog query needs at least one where clause")
    find = query["find"]
    find_vars = [find] if isinstance(find, str) else list(find)

    bound: DataFrame | None = None
    bound_vars: set[str] = set()
    for clause in where:
        cdf, cvars = _clause_df(facts, clause)
        if bound is None:
            bound, bound_vars = cdf, set(cvars)
            continue
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
            bound = bound.crossJoin(cdf)
        bound_vars |= set(cvars)

    missing = [v for v in find_vars if v not in bound_vars]
    if missing:
        raise ValueError(f"find variables not bound by any clause: {missing}")
    out = bound.select(*find_vars).distinct()
    sort = query.get("sort")
    if sort:
        out = out.orderBy(*[_binding_sort_key(v) for v in
                            (sort if isinstance(sort, list) else [sort])])
    take = query.get("take")
    if take:
        out = out.limit(int(take))
    return out


def _binding_sort_key(var: str) -> F.Column:
    """Type-aware ordering for canonical keys: numbers numerically,
    everything else by its key string (the raw 'n:12.0' key would sort
    lexicographically and put 9 after 20)."""
    col = F.col(var)
    is_num = col.startswith("n:")
    return F.struct(
        F.when(is_num, F.lit(0)).otherwise(F.lit(1)).alias("k"),
        F.when(is_num, F.substring(col, 3, 64).cast("double")).alias("n"),
        col.alias("s"),
    )


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


def q(store: Any, query: dict[str, Any]) -> list[tuple]:
    """Run a datalog query against a TripleStore → list of binding
    tuples (ordered by 'sort' if given, else by all find vars for
    determinism)."""
    find = query["find"]
    find_vars = [find] if isinstance(find, str) else list(find)
    df = q_df(store.current_facts(), query)
    if not query.get("sort") and not query.get("take"):
        df = df.orderBy(*find_vars)
    return [tuple(decode_binding(row[v]) for v in find_vars) for row in df.collect()]
