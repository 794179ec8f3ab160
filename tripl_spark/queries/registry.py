"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers here as a named query:
``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__``'s
``queries()`` / ``oracle_sql()`` are thin views over this registry.

Conventions that keep the Spark side and the DuckDB oracle hash-equal:

* alias every computed column identically on both sides;
* round float aggregates (``round(x, 2)`` money, ``round(x, 4)`` ratios)
  so double summation-order differences can't flip the value hash;
* emit dates/timestamps as ISO strings (engine-neutral types);
* break window/top-k ties with a unique key so LIMIT is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from tripl_spark.queries import advanced, analytics, analytics2, tpch, tpch2, tpch3, tpch4  # noqa: F401
    from tripl_spark.queries import graph_queries, streaming_queries, triples  # noqa: F401
    from tripl_spark.operators import clustering, curation, dedup, dedup_groups, mixing, multimodal, packing, rangejoin, repetition, search, similarity, skew, text, tokenizer  # noqa: F401

    _LOADED = True
