"""Conjunctive pattern-match compiler (reference ``match``,
/root/reference/tripl/tripl.py:589-609).

A pattern is a dict of clauses ``{attr: value}`` where value may be:

* a scalar → equality predicate;
* a list/set → IN (disjunction over values, SURVEY.md Q11);
* a dict → recursive sub-match whose eid-set joins through the attr
  (a graph equi-join; uniform semi-join path fixes SURVEY.md Q3).

Compilation: each clause becomes a filtered scan of the facts frame
projected to eids; the conjunction is a chain of left-semi joins.
The attribute-equality filter plays the role of the reference's AEV
index (partition/cluster facts by ``a`` and Catalyst prunes); the
sub-match semi-join on ``v_str`` plays the VAE role. Catalyst orders
and broadcasts the semi-joins (clause eid-sets are usually small), so
no manual selectivity ordering is needed.
"""

from __future__ import annotations

import functools
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripl_spark.core.flatten import typed_value


def value_predicate(values: list[Any]) -> F.Column:
    """Type-aware equality/IN predicate over the typed value columns.

    Numeric lookups compare on v_num (so 5 matches 5.0, as Python
    equality does in the reference); strings compare on v_str, which
    also holds ref values (eids), matching the reference's raw-value
    AEV scan.
    """
    preds = []
    str_vals, num_vals, bool_vals = [], [], []
    for v in values:
        if isinstance(v, bool):
            bool_vals.append(v)
        elif isinstance(v, (int, float)):
            num_vals.append(float(v))
        elif v is None:
            preds.append(F.col("vtype") == "null")
        else:
            vtype, v_str, _, _ = typed_value(v, is_ref=False)
            str_vals.append(v_str)
    if str_vals:
        preds.append(F.col("v_str").isin(str_vals))
    if num_vals:
        preds.append(F.col("v_num").isin(num_vals))
    if bool_vals:
        preds.append(F.col("v_bool").isin(bool_vals))
    return functools.reduce(lambda x, y: x | y, preds) if preds else F.lit(False)


def clause_eids(facts: DataFrame, attr: str, value: Any) -> DataFrame:
    """eids satisfying one ``attr = value`` clause → DataFrame['e'].

    Deliberately NOT deduplicated: semi-join probes tolerate duplicate
    build rows, so dedup here would add one shuffle per clause. The
    single distinct happens once in match_df.
    """
    base = facts.filter(F.col("a") == attr)
    if isinstance(value, DataFrame):
        # sub-match result: join through the ref value (facts.v == sub.e)
        sub = value.select(F.col("e").alias("__sub_e"))
        return base.join(sub, base.v_str == F.col("__sub_e"), "left_semi").select("e")
    values = list(value) if isinstance(value, (list, set, tuple)) else [value]
    return base.filter(value_predicate(values)).select("e")


def match_df(facts: DataFrame, pattern: dict[str, Any]) -> DataFrame:
    """Compile a pattern to a DataFrame of matching eids (column ``e``)."""
    if not pattern:
        raise ValueError("empty match pattern")
    resolved = {
        a: (match_df(facts, v) if isinstance(v, dict) else v) for a, v in pattern.items()
    }
    clause_dfs = [clause_eids(facts, a, v) for a, v in resolved.items()]
    result = clause_dfs[0]
    for other in clause_dfs[1:]:
        result = result.join(other.withColumnRenamed("e", "__other_e"),
                             result.e == F.col("__other_e"), "left_semi")
    return result.distinct()
