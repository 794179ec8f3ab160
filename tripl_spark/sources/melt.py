"""Melt a relational DataFrame into the EAV facts encoding — the
distributed bulk-ingest path (FIXTURES.md "triple-encoding bridge").

Where ``TripleStore.assert_facts`` flattens driver-side documents (the
reference's write API is driver-side by nature), ``melt_table`` turns an
arbitrary table into facts rows entirely JVM-side: one ``explode`` over
a per-row array of typed (a, v) structs — no Python in the loop, linear
in input size, and the output inherits the input's partitioning. At
100 TB this is THE way triples enter the store.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# names that embed verbatim in SQL text with no escaping concerns in
# EITHER parser mode (no quote, no backslash, no backtick)
_SQL_SAFE_NAME = re.compile(r"[A-Za-z0-9:_.\- ]+")


def melt_table(
    df: DataFrame,
    ns: str,
    key_col: str,
    ref_cols: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Produce a facts frame (e, a, vtype, v_str, v_num, v_bool, t) from a
    table.

    * ``e`` = ``"{ns}-{key}"``; every column ``c`` becomes attr ``"{ns}:{c}"``.
    * ``ref_cols`` maps column → (target_ns, attr_name): the value becomes
      a ref eid ``"{target_ns}-{value}"`` under ``"{ns}:{attr_name}"`` —
      foreign keys become graph edges.

    The per-row struct array is rendered as ONE ``selectExpr`` parse
    (the per-column expression builder issued ~12 py4j round trips per
    melted column, billed to every store-backed query construction —
    guide §5, the driver does no per-cell work); names that would need
    SQL escaping fall back to the exact columnwise builder.
    """
    ref_cols = ref_cols or {}
    names = [ns, key_col, *df.columns]
    for tns, attr in ref_cols.values():
        names += [tns, attr]
    if all(_SQL_SAFE_NAME.fullmatch(n) for n in names):
        return _melt_table_sql(df, ns, key_col, ref_cols)
    return _melt_table_columnwise(df, ns, key_col, ref_cols)


def _melt_table_sql(
    df: DataFrame,
    ns: str,
    key_col: str,
    ref_cols: dict[str, tuple[str, str]],
) -> DataFrame:
    """SQL-text twin of ``_melt_table_columnwise`` — same structs, same
    types, one parse."""
    e = f"concat('{ns}-', CAST(`{key_col}` AS STRING))"
    null_s = "CAST(NULL AS STRING)"
    null_n = "CAST(NULL AS DOUBLE)"
    null_b = "CAST(NULL AS BOOLEAN)"

    def kv(a: str, vtype: str, v_str: str, v_num: str, v_bool: str) -> str:
        return (
            f"named_struct('a', '{a}', 'vtype', '{vtype}', "
            f"'v_str', CAST({v_str} AS STRING), "
            f"'v_num', CAST({v_num} AS DOUBLE), "
            f"'v_bool', CAST({v_bool} AS BOOLEAN))"
        )

    structs = [kv("db:ident", "str", e, null_n, null_b)]
    for f in df.schema.fields:
        c = f"`{f.name}`"
        if f.name in ref_cols:
            target_ns, attr_name = ref_cols[f.name]
            ref = f"concat('{target_ns}-', CAST({c} AS STRING))"
            structs.append(kv(f"{ns}:{attr_name}", "ref", ref, null_n, null_b))
            continue
        a = f"{ns}:{f.name}"
        dt = f.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            structs.append(kv(a, "int", null_s, c, null_b))
        elif isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            structs.append(kv(a, "float", null_s, c, null_b))
        elif isinstance(dt, T.BooleanType):
            structs.append(kv(a, "bool", null_s, null_n, c))
        elif isinstance(dt, (T.TimestampType, T.DateType)):
            structs.append(
                kv(a, "str", f"date_format({c}, 'yyyy-MM-dd HH:mm:ss')",
                   null_n, null_b)
            )
        elif isinstance(dt, T.StringType):
            structs.append(kv(a, "str", c, null_n, null_b))
        else:
            continue  # arrays/maps/binary: not meltable scalars, skip
    return df.selectExpr(
        f"{e} AS e", f"explode(array({', '.join(structs)})) AS kv"
    ).selectExpr("e", "kv.*", "CAST(0 AS BIGINT) AS t")


def _melt_table_columnwise(
    df: DataFrame,
    ns: str,
    key_col: str,
    ref_cols: dict[str, tuple[str, str]],
) -> DataFrame:
    """The original per-column expression builder — exact but
    py4j-chatty; kept as the fallback for names needing SQL escaping."""
    e = F.concat(F.lit(f"{ns}-"), F.col(key_col).cast("string"))
    null_s = F.lit(None).cast("string")
    null_n = F.lit(None).cast("double")
    null_b = F.lit(None).cast("boolean")

    def kv(a: str, vtype: str, v_str, v_num, v_bool):
        return F.struct(
            F.lit(a).alias("a"),
            F.lit(vtype).alias("vtype"),
            v_str.cast("string").alias("v_str"),
            v_num.cast("double").alias("v_num"),
            v_bool.cast("boolean").alias("v_bool"),
        )

    structs = [kv("db:ident", "str", e, null_n, null_b)]
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.name in ref_cols:
            target_ns, attr_name = ref_cols[f.name]
            ref = F.concat(F.lit(f"{target_ns}-"), c.cast("string"))
            structs.append(kv(f"{ns}:{attr_name}", "ref", ref, null_n, null_b))
            continue
        a = f"{ns}:{f.name}"
        dt = f.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            structs.append(kv(a, "int", null_s, c, null_b))
        elif isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            structs.append(kv(a, "float", null_s, c, null_b))
        elif isinstance(dt, T.BooleanType):
            structs.append(kv(a, "bool", null_s, null_n, c))
        elif isinstance(dt, (T.TimestampType, T.DateType)):
            structs.append(kv(a, "str", F.date_format(c, "yyyy-MM-dd HH:mm:ss"), null_n, null_b))
        elif isinstance(dt, T.StringType):
            structs.append(kv(a, "str", c, null_n, null_b))
        else:
            continue  # arrays/maps/binary: not meltable scalars, skip
    return (
        df.select(e.alias("e"), F.explode(F.array(*structs)).alias("kv"))
        .select("e", "kv.*", F.lit(0).cast("long").alias("t"))
    )
