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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    """
    ref_cols = ref_cols or {}
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
