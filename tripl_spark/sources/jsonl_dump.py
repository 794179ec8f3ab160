"""Distributed EAV-index JSON persistence — the scale path for the
reference's ``dump``/``load`` (/root/reference/tripl/tripl.py:536-558).

The reference dumps the whole store as ONE json.dump'd dict
``{e: {a: [v, ...]}}`` — inherently driver-bound. Here the same logical
index is written as JSONL: one line per entity, each line a one-key
``{e: {a: [v, ...]}}`` object, so

* rendering is fully JVM-side (``to_json`` for escaping, no Python in
  the loop, no collect) and writes shard across executors;
* any concatenation of shards is a loads()-mergeable index — entity
  merge stays a line-level union, matching the reference's "trivially
  merged" design goal (docs/vision.md:69);
* loading is distributed too: Spark 4 ``VariantType`` — ``parse_json``
  per line, three LATERAL ``variant_explode`` levels (entity → attr →
  value), with ``schema_of_variant`` recovering the value type tag, so
  int/float/bool/str/null round-trip type-exactly without a Python UDF.

Attribute maps and value lists are sorted (values by the same canonical
key the driver-side ``to_dict`` uses), so the dump is deterministic:
re-dumping an unchanged store yields byte-identical lines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _json_quote(col: Column) -> Column:
    """JSON-escape + quote a string column JVM-side: render a 1-element
    array and strip the brackets (``to_json`` does the escaping)."""
    aj = F.to_json(F.array(col))
    return F.substring(aj, F.lit(2), F.length(aj) - 2)


def _render_value() -> Column:
    """One fact's value as a JSON scalar literal, from the tagged
    columns. Doubles render via ``to_json`` (Jackson's shortest-repr
    double, e.g. ``1.0E-7`` — valid JSON, parses back to the identical
    double); ints as longs; strings/refs escaped."""
    fj = F.to_json(F.array(F.col("v_num")))
    return (
        F.when(F.col("vtype") == "null", F.lit("null"))
        .when(
            F.col("vtype") == "bool",
            F.when(F.col("v_bool"), F.lit("true")).otherwise(F.lit("false")),
        )
        .when(F.col("vtype") == "int", F.col("v_num").cast("long").cast("string"))
        .when(F.col("vtype") == "float", F.substring(fj, F.lit(2), F.length(fj) - 2))
        .otherwise(_json_quote(F.col("v_str")))
    )


def render_index_lines(facts: DataFrame) -> DataFrame:
    """Compacted facts → one ``value: string`` column, one entity per
    line in EAV-index shape. Two aggregations, both keyed by ``e`` (the
    second groupBy reuses the first's hash partitioning — one shuffle)."""
    from tripl_spark.core.store import _vkey_col

    vals = facts.select(
        "e", "a", _vkey_col().alias("vk"), _render_value().alias("jv")
    )
    per_ea = vals.groupBy("e", "a").agg(
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vk", "jv"))),
                    lambda s: s["jv"],
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("vals_json")
    )
    pair = F.concat(_json_quote(F.col("a")), F.lit(":"), F.col("vals_json"))
    per_e = per_ea.groupBy("e").agg(
        F.concat(
            F.lit("{"),
            F.array_join(F.array_sort(F.collect_list(pair)), ","),
            F.lit("}"),
        ).alias("doc_json")
    )
    return per_e.select(
        F.concat(
            F.lit("{"), _json_quote(F.col("e")), F.lit(":"), F.col("doc_json"), F.lit("}")
        ).alias("value")
    )


def parse_index_lines(lines: DataFrame, t: int = 0) -> DataFrame:
    """JSONL index lines → facts rows (``FACT_COLUMNS`` shape, stamp
    ``t``). Dynamic keys rule out ``from_json`` with a fixed schema (and
    a map<string,string> target would erase value types); VariantType
    keeps the JSON type system intact end-to-end."""
    spark = lines.sparkSession
    parsed = lines.select(F.parse_json(F.col("value")).alias("doc"))
    view = "__tripl_jsonl_parse__"
    parsed.createOrReplaceTempView(view)
    tri = spark.sql(
        f"""
        SELECT ee.key AS e, aa.key AS a, vv.value AS val
        FROM {view},
        LATERAL variant_explode(doc) AS ee,
        LATERAL variant_explode(ee.value) AS aa,
        LATERAL variant_explode(aa.value) AS vv
        """
    )
    tri.schema  # force analysis (resolves the view) before dropping it
    spark.catalog.dropTempView(view)
    st = F.schema_of_variant(F.col("val"))
    vtype = (
        F.when(st == "VOID", F.lit("null"))
        .when(st == "BOOLEAN", F.lit("bool"))
        .when(st == "BIGINT", F.lit("int"))
        .when(st.startswith("DECIMAL") | st.isin("DOUBLE", "FLOAT"), F.lit("float"))
        .otherwise(F.lit("str"))
    )
    tri = tri.withColumn("vtype", vtype)
    return tri.select(
        "e",
        "a",
        "vtype",
        F.when(
            F.col("vtype") == "str", F.try_variant_get("val", "$", "string")
        ).alias("v_str"),
        F.when(
            F.col("vtype").isin("int", "float"),
            F.try_variant_get("val", "$", "double"),
        ).alias("v_num"),
        F.when(
            F.col("vtype") == "bool", F.try_variant_get("val", "$", "boolean")
        ).alias("v_bool"),
        F.lit(t).cast("long").alias("t"),
    )
