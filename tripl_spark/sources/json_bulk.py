"""Distributed bulk document ingestion: JSON/JSONL → facts, all JVM.

The driver-side flattener (``core/flatten.py``) is right for interactive
writes — documents already live on the driver. For bulk corpora the
documents live in files, and this module flattens them WITHOUT ever
materializing a Python object per doc: ``spark.read.json`` infers the
nested schema, and we recurse over that *schema* (driver-side plan
construction, like the pull compiler) emitting one explode pipeline per
nesting level. Reference semantics ported from ``_assert_dict``
(/root/reference/tripl/tripl.py:483-494): nested objects become
sub-entities replaced by refs, arrays fan out, idents self-assert.

Entity-id parity with the driver path is exact: identifying attributes
mint ``uuid5("tripl:{attr}={value}")`` via the JVM uuid5 expression
(``functions/ids.py``), so the same entity ingested through either path
gets the same eid. Anonymous entities hash their content + position
(``uuid5("tripl-anon:...")``) — deterministic re-ingest, unlike the
reference's uuid1 (which also makes bulk ingest idempotent: re-running
a batch produces identical rows that compact away).

``remap_to_existing`` reconciles a fresh batch against an existing
store: id-attr keys that already resolve to a (possibly explicit-ident)
entity rewrite both ``e`` and ref values — two broadcast-able joins,
the batched equivalent of the reference's per-doc ``match`` scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tripl_spark.functions.ids import deterministic_eid_col, uuid5_col


def _scalar_vtype(dt: T.DataType) -> str | None:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return "str"
    return None


def _kv(a: str, vtype: str, v: F.Column) -> F.Column:
    null_s = F.lit(None).cast("string")
    null_n = F.lit(None).cast("double")
    null_b = F.lit(None).cast("boolean")
    return F.struct(
        F.lit(a).alias("a"),
        F.lit(vtype).alias("vtype"),
        (v.cast("string") if vtype in ("str", "ref") else null_s).alias("v_str"),
        (v.cast("double") if vtype in ("int", "float") else null_n).alias("v_num"),
        (v.cast("boolean") if vtype == "bool" else null_b).alias("v_bool"),
    )


def _eid_expr(doc: F.Column, fields: list[T.StructField], ident_attr: str,
              id_attrs: list[str], anon_name: F.Column) -> F.Column:
    names = {f.name for f in fields}
    chain: list[F.Column] = []
    if ident_attr in names:
        chain.append(doc.getField(ident_attr).cast("string"))
    for attr in sorted(a for a in id_attrs if a in names):
        chain.append(
            F.when(
                doc.getField(attr).isNotNull(),
                deterministic_eid_col(attr, doc.getField(attr)),
            )
        )
    chain.append(uuid5_col(anon_name))
    return F.coalesce(*chain)


def flatten_docs_df(
    docs: DataFrame,
    ident_attr: str = "db:ident",
    id_attrs: list[str] | None = None,
    t: int = 0,
) -> DataFrame:
    """Flatten a nested-struct documents frame (e.g. from
    ``spark.read.json``) into facts rows. One batch = one ``t`` stamp
    (bulk batches are unordered sets; per-triple ordering only matters
    for the interactive card-one path, which uses the driver flattener).
    """
    id_attrs = list(id_attrs or [])
    fields = list(docs.schema.fields)
    doc_struct = F.struct(*[F.col(c).alias(c) for c in docs.columns])
    root = docs.select(doc_struct.alias("__doc")).withColumn(
        "__eid",
        _eid_expr(
            F.col("__doc"),
            fields,
            ident_attr,
            id_attrs,
            F.concat(F.lit("tripl-anon:root:"), F.to_json(F.col("__doc"))),
        ),
    )
    frames = _flatten_level(root, fields, ident_attr, id_attrs)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.withColumn("t", F.lit(t).cast("long"))


def _flatten_level(
    level: DataFrame, fields: list[T.StructField], ident_attr: str, id_attrs: list[str]
) -> list[DataFrame]:
    """Emit facts frames for one nesting level + recurse into children.
    ``level`` has columns __doc (struct), __eid (string)."""
    doc = F.col("__doc")
    kvs: list[F.Column] = [_kv(ident_attr, "str", F.col("__eid"))]
    out_frames: list[DataFrame] = []
    for f in fields:
        if f.name == ident_attr:
            continue  # the self-assert kv above covers it (eid == str(ident))
        a = f.name
        vt = _scalar_vtype(f.dataType)
        col = doc.getField(a)
        if vt is not None:
            kvs.append(F.when(col.isNotNull(), _kv(a, vt, col)))
        elif isinstance(f.dataType, T.ArrayType):
            el = f.dataType.elementType
            evt = _scalar_vtype(el)
            if evt is not None:
                # array of scalars: fan out to one kv per element
                exploded = level.select(
                    F.col("__eid"), F.explode(F.coalesce(col, F.array())).alias("__v")
                ).select(F.col("__eid").alias("e"), _kv(a, evt, F.col("__v")).alias("kv"))
                out_frames.append(exploded.select("e", "kv.*"))
            elif isinstance(el, T.StructType):
                out_frames.extend(
                    _child_frames(level, a, col, el, ident_attr, id_attrs, is_array=True)
                )
        elif isinstance(f.dataType, T.StructType):
            out_frames.extend(
                _child_frames(level, a, col, f.dataType, ident_attr, id_attrs, is_array=False)
            )
        # other types (map, binary) are not valid triple values: skipped
    scalars = level.select(
        F.col("__eid").alias("e"),
        F.explode(F.array_compact(F.array(*kvs))).alias("kv"),
    ).select("e", "kv.*")
    return [scalars] + out_frames


def _child_frames(
    level: DataFrame,
    attr: str,
    col: F.Column,
    struct_type: T.StructType,
    ident_attr: str,
    id_attrs: list[str],
    is_array: bool,
) -> list[DataFrame]:
    if is_array:
        base = level.select(
            F.col("__eid").alias("__peid"),
            F.posexplode(F.coalesce(col, F.array())).alias("__pos", "__doc"),
        )
    else:
        base = level.select(
            F.col("__eid").alias("__peid"), F.lit(0).alias("__pos"), col.alias("__doc")
        )
    base = base.filter(F.col("__doc").isNotNull())
    anon = F.concat(
        F.lit("tripl-anon:"), F.col("__peid"), F.lit(f":{attr}:"),
        F.col("__pos").cast("string"), F.lit(":"), F.to_json(F.col("__doc")),
    )
    child = base.withColumn(
        "__eid", _eid_expr(F.col("__doc"), list(struct_type.fields), ident_attr, id_attrs, anon)
    )
    ref_rows = child.select(
        F.col("__peid").alias("e"), _kv(attr, "ref", F.col("__eid")).alias("kv")
    ).select("e", "kv.*")
    return [ref_rows] + _flatten_level(
        child.select("__doc", "__eid"), list(struct_type.fields), ident_attr, id_attrs
    )


def remap_to_existing(
    rows: DataFrame, existing: DataFrame, id_attrs: list[str]
) -> DataFrame:
    """Rewrite minted deterministic eids to existing entities that carry
    the same identifying fact (batch analog of _resolve_eid's match
    lookup, /root/reference/tripl/tripl.py:457-481)."""
    if not id_attrs:
        return rows
    maps = []
    for attr in id_attrs:
        src = existing.filter(F.col("a") == attr)
        val = F.when(F.col("vtype") == "int", F.col("v_num").cast("long").cast("string")) \
            .when(F.col("vtype") == "float", F.col("v_num").cast("string")) \
            .otherwise(F.col("v_str"))
        maps.append(
            src.select(
                deterministic_eid_col(attr, val).alias("__from"), F.col("e").alias("__to")
            )
        )
    mapping = maps[0]
    for m in maps[1:]:
        mapping = mapping.unionByName(m)
    mapping = mapping.filter(F.col("__from") != F.col("__to")).distinct()
    # Prune the mapping to eids the BATCH actually minted before
    # broadcasting: the store-derived mapping is O(|store entities|),
    # and broadcasting it verbatim couples re-ingest cost (and driver
    # memory) to store size. Entries whose __from appears nowhere in
    # the batch can never rewrite anything, so the semi-join below is
    # semantics-free — it scans the store-side mapping ONCE with the
    # small batch-eid set broadcast into it, leaving a batch-bounded
    # mapping to broadcast into the two rewrite joins. Resolution cost
    # then scales with the batch, not the store (SCALE.md probe row).
    batch_eids = (
        rows.select(F.col("e").alias("__k"))
        .unionByName(
            rows.filter(F.col("vtype") == "ref").select(F.col("v_str").alias("__k"))
        )
        .distinct()
    )
    mapping = mapping.join(
        F.broadcast(batch_eids), mapping.__from == F.col("__k"), "left_semi"
    )
    remapped = (
        rows.join(F.broadcast(mapping), rows.e == mapping.__from, "left")
        .withColumn("e", F.coalesce(F.col("__to"), F.col("e")))
        .drop("__from", "__to")
    )
    remapped = (
        remapped.join(
            F.broadcast(mapping),
            (remapped.vtype == "ref") & (remapped.v_str == mapping.__from),
            "left",
        )
        .withColumn("v_str", F.coalesce(F.col("__to"), F.col("v_str")))
        .drop("__from", "__to")
    )
    return remapped


def read_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """JSONL reader with a dead-letter quarantine: returns
    (good_docs, corrupt_lines). At ingest scale one malformed line must
    not kill the job (FAILFAST) or silently vanish (DROPMALFORMED) —
    PERMISSIVE mode routes unparseable lines into a corrupt-record
    column, split out here so the caller can count/persist them to a
    dead-letter path while the good docs continue into
    ``flatten_docs_df``. The cache is required: Spark refuses to answer
    queries that select only the corrupt column from a raw scan."""
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    ).cache()
    if "_corrupt" in raw.columns:
        corrupt = raw.filter(F.col("_corrupt").isNotNull()).select("_corrupt")
        good = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    else:
        corrupt = raw.limit(0).select(F.lit("").alias("_corrupt")).limit(0)
        good = raw
    return good, corrupt
