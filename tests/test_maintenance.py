"""Table-maintenance ops: corrupt-line quarantine on JSONL ingest and
small-file compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tripl_spark.session import load_table
from tripl_spark.sources.bucketing import optimize_parquet
from tripl_spark.sources.json_bulk import flatten_docs_df, read_jsonl


def test_jsonl_quarantine_splits_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"name": "a", "age": 1}\n'
        "{this is not json\n"
        '{"name": "b", "age": 2}\n'
        '[42, "also not a doc object"\n'
        '{"name": "c"}\n'
    )
    good, corrupt = read_jsonl(spark, str(p))
    assert good.count() == 3
    assert corrupt.count() == 2
    assert {r.name for r in good.collect()} == {"a", "b", "c"}
    # the good half flows straight into the distributed flattener
    facts = flatten_docs_df(good)
    assert facts.filter(F.col("a") == "name").count() == 3


def test_optimize_parquet_compacts_small_files(spark, sf_small, tmp_path):
    src = str(tmp_path / "frag")
    # fragment: 24 tiny files
    load_table(spark, sf_small, "orders").repartition(24).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 24

    dst = str(tmp_path / "opt")
    n = optimize_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 1
    assert (
        spark.read.parquet(dst).count()
        == load_table(spark, sf_small, "orders").count()
    )


def test_optimize_parquet_clusters_within_files(spark, sf_small, tmp_path):
    src = str(tmp_path / "frag2")
    load_table(spark, sf_small, "orders").repartition(8).write.parquet(src)
    dst = str(tmp_path / "opt2")
    optimize_parquet(
        spark, src, dst, target_file_bytes=1 << 30, cluster_by=["o_orderdate"]
    )
    pdf = spark.read.parquet(dst).select("o_orderdate").toPandas()
    assert list(pdf["o_orderdate"]) == sorted(pdf["o_orderdate"])


def test_zorder_shrinks_rowgroup_spans_on_both_dims(spark, sf_medium, tmp_path):
    """Z-ordering must cluster BOTH dimensions: every row group's
    min/max span over each Z column shrinks well below the global span
    (that is precisely what lets a scan skip row groups on a filter
    against either column). Verified from real parquet footer stats."""
    import pyarrow.parquet as pq
    from tripl_spark.sources.bucketing import zorder_parquet

    src = str(tmp_path / "src")
    load_table(spark, sf_medium, "orders").repartition(4).write.parquet(src)
    dst = str(tmp_path / "z")
    zorder_parquet(
        spark, src, dst, ["o_custkey", "o_totalprice"],
        target_file_bytes=1 << 30, row_group_bytes=32 << 10,
    )
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == 1
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.num_row_groups >= 4, "need several row groups to measure"
    names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}

    def spans(col):
        out = []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(names[col]).statistics
            out.append(st.max - st.min)
        return out

    orders = load_table(spark, sf_medium, "orders")
    for col in ("o_custkey", "o_totalprice"):
        row = orders.agg(F.max(col), F.min(col)).collect()[0]
        global_span = float(row[0] - row[1])
        avg_span = sum(float(s) for s in spans(col)) / meta.num_row_groups
        assert avg_span < 0.6 * global_span, (
            f"{col}: avg row-group span {avg_span} vs global {global_span}"
        )
