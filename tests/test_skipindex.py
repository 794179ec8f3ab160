"""File-list skip index: pruned reads are row-identical to full reads
and actually skip files (`sources/skipindex.py`)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tripl_spark.core.store import TripleStore
from tripl_spark.session import load_table
from tripl_spark.sources.skipindex import (
    build_skip_index,
    plan_files,
    read_pruned,
    verify_skip_index,
)


@pytest.fixture(scope="module")
def dump(spark, sf_small, tmp_path_factory):
    """An attribute-partitioned fact dump with a REAL time spread:
    events melt to stamped facts (the time-travel fixture shape), so
    per-file t-ranges differ and as_of pruning has something to skip.
    repartitionByRange on t inside each attr partition gives each file
    a tight, mostly-disjoint stamp range — exactly the layout an
    append-only log produces naturally (each ingest batch is one file
    covering its own time slice)."""
    events = load_table(spark, sf_small, "events")
    facts = events.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("e"),
        F.concat(F.lit("user:evt_"), (F.col("event_id") % 3).cast("string")).alias("a"),
        F.lit("str").alias("vtype"),
        F.col("event_type").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        (F.unix_millis("ts") * 1_000_000 + F.col("event_id")).alias("t"),
    )
    path = str(tmp_path_factory.mktemp("skipdump") / "facts")
    facts.repartitionByRange(4, "a", "t").write.partitionBy("a").parquet(path)
    build_skip_index(spark, path)
    return path


def test_sidecar_rows_cover_every_file(spark, dump):
    audit = verify_skip_index(spark, dump)
    assert audit["files"] >= 2  # the fixture layout must actually split
    assert audit["rows"] == spark.read.parquet(dump).count()


def test_asof_prune_matches_full_read(spark, dump):
    full = spark.read.parquet(dump)
    cutoff = full.agg(F.percentile_approx("t", 0.3)).collect()[0][0]
    expect = full.filter(F.col("t") <= cutoff)
    got = read_pruned(spark, dump, as_of_t=int(cutoff))
    assert got.count() == expect.count()
    assert (
        got.exceptAll(expect.select(*got.columns)).count() == 0
        and expect.select(*got.columns).exceptAll(got).count() == 0
    )


def test_asof_prune_skips_files(spark, dump):
    full = spark.read.parquet(dump)
    cutoff = full.agg(F.percentile_approx("t", 0.1)).collect()[0][0]
    _, report, _idx = plan_files(spark, dump, as_of_t=int(cutoff))
    assert report["kept"] < report["total"]


def test_attr_prune_matches_and_skips(spark, dump):
    expect = spark.read.parquet(dump).filter(F.col("a") == "user:evt_0")
    got = read_pruned(spark, dump, attrs=["user:evt_0"])
    assert got.count() == expect.count()
    _, report, _idx = plan_files(spark, dump, attrs=["user:evt_0"])
    assert 0 < report["kept"] < report["total"]


def test_entity_range_prune_is_sound(spark, dump):
    full = spark.read.parquet(dump)
    lo, hi = "user-1", "user-3"
    expect = full.filter(F.col("e").between(lo, hi))
    got = read_pruned(spark, dump, e_between=(lo, hi))
    assert got.count() == expect.count()


def test_combined_predicates(spark, dump):
    full = spark.read.parquet(dump)
    cutoff = full.agg(F.percentile_approx("t", 0.5)).collect()[0][0]
    expect = full.filter(
        (F.col("a") == "user:evt_1") & (F.col("t") <= cutoff)
    )
    got = read_pruned(spark, dump, attrs=["user:evt_1"], as_of_t=int(cutoff))
    assert got.count() == expect.count()


def test_empty_prune_returns_empty_with_schema(spark, dump):
    got = read_pruned(spark, dump, attrs=["user:nonexistent"])
    assert got.count() == 0
    assert set(got.columns) == set(spark.read.parquet(dump).columns)


def test_stale_index_raises(spark, dump, tmp_path):
    # copy the dump, rebuild index, then delete a data file: reads must
    # refuse rather than silently return partial data
    import shutil

    path = str(tmp_path / "stale")
    shutil.copytree(dump, path)
    build_skip_index(spark, path)
    data_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_skipindex" not in r
    ]
    os.remove(data_files[0])
    with pytest.raises(ValueError, match="stale"):
        read_pruned(spark, path, as_of_t=2**62)
    with pytest.raises(ValueError, match="stale"):
        verify_skip_index(spark, path)


def test_unindexed_append_refuses_silent_partial_read(spark, dump, tmp_path):
    """The OTHER staleness direction: data appended without a refresh
    must make reads refuse (pruning would silently drop the new
    files' rows), unless the caller explicitly asserts the writer
    protocol with assume_fresh=True."""
    import shutil

    from tripl_spark.sources.skipindex import refresh_skip_index

    path = str(tmp_path / "appended")
    shutil.copytree(dump, path)
    build_skip_index(spark, path)
    full = spark.read.parquet(path)
    full.limit(10).write.mode("append").partitionBy("a").parquet(path)
    with pytest.raises(ValueError, match="not in"):
        read_pruned(spark, path, as_of_t=2**62)
    # assume_fresh skips the check (manifest-trusting reader) ...
    assert read_pruned(spark, path, as_of_t=2**62, assume_fresh=True).count() >= 0
    # ... and a refresh heals it
    refresh_skip_index(spark, path)
    assert read_pruned(spark, path, as_of_t=2**62).count() == full.count() + 10


def test_refresh_appends_only_new_files(spark, dump, tmp_path):
    """Incremental maintenance: append a new time slice to a copy of
    the dump, refresh, and the sidecar (a) gains exactly the new
    files, (b) plans reads identical to a from-scratch rebuild."""
    import shutil

    from tripl_spark.sources.skipindex import refresh_skip_index

    path = str(tmp_path / "grown")
    shutil.copytree(dump, path)
    build_skip_index(spark, path)

    noop = refresh_skip_index(spark, path)
    assert noop["added"] == 0

    full = spark.read.parquet(path)
    tmax = full.agg(F.max("t")).collect()[0][0]
    batch = full.limit(50).withColumn("t", F.col("t") + F.lit(tmax))
    batch.write.mode("append").partitionBy("a").parquet(path)

    rep = refresh_skip_index(spark, path)
    assert rep["added"] > 0
    audit = verify_skip_index(spark, path)  # refreshed == fully consistent
    assert audit["rows"] == spark.read.parquet(path).count()

    # pruning below the appended slice ignores every new file
    _, rep_old, _idx = plan_files(spark, path, as_of_t=int(tmax))
    assert rep_old["kept"] == rep_old["total"] - rep["added"]
    got = read_pruned(spark, path, as_of_t=int(tmax)).count()
    want = spark.read.parquet(path).filter(F.col("t") <= tmax).count()
    assert got == want


def test_empty_part_files_are_indexed_and_pruned(spark, tmp_path):
    """REGRESSION (r8 verdict #1): a zero-row parquet part file never
    surfaces under input_file_name(), so the stats pass alone leaves
    it unindexed and every subsequent pruned read raised 'stale'
    permanently (1 row, repartition(2) was the Hypothesis falsifying
    example). The sidecar must carry an n_rows=0 sentinel for it —
    then freshness sees it as indexed and pruning drops it for free."""
    df = spark.createDataFrame(
        [("user-1", "ns:a_0", "str", "v1", None, None, 7)],
        "e string, a string, vtype string, v_str string, "
        "v_num double, v_bool boolean, t long",
    )
    path = str(tmp_path / "tinydump")
    df.repartition(2).write.parquet(path)  # 1 row -> one part is empty
    side = build_skip_index(spark, path)
    sentinels = side.filter(F.col("n_rows") == 0).collect()
    assert len(sentinels) >= 1
    assert sentinels[0]["min_t"] is None  # no range stats to fake
    verify_skip_index(spark, path)  # empty files count as indexed
    # pruned reads work, match the full filter, and skip the empty file
    assert read_pruned(spark, path, as_of_t=100).count() == 1
    assert read_pruned(spark, path, as_of_t=0).count() == 0
    files, rep, _ = plan_files(spark, path, as_of_t=100)
    assert rep["kept"] < rep["total"]  # the empty file was pruned


def test_refresh_indexes_empty_part_files(spark, tmp_path):
    """The refresh path has the same blind spot: an appended batch
    whose repartitioning leaves an empty part must still heal — the
    old behavior re-statted the file to zero rows forever."""
    from tripl_spark.sources.skipindex import refresh_skip_index

    schema = (
        "e string, a string, vtype string, v_str string, "
        "v_num double, v_bool boolean, t long"
    )
    base = spark.createDataFrame(
        [("user-1", "ns:a_0", "str", "v1", None, None, 1)], schema
    )
    path = str(tmp_path / "growdump")
    base.write.parquet(path)
    build_skip_index(spark, path)
    batch = spark.createDataFrame(
        [("user-2", "ns:a_1", "str", "v2", None, None, 50)], schema
    )
    batch.repartition(3).write.mode("append").parquet(path)  # empty parts
    rep = refresh_skip_index(spark, path)
    assert rep["added"] >= 2  # the data file plus >=1 empty part
    side = spark.read.parquet(os.path.join(path, "_skipindex"))
    assert side.filter(F.col("n_rows") == 0).count() >= 1
    verify_skip_index(spark, path)
    # refresh again: idempotent, nothing new to index
    assert refresh_skip_index(spark, path)["added"] == 0
    assert read_pruned(spark, path, as_of_t=10).count() == 1
    assert read_pruned(spark, path, as_of_t=100).count() == 2


def test_read_pruned_auto_heal_refresh(spark, dump, tmp_path):
    """read_pruned(refresh=True) self-serves append-shaped staleness:
    a raw append between ingests is healed transparently (incremental
    refresh before planning); a rewritten log still refuses."""
    import shutil

    path = str(tmp_path / "heal")
    shutil.copytree(dump, path)
    build_skip_index(spark, path)
    full = spark.read.parquet(path)
    n0 = full.count()
    full.limit(10).write.mode("append").partitionBy("a").parquet(path)
    # default read refuses; refresh=True heals and reads everything
    with pytest.raises(ValueError, match="stale"):
        read_pruned(spark, path, as_of_t=2**62)
    assert read_pruned(spark, path, as_of_t=2**62, refresh=True).count() == n0 + 10
    # and the heal is durable: the next default read is fresh
    assert read_pruned(spark, path, as_of_t=2**62).count() == n0 + 10
    # rewrite-shaped staleness still raises even with refresh=True
    data_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_skipindex" not in r
    ]
    os.remove(data_files[0])
    with pytest.raises(ValueError, match="rewritten"):
        read_pruned(spark, path, as_of_t=2**62, refresh=True)


def test_refresh_refuses_rewritten_log(spark, dump, tmp_path):
    import shutil

    from tripl_spark.sources.skipindex import refresh_skip_index

    path = str(tmp_path / "rewritten")
    shutil.copytree(dump, path)
    build_skip_index(spark, path)
    data_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_skipindex" not in r
    ]
    os.remove(data_files[0])
    with pytest.raises(ValueError, match="rewritten"):
        refresh_skip_index(spark, path)


def test_compaction_rewrite_then_rebuild_contract(spark, sf_small, tmp_path):
    """The maintain/compaction ↔ skip-index contract (r8 verdict #3):
    (a) reading a compacted (rewritten-in-place) dump through the OLD
    sidecar fails loudly — the rewrite case _check_fresh is designed
    for — and refresh=True cannot paper over it; (b) a rebuild after
    the rewrite restores pruned ≡ full + filter across the whole
    predicate set."""
    import shutil

    store, _facts = _melted_store(spark, sf_small)
    store.assert_schema(
        {"user:last_type": {"db:cardinality": "db.cardinality:one"}}
    )
    path = str(tmp_path / "log")
    store.dump_parquet(path, skip_index=True)

    # compaction rewrite: LWW-compact to a staging dir, then swap the
    # data dirs in place WITHOUT touching the sidecar
    staged = str(tmp_path / "staged")
    TripleStore.load_parquet(path, spark=spark).dump_parquet(staged)
    for d in os.listdir(path):
        if d.startswith("a="):
            shutil.rmtree(os.path.join(path, d))
    for d in os.listdir(staged):
        if d.startswith("a="):
            shutil.move(os.path.join(staged, d), os.path.join(path, d))

    with pytest.raises(ValueError, match="stale"):
        read_pruned(spark, path, as_of_t=2**62)
    with pytest.raises(ValueError, match="rewritten"):
        read_pruned(spark, path, as_of_t=2**62, refresh=True)

    build_skip_index(spark, path)
    verify_skip_index(spark, path)
    full = spark.read.parquet(path)
    cutoff = int(full.agg(F.percentile_approx("t", 0.5)).collect()[0][0])
    for kwargs in (
        dict(as_of_t=cutoff),
        dict(attrs=["user:last_type"]),
        dict(attrs=["user:last_type"], as_of_t=cutoff),
        dict(e_between=("user-1", "user-3")),
    ):
        got = read_pruned(spark, path, **kwargs)
        cond = F.lit(True)
        if "as_of_t" in kwargs:
            cond = cond & (F.col("t") <= kwargs["as_of_t"])
        if "attrs" in kwargs:
            cond = cond & F.col("a").isin(kwargs["attrs"])
        if "e_between" in kwargs:
            lo, hi = kwargs["e_between"]
            cond = cond & F.col("e").between(lo, hi)
        expect = full.filter(cond)
        assert got.count() == expect.count()
        assert got.exceptAll(expect.select(*got.columns)).count() == 0


def _melted_store(spark, sf_small, n=200):
    events = load_table(spark, sf_small, "events").limit(n)
    facts = events.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("e"),
        F.lit("user:last_type").alias("a"),
        F.lit("str").alias("vtype"),
        F.col("event_type").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        (F.unix_millis("ts") * 1_000_000 + F.col("event_id")).alias("t"),
    )
    return TripleStore.from_facts_df(facts, spark=spark), facts


def test_store_dump_load_with_index_and_asof(spark, sf_small, tmp_path):
    """dump_parquet(skip_index=True) -> load_parquet(as_of=) equals
    restoring the dump and filtering: the pruned load path is
    semantically invisible. Schema declarations survive an attr-
    restricted load (they travel at t=0 under the meta attrs)."""
    from tripl_spark.core.schema import CARD_ONE

    store, facts = _melted_store(spark, sf_small)
    # assert_schema (not a bare registry.declare) so the declaration
    # travels in the dump as t=0 meta facts and survives the load
    store.assert_schema({"user:last_type": {"db:cardinality": CARD_ONE}})
    path = str(tmp_path / "dump")
    store.dump_parquet(path, skip_index=True)
    cutoff = int(facts.agg(F.percentile_approx("t", 0.5)).collect()[0][0])

    full = TripleStore.load_parquet(path, spark=spark)
    pruned = TripleStore.load_parquet(path, spark=spark, as_of=cutoff)
    expect = full.facts_df().filter(F.col("t") <= cutoff)
    assert pruned.facts_df().count() == expect.count()

    restricted = TripleStore.load_parquet(
        path, spark=spark, attrs=["user:last_type"]
    )
    assert restricted.registry.cardinality("user:last_type") == CARD_ONE
    assert (
        restricted.facts_df().filter(F.col("a") == "user:last_type").count()
        == full.facts_df().filter(F.col("a") == "user:last_type").count()
    )


def test_zorder_tightens_entity_pruning(spark, sf_small, tmp_path):
    """Composition with the z-order layout: clustering the dump on e
    gives each file a tight entity range, so e_between pruning keeps
    strictly fewer files than the unclustered dump — the sidecar is
    layout-agnostic, the LAYOUT is what makes its ranges selective."""
    from tripl_spark.sources.bucketing import zorder_parquet

    store, facts = _melted_store(spark, sf_small, n=2000)
    raw = str(tmp_path / "raw")
    # shuffle entities across files: worst case for range pruning
    store.current_facts(cache=False).repartition(8).write.parquet(raw)
    build_skip_index(spark, raw)

    clustered = str(tmp_path / "clustered")
    zorder_parquet(spark, raw, clustered, ["e"], target_file_bytes=16 << 10)
    build_skip_index(spark, clustered)

    lo, hi = "user-1", "user-2"
    _, rep_raw, _i1 = plan_files(spark, raw, e_between=(lo, hi))
    _, rep_z, _i2 = plan_files(spark, clustered, e_between=(lo, hi))
    # raw layout: every file spans most of the entity range -> no skip
    assert rep_raw["kept"] == rep_raw["total"]
    assert rep_z["kept"] < rep_z["total"]
    # and the pruned reads agree with the ground truth on both layouts
    want = (
        spark.read.parquet(raw).filter(F.col("e").between(lo, hi)).count()
    )
    assert read_pruned(spark, raw, e_between=(lo, hi)).count() == want
    assert (
        read_pruned(spark, clustered, e_between=(lo, hi)).count() == want
    )


def test_store_roundtrip_through_pruned_read(spark, sf_small, tmp_path):
    """A store dumped with dump_parquet, read back through the pruned
    path at a cutoff, equals as_of() on the original store."""
    events = load_table(spark, sf_small, "events").limit(200)
    facts = events.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("e"),
        F.lit("user:last_type").alias("a"),
        F.lit("str").alias("vtype"),
        F.col("event_type").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        (F.unix_millis("ts") * 1_000_000 + F.col("event_id")).alias("t"),
    )
    store = TripleStore.from_facts_df(facts, spark=spark)
    path = str(tmp_path / "dump")
    store.dump_parquet(path)
    build_skip_index(spark, path)
    cutoff = facts.agg(F.percentile_approx("t", 0.5)).collect()[0][0]
    pruned = read_pruned(spark, path, as_of_t=int(cutoff)).filter(
        F.col("a") == "user:last_type"
    )
    # dump_parquet persists the COMPACTED view (current_facts), so the
    # ground truth is the dump itself re-filtered — the test's value is
    # the integration: a real store layout (percent-escaped attr dirs,
    # LWW-compacted log) survives the pruned-read path intact
    expect = spark.read.parquet(path).filter(
        (F.col("t") <= cutoff) & (F.col("a") == "user:last_type")
    )
    assert pruned.count() == expect.count()
    assert pruned.count() > 0


# -- property-based equivalence (hypothesis) ---------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HYP = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_facts_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # entity
        st.integers(min_value=0, max_value=2),    # attr
        st.integers(min_value=0, max_value=100),  # stamp
    ),
    min_size=1,
    max_size=30,
)


def _write_random_dump(spark, tmp, rows, nfiles, by_range, partition_attr):
    df = spark.createDataFrame(
        [
            (f"user-{e}", f"ns:a_{a}", "str", f"v{t}", None, None, t)
            for e, a, t in rows
        ],
        "e string, a string, vtype string, v_str string, "
        "v_num double, v_bool boolean, t long",
    )
    shaped = (
        df.repartitionByRange(nfiles, "t") if by_range else df.repartition(nfiles)
    )
    w = shaped.write.mode("overwrite")
    if partition_attr:
        w = w.partitionBy("a")
    w.parquet(tmp)
    build_skip_index(spark, tmp)
    return spark.read.parquet(tmp)


@given(
    rows=_facts_st,
    nfiles=st.integers(min_value=1, max_value=4),
    cutoff=st.integers(min_value=0, max_value=100),
    by_range=st.booleans(),
    partition_attr=st.booleans(),
)
@settings(**_HYP)
def test_pruned_read_equals_full_filter_on_arbitrary_logs(
    spark, rows, nfiles, cutoff, by_range, partition_attr
):
    """For ANY log content, file split, layout, and predicate, the
    sidecar-pruned read is row-identical to full-read + filter —
    including degenerate shapes (single file, one entity hot, every
    row at the same stamp, cutoff below/above the whole range)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="tripl_spark_skipprop_")
    try:
        full = _write_random_dump(
            spark, tmp, rows, nfiles, by_range, partition_attr
        )

        def rowset(df):
            return {(r.e, r.a, r.v_str, r.t) for r in df.collect()}

        want_t = rowset(full.filter(F.col("t") <= cutoff))
        assert rowset(read_pruned(spark, tmp, as_of_t=cutoff)) == want_t

        want_a = rowset(full.filter(F.col("a") == "ns:a_1"))
        assert rowset(read_pruned(spark, tmp, attrs=["ns:a_1"])) == want_a

        lo, hi = "user-1", "user-3"
        want_e = rowset(full.filter(F.col("e").between(lo, hi)))
        assert rowset(read_pruned(spark, tmp, e_between=(lo, hi))) == want_e

        want_all = rowset(
            full.filter(
                (F.col("t") <= cutoff)
                & (F.col("a") == "ns:a_0")
                & F.col("e").between(lo, hi)
            )
        )
        got_all = rowset(
            read_pruned(
                spark, tmp, attrs=["ns:a_0"], as_of_t=cutoff, e_between=(lo, hi)
            )
        )
        assert got_all == want_all
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(
    rows=_facts_st,
    extra=_facts_st,
    cutoff=st.integers(min_value=0, max_value=100),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_refresh_equals_rebuild_on_arbitrary_appends(spark, rows, extra, cutoff):
    """Append-then-refresh prunes identically to a from-scratch
    rebuild, for any base/append contents."""
    import shutil
    import tempfile

    from tripl_spark.sources.skipindex import refresh_skip_index

    tmp = tempfile.mkdtemp(prefix="tripl_spark_skipprop_")
    try:
        _write_random_dump(spark, tmp, rows, 2, True, True)
        batch = spark.createDataFrame(
            [
                (f"user-{e}", f"ns:a_{a}", "str", f"v{t}", None, None, t)
                for e, a, t in extra
            ],
            "e string, a string, vtype string, v_str string, "
            "v_num double, v_bool boolean, t long",
        )
        batch.write.mode("append").partitionBy("a").parquet(tmp)
        refresh_skip_index(spark, tmp)
        got = read_pruned(spark, tmp, as_of_t=cutoff).count()
        build_skip_index(spark, tmp)  # from-scratch rebuild
        want = read_pruned(spark, tmp, as_of_t=cutoff).count()
        assert got == want
        full = spark.read.parquet(tmp).filter(F.col("t") <= cutoff).count()
        assert got == full
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_file_uri_dump_builds_verifies_and_prunes(spark, sf_small, tmp_path):
    """The Hadoop-FS listing path under an explicit file:// URI: build,
    verify, refresh-after-append, and a pruned read must all work with
    the scheme-qualified spelling (the object-store shape, exercised on
    the local FS), and the pruned read must equal the full-read filter."""
    from tripl_spark.sources.skipindex import refresh_skip_index

    facts = load_table(spark, sf_small, "nation").select(
        F.concat(F.lit("nation-"), F.col("n_nationkey").cast("string")).alias("e"),
        F.lit("nation:name").alias("a"),
        F.lit("str").alias("vtype"),
        F.col("n_name").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        F.col("n_nationkey").cast("long").alias("t"),
    )
    uri = "file://" + str(tmp_path / "facts")
    facts.repartitionByRange(3, "t").write.partitionBy("a").parquet(uri)
    build_skip_index(spark, uri)
    audit = verify_skip_index(spark, uri)
    assert audit["files"] >= 2 and audit["rows"] == facts.count()

    # refresh sees the sidecar through the URI (no spurious full build)
    r0 = refresh_skip_index(spark, uri)
    assert r0 == {"added": 0, "total": audit["files"]}
    # append → heal-mode refresh indexes exactly the new files
    facts.limit(2).withColumn("t", F.col("t") + 1000).coalesce(1) \
        .write.mode("append").partitionBy("a").parquet(uri)
    r1 = refresh_skip_index(spark, uri)
    assert r1["added"] >= 1 and r1["total"] == audit["files"] + r1["added"]

    got = read_pruned(spark, uri, as_of_t=10).select("e", "v_str", "t")
    want = spark.read.parquet(uri).filter(F.col("t") <= 10).select("e", "v_str", "t")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    files, report, _ = plan_files(spark, uri, as_of_t=10)
    assert 0 < report["kept"] < report["total"]  # pruning actually skipped


def test_unresolvable_scheme_refuses_loudly(spark, dump):
    from tripl_spark.sources.skipindex import _list_data_files

    with pytest.raises(NotImplementedError, match="no\nHadoop FileSystem|no Hadoop|scheme"):
        _list_data_files(spark, "nosuchfs://bucket/path")


def test_local_path_canonicalization_is_scheme_aware():
    """Pure-function contract of the identity canonicalizer: local
    spellings realpath-collapse, remote URIs keep scheme + authority
    (dropping the bucket would alias files across buckets), and the
    single-unquote rule lands on the literal on-disk name for
    percent-escaped partition values."""
    from tripl_spark.sources.skipindex import _local_path

    # local: file:// URI and plain path converge
    assert _local_path("file:///tmp/x/part-0.parquet") == _local_path(
        "/tmp/x/part-0.parquet"
    )
    # one unquote: the escaped ':' in a partition dir decodes once
    assert _local_path("file:///d/a=ns%3Aattr/p.parquet").endswith(
        "/d/a=ns:attr/p.parquet"
    )
    # remote: scheme + bucket survive; same key in another bucket differs
    a = _local_path("s3a://bucket-a/log/a=x/p.parquet")
    b = _local_path("s3a://bucket-b/log/a=x/p.parquet")
    assert a == "s3a://bucket-a/log/a=x/p.parquet" and a != b
    assert _local_path("hdfs://nn:8020/warehouse/p.parquet").startswith("hdfs://nn:8020/")


def test_zero_row_sentinel_inside_escaped_partition_dir(spark, tmp_path):
    """REGRESSION (r11 review): sentinel rows are written from the
    already-canonical listing path, while stats rows store raw
    input_file_name() URIs — readers decode every sidecar value ONCE,
    so sentinels must be re-encoded at write (`_sidecar_form`) or a
    literal '%' in an escaped partition dir (any ':'-carrying
    attribute) double-decodes and the dump reads permanently stale."""
    from tripl_spark.sources.skipindex import refresh_skip_index

    schema = (
        "e string, vtype string, v_str string, "
        "v_num double, v_bool boolean, t long, a string"
    )
    df = spark.createDataFrame(
        [("user-1", "str", "v1", None, None, 7, "ns:attr")], schema
    )
    path = str(tmp_path / "escdump")
    df.write.partitionBy("a").parquet(path)  # dir is a=ns%3Aattr
    # plant a ZERO-ROW part file inside the escaped partition dir
    df.drop("a").limit(0).coalesce(1).write.mode("append").parquet(
        os.path.join(path, "a=ns%3Aattr")
    )
    build_skip_index(spark, path)
    verify_skip_index(spark, path)  # double-decode made this raise
    assert refresh_skip_index(spark, path)["added"] == 0  # idempotent
    assert read_pruned(spark, path, attrs=["ns:attr"]).count() == 1
    side = spark.read.parquet(os.path.join(path, "_skipindex"))
    assert side.filter(F.col("n_rows") == 0).count() >= 1


def test_nonfile_scheme_dump_full_lifecycle(spark, tmp_path):
    """Object-store fidelity, exercised on a REAL non-`file` Hadoop
    scheme available in-sandbox: a `viewfs://` mount table (bundled in
    hadoop-common) backed by the local FS. Unlike the file:// test,
    every identity here carries a scheme AND an authority (the mount
    table name — the bucket analog), and the encoding stack is the
    object-store one: input_file_name() double-encodes an escaped
    partition dir (`a=ns%253Aattr`) while the Hadoop listing decodes
    once to the on-disk literal (`a=ns%3Aattr`) — so build, freshness,
    refresh-after-append, zero-row sentinels, and pruned reads all pin
    the single-unquote identity rule under authority-qualified URIs."""
    from tripl_spark.sources.skipindex import (
        _list_data_files,
        _local_path,
        _sidecar_exists,
        refresh_skip_index,
    )

    hconf = spark._jsc.hadoopConfiguration()
    key = "fs.viewfs.mounttable.sitest.link./data"
    hconf.set(key, "file://" + str(tmp_path))
    uri = "viewfs://sitest/data/facts"
    try:
        df = spark.createDataFrame(
            [
                ("e-1", "ns:attr", "str", "v1", None, None, 5),
                ("e-2", "ns:attr", "str", "v2", None, None, 15),
                ("e-3", "plain", "str", "v3", None, None, 25),
            ],
            "e string, a string, vtype string, v_str string, "
            "v_num double, v_bool boolean, t long",
        )
        df.repartitionByRange(3, "t").write.partitionBy("a").parquet(uri)

        # identity fidelity: the stats-row form (input_file_name, decoded
        # once) and the listing form must agree byte-for-byte, scheme and
        # authority included, on the escaped partition dir
        listed = set(_list_data_files(spark, uri))
        stats_ids = {
            _local_path(r.f)
            for r in spark.read.parquet(uri)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        assert stats_ids == listed
        assert all(f.startswith("viewfs://sitest/") for f in listed)
        assert any("a=ns%3Aattr/" in f for f in listed)  # literal, not %253A

        assert not _sidecar_exists(spark, uri)
        build_skip_index(spark, uri)
        assert _sidecar_exists(spark, uri)
        audit = verify_skip_index(spark, uri)
        assert audit["files"] >= 2 and audit["rows"] == df.count()
        assert refresh_skip_index(spark, uri) == {"added": 0, "total": audit["files"]}

        # zero-row part inside the ESCAPED dir: the sentinel is written
        # from the canonical listing path through _sidecar_form's remote
        # branch (scheme + netloc preserved, path re-encoded once)
        df.filter("a = 'ns:attr'").drop("a").limit(0).coalesce(1).write.mode(
            "append"
        ).parquet(uri + "/a=ns%3Aattr")
        # plus a real append elsewhere
        df.filter("a = 'plain'").withColumn("t", F.col("t") + 100).coalesce(
            1
        ).write.mode("append").partitionBy("a").parquet(uri)
        r1 = refresh_skip_index(spark, uri)
        assert r1["added"] >= 2
        verify_skip_index(spark, uri)  # identity drift would raise here
        assert refresh_skip_index(spark, uri)["added"] == 0  # idempotent

        got = read_pruned(spark, uri, as_of_t=20, attrs=["ns:attr"]).select(
            "e", "v_str", "t"
        )
        want = (
            spark.read.parquet(uri)
            .filter((F.col("t") <= 20) & (F.col("a") == "ns:attr"))
            .select("e", "v_str", "t")
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        files, report, _ = plan_files(spark, uri, as_of_t=20, attrs=["ns:attr"])
        assert 0 < report["kept"] < report["total"]
        assert all(f.startswith("viewfs://sitest/") for f in files)
    finally:
        hconf.unset(key)
