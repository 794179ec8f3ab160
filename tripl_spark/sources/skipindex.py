"""File-list skip index: manifest-level pruning for the fact log.

The 100 TB story: parquet already prunes ROW GROUPS via footer min/max
stats, but at scale the expensive step happens *before* any footer is
read — listing hundreds of thousands of files on an object store and
opening each footer. Table formats (Delta/Iceberg) solve this with
manifest files that carry per-data-file column stats so the planner
selects the file list from a tiny sidecar instead of touching the
data. This module is that pattern over the plain attribute-partitioned
fact-log layout (`TripleStore.dump_parquet`, reference persistence
surface tripl.py:536-558): one stats row per data file, written as a
parquet sidecar under ``<dump>/_skipindex``.

Why it pays for THIS workload specifically:

* the fact log is append-only and stamped with a monotone ``t``, so a
  time-travel read (``as_of(t)``) — the reference's signature query
  shape — only needs files whose ``[min_t, max_t]`` range intersects
  ``(-inf, t]``; on a long-lived store that is a small prefix of the
  log.
* match clauses bind the attribute, which the layout already turns
  into directory pruning (``a=<attr>/``); the skip index composes with
  it (its rows carry the partition value, so attr pruning happens on
  the sidecar too, before any listing).
* entity-range pruning (``min_e/max_e``) helps point lookups when
  writers cluster entities (e.g. uuid5 ids from the same id_attr
  namespace sort together) — it is best-effort and never unsound,
  because pruning only ever *drops* files proven disjoint from the
  predicate.

Scale discipline:

* the sidecar is ~1 row per data file — at 100 TB with 256 MB files
  that is ~400k rows, comfortably a driver-side collect (a few tens of
  MB) and far cheaper than an object-store LIST + footer reads. The
  stats build itself is one distributed pass over the dump
  (``input_file_name()`` group-by: map-side combinable, one shuffle of
  file-count rows).
* staleness is detected, not assumed: the sidecar records the file
  count and total rows; ``read_pruned`` compares the pruned plan's
  input against the predicate semantics only (pruning is computed from
  the sidecar alone), so a dump rewritten without rebuilding the index
  raises rather than silently mis-reading (`_check_fresh`).
* reads preserve the partition column by passing ``basePath`` so the
  directory-encoded ``a`` survives explicit-file-list reads.
* freshness checks LIST the dump driver-side through the JVM Hadoop
  ``FileSystem`` (`_list_data_files`) — the listing works on any
  scheme the cluster's Hadoop configuration can resolve (file://,
  hdfs://, s3a://, …) and raises loudly on a scheme with no handler
  rather than reading an empty listing as "no files". Object-store
  deployments that want to skip even that single LIST read with
  ``assume_fresh=True`` under a writer protocol that refreshes the
  sidecar in the same commit as the data — the table-format trust
  model.
* zero-row part files (repartition > rows, filtered-empty partitions,
  speculative tasks) are first-class: they get ``n_rows=0`` sentinel
  rows at build/refresh time, count as indexed for freshness, and are
  always pruned.
"""

from __future__ import annotations

import os
from urllib.parse import quote, unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIDECAR = "_skipindex"

_STATS_COLS = [
    "file",
    "a",
    "n_rows",
    "min_t",
    "max_t",
    "min_e",
    "max_e",
]


def build_skip_index(spark: SparkSession, path: str) -> DataFrame:
    """One distributed pass over an attribute-partitioned fact dump:
    per-file (n_rows, min/max t, min/max e) grouped by
    ``input_file_name()``. Returns the stats frame after writing it to
    ``<path>/_skipindex`` (coalesced — the sidecar is file-count rows,
    always tiny relative to the data).

    Zero-row part files (a normal artifact: repartition > rows, empty
    partitions after a filter, speculative tasks) never appear under
    ``input_file_name()`` — they are recorded explicitly with an
    ``n_rows=0`` sentinel row so freshness checks see them as indexed
    and pruning drops them unconditionally (an empty file is always
    prunable)."""
    stats = _stats_frame(spark.read.parquet(path))
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, SIDECAR)
    )
    _append_empty_sentinels(spark, path, _list_data_files(spark, path))
    return spark.read.parquet(os.path.join(path, SIDECAR))


def _stats_frame(df: DataFrame) -> DataFrame:
    """The per-file stats aggregation — ONE definition, shared by the
    full build and the incremental refresh so appended sidecar rows
    can never drift from built ones."""
    return (
        df.groupBy(F.input_file_name().alias("file"), "a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("t").alias("min_t"),
            F.max("t").alias("max_t"),
            F.min("e").alias("min_e"),
            F.max("e").alias("max_e"),
        )
        .select(*_STATS_COLS)
    )


def _load_sidecar(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, SIDECAR))


def _local_path(uri: str) -> str:
    """Canonical form for file-identity comparisons. input_file_name()
    returns URI-encoded paths (the partition dir itself
    percent-escapes ':' etc., then the URI escapes the '%'); ONE
    unquote of the URI path yields the literal name. Local paths
    (no scheme / file://) canonicalize via realpath (symlinks,
    relative spellings) so sidecar paths compare equal to filesystem
    listings however the caller spelled the dump path; remote schemes
    keep scheme + authority (an s3a:// key has no realpath, and
    dropping the bucket would alias files across buckets)."""
    p = urlparse(uri)
    if p.scheme in ("", "file"):
        return os.path.realpath(unquote(p.path) if p.scheme else unquote(uri))
    return f"{p.scheme}://{p.netloc}{unquote(p.path)}"


def plan_files(
    spark: SparkSession,
    path: str,
    attrs: list[str] | None = None,
    as_of_t: int | None = None,
    e_between: tuple[str, str] | None = None,
) -> tuple[list[str], dict[str, int], set[str]]:
    """Select the data-file list from the sidecar alone — collected
    ONCE (the sidecar is file-count-sized by construction) with the
    range-intersection pruning evaluated driver-side, so a read costs
    a single sidecar job. Returns (files, report, indexed) where
    report carries {total, kept} file counts — the observability hook
    the pruning tests assert on — and indexed is the full canonical
    file set (for freshness checks, avoiding a second collect).
    Pruning drops only files PROVEN disjoint from the predicate, so a
    file with any matching row always survives; rows inside kept
    files that fail the predicate are filtered by the normal
    pushed-down scan filter afterwards."""
    rows = _load_sidecar(spark, path).collect()
    attr_set = set(attrs) if attrs is not None else None
    kept: set[str] = set()
    indexed: set[str] = set()
    for r in rows:
        # the sidecar keys on (file, a) — one file holds MANY attrs
        # when the layout isn't attribute-partitioned — so file-level
        # counts and the returned list are DISTINCT files, or a
        # multi-attr file would be read (and its rows counted) twice
        f = _local_path(r["file"])
        indexed.add(f)
        if f in kept:
            continue
        # n_rows=0 sentinel (empty part file): always prunable — no
        # predicate can match a row that doesn't exist
        if r["n_rows"] == 0:
            continue
        if attr_set is not None and r["a"] not in attr_set:
            continue
        # as_of keeps facts with t <= cutoff: a file whose min_t
        # already exceeds the cutoff has no qualifying row. A None
        # stat (every t in the file is NULL) cannot prove
        # disjointness — keep the file, the scan filter handles it.
        if (
            as_of_t is not None
            and r["min_t"] is not None
            and not r["min_t"] <= int(as_of_t)
        ):
            continue
        if (
            e_between is not None
            and r["min_e"] is not None
            and r["max_e"] is not None
            and not (r["max_e"] >= e_between[0] and r["min_e"] <= e_between[1])
        ):
            continue
        kept.add(f)
    files = sorted(kept)
    return files, {"total": len(indexed), "kept": len(files)}, indexed


def _check_fresh(spark: SparkSession, path: str, indexed: set[str]) -> None:
    """TWO-sided staleness check against the ALREADY-collected sidecar
    file set (no extra Spark job): an indexed file that vanished means
    the dump was rewritten (stale ranges), and a data file the sidecar
    doesn't know means an append never refreshed the index — pruning
    on it would SILENTLY drop that file's rows, the worse failure.
    Both refuse loudly. Cost: one driver-side listing of the dump —
    the object-store LIST the manifest normally replaces; callers that
    enforce the writer protocol (every commit refreshes the sidecar,
    the `StreamingLogIngest` contract / the table-format posture) can
    skip it with ``assume_fresh=True``. Both sides compare in
    realpath-canonical form, so relative or symlinked dump paths
    never read as drift."""
    live = set(_list_data_files(spark, path))
    missing = sorted(indexed - live)
    if missing:
        raise ValueError(
            f"skip index is stale: {len(missing)} indexed files missing "
            f"(first: {missing[0]}); rebuild with build_skip_index()"
        )
    unindexed = sorted(live - indexed)
    if unindexed:
        raise ValueError(
            f"skip index is stale: {len(unindexed)} data files not in "
            f"the sidecar (first: {unindexed[0]}); pruning would "
            "silently drop their rows — refresh_skip_index() first"
        )


def read_pruned(
    spark: SparkSession,
    path: str,
    attrs: list[str] | None = None,
    as_of_t: int | None = None,
    e_between: tuple[str, str] | None = None,
    assume_fresh: bool = False,
    refresh: bool = False,
) -> DataFrame:
    """Read the dump through the skip index: file list from the
    sidecar, then an explicit-file parquet read with ``basePath`` so
    the directory-encoded partition column survives. The SAME
    predicates are re-applied as scan filters (pruning is a superset
    guarantee, not an exact one), so the result is row-identical to a
    full read + filter — `tests/test_skipindex.py` pins that
    equivalence and that the kept-file count actually shrinks.

    By default the read verifies sidecar↔disk agreement both ways
    (`_check_fresh`); ``assume_fresh=True`` skips that LIST for
    readers under a writer protocol that updates the sidecar in the
    same commit as the data (the table-format trust model).

    ``refresh=True`` auto-heals append-shaped staleness before
    planning: raw files appended since the last sidecar commit are
    statted incrementally (`refresh_skip_index` — O(new files)), and
    a missing sidecar triggers a first build. Rewrite-shaped
    staleness (an indexed file VANISHED) still raises — cached ranges
    for a rewritten log are unsalvageable and demand a rebuild."""
    if refresh:
        refresh_skip_index(spark, path)
    files, _, indexed = plan_files(
        spark, path, attrs=attrs, as_of_t=as_of_t, e_between=e_between
    )
    if not assume_fresh:
        _check_fresh(spark, path, indexed)
    if not files:
        base = spark.read.parquet(path)
        df = base.limit(0)
    else:
        df = spark.read.option("basePath", path).parquet(*files)
    if attrs is not None:
        df = df.filter(F.col("a").isin(list(attrs)))
    if as_of_t is not None:
        df = df.filter(F.col("t") <= F.lit(int(as_of_t)))
    if e_between is not None:
        lo, hi = e_between
        df = df.filter(F.col("e").between(F.lit(lo), F.lit(hi)))
    return df


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Driver-side listing of the dump's data files (the sidecar dir
    and other _-prefixed/hidden entries excluded, matching Spark's own
    file-index rules) through the JVM Hadoop ``FileSystem`` — ONE
    recursive LIST against whatever filesystem the scheme resolves to
    (local, file://, hdfs://, s3a://, …), exactly the call Spark's own
    InMemoryFileIndex makes, so the freshness view can never disagree
    with the engine's. A scheme the Hadoop configuration has no
    handler for refuses loudly (readers under a writer protocol use
    ``assume_fresh=True`` there) — an empty listing silently read as
    "no files" would pass every freshness check while pruning dropped
    the whole dump."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    if urlparse(path).scheme == "":
        path = os.path.abspath(path)
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    try:
        fs = hpath.getFileSystem(hconf)
    except Exception as e:  # org.apache.hadoop.fs.UnsupportedFileSystemException et al.
        raise NotImplementedError(
            f"skip-index freshness checks cannot list {path!r}: no "
            f"Hadoop FileSystem for its scheme ({e}) — pass "
            "assume_fresh=True under a writer protocol or configure "
            "the filesystem"
        ) from e
    base = fs.makeQualified(hpath).toUri().getPath().rstrip("/")
    out = []
    it = fs.listFiles(hpath, True)  # recursive, files only
    while it.hasNext():
        st = it.next()
        uri = st.getPath().toUri()
        # java.net.URI.getPath() DECODES percent-escapes, which yields
        # exactly the literal on-disk name (partition dirs like
        # `a=ns%3Aattr` are stored escaped; the URI layer re-escapes
        # the '%', and one decode lands back on the literal) — the
        # same form `_local_path` produces from input_file_name(). Do
        # NOT round-trip through _local_path here: its unquote would
        # decode the name a second time.
        lit = uri.getPath()
        rel = lit[len(base):].lstrip("/")
        segs = rel.split("/")
        # _-prefixed / hidden path segments (the sidecar, _SUCCESS,
        # .crc files) are metadata, not data — Spark's own rule
        if any(s.startswith(("_", ".")) for s in segs):
            continue
        if not segs[-1].endswith(".parquet"):
            continue
        scheme = uri.getScheme()
        if scheme is None or scheme == "file":
            out.append(os.path.realpath(lit))
        else:
            out.append(f"{scheme}://{uri.getAuthority() or ''}{lit}")
    return out


def _sidecar_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe for ``<path>/_skipindex`` — the
    scheme-agnostic form of ``os.path.isdir`` (which reads any URI as
    absent and would force a full rebuild on every refresh). Same
    loud-refusal contract as ``_list_data_files`` for schemes with no
    handler."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(os.path.join(path, SIDECAR))
    try:
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    except Exception as e:
        raise NotImplementedError(
            f"skip-index maintenance cannot probe {path!r}: no Hadoop "
            f"FileSystem for its scheme ({e}) — pass assume_fresh=True "
            "under a writer protocol or configure the filesystem"
        ) from e
    return bool(fs.exists(hpath))


def _sidecar_form(canonical: str) -> str:
    """Inverse of ``_local_path`` for WRITING file identities into the
    sidecar. Stats rows store raw ``input_file_name()`` URIs, which are
    URI-encoded ONCE — so readers decode every sidecar value once.
    Sentinel rows start from the canonical (literal, decoded) listing
    path instead; storing that verbatim would make the reader's single
    unquote decode it a SECOND time (a partition dir like
    ``a=ns%3Aattr`` — any ':'-carrying attribute — would corrupt to
    ``a=ns:attr`` and read as permanently stale). Re-encode so one
    decode lands exactly back on the canonical form."""
    p = urlparse(canonical)
    if p.scheme == "":  # local canonical path
        return "file://" + quote(canonical, safe="/")
    return f"{p.scheme}://{p.netloc}{quote(p.path, safe='/')}"


def _append_empty_sentinels(
    spark: SparkSession, path: str, candidates: list[str]
) -> None:
    """Record zero-row part files the stats aggregation can never see
    (``input_file_name()`` only iterates data ROWS): any candidate
    file absent from the sidecar gets an ``n_rows=0`` row with NULL
    range stats. Cost: one sidecar read (file-count rows) + a tiny
    append — no data-file access at all."""
    side = _load_sidecar(spark, path)
    known = {
        _local_path(r["file"]) for r in side.select("file").distinct().collect()
    }
    missing = sorted(f for f in candidates if f not in known)
    if not missing:
        return
    sent = spark.createDataFrame(
        [(_sidecar_form(f),) for f in missing], "file string"
    ).select(
        "file",
        *[
            (
                F.lit(0).cast("long")
                if c == "n_rows"
                else F.lit(None).cast(side.schema[c].dataType)
            ).alias(c)
            for c in _STATS_COLS
            if c != "file"
        ],
    )
    sent.coalesce(1).write.mode("append").parquet(os.path.join(path, SIDECAR))


def _append_stats(spark: SparkSession, path: str, files: list[str]) -> None:
    _stats_frame(
        spark.read.option("basePath", path).parquet(*files)
    ).coalesce(1).write.mode("append").parquet(os.path.join(path, SIDECAR))
    # zero-row files in this batch produce no stats rows — sentinel them
    _append_empty_sentinels(spark, path, files)


def refresh_skip_index(
    spark: SparkSession,
    path: str,
    new_dirs: list[str] | None = None,
) -> dict[str, int]:
    """Incremental sidecar maintenance for an append-only log: stat
    ONLY the files the sidecar doesn't know yet and append their rows.
    At 100 TB a per-ingest full rebuild is a full table scan — this is
    one pass over the new batch, the same cost class as writing it
    (the manifest-commit pattern of the table formats).

    Two modes. With ``new_dirs`` (a writer that KNOWS what it just
    committed — the `StreamingLogIngest` per-batch path), only those
    directories are listed and statted: per-commit cost is O(batch),
    independent of log size, with no full LIST and no sidecar read —
    the caller guarantees the dirs are new. Without it (the heal /
    catch-up path), the diff is computed against a full listing: a
    file that VANISHED from disk while indexed means the log was
    rewritten, not appended — that invalidates every cached range, so
    refuse and demand a rebuild rather than patching around it. A log
    with no sidecar yet gets a full build (the first-ingest case).
    Returns {added, total} file counts (total = -1 in targeted mode,
    which never lists the log)."""
    if not _sidecar_exists(spark, path):
        n = _list_data_files(spark, path)
        build_skip_index(spark, path)
        return {"added": len(n), "total": len(n)}
    if new_dirs is not None:
        new = [f for d in new_dirs for f in _list_data_files(spark, d)]
        if new:
            _append_stats(spark, path, new)
        return {"added": len(new), "total": -1}
    side = _load_sidecar(spark, path)
    indexed = {
        _local_path(r["file"])
        for r in side.select("file").distinct().collect()
    }
    live = set(_list_data_files(spark, path))
    missing = sorted(indexed - live)
    if missing:
        raise ValueError(
            f"skip index is stale: {len(missing)} indexed files missing "
            f"(first: {missing[0]}) — the log was rewritten, not "
            "appended; rebuild with build_skip_index()"
        )
    new = sorted(live - indexed)
    if new:
        _append_stats(spark, path, new)
    return {"added": len(new), "total": len(live)}


def verify_skip_index(spark: SparkSession, path: str) -> dict[str, int]:
    """Freshness audit: compare the sidecar's file set and row total
    against the live dump. Returns counts; raises on drift."""
    side = _load_sidecar(spark, path)
    indexed = {_local_path(r["file"]) for r in side.select("file").collect()}
    # disk listing, not input_file_name(): zero-row part files never
    # surface under input_file_name but ARE live files the sidecar
    # must cover (as n_rows=0 sentinels)
    live_files = set(_list_data_files(spark, path))
    if indexed != live_files:
        raise ValueError(
            f"skip index is stale: {len(indexed - live_files)} indexed-"
            f"but-missing, {len(live_files - indexed)} unindexed files; "
            "rebuild with build_skip_index()"
        )
    n_side = side.agg(F.sum("n_rows").cast("long").alias("n")).collect()[0]["n"]
    n_live = spark.read.parquet(path).count()
    if n_side != n_live:
        raise ValueError(
            f"skip index is stale: sidecar rows {n_side} != live {n_live}"
        )
    return {"files": len(indexed), "rows": int(n_live)}
