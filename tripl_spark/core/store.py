"""TripleStore — the EAV store surface of the reference
(/root/reference/tripl/tripl.py:300-740) over a Spark facts DataFrame.

Physical model (SURVEY.md §1.1): one canonical ``facts`` frame

    facts(e string, a string, vtype string,
          v_str string, v_num double, v_bool boolean, t long)

``v_str`` holds strings AND refs (eids are strings); ``vtype``
distinguishes. ``t`` is a per-triple monotonic stamp so cardinality-one
is last-write-wins at read time (the reference's in-place displacement
is broken as shipped — SURVEY.md Q2; we implement the intent).

The reference's three hash-trie orderings (EAV/AEV/VAE) become plan
shapes, not structures: every match clause filters on ``a`` first (AEV),
pull's reverse joins hit ``v_str`` (VAE), and at rest the frame should
be written partitioned by ``a`` (see ``dump_parquet``) so Catalyst
prunes to the attributes a query touches.

Writes append micro-batches: documents are flattened driver-side (they
arrive driver-side by definition of this API — for bulk data use
``assert_facts_df``) and buffered; the buffer materializes into the
DataFrame lazily on first read. Set semantics (duplicate assertion is
idempotent) and card-one collapse are applied by the ``current_facts``
compaction view, not at write time — at 100 TB you want append-only
writes and a merge-on-read view, exactly like Delta/Hudi MOR tables.
"""

from __future__ import annotations

import json
import warnings
from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tripl_spark.core.flatten import (
    FACT_COLUMNS,
    Flattener,
    collect_id_pairs,
    decode_value,
    typed_value,
)
from tripl_spark.core.schema import CARD_MANY, CARD_ONE, SchemaRegistry, base_schema
from tripl_spark.functions.namespaces import some
from tripl_spark.plans import match as match_plan
from tripl_spark.plans import pull as pull_plan
from tripl_spark.session import eager_checkpoint, local_df

FACTS_SCHEMA = T.StructType(
    [
        T.StructField("e", T.StringType(), False),
        T.StructField("a", T.StringType(), False),
        T.StructField("vtype", T.StringType(), False),
        T.StructField("v_str", T.StringType(), True),
        T.StructField("v_num", T.DoubleType(), True),
        T.StructField("v_bool", T.BooleanType(), True),
        T.StructField("t", T.LongType(), False),
    ]
)

_SETTINGS_ATTRS = {"db.refs:lazy", "db.cardinality:default"}
_SCHEMA_META_ATTRS = {"db:cardinality", "db:valueType"}


class TripleStore:
    """Reference-compatible constructor signature (tripl.py:304-309) plus
    an optional ``spark`` session."""

    def __init__(
        self,
        schema: dict[str, dict[str, Any]] | None = None,
        facts: Any = None,
        lazy_refs: bool | None = None,
        default_cardinality: str | None = None,
        types: Any = None,
        ident_attr: str = "db:ident",
        id_attrs: list[str] | None = None,
        spark: SparkSession | None = None,
    ) -> None:
        if spark is None:
            from tripl_spark.session import get_spark

            spark = get_spark()
        self.spark = spark
        self.registry = SchemaRegistry(ident_attr=ident_attr)
        self.types = types
        self._pending: list[tuple] = []
        self._df: DataFrame | None = None
        self._t = 0
        self._t_scan: DataFrame | None = None  # deferred max(t) source
        self._id_cache: dict[tuple[str, Any], str] = {}
        self._compacted: DataFrame | None = None
        self._attr_stats: dict[str, int] | None = None

        self.assert_facts(base_schema(ident_attr))
        if facts is not None:
            self.assert_facts(facts, id_attrs=id_attrs)
        if schema:
            self.assert_schema(schema)
        # kwargs override settings recovered from loaded facts (tripl.py:330-346)
        if lazy_refs is not None:
            self.registry.lazy_refs = bool(lazy_refs)
        if default_cardinality is not None:
            self.registry.default_cardinality = default_cardinality
        self.assert_fact(
            {
                ident_attr: "db:schema",
                "db.refs:lazy": self.registry.lazy_refs,
                "db.cardinality:default": self.registry.default_cardinality,
            }
        )

    # -- settings proxies ----------------------------------------------------

    @property
    def ident_attr(self) -> str:
        return self.registry.ident_attr

    @property
    def lazy_refs(self) -> bool:
        return self.registry.lazy_refs

    @property
    def default_cardinality(self) -> str:
        return self.registry.default_cardinality

    # -- write path ------------------------------------------------------------

    def _ingest_rows(self, rows: list[tuple]) -> None:
        """Append flattened rows, intercepting schema/settings triples to
        keep the driver-side registry consistent (the reference reads
        schema straight from its indexes; our registry is that cache)."""
        for e, a, vtype, v_str, v_num, v_bool, _t in rows:
            if a in _SCHEMA_META_ATTRS:
                self.registry.declare(e, {a: decode_value(vtype, v_str, v_num, v_bool)})
            elif e == "db:schema" and a in _SETTINGS_ATTRS:
                val = decode_value(vtype, v_str, v_num, v_bool)
                if a == "db.refs:lazy":
                    self.registry.lazy_refs = bool(val)
                else:
                    self.registry.default_cardinality = str(val)
        self._pending.extend(rows)
        self._invalidate()

    def _invalidate(self) -> None:
        self._attr_stats = None
        if self._compacted is not None:
            try:
                self._compacted.unpersist()
            except Exception:
                pass
            self._compacted = None

    def _resolve_existing_ids(self, pairs: set[tuple[str, Any]]) -> dict[tuple[str, Any], str]:
        """Look up (id_attr, value) pairs against already-stored facts.
        Pending rows are scanned driver-side; materialized facts via one
        broadcast-semi join (the reference's per-doc match scan, batched:
        its author flags that inefficiency at tripl.py:460)."""
        out: dict[tuple[str, Any], str] = {}
        todo = {p for p in pairs if p not in self._id_cache}
        for p in pairs - todo:
            out[p] = self._id_cache[p]
        if not todo:
            return out
        attrs = {a for a, _ in todo}
        for e, a, vtype, v_str, v_num, v_bool, _t in self._pending:
            if a in attrs:
                val = decode_value(vtype, v_str, v_num, v_bool)
                if (a, val) in todo:
                    out[(a, val)] = e
        if self._df is not None:
            remaining = todo - set(out)
            if remaining:
                pred = match_plan.value_predicate([v for _, v in remaining])
                rows = (
                    self._df.filter(F.col("a").isin(list({a for a, _ in remaining})))
                    .filter(pred)
                    .select("e", "a", "vtype", "v_str", "v_num", "v_bool")
                    .collect()
                )
                for row in rows:
                    key = (row.a, decode_value(row.vtype, row.v_str, row.v_num, row.v_bool))
                    if key in remaining and key not in out:
                        out[key] = row.e
        self._id_cache.update(out)
        return out

    def assert_fact(self, fact: Any, id_attrs: list[str] | None = None) -> str | None:
        """Assert one document dict or one (e, a, v) triple."""
        if isinstance(fact, dict):
            eids = self.assert_facts([fact], id_attrs=id_attrs)
            return eids[0] if eids else None
        e, a, v = fact
        vtype, v_str, v_num, v_bool = typed_value(v, is_ref=self.registry.ref_attr(a))
        self._ingest_rows([(str(e), a, vtype, v_str, v_num, v_bool, self._bump_t())])
        return None

    def _materialize_t(self) -> None:
        # bulk attach (from_facts_df) defers the max(t) scan until a
        # stamp is actually needed — read-only uses (match/pull/as_of)
        # never pay it
        if self._t_scan is not None:
            scan, self._t_scan = self._t_scan, None
            max_t = scan.agg(F.max("t")).collect()[0][0]
            self._t = max(self._t, int(max_t or 0) + 1)

    def _bump_t(self) -> int:
        self._materialize_t()
        t = self._t
        self._t += 1
        return t

    def assert_facts(self, facts: Any, id_attrs: list[str] | None = None) -> list[str]:
        """Docs iterable, EAV-index dict, or another TripleStore (merge)."""
        if isinstance(facts, dict):
            for e, d in facts.items():
                for a, vs in d.items():
                    vs = vs if isinstance(vs, (list, tuple, set)) else [vs]
                    for v in vs:
                        self.assert_fact((e, a, v))
            return []
        if isinstance(facts, TripleStore):
            return self.assert_facts(facts.to_dict())
        docs = list(facts)
        memo = dict(
            self._resolve_existing_ids(collect_id_pairs(docs, id_attrs)) if id_attrs else {}
        )
        self._materialize_t()
        fl = Flattener(self.registry, id_attrs=id_attrs, memo=memo, t0=self._t)
        result = fl.flatten_docs(docs)
        self._t = result.next_t
        self._id_cache.update(memo)
        self._ingest_rows(result.rows)
        return result.root_eids

    def assert_docs_df(self, docs: DataFrame, id_attrs: list[str] | None = None) -> None:
        """Bulk write path: flatten a nested-struct documents DataFrame
        (e.g. ``spark.read.json``) into facts entirely JVM-side and
        append it. Identifying attrs mint the same uuid5 eids as the
        driver path (functions/ids.py) and are reconciled against
        already-stored entities with two broadcast joins."""
        from tripl_spark.sources.json_bulk import flatten_docs_df, remap_to_existing

        rows = flatten_docs_df(
            docs, ident_attr=self.ident_attr, id_attrs=id_attrs, t=self._bump_t()
        )
        if id_attrs:
            rows = remap_to_existing(rows, self.facts_df(), id_attrs)
        base = self.facts_df()
        self._df = base.unionByName(rows.select(*base.columns))
        self._id_cache.clear()
        self._invalidate()

    def assert_schema(self, schema: dict[str, dict[str, Any]]) -> str | None:
        """Schema stored as data (tripl.py:363-373): attribute-named
        entities under db:schema / db:attributes."""
        def attr_entity(attr: str, attr_schema: dict[str, Any]) -> dict[str, Any]:
            out = dict(attr_schema)
            out[self.ident_attr] = attr
            return out

        return self.assert_fact(
            {
                self.ident_attr: "db:schema",
                "db:attributes": [attr_entity(a, s) for a, s in schema.items()],
            }
        )

    def retract_fact(self, fact: tuple) -> None:
        """Remove one (e, a, v) triple — correct implementation of the
        reference's broken private API (tripl.py:434-443, SURVEY.md Q2)."""
        self.retract_facts([fact])

    def retract_facts(self, facts: Iterable[tuple]) -> None:
        keys = []
        for e, a, v in facts:
            vtype, v_str, v_num, v_bool = typed_value(v, is_ref=False)
            keys.append((str(e), a, _vkey_py(vtype, v_str, v_num, v_bool)))
        df = self.facts_df()
        tomb = local_df(
            self.spark, keys, T.StructType([
                T.StructField("te", T.StringType()),
                T.StructField("ta", T.StringType()),
                T.StructField("tv", T.StringType()),
            ])
        )
        self._df = df.join(
            F.broadcast(tomb),
            (df.e == tomb.te) & (df.a == tomb.ta) & (_vkey_col() == tomb.tv),
            "left_anti",
        )
        self._invalidate()

    # -- time travel -----------------------------------------------------------

    def as_of(self, t: int) -> "TripleStore":
        """Datomic-style snapshot: a read view of the store as it stood
        once stamp ``t`` had committed. Purely a plan over the same fact
        log — no data copied: the ``t <= T`` filter composes with the
        merge-on-read compaction, so at rest (``dump_parquet``) it
        reaches the parquet scan as a pushed-down predicate. Matches,
        pulls, and entity reads against the snapshot all see the
        historical state.

        Caveat (reference semantics): ``retract_facts`` removes rows
        physically, so retracted assertions do not reappear in earlier
        snapshots."""
        import copy

        snap = copy.copy(self)
        snap._pending = []
        snap._df = self.facts_df().filter(F.col("t") <= F.lit(int(t)))
        snap._id_cache = {}
        snap._compacted = None
        snap._attr_stats = None
        return snap

    def history(self, e: Any | None = None) -> DataFrame:
        """The pre-compaction fact log (every assertion with its stamp),
        optionally restricted to one entity — the audit/debug companion
        to ``as_of``."""
        df = self.facts_df()
        if e is not None:
            df = df.filter(F.col("e") == str(e))
        return df.orderBy("t")

    @property
    def latest_t(self) -> int:
        """The highest committed stamp (``as_of(latest_t)`` ≡ now)."""
        self._materialize_t()
        return self._t - 1

    @classmethod
    def from_facts_df(cls, facts: DataFrame,
                      spark: SparkSession | None = None) -> "TripleStore":
        """Attach an externally-built facts frame (bulk melt/ingest
        output with explicit ``t`` stamps) as a store — the cluster-side
        sibling of ``load``; same attach pattern as ``load_parquet``."""
        store = cls(spark=spark)
        store._df = store.facts_df().unionByName(facts.select(*FACT_COLUMNS))
        store._t_scan = facts  # max(t) resolved lazily on first write/read of _t
        store._invalidate()
        return store

    # -- facts views -----------------------------------------------------------

    def facts_df(self) -> DataFrame:
        """All appended triples (bag, pre-compaction)."""
        if self._pending:
            new = local_df(self.spark, self._pending, FACTS_SCHEMA)
            self._df = new if self._df is None else self._df.unionByName(new)
            self._pending = []
        assert self._df is not None
        return self._df

    def current_facts(self, cache: bool = True) -> DataFrame:
        """Compacted view: set semantics (exact-duplicate dedup) +
        cardinality-one last-write-wins by ``t``."""
        if self._compacted is not None:
            return self._compacted
        df = self.facts_df()
        # Dedup on the canonical value key, not the raw vtype tuple: the
        # reference's Python sets treat 1 == 1.0 and a ref IS its eid
        # string, so str/ref (and int/float) assertions of the same value
        # are one fact. Keeps JSON round-trips idempotent — a dump
        # re-parses refs as 'str' (JSON can't carry the tag) and must
        # collapse with the ref-typed original. The typed representative
        # prefers ref over str (keeps pull navigation) and int over float
        # (stable JSON rendering), then the latest stamp.
        prio = (
            F.when(F.col("vtype") == "ref", 3)
            .when(F.col("vtype") == "int", 2)
            .otherwise(1)
        )
        df = (
            df.groupBy("e", "a", _vkey_col().alias("__vk"))
            .agg(
                F.max("t").alias("t"),
                F.max_by(
                    F.struct("vtype", "v_str", "v_num", "v_bool"),
                    F.struct(prio.alias("p"), F.col("t").alias("t")),
                ).alias("__v"),
            )
            .select(
                "e",
                "a",
                F.col("__v.vtype").alias("vtype"),
                F.col("__v.v_str").alias("v_str"),
                F.col("__v.v_num").alias("v_num"),
                F.col("__v.v_bool").alias("v_bool"),
                "t",
                "__vk",
            )
        )
        if self.registry.default_cardinality == CARD_ONE:
            many = self.registry.declared_many_attrs()
            card_one_pred = ~F.col("a").isin(many) if many else F.lit(True)
        else:
            ones = self.registry.card_one_attrs()
            if "db:cardinality" not in ones:
                ones = ones + ["db:cardinality"]
            card_one_pred = F.col("a").isin(ones)
        # equal-t conflicts (bulk loads stamp one t) need a deterministic
        # tiebreaker or the surviving card-one value varies run to run
        w = Window.partitionBy("e", "a").orderBy(F.desc("t"), F.asc("__vk"))
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter((~card_one_pred) | (F.col("__rn") == 1))
            .drop("__rn", "__vk")
        )
        if cache:
            df = df.cache()
            self._compacted = df
        return df

    # -- queries -----------------------------------------------------------

    def stats(self) -> dict[str, int]:
        """Facts count per attribute (cached per store version) — the
        AVE-index statistics the reference author wished for
        (tripl.py:460); drives match clause ordering."""
        if self._attr_stats is None:
            self._attr_stats = {
                r.a: r["count"]
                for r in self.current_facts().groupBy("a").agg(
                    F.count(F.lit(1)).alias("count")
                ).collect()
            }
        return self._attr_stats

    def compact(self) -> None:
        """Materialize the compaction view as the new physical base —
        truncates the append lineage (the batch analog of a Delta
        OPTIMIZE pass). Current-state semantics are unchanged, but the
        compaction horizon moves: superseded card-one versions are
        dropped, so ``as_of`` earlier than the compaction sees the
        compacted state, not the discarded history (the standard
        compaction/time-travel retention trade-off)."""
        self._df = self.current_facts(cache=False).transform(eager_checkpoint)
        self._invalidate()

    def match_df(self, pattern: dict[str, Any]) -> DataFrame:
        """Clauses are ordered most-selective-first using per-attribute
        counts (SURVEY.md §4.2.2 — the reference evaluates in dict
        order); Catalyst/AQE then handle join strategy per clause."""
        if len(pattern) > 1:
            stats = self.stats()
            pattern = dict(
                sorted(pattern.items(), key=lambda kv: stats.get(kv[0], 0))
            )
        return match_plan.match_df(self.current_facts(), pattern)

    def match(self, pattern: dict[str, Any]) -> set[str]:
        return {row.e for row in self.match_df(pattern).collect()}

    def pull(self, pull_expr: list[Any], entity: Any, max_depth: int = 20) -> dict[str, Any]:
        if isinstance(entity, dict):
            eids = sorted(self.match(entity))
            return self.pull(pull_expr, some(eids), max_depth=max_depth)
        eid = entity.ident if hasattr(entity, "ident") and not isinstance(entity, str) else entity
        return pull_plan.pull_many_plan(
            self.spark, self.current_facts(), self.registry, pull_expr, [str(eid)],
            max_depth=max_depth,
        )[0]

    # Root count past which pull_many assembles on the CLUSTER (the
    # pull_df JSON path) instead of the driver-side fetch loop: the
    # driver path costs a collect() per expression position per level
    # and re-nests row-by-row in Python — fine for a page of entities,
    # quadratic-feeling at a million roots. The distributed path is one
    # job + ONE collect of finished documents. The auto-switch applies
    # to EVERY expression shape (r15): FLAT expressions take the
    # bottom-up assembly (equivalent on every store); everything else,
    # '...' recursion included, takes the path-keyed assembly
    # (plans/pull_df.pull_json_paths_df), which reproduces the driver
    # loop's ancestor-revisit ident-stub rule, the reference's
    # recursion-re-enters-root rule, AND the max_depth fetch
    # truncation, cyclic stores included — so the switch is invisible
    # to callers (pinned by tests/test_pull_df.py's equivalence
    # properties over arbitrary and cyclic Hypothesis graphs,
    # recursive expressions included).
    #
    # Threshold tuning (r12 probe, re-measured r13 after the paths
    # rewrite; SCALE.md "pull_many assembly" rows): the driver loop
    # costs ~0.1 ms/doc of Python re-nesting on 4-attr docs
    # (alpha_time 0.45 across 30x), the distributed path ~2 s of
    # fixed job overhead (alpha_time near-flat) — locally the lines
    # cross around ~20k roots; wider docs pull the crossover down, a
    # real cluster's per-level collect round-trips pull it down
    # further. 8192 sits under the measured crossover while keeping
    # driver collects bounded at ~10^5 rows — the page-of-entities
    # regime stays on the cheap loop, anything bulk goes cluster-side.
    PULL_DISTRIBUTED_THRESHOLD = 8192

    @staticmethod
    def _expr_has_recur(expr: list[Any]) -> bool:
        for item in expr:
            if isinstance(item, dict):
                for sub in item.values():
                    if sub == pull_plan.RECUR or (
                        isinstance(sub, list) and TripleStore._expr_has_recur(sub)
                    ):
                        return True
        return False

    @staticmethod
    def _expr_is_flat(expr: list[Any]) -> bool:
        """No dict children (and therefore no '...' either): the pull
        shapes whose two assembly paths are equivalent on EVERY store —
        plain attrs, '*', bare reverse lookups — with no per-store
        check needed."""
        return not any(isinstance(item, dict) for item in expr)

    def pull_many(
        self,
        pull_expr: list[Any],
        eids_or_pattern: Any,
        sort_by: str | None = None,
        sort_desc: bool = True,
        ascending: bool | None = None,
        max_depth: int = 20,
        distributed: bool | None = None,
    ) -> list[dict[str, Any]]:
        """Reference-compat note (SURVEY.md Q7): the reference's
        ``sort_desc=True`` default yields ASCENDING order and ``False``
        applies ``reversed()``. We keep that behavior for compatibility
        but expose ``ascending=`` which, when given, wins.

        ``distributed`` selects the assembly path: None (default)
        auto-switches to cluster-side JSON assembly
        (`plans/pull_df.py`) past ``PULL_DISTRIBUTED_THRESHOLD`` roots
        for EVERY expression shape — FLAT expressions take the
        bottom-up assembly (one render per node); everything else,
        ``'...'`` recursion included, takes the path-keyed assembly,
        which reproduces the driver loop's semantics exactly on ANY
        store (ancestor-revisit ident stubs, the reference's
        recursion-re-enters-root rule, and the ``max_depth`` fetch
        truncation — r15; no shape falls back to the driver loop any
        more). True/False force distributed/driver."""
        if isinstance(eids_or_pattern, dict):
            eids = sorted(self.match(eids_or_pattern))
        else:
            eids = [e.ident if hasattr(e, "ident") and not isinstance(e, str) else str(e)
                    for e in eids_or_pattern]
        use_df = (
            distributed
            if distributed is not None
            else len(eids) >= self.PULL_DISTRIBUTED_THRESHOLD
        )
        if use_df:
            import json as _json

            from tripl_spark.plans.pull_df import pull_json_df, pull_json_paths_df

            roots = local_df(
                self.spark, [(e,) for e in sorted(set(eids))], "e string"
            )
            if self._expr_is_flat(pull_expr):
                rows = pull_json_df(
                    self.current_facts(), self.registry, pull_expr, roots
                ).collect()
            else:
                rows = pull_json_paths_df(
                    self.current_facts(), self.registry, pull_expr, roots,
                    max_depth=max_depth,
                ).collect()
            raw_by_e = {r["e"]: r["doc"] for r in rows}
            # parse PER OCCURRENCE: duplicate eids must get independent
            # dicts (the driver path builds one per root — a caller
            # mutating one returned doc must not mutate its twins)
            results = [_json.loads(raw_by_e[e]) for e in eids]
        else:
            results = pull_plan.pull_many_plan(
                self.spark, self.current_facts(), self.registry, pull_expr, eids,
                max_depth=max_depth,
            )
        if sort_by:
            results = sorted(
                results, key=lambda x: (x.get(sort_by) is None, str(x.get(sort_by)))
            )
            asc = ascending if ascending is not None else sort_desc
            if not asc:
                results = list(reversed(results))
        return results

    def pull_df(
        self, pull_expr: list[Any], eids_or_pattern: Any, max_depth: int = 20
    ) -> DataFrame:
        """Distributed pull: (e, doc) DataFrame with JSON documents
        assembled on the cluster — for result sets too large to re-nest
        driver-side. Wildcards render every present attr (refs
        unexpanded). Driver-loop-identical on any store for ANY
        expression shape: flat expressions take the bottom-up assembly
        (one render per node); nested and ``'...'`` recursive
        expressions take the path-keyed assembly, which carries the
        ancestor-revisit ident stubs, the reference's
        recursion-re-enters-root rule, and the same ``max_depth``
        fetch-truncation husks as the driver loop (r15 — the bounded
        unroll and its cycle-semantics caveat are gone; see
        plans/pull_df.py)."""
        from tripl_spark.plans.pull_df import pull_json_df, pull_json_paths_df

        if isinstance(eids_or_pattern, dict):
            roots = self.match_df(eids_or_pattern)
        else:
            roots = local_df(
                self.spark, [(str(e),) for e in eids_or_pattern], "e string"
            )
        if self._expr_is_flat(pull_expr):
            # flat: one render per node, no path expansion needed
            return pull_json_df(
                self.current_facts(), self.registry, pull_expr, roots
            )
        return pull_json_paths_df(
            self.current_facts(), self.registry, pull_expr, roots,
            max_depth=max_depth,
        )

    def q(self, query: dict[str, Any],
          rules: list[tuple] | None = None) -> list[tuple]:
        """Datalog-style conjunctive query (the reference's sketched,
        unimplemented API — tripl.py:571-587), optionally with recursive
        ``rules`` evaluated to fixpoint first so derived predicates can
        appear in where clauses. See plans/datalog.py."""
        from tripl_spark.plans import datalog

        if not rules:
            return datalog.q(self, query)
        extended = datalog.facts_with_rules(self.current_facts(), rules)
        find = query["find"]
        has_agg = not all(
            isinstance(f, str)
            for f in ([find] if isinstance(find, str) else find)
        )
        df = datalog.q_df(extended, query)
        if not query.get("sort") and not has_agg:
            df = df.orderBy(*df.columns)  # presentation order (take is
            # already deterministic inside q_df)
        return [
            tuple(datalog.decode_cell(row[c]) for c in df.columns)
            for row in df.collect()
        ]

    def entity(self, pattern_or_eid: Any, namespace: str | None = None):
        from tripl_spark.core.entity import Entity

        if isinstance(pattern_or_eid, dict):
            eid = some(sorted(self.match(pattern_or_eid)))
            return self.entity(eid, namespace=namespace)
        return Entity(self, pattern_or_eid, namespace=namespace)

    def entities(self, pattern: dict[str, Any], namespace: str | None = None):
        return [self.entity(e, namespace=namespace) for e in sorted(self.match(pattern))]

    def schema(self, attr: str | None = None, meta_attr: str | None = None) -> Any:
        if attr and meta_attr:
            return self.registry.attrs.get(attr, {}).get(meta_attr)
        if attr:
            return dict(self.registry.attrs.get(attr, {}))
        return [dict(s) for s in self.registry.attrs.values()]

    # -- persistence ---------------------------------------------------------

    def to_dict(self) -> dict[str, dict[str, list[Any]]]:
        """EAV-index-shaped dict of the compacted store (dump format:
        ``{e: {a: [v, ...]}}``, reference tripl.py:555-558 with sorted
        value lists instead of arbitrary set order)."""
        out: dict[str, dict[str, list[Any]]] = {}
        for row in self.current_facts().collect():
            val = decode_value(row.vtype, row.v_str, row.v_num, row.v_bool)
            out.setdefault(row.e, {}).setdefault(row.a, []).append(val)
        for avs in out.values():
            for a in avs:
                avs[a] = sorted(avs[a], key=lambda v: (type(v).__name__, str(v)))
        return out

    def dump(self, filename: str) -> None:
        with open(filename, "w") as fp:
            json.dump(self.to_dict(), fp, default=list)

    @classmethod
    def load(cls, filename: str, schema: dict | None = None,
             id_attrs: list[str] | None = None, spark: SparkSession | None = None
             ) -> "TripleStore":
        with open(filename, "rb") as fp:
            data = json.load(fp)
        return cls(facts=data, schema=schema, id_attrs=id_attrs, spark=spark)

    @classmethod
    def loads(cls, filenames: list[str], schema: dict | None = None,
              id_attrs: list[str] | None = None, spark: SparkSession | None = None
              ) -> "TripleStore":
        result = cls.load(filenames[0], schema=schema, id_attrs=id_attrs, spark=spark)
        for filename in filenames[1:]:
            with open(filename, "rb") as fp:
                result.assert_facts(json.load(fp), id_attrs=id_attrs)
        return result

    def dump_parquet(self, path: str, skip_index: bool = False) -> None:
        """Scale-path persistence: the compacted facts frame partitioned
        by attribute (the AEV ordering as physical layout — match clauses
        prune to one attribute directory). ``skip_index=True``
        additionally writes the per-file stats sidecar
        (`sources/skipindex.py`) so later loads can select the file
        list from a manifest instead of an object-store LIST."""
        self.current_facts(cache=False).write.mode("overwrite").partitionBy("a").parquet(path)
        if skip_index:
            from tripl_spark.sources.skipindex import build_skip_index

            build_skip_index(self.spark, path)

    def dump_bucketed(self, table: str, buckets: int) -> None:
        """Catalog persistence bucketed by ``e`` — the EAV ordering as
        physical layout: every pull/match join chains on the entity id,
        and the (e, a) compaction groupBy keys on it too, so a store
        persisted this way runs those joins bucket-to-bucket with ZERO
        Exchange on either side (plan-asserted in
        ``tests/test_bucketing.py``). The complement of ``dump_parquet``
        (attribute-partitioned for clause pruning): at 100 TB you keep
        BOTH layouts — AEV directories for scan pruning, this
        e-bucketed table for join-heavy pull workloads — the usual
        primary/secondary-layout trade. ``buckets`` is explicit:
        size for 128-512 MB buckets at the target scale."""
        from tripl_spark.sources.bucketing import write_bucketed

        write_bucketed(self.current_facts(cache=False), table, "e", buckets)

    @classmethod
    def load_parquet(
        cls,
        path: str,
        spark: SparkSession | None = None,
        as_of: int | None = None,
        attrs: list[str] | None = None,
    ) -> "TripleStore":
        """Restore a ``dump_parquet`` directory. ``as_of``/``attrs``
        restrict the load AT THE SOURCE: when the dump carries a skip
        index the file list is pruned from the sidecar before any data
        file is opened; otherwise the same predicates still push down
        into the scan. Schema/bookkeeping facts travel at ``t=0`` and an
        attr filter always retains them, so the restored store keeps
        its cardinality and ref declarations."""
        import os as _os

        from tripl_spark.sources.skipindex import SIDECAR, read_pruned

        store = cls(spark=spark)
        keep_attrs = None
        if attrs is not None:
            keep_attrs = sorted(
                set(attrs)
                | _SCHEMA_META_ATTRS
                | _SETTINGS_ATTRS
                | {"db:ident"}
            )
        if _os.path.isdir(_os.path.join(path, SIDECAR)):
            df = read_pruned(
                store.spark, path, attrs=keep_attrs, as_of_t=as_of
            )
        else:
            df = store.spark.read.parquet(path)
            if keep_attrs is not None:
                df = df.filter(F.col("a").isin(keep_attrs))
            if as_of is not None:
                df = df.filter(F.col("t") <= F.lit(int(as_of)))
        store._attach_loaded(df.select(*FACT_COLUMNS))
        return store

    def _attach_loaded(self, df: DataFrame) -> None:
        """Union an externally-loaded facts frame into this store and
        rebuild the registry caches from its schema triples."""
        self._df = self.facts_df().unionByName(df)
        meta = df.filter(
            F.col("a").isin(list(_SCHEMA_META_ATTRS))
            | ((F.col("e") == "db:schema") & F.col("a").isin(list(_SETTINGS_ATTRS)))
        ).collect()
        max_t = df.agg(F.max("t")).collect()[0][0]
        self._t = max(self._t, (max_t or 0) + 1)
        for row in meta:
            val = decode_value(row.vtype, row.v_str, row.v_num, row.v_bool)
            if row.a in _SCHEMA_META_ATTRS:
                self.registry.declare(row.e, {row.a: val})
            elif row.a == "db.refs:lazy":
                self.registry.lazy_refs = bool(val)
            else:
                self.registry.default_cardinality = str(val)
        self._invalidate()

    def dump_jsonl(self, path: str) -> None:
        """Distributed dump: the same logical EAV index as ``dump``
        (reference tripl.py:555-558) but one entity per line, rendered
        JVM-side and written as sharded text — no collect, no Python in
        the loop. Shards concatenate to a loads()-mergeable index; the
        line set is deterministic (sorted attrs and values)."""
        from tripl_spark.sources.jsonl_dump import render_index_lines

        render_index_lines(self.current_facts(cache=False)).write.mode(
            "overwrite"
        ).text(path)

    @classmethod
    def load_jsonl(cls, path: str, spark: SparkSession | None = None) -> "TripleStore":
        """Distributed load of a ``dump_jsonl`` directory (or any JSONL
        of one-entity index objects): Spark 4 VariantType parse — see
        sources/jsonl_dump.py. Schema triples travel inside the dump, so
        cardinality/ref declarations are restored exactly as the
        reference's load does (tripl.py:330-346)."""
        from tripl_spark.sources.jsonl_dump import parse_index_lines

        store = cls(spark=spark)
        lines = store.spark.read.text(path)
        df = parse_index_lines(lines, t=0).select(*FACT_COLUMNS)
        store._attach_loaded(df)
        return store


def _vkey_py(vtype: str, v_str: str | None, v_num: float | None, v_bool: bool | None) -> str:
    """Canonical value key treating str/ref as equal (driver side)."""
    if vtype == "null":
        return "z"
    if vtype in ("int", "float"):
        return f"n:{float(v_num)}"
    if vtype == "bool":
        return f"b:{v_bool}"
    return f"s:{v_str}"


def _vkey_col() -> F.Column:
    """Same canonical value key, as a Column (JVM side)."""
    return (
        F.when(F.col("vtype") == "null", F.lit("z"))
        .when(F.col("vtype").isin("int", "float"),
              F.concat(F.lit("n:"), F.col("v_num").cast("string")))
        .when(F.col("vtype") == "bool",
              F.concat(F.lit("b:"),
                       F.when(F.col("v_bool"), F.lit("True")).otherwise(F.lit("False"))))
        .otherwise(F.concat(F.lit("s:"), F.col("v_str")))
    )
