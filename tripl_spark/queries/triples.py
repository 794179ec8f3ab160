"""Triple-engine bridge queries: Layer A semantics (match / graph join /
reverse lookup / pull projection) exercised distributed over melted
driver tables, each with a relational DuckDB oracle.

This is the correctness tie between the EAV encoding and plain SQL
(FIXTURES.md §B "triple-encoding bridge"): the Spark side goes
table → melt → facts → match/pull plan; the oracle expresses the same
question relationally. If the planners mis-join, these hash-mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.plans.match import match_df
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table
from tripl_spark.sources.melt import melt_table


def _customer_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return melt_table(
        load_table(spark, sf_dir, "customer"),
        "customer",
        "c_custkey",
        ref_cols={"c_nationkey": ("nation", "nation")},
    )


def _nation_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return melt_table(load_table(spark, sf_dir, "nation"), "nation", "n_nationkey")


@query(
    "triple_match_segment",
    oracle="""
    SELECT 'customer-' || CAST(c_custkey AS VARCHAR) AS e
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def triple_match_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-clause match (reference _entity_lookup, tripl.py:589-602):
    attribute-equality scan over the facts frame."""
    facts = _customer_facts(spark, sf_dir)
    return match_df(facts, {"customer:c_mktsegment": "BUILDING"})


@query(
    "triple_match_nested",
    oracle="""
    SELECT 'customer-' || CAST(c_custkey AS VARCHAR) AS e
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name = 'NATION_3' AND c_acctbal > 0
    """,
)
def triple_match_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested pattern = graph equi-join through a ref attr (reference
    match sub-pattern, tripl.py:605-608; crashes there for declared refs
    — SURVEY.md Q3 — implemented uniformly here as a semi-join), plus a
    conjunctive second clause intersected via semi-join."""
    facts = _customer_facts(spark, sf_dir).unionByName(_nation_facts(spark, sf_dir))
    pos = (
        facts.filter((F.col("a") == "customer:c_acctbal") & (F.col("v_num") > 0))
        .select("e")
        .distinct()
    )
    nested = match_df(facts, {"customer:nation": {"nation:n_name": "NATION_3"}})
    return nested.join(pos.withColumnRenamed("e", "pe"),
                       nested.e == F.col("pe"), "left_semi")


@query(
    "triple_reverse_fanin",
    oracle="""
    SELECT 'nation-' || CAST(c_nationkey AS VARCHAR) AS e, count(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def triple_reverse_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse lookup (``customer:_nation`` fan-in, reference
    tripl.py:694-706): group facts by ref value — the VAE index ordering
    expressed as an aggregation."""
    facts = _customer_facts(spark, sf_dir)
    return (
        facts.filter(F.col("a") == "customer:nation")
        .groupBy(F.col("v_str").alias("e"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "triple_datalog_join",
    oracle="""
    SELECT 'customer-' || CAST(c_custkey AS VARCHAR) AS e, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def triple_datalog_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datalog conjunctive query (the reference's unimplemented sketch,
    tripl.py:571-587) compiled to joins over melted facts: customers in
    the BUILDING segment with their nation's name, bound through two
    variable joins."""
    from tripl_spark.plans.datalog import q_df

    facts = _customer_facts(spark, sf_dir).unionByName(_nation_facts(spark, sf_dir))
    df = q_df(
        facts,
        {
            "find": ["?c", "?n_name"],
            "where": [
                ["?c", "customer:c_mktsegment", "BUILDING"],
                ["?c", "customer:nation", "?n"],
                ["?n", "nation:n_name", "?n_name"],
            ],
        },
    )
    return df.select(
        F.substring(df["?c"], 3, 1 << 20).alias("e"),
        F.substring(df["?n_name"], 3, 1 << 20).alias("n_name"),
    )


@query(
    "triple_pull_projection",
    oracle="""
    SELECT 'customer-' || CAST(c_custkey AS VARCHAR) AS e,
           c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'MACHINERY'
    """,
)
def triple_pull_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat pull: match roots, project a plain attr and a one-level
    forward ref attr (the pull compiler's join shape, SURVEY.md §7.4,
    as a relational result)."""
    facts = _customer_facts(spark, sf_dir).unionByName(_nation_facts(spark, sf_dir))
    roots = match_df(facts, {"customer:c_mktsegment": "MACHINERY"})
    names = facts.filter(F.col("a") == "customer:c_name").select(
        F.col("e").alias("ne"), F.col("v_str").alias("c_name")
    )
    edges = facts.filter(F.col("a") == "customer:nation").select(
        F.col("e").alias("ee"), F.col("v_str").alias("nation_e")
    )
    nnames = facts.filter(F.col("a") == "nation:n_name").select(
        F.col("e").alias("nne"), F.col("v_str").alias("n_name")
    )
    return (
        roots.join(names, roots.e == names.ne)
        .join(edges, roots.e == edges.ee)
        .join(nnames, edges.nation_e == nnames.nne)
        .select("e", "c_name", "n_name")
    )


@query(
    "triple_pull_df_wildcard",
    oracle="""
    SELECT 'customer-' || CAST(c_custkey AS VARCHAR) AS e,
           c_name, c_mktsegment, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'MACHINERY'
    """,
)
def triple_pull_df_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed pull END-TO-END: match roots → assemble nested JSON
    documents on the cluster (plain attr + '*' wildcard + expanded child
    position) → parse fields back out relationally. If any stage of the
    cluster-side JSON assembly mis-renders, from_json nulls the row and
    the value hash flips."""
    from pyspark.sql import types as T

    from tripl_spark.core.schema import CARD_ONE, REF_TYPE, SchemaRegistry
    from tripl_spark.plans.pull_df import pull_json_df

    facts = _customer_facts(spark, sf_dir).unionByName(_nation_facts(spark, sf_dir))
    registry = SchemaRegistry(default_cardinality=CARD_ONE)
    registry.declare("customer:nation", {"db:valueType": REF_TYPE, "db:cardinality": CARD_ONE})

    roots = match_df(facts, {"customer:c_mktsegment": "MACHINERY"})
    expr = ["customer:c_name", "*", {"customer:nation": ["nation:n_name"]}]
    docs = pull_json_df(facts, registry, expr, roots)

    parsed_schema = T.StructType(
        [
            T.StructField("customer:c_name", T.StringType()),
            T.StructField("customer:c_mktsegment", T.StringType()),
            T.StructField(
                "customer:nation",
                T.StructType([T.StructField("nation:n_name", T.StringType())]),
            ),
        ]
    )
    return docs.select("e", F.from_json("doc", parsed_schema).alias("d")).select(
        "e",
        F.col("d.`customer:c_name`").alias("c_name"),
        F.col("d.`customer:c_mktsegment`").alias("c_mktsegment"),
        F.col("d.`customer:nation`.`nation:n_name`").alias("n_name"),
    )


_STAGED_DUMPS: set[str] = set()  # staging dirs registered for atexit cleanup


def _last_type_fact_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events melted to the stamped ``user:last_type`` fact log,
    t packed as millis(ts)*1e6 + event_id — ONE definition shared by
    `triple_asof_snapshot` and `triple_skipindex_asof` (their oracles
    are required to stay identical, so the melt must too; the packing
    radix note in the asof docstring applies to both)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("e"),
        F.lit("user:last_type").alias("a"),
        F.lit("str").alias("vtype"),
        F.col("event_type").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        (F.unix_millis("ts") * 1_000_000 + F.col("event_id")).alias("t"),
    )


def _jan15_cutoff_t(spark: SparkSession) -> int:
    """The packed-stamp as-of cutoff both asof queries filter at:
    strictly before Jan 15 2024 → last stamp ≤ millis(cutoff)*1e6 - 1."""
    return (
        spark.range(1)
        .select(
            (
                F.unix_millis(F.lit("2024-01-15").cast("timestamp"))
                * 1_000_000
                - 1
            ).alias("c")
        )
        .first()["c"]
    )


@query(
    "triple_asof_snapshot",
    oracle="""
    SELECT 'user-' || CAST(user_id AS VARCHAR) AS e, event_type AS last_type
    FROM (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) * 1000000
                                         + event_id DESC,
                                         event_type ASC) AS rn
      FROM events
      WHERE epoch_ms(CAST(ts AS TIMESTAMP)) * 1000000 + event_id
            < epoch_ms(TIMESTAMP '2024-01-15') * 1000000)
    WHERE rn = 1
    """,
)
def triple_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic-style time travel (``TripleStore.as_of``): events melt to
    a card-one ``user:last_type`` fact log stamped ``t = millis(ts)*1e6
    + event_id``, and the snapshot at Jan 15 answers "what was each
    user's latest event type THEN". The oracle ranks and filters in the
    PACKED-STAMP domain — the store's t IS the transaction order, and
    replicating the packing (rather than ordering by raw (ts, event_id))
    keeps both engines identical even when event_id outgrows the 1e6
    packing radix at large scale factors; equal-stamp ties break by
    value ascending, the store's own LWW tiebreak
    (`core/store.py:current_facts`). If the snapshot filter or LWW
    compaction mis-ranked, values flip. The as-of filter is a
    pushed-down predicate over the fact log, not a copy."""
    from tripl_spark.core.schema import CARD_ONE
    from tripl_spark.core.store import TripleStore

    facts = _last_type_fact_log(spark, sf_dir)
    store = TripleStore.from_facts_df(facts, spark=spark)
    store.registry.declare("user:last_type", {"db:cardinality": CARD_ONE})
    snap = store.as_of(_jan15_cutoff_t(spark))
    return (
        snap.current_facts(cache=False)
        .filter(F.col("a") == "user:last_type")
        .select("e", F.col("v_str").alias("last_type"))
    )


@query(
    "triple_skipindex_asof",
    oracle="""
    SELECT 'user-' || CAST(user_id AS VARCHAR) AS e, event_type AS last_type
    FROM (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) * 1000000
                                         + event_id DESC,
                                         event_type ASC) AS rn
      FROM events
      WHERE epoch_ms(CAST(ts AS TIMESTAMP)) * 1000000 + event_id
            < epoch_ms(TIMESTAMP '2024-01-15') * 1000000)
    WHERE rn = 1
    """,
)
def triple_skipindex_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `triple_asof_snapshot` answer computed THROUGH the
    persistence layer: the same melted fact log is written as an
    attribute-partitioned parquet dump with a file-list skip index
    (`sources/skipindex.py`), the as-of read selects its file list
    from the stats sidecar (only files whose [min_t, max_t] intersects
    the cutoff are opened), and LWW compaction runs over the pruned
    load. Identical oracle to the in-memory twin — the hash gate pins
    that manifest pruning loses no qualifying fact and admits no
    extra one. The log is written one file per time slice
    (repartitionByRange on t), the layout an append-only ingest
    produces naturally and the one that makes t-range pruning
    selective; at 100 TB this is the difference between opening a
    bounded prefix of the log and LISTing the whole table.

    The staging dump lives at a per-(sf_dir, process, user) temp path:
    reused (overwritten) across calls WITHIN a process so repeated
    harness invocations don't leak one dump each; isolated per pid and
    user so a concurrent run can never clobber files a still-live lazy
    DataFrame points at; removed at process exit via atexit (by then
    every returned DataFrame has been evaluated or abandoned)."""
    import atexit
    import getpass
    import hashlib
    import os
    import shutil
    import tempfile

    from tripl_spark.core.flatten import FACT_COLUMNS
    from tripl_spark.core.schema import CARD_ONE
    from tripl_spark.core.store import TripleStore
    from tripl_spark.sources.skipindex import build_skip_index, read_pruned

    facts = _last_type_fact_log(spark, sf_dir)
    tag = hashlib.md5(
        f"{sf_dir}:{os.getpid()}:{getpass.getuser()}".encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"tripl_spark_skipidx_{tag}")
    if path not in _STAGED_DUMPS:
        _STAGED_DUMPS.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    facts.repartitionByRange(8, "t").write.mode("overwrite").partitionBy(
        "a"
    ).parquet(path)
    build_skip_index(spark, path)
    pruned = read_pruned(spark, path, as_of_t=_jan15_cutoff_t(spark))
    store = TripleStore.from_facts_df(pruned.select(*FACT_COLUMNS), spark=spark)
    store.registry.declare("user:last_type", {"db:cardinality": CARD_ONE})
    return (
        store.current_facts(cache=False)
        .filter(F.col("a") == "user:last_type")
        .select("e", F.col("v_str").alias("last_type"))
    )


@query(
    "triple_pull_recursive",
    oracle="""
    WITH RECURSIVE users AS (SELECT DISTINCT user_id AS u FROM events),
    anc AS (
      SELECT u, u AS node, 0 AS depth FROM users
      UNION ALL
      SELECT a.u, p.u AS node, a.depth + 1
      FROM anc a
      JOIN users p ON p.u = CAST(floor(a.node / 16) AS BIGINT)
      WHERE a.node > 0
    )
    SELECT 'user-' || CAST(u AS VARCHAR) AS e, depth,
           'user-' || CAST(node AS VARCHAR) AS ancestor
    FROM anc WHERE depth > 0
    """,
)
def triple_pull_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive pull (``'...'`` re-enters the root expression —
    reference tripl.py:708-710) exercised END-TO-END on the facts
    encoding itself: events users melt to a ``user:parent`` ref forest
    (u → u//16, edge kept only when the parent is itself a user — a
    16-ary forest, so chains run ~log16(max id) deep and every level
    is a real dynamic-frontier round, not job-floor padding), then
    the path-keyed assembly (`pull_json_paths_df`, driver-loop-exact
    since r15) expands ``["db:ident", {"user:parent": "..."}]`` on the
    cluster TO EXHAUSTION — the '...' rule's own termination (a chain
    ends at user-0 or at a gap in the user ids), ~log16(max user id)
    dynamic-frontier levels, no truncation anywhere: ``max_depth`` is
    set far above any chain so the fetch-truncation machinery (and its
    fetched-set BFS) never engages, and the oracle's WITH RECURSIVE
    runs to the same fixpoint. The full chain is parsed back
    relationally from the nested JSON by ident extraction in nesting
    order (the doc nests ancestors depth-first, so textual match order
    IS depth order) — a wrong recursion-exhaustion rule, a dropped
    level, or a mis-join flips rows. Ancestor-revisit stub coverage
    lives in `triple_pull_recursive_cyclic`; this query pins the
    acyclic exhaustion path."""
    from tripl_spark.core.schema import CARD_ONE, REF_TYPE, SchemaRegistry
    from tripl_spark.plans.pull_df import pull_json_paths_df

    users = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("long").alias("u"))
        .distinct()
    )
    eid = F.concat(F.lit("user-"), F.col("u").cast("string"))
    idents = users.select(
        eid.alias("e"),
        F.lit("db:ident").alias("a"),
        F.lit("str").alias("vtype"),
        eid.alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        F.lit(0).cast("long").alias("t"),
    )
    parents = users.alias("c").filter(F.col("u") > 0).join(
        users.alias("p"),
        F.col("p.u") == F.floor(F.col("c.u") / 16).cast("long"),
        "left_semi",
    )
    edges = parents.select(
        F.concat(F.lit("user-"), F.col("u").cast("string")).alias("e"),
        F.lit("user:parent").alias("a"),
        F.lit("ref").alias("vtype"),
        F.concat(
            F.lit("user-"), F.floor(F.col("u") / 16).cast("long").cast("string")
        ).alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        F.lit(0).cast("long").alias("t"),
    )
    facts = idents.unionByName(edges)

    registry = SchemaRegistry(default_cardinality=CARD_ONE)
    registry.declare("user:parent", {"db:valueType": REF_TYPE, "db:cardinality": CARD_ONE})

    roots = users.select(eid.alias("e"))
    # max_depth far above any chain (log2 of the max user id): the
    # expansion's own termination rule ends every chain, so the
    # fetch-truncation path (and its fetched-set BFS) never engages
    docs = pull_json_paths_df(
        facts, registry, ["db:ident", {"user:parent": "..."}], roots,
        max_depth=64,
    )

    # unbounded-depth parse-back: idents appear in the nested JSON in
    # depth order (each level nests under "user:parent"), so ordered
    # regex extraction recovers the whole chain; element 1 is the root
    # itself, the rest are the ancestors
    idents_in_doc = F.regexp_extract_all(
        F.col("doc"), F.lit('"db:ident":"(user-[0-9]+)"'), F.lit(1)
    )
    chain = F.slice(
        idents_in_doc, 2, F.greatest(F.size(idents_in_doc) - 1, F.lit(0))
    )
    return (
        docs.select("e", F.posexplode(chain).alias("pos", "ancestor"))
        .select("e", (F.col("pos") + 1).cast("int").alias("depth"), "ancestor")
    )


@query(
    "triple_datalog_aggregate",
    # Datomic-style find aggregates over the melted facts: group keys =
    # plain find vars, aggregation over the DISTINCT binding tuples
    # (set semantics — each (customer, balance) binds once, so counts
    # are entity counts). The relational oracle is the plain GROUP BY.
    oracle="""
    SELECT n_name,
           CAST(count(c_custkey) AS BIGINT) AS count_c,
           round(sum(c_acctbal), 2) AS sum_bal,
           round(min(c_acctbal), 2) + 0.0 AS min_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="datalog find-aggregates (count/sum/min with a group variable) "
    "— the Datomic aggregation surface the reference sketch never "
    "reached, compiled to one grouped aggregation over the binding "
    "tuples; hash-gated vs the relational GROUP BY",
)
def triple_datalog_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers-per-nation stats asked in datalog: ``find`` mixes the
    group variable ?n_name with [count ?c], [sum ?bal], [min ?bal] —
    the engine folds the where clauses as usual, then aggregates the
    distinct binding tuples grouped by the plain variables. min runs on
    the TYPED ordering (numeric keys numerically) and returns a
    canonical key; sum decodes the numeric payload. Scale shape: the
    clause joins as ever, plus ONE map-side-combined aggregation —
    aggregation never collects bindings to the driver."""
    from tripl_spark.plans.datalog import q_df

    facts = _customer_facts(spark, sf_dir).unionByName(_nation_facts(spark, sf_dir))
    df = q_df(
        facts,
        {
            "find": ["?n_name", ["count", "?c"], ["sum", "?bal"], ["min", "?bal"]],
            "where": [
                ["?c", "customer:nation", "?n"],
                ["?n", "nation:n_name", "?n_name"],
                ["?c", "customer:c_acctbal", "?bal"],
            ],
        },
    )
    return df.select(
        F.substring(df["?n_name"], 3, 1 << 20).alias("n_name"),
        F.col("count_c"),
        F.round(F.col("sum_bal"), 2).alias("sum_bal"),
        (F.round(F.substring(F.col("min_bal"), 3, 64).cast("double"), 2) + F.lit(0.0)).alias("min_bal"),
    )


def _order_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return melt_table(
        load_table(spark, sf_dir, "orders"),
        "orders",
        "o_orderkey",
        ref_cols={"o_custkey": ("customer", "customer")},
    )


@query(
    "triple_datalog_negation",
    # Stratified negation: the `not` SUB-CONJUNCTION (two clauses —
    # the order must belong to the customer AND be urgent) folds like
    # a normal body, then anti-joins the bound set on the shared
    # variable — gated against the relational NOT EXISTS.
    oracle="""
    SELECT 'customer-' || CAST(c_custkey AS VARCHAR) AS e
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    doc="datalog `not` clauses (Datomic-style stratified negation via "
    "anti-join over a folded sub-conjunction): customers with no "
    "URGENT order — hash-gated vs the relational NOT EXISTS",
)
def triple_datalog_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1-URGENT order, asked in datalog with a
    two-clause ``not`` sub-conjunction — the set-difference shape the
    positive-conjunction engine could not express. The sub-body
    (?o belongs to ?c AND ?o is urgent) folds exactly like a positive
    body, then ONE anti-join on the shared ?c removes matching
    customers; ?o is existential inside the ``not``."""
    from tripl_spark.plans.datalog import q_df

    facts = _customer_facts(spark, sf_dir).unionByName(_order_facts(spark, sf_dir))
    df = q_df(
        facts,
        {
            "find": ["?c"],
            "where": [
                ["?c", "customer:c_custkey", "?k"],
                ["not",
                 ["?o", "orders:customer", "?c"],
                 ["?o", "orders:o_orderpriority", "1-URGENT"]],
            ],
        },
    )
    return df.select(F.substring(df["?c"], 3, 1 << 20).alias("e"))


@query(
    "triple_datalog_disjunction",
    # `or` branches fold independently and union into one binding
    # relation that joins like a clause — gated against the relational
    # IN-list.
    oracle="""
    SELECT 'customer-' || CAST(c_custkey AS VARCHAR) AS e, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    doc="datalog `or` clauses (Datomic-style disjunction: branches "
    "must bind the same variables; union of branch binding sets) — "
    "hash-gated vs the relational IN-list",
)
def triple_datalog_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-or-AUTOMOBILE customers with their nation names, asked
    with an ``["or", ...]`` clause. Each branch folds independently;
    the union joins into the rest of the conjunction exactly like a
    clause, so Catalyst still reorders/broadcasts it."""
    from tripl_spark.plans.datalog import q_df

    facts = _customer_facts(spark, sf_dir).unionByName(_nation_facts(spark, sf_dir))
    df = q_df(
        facts,
        {
            "find": ["?c", "?n_name"],
            "where": [
                ["or",
                 ["?c", "customer:c_mktsegment", "BUILDING"],
                 ["?c", "customer:c_mktsegment", "AUTOMOBILE"]],
                ["?c", "customer:nation", "?n"],
                ["?n", "nation:n_name", "?n_name"],
            ],
        },
    )
    return df.select(
        F.substring(df["?c"], 3, 1 << 20).alias("e"),
        F.substring(df["?n_name"], 3, 1 << 20).alias("n_name"),
    )


@query(
    "triple_attr_stats",
    oracle="""
    WITH cn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM customer),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nation)
    SELECT 'db:ident' AS a, cn.c + nn.n AS n_facts, cn.c + nn.n AS n_entities,
           cn.c + nn.n AS n_values,
           round((cn.c + nn.n) * 1.0 / (cn.c + nn.n), 4) AS selectivity
    FROM cn, nn
    UNION ALL
    SELECT 'customer:c_custkey', count(*), count(DISTINCT c_custkey),
           count(DISTINCT c_custkey),
           round(count(DISTINCT c_custkey) * 1.0 / count(*), 4)
    FROM customer
    UNION ALL
    SELECT 'customer:c_name', count(*), count(DISTINCT c_custkey),
           count(DISTINCT c_name),
           round(count(DISTINCT c_name) * 1.0 / count(*), 4)
    FROM customer
    UNION ALL
    SELECT 'customer:nation', count(*), count(DISTINCT c_custkey),
           count(DISTINCT c_nationkey),
           round(count(DISTINCT c_nationkey) * 1.0 / count(*), 4)
    FROM customer
    UNION ALL
    SELECT 'customer:c_acctbal', count(*), count(DISTINCT c_custkey),
           count(DISTINCT c_acctbal),
           round(count(DISTINCT c_acctbal) * 1.0 / count(*), 4)
    FROM customer
    UNION ALL
    SELECT 'customer:c_mktsegment', count(*), count(DISTINCT c_custkey),
           count(DISTINCT c_mktsegment),
           round(count(DISTINCT c_mktsegment) * 1.0 / count(*), 4)
    FROM customer
    UNION ALL
    SELECT 'nation:n_nationkey', count(*), count(DISTINCT n_nationkey),
           count(DISTINCT n_nationkey),
           round(count(DISTINCT n_nationkey) * 1.0 / count(*), 4)
    FROM nation
    UNION ALL
    SELECT 'nation:n_name', count(*), count(DISTINCT n_nationkey),
           count(DISTINCT n_name),
           round(count(DISTINCT n_name) * 1.0 / count(*), 4)
    FROM nation
    UNION ALL
    SELECT 'nation:n_regionkey', count(*), count(DISTINCT n_nationkey),
           count(DISTINCT n_regionkey),
           round(count(DISTINCT n_regionkey) * 1.0 / count(*), 4)
    FROM nation
    """,
    doc="the planner-statistics view: per attribute, fact count, "
    "entity count, distinct-value count and selectivity over the "
    "melted customer+nation fact log — the numbers `plans/match.py` "
    "orders clauses by, exposed as a query (DuckDB replays the melt "
    "per source column); hash-gated",
)
def triple_attr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE for the triple store: per-attribute cardinalities and
    selectivity (distinct values / facts). These are exactly the
    statistics the match compiler's most-selective-first clause
    ordering consumes (`plans/match.py` counts per-attribute facts
    before choosing a join order — the EAV analog of Catalyst's column
    stats), surfaced as a registered query so an operator can inspect
    WHY a clause ordering was chosen and a pipeline can monitor
    attribute-cardinality drift between ingests.

    Scale shape: one map-side-combined aggregation over the fact log;
    distinct counts are Spark's two-phase partial-distinct (at true
    100 TB scale you would swap countDistinct for approx_count_distinct
    — the HLL path `approx_distinct_users` pins — at the price of the
    exact oracle)."""
    facts = _customer_facts(spark, sf_dir).unionByName(_nation_facts(spark, sf_dir))
    val_key = F.coalesce(
        F.col("v_str"), F.col("v_num").cast("string"), F.col("v_bool").cast("string")
    )
    return facts.groupBy("a").agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"),
        F.countDistinct("e").cast("long").alias("n_entities"),
        F.countDistinct(val_key).cast("long").alias("n_values"),
        F.round(
            F.countDistinct(val_key) * 1.0 / F.count(F.lit(1)), 4
        ).alias("selectivity"),
    )


@query(
    "triple_history_audit",
    oracle="""
    WITH f AS (
      SELECT user_id, event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) * 1000000 + event_id AS t
      FROM events
    )
    SELECT strftime(date_trunc('month', epoch_ms(t // 1000000)), '%Y-%m')
             AS month,
           CAST(count(*) AS BIGINT) AS n_assertions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_entities,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_values,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overwrites
    FROM (
      SELECT user_id, event_type, t,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t, event_type) AS rn
      FROM f
    )
    GROUP BY 1
    """,
    doc="Datomic history() as an audit rollup: per month, how many "
    "assertions landed on the card-one user:last_type attribute, how "
    "many entities/values they touched, and how many were OVERWRITES "
    "of an earlier assertion (rn > 1 in stamp order) — the write-audit "
    "view the as-of snapshot family completes; hash-gated",
)
def triple_history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`TripleStore.history()` surfaced as a monitoring query: the
    pre-compaction fact log (the SAME events-melted card-one store as
    `triple_asof_snapshot`) aggregated to a monthly write-audit —
    assertion volume, touched entities, distinct values, and the
    overwrite count (assertions that superseded an earlier stamp for
    their (e, a), i.e. everything merge-on-read compaction will
    discard). At 100 TB this is the question 'how fast is my store
    churning and what will compaction reclaim' answered by one scan
    of the log; the history() view adds no shuffle of its own — the
    rank-by-stamp runs per entity, the log's natural key.

    Scale shape: one window over (e) in stamp order (near-unique keys,
    shuffle-balanced) and one month-grain aggregation."""
    from pyspark.sql import Window

    from tripl_spark.core.store import TripleStore

    events = load_table(spark, sf_dir, "events")
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
    # restrict the audit to the data attribute: the store also logs
    # its own bookkeeping facts at t=0 (idents/schema), which are not
    # part of this attribute's write history
    hist = store.history().filter(F.col("a") == "user:last_type")
    w = Window.partitionBy("e").orderBy("t")
    ranked = hist.withColumn("rn", F.row_number().over(w))
    # integer division, matching the oracle's `t // 1000000`: a double
    # divide of a ~1e18 stamp rounds by up to ~256 units, enough to
    # flip a boundary-millisecond event across a month edge
    month = F.date_format(
        F.timestamp_millis(F.expr("t div 1000000")), "yyyy-MM"
    )
    return ranked.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_assertions"),
        F.countDistinct("e").cast("long").alias("n_entities"),
        F.countDistinct("v_str").cast("long").alias("n_values"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long")
          .alias("n_overwrites"),
    )


@query(
    "triple_pull_paths_cyclic",
    oracle="""
    WITH firstn AS (
      SELECT n_regionkey, min(n_nationkey) AS fk
      FROM nation GROUP BY n_regionkey
    )
    SELECT 'nation-' || CAST(n.n_nationkey AS VARCHAR) AS e,
           n.n_name,
           r.r_name,
           CASE WHEN n.n_nationkey = f.fk THEN NULL ELSE fn.n_name END
             AS first_name,
           CASE WHEN n.n_nationkey = f.fk
                THEN 'nation-' || CAST(n.n_nationkey AS VARCHAR) END
             AS stub_ident,
           (n.n_nationkey = f.fk) AS stubbed
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN firstn f ON n.n_regionkey = f.n_regionkey
    JOIN nation fn ON fn.n_nationkey = f.fk
    """,
    doc="Path-keyed distributed pull over a CYCLIC graph "
    "(nation -> region -> first-nation-of-region): the depth-2 child "
    "equals the root exactly for each region's first nation, which "
    "must render as the driver loop's {db:ident} ancestor stub while "
    "every other path expands fully — the r13 revisit-complete "
    "assembly hash-gated end-to-end through from_json",
)
def triple_pull_paths_cyclic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives `plans/pull_df.pull_json_paths_df` (the r13 path-keyed
    assembly) on a deliberately cyclic store built from driver tables:
    every nation points at its region, every region points back at its
    lowest-key nation. For exactly that nation the traversal path
    revisits its own root and the document must carry the reference
    cycle rule's ident stub (tripl.py:665-668 per SURVEY Q5); for all
    others the full nested document renders. Any stub mis-fire — too
    eager (node-level instead of path-level cycle detection) or too
    lazy (missing stub) — flips `stubbed`/`first_name` and the value
    hash."""
    from pyspark.sql import types as T

    from tripl_spark.core.schema import CARD_ONE, REF_TYPE, SchemaRegistry
    from tripl_spark.plans.pull_df import pull_json_paths_df

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation_facts = melt_table(
        nation, "nation", "n_nationkey",
        ref_cols={"n_regionkey": ("region", "region")},
    )
    region_facts = melt_table(region, "region", "r_regionkey")
    first_nation = nation.groupBy("n_regionkey").agg(
        F.min("n_nationkey").alias("fk")
    )
    back_edges = first_nation.select(
        F.concat(F.lit("region-"), F.col("n_regionkey").cast("string")).alias("e"),
        F.lit("region:first_nation").alias("a"),
        F.lit("ref").alias("vtype"),
        F.concat(F.lit("nation-"), F.col("fk").cast("string")).alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        F.lit(0).cast("long").alias("t"),
    )
    facts = nation_facts.unionByName(region_facts).unionByName(back_edges)

    registry = SchemaRegistry(default_cardinality=CARD_ONE)
    registry.declare("nation:region",
                     {"db:valueType": REF_TYPE, "db:cardinality": CARD_ONE})
    registry.declare("region:first_nation",
                     {"db:valueType": REF_TYPE, "db:cardinality": CARD_ONE})

    roots = nation.select(
        F.concat(F.lit("nation-"), F.col("n_nationkey").cast("string")).alias("e")
    )
    expr = [
        "nation:n_name",
        {"nation:region": ["region:r_name",
                           {"region:first_nation": ["nation:n_name"]}]},
    ]
    docs = pull_json_paths_df(facts, registry, expr, roots)

    parsed = T.StructType([
        T.StructField("nation:n_name", T.StringType()),
        T.StructField("nation:region", T.StructType([
            T.StructField("region:r_name", T.StringType()),
            T.StructField("region:first_nation", T.StructType([
                T.StructField("nation:n_name", T.StringType()),
                T.StructField("db:ident", T.StringType()),
            ])),
        ])),
    ])
    d = F.from_json("doc", parsed)
    fn_node = d.getField("nation:region").getField("region:first_nation")
    return docs.select(
        "e",
        d.getField("nation:n_name").alias("n_name"),
        d.getField("nation:region").getField("region:r_name").alias("r_name"),
        fn_node.getField("nation:n_name").alias("first_name"),
        fn_node.getField("db:ident").alias("stub_ident"),
        fn_node.getField("db:ident").isNotNull().alias("stubbed"),
    )

@query(
    "triple_pull_recursive_cyclic",
    oracle="""
    WITH RECURSIVE ring AS (
      SELECT n_nationkey AS k, n_name, n_regionkey AS rg,
             row_number() OVER (PARTITION BY n_regionkey
                                ORDER BY n_nationkey) AS rn,
             count(*) OVER (PARTITION BY n_regionkey) AS cnt
      FROM nation
    ),
    succ AS (
      SELECT a.k AS k, b.k AS nxt
      FROM ring a JOIN ring b ON a.rg = b.rg AND b.rn = a.rn % a.cnt + 1
    ),
    walk(root, node, depth) AS (
      SELECT k, k, 0 FROM ring
      UNION ALL
      SELECT w.root, s.nxt, w.depth + 1
      FROM walk w JOIN succ s ON s.k = w.node
      WHERE w.depth = 0 OR w.node <> w.root
    )
    SELECT 'nation-' || CAST(w.root AS VARCHAR) AS e,
           CAST(w.depth AS INT) AS depth,
           'nation-' || CAST(w.node AS VARCHAR) AS ancestor,
           CASE WHEN w.node = w.root THEN NULL ELSE r.n_name END AS anc_name,
           (w.node = w.root) AS stubbed
    FROM walk w JOIN ring r ON r.k = w.node
    WHERE w.depth > 0
    """,
    doc="'...' recursion on a CYCLIC graph through the r15 dynamic-"
    "frontier path-keyed assembly: nations form a successor RING within "
    "each region, the recursive pull walks each ring until the path "
    "revisits its own root and emits the driver loop's {db:ident} cycle "
    "stub — ring length is a DATA property (5 here), not an expression "
    "property, so the static-depth walk this replaced could not run it; "
    "hash-gated against a WITH RECURSIVE ring walk",
)
def triple_pull_recursive_cyclic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r15 headline path end-to-end: ``["db:ident", "nation:n_name",
    {"nation:ring_next": "..."}]`` over a deliberately cyclic store —
    every nation points at the NEXT nation of its region (ordered by
    key, wrapping to the first), so every pull path is a simple cycle
    back to its root. The reference's recursion rule re-enters the whole
    base expression per hop (tripl.py:708-710) and the first ancestor
    revisit renders the ident stub (tripl.py:665-668): each document is
    a chain of ring-size hops whose last node is ``{"db:ident": root}``.
    The chain is parsed back relationally as (e, depth, ancestor,
    anc_name, stubbed) rows — a stub that fires early (node-level cycle
    detection), late (missed revisit), or not at all (bounded unroll)
    flips rows and the value hash.

    Scale shape: expansion is one join per ring hop over a frontier
    that never exceeds |nation| path rows (simple cycles — no sharing
    blowup), assembly one aggregation per hop; the ring-size probe is a
    bounded dimension-metadata collect (nation is a fixed 25-row dim).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from tripl_spark.core.schema import CARD_ONE, REF_TYPE, SchemaRegistry
    from tripl_spark.plans.pull_df import pull_json_paths_df

    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    ring = nation.select(
        "n_nationkey",
        "n_regionkey",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("n_regionkey")).alias("cnt"),
    )
    succ = (
        ring.alias("a")
        .join(
            ring.alias("b"),
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("b.rn") == F.col("a.rn") % F.col("a.cnt") + 1),
        )
        .select(
            F.col("a.n_nationkey").alias("k"), F.col("b.n_nationkey").alias("nxt")
        )
    )
    edges = succ.select(
        F.concat(F.lit("nation-"), F.col("k").cast("string")).alias("e"),
        F.lit("nation:ring_next").alias("a"),
        F.lit("ref").alias("vtype"),
        F.concat(F.lit("nation-"), F.col("nxt").cast("string")).alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        F.lit(0).cast("long").alias("t"),
    )
    facts = melt_table(nation, "nation", "n_nationkey").unionByName(edges)

    registry = SchemaRegistry(default_cardinality=CARD_ONE)
    registry.declare(
        "nation:ring_next",
        {"db:valueType": REF_TYPE, "db:cardinality": CARD_ONE},
    )
    roots = nation.select(
        F.concat(F.lit("nation-"), F.col("n_nationkey").cast("string")).alias("e")
    )
    expr = ["db:ident", "nation:n_name", {"nation:ring_next": "..."}]
    docs = pull_json_paths_df(facts, registry, expr, roots)

    # parse depth = the longest ring (a bounded dim-metadata lookup;
    # every chain ends at exactly its ring's size with the root stub)
    max_ring = (
        nation.groupBy("n_regionkey").count().agg(F.max("count")).collect()[0][0]
    )
    schema: T.StructType | None = None
    for _ in range(max_ring + 1):
        fields = [
            T.StructField("db:ident", T.StringType()),
            T.StructField("nation:n_name", T.StringType()),
        ]
        if schema is not None:
            fields.append(T.StructField("nation:ring_next", schema))
        schema = T.StructType(fields)
    d = F.from_json("doc", schema)
    node, elems = d, []
    for _ in range(max_ring):
        node = node.getField("nation:ring_next")
        elems.append(
            F.struct(
                node.getField("db:ident").alias("ident"),
                node.getField("nation:n_name").alias("name"),
            )
        )
    out = docs.select("e", F.posexplode(F.array(*elems)).alias("pos", "anc"))
    return out.filter(F.col("anc.ident").isNotNull()).select(
        "e",
        (F.col("pos") + 1).cast("int").alias("depth"),
        F.col("anc.ident").alias("ancestor"),
        F.col("anc.name").alias("anc_name"),
        (F.col("anc.ident") == F.col("e")).alias("stubbed"),
    )
