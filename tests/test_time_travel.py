"""TripleStore time travel: as_of snapshots, history log, latest_t."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.core.schema import CARD_ONE
from tripl_spark.core.store import TripleStore


def _store(spark):
    return TripleStore(
        schema={"person:name": {"db:cardinality": CARD_ONE}},
        spark=spark,
    )


def test_as_of_sees_old_card_one_value(spark):
    store = _store(spark)
    store.assert_fact({"db:ident": "p1", "person:name": "alice"})
    t_v1 = store.latest_t
    store.assert_fact({"db:ident": "p1", "person:name": "alicia"})

    assert store.entity("p1")["person:name"] == "alicia"
    assert store.as_of(t_v1).entity("p1")["person:name"] == "alice"


def test_as_of_before_entity_existed_is_empty(spark):
    store = _store(spark)
    store.assert_fact({"db:ident": "p1", "person:name": "alice"})
    t_before = store.latest_t
    store.assert_fact({"db:ident": "p2", "person:name": "bob"})

    snap = store.as_of(t_before)
    assert len(snap.match({"person:name": "bob"})) == 0
    assert len(store.match({"person:name": "bob"})) == 1


def test_snapshot_does_not_see_later_writes(spark):
    store = _store(spark)
    store.assert_fact({"db:ident": "p1", "person:name": "alice"})
    snap = store.as_of(store.latest_t)
    store.assert_fact({"db:ident": "p1", "person:name": "alicia"})
    # the snapshot was taken before the second write landed
    assert snap.entity("p1")["person:name"] == "alice"


def test_history_shows_every_version(spark):
    store = _store(spark)
    store.assert_fact({"db:ident": "p1", "person:name": "alice"})
    store.assert_fact({"db:ident": "p1", "person:name": "alicia"})
    eid = next(iter(store.match({"db:ident": "p1"})))
    names = [
        r.v_str
        for r in store.history(eid).filter(F.col("a") == "person:name").collect()
    ]
    assert names == ["alice", "alicia"]  # ordered by t
