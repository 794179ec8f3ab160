"""Streaming anomaly monitor ≡ one-shot batch statistic, for any
micro-batch split, with the snapshot-sink restart contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.monitor_stream import StreamingAnomalyMonitor, daily_partials

_ensure_loaded()


def _events(spark, sf):
    return load_table(spark, sf, "events")


def _daily_map(df):
    return {(r.event_type, r.day): (r.n_events, r.x) for r in df.collect()}


@pytest.mark.parametrize("split", ["one", "mod3", "skew"])
def test_monitor_daily_series_is_split_invariant(spark, sf_small, split):
    ev = _events(spark, sf_small)
    batches = {
        "one": [ev],
        "mod3": [ev.filter(F.pmod("user_id", 3) == i) for i in range(3)],
        "skew": [
            ev.filter(F.pmod("user_id", 10) != 0),
            ev.filter(F.pmod("user_id", 10) == 0),
            ev.limit(0),
        ],
    }[split]
    mon = StreamingAnomalyMonitor(spark)
    for i, b in enumerate(batches):
        mon.process(b, batch_id=i)
    want = _daily_map(
        daily_partials(ev).select(
            "event_type", "day", "n_events",
            F.col("sum_value").cast("double").alias("x"),
        )
    )
    assert _daily_map(mon.daily()) == want  # DECIMAL partials: exact


def test_monitor_summary_matches_oracled_batch_query(spark, sf_small):
    ev = _events(spark, sf_small)
    mon = StreamingAnomalyMonitor(spark)
    for i in range(3):
        mon.process(ev.filter(F.pmod("user_id", 3) == i), batch_id=i)
    got = {
        r.event_type: (r.n_days, r.n_anomalies, r.max_abs_z)
        for r in mon.anomaly_summary().collect()
    }
    want = {
        r.event_type: (r.n_days, r.n_anomalies, r.max_abs_z)
        for r in REGISTRY["events_anomaly_mad"].fn(spark, sf_small).collect()
    }
    assert got == want and len(want) > 0


def test_monitor_sink_mode_survives_driver_restart(spark, sf_small, tmp_path):
    ev = _events(spark, sf_small)
    sink = str(tmp_path / "mon_sink")
    m1 = StreamingAnomalyMonitor(spark, sink_path=sink)
    m1.process(ev.filter(F.pmod("user_id", 3) == 0), batch_id=0)
    m1.process(ev.filter(F.pmod("user_id", 3) == 1), batch_id=1)

    m2 = StreamingAnomalyMonitor(spark, sink_path=sink)
    assert m2._seen == {0, 1}
    assert m2.state is not None
    m2.process(ev.filter(F.pmod("user_id", 3) == 1), batch_id=1)  # replay
    m2.process(ev.filter(F.pmod("user_id", 3) == 2), batch_id=2)  # new

    ref = StreamingAnomalyMonitor(spark)
    for i in range(3):
        ref.process(ev.filter(F.pmod("user_id", 3) == i), batch_id=i)
    assert _daily_map(m2.daily()) == _daily_map(ref.daily())

    # forced replay of a committed batch must be a no-op (running
    # aggregate: a re-merge would double every touched day)
    before = _daily_map(m2.daily())
    m2._seen.discard(2)
    m2.process(ev.filter(F.pmod("user_id", 3) == 2), batch_id=2)
    assert 2 in m2._seen
    assert _daily_map(m2.daily()) == before


def test_monitor_flags_a_planted_spike(spark):
    # 30 near-flat days then one 100x day: the spike day (and only it)
    # must be flagged. Days jitter slightly — with EXACTLY constant
    # days MAD is 0 and the type drops out of the view entirely (the
    # documented mad > 0 guard; a zero-dispersion series has no robust
    # scale to standardize against)
    rows = [
        ("load", f"2024-01-{d:02d} 12:00:00", 10.0 + (d % 3)) for d in range(1, 31)
    ]
    rows.append(("load", "2024-02-01 12:00:00", 1000.0))
    ev = spark.createDataFrame(rows, "event_type string, ts_s string, value double").select(
        "event_type", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    mon = StreamingAnomalyMonitor(spark)
    mon.process(ev, batch_id=0)
    flagged = [(r.event_type, r.day) for r in mon.anomalous_days().collect()]
    assert flagged == [("load", "2024-02-01")]
