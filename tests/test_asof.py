"""Tests for plans/asof.py (forward as-of join, materialization delta)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from feast_hive_spark.plans.asof import asof_forward_join, materialize_delta


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_forward_basic(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 10.0, 100),
            (1, _ts("2024-01-03T10:00:00"), 30.0, 101),
            (2, _ts("2024-01-02T00:00:00"), 20.0, 102),
        ],
        ["k", "ts", "v", "eid"],
    )
    probes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),  # -> first event (10.0)
            (1, _ts("2024-01-02T00:00:00")),  # -> skips to the 3rd (30.0)
            (1, _ts("2024-01-04T00:00:00")),  # -> nothing ahead: NULLs
            (2, _ts("2024-01-02T00:00:00")),  # coincident ts -> matches
        ],
        ["k", "pts"],
    )
    out = {
        (r["k"], r["probe_ts"]): (r["next_ts"], r["next_v"])
        for r in asof_forward_join(
            probes, events, ["k"], "pts", "ts", ["v"], tiebreak_col="eid"
        ).collect()
    }
    assert out[(1, _ts("2024-01-01T00:00:00"))] == (_ts("2024-01-01T10:00:00"), 10.0)
    assert out[(1, _ts("2024-01-02T00:00:00"))] == (_ts("2024-01-03T10:00:00"), 30.0)
    assert out[(1, _ts("2024-01-04T00:00:00"))] == (None, None)
    # an event exactly AT the probe time matches (probe sorts first)
    assert out[(2, _ts("2024-01-02T00:00:00"))] == (_ts("2024-01-02T00:00:00"), 20.0)


def test_asof_forward_tie_deterministic(spark):
    t = _ts("2024-01-01T12:00:00")
    events = spark.createDataFrame(
        [(1, t, 5.0, 7), (1, t, 6.0, 3)], ["k", "ts", "v", "eid"]
    )
    probes = spark.createDataFrame([(1, t)], ["k", "pts"])
    rows = asof_forward_join(
        probes, events, ["k"], "pts", "ts", ["v"], tiebreak_col="eid"
    ).collect()
    # lowest eid wins the tie, every run
    assert rows[0]["next_v"] == 6.0


def test_materialize_delta_classifies(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01"), 1.0, 10),   # old latest for k=1
            (1, _ts("2024-01-25"), 2.0, 11),   # new latest -> updated
            (2, _ts("2024-01-05"), 3.0, 12),   # unchanged -> excluded
            (3, _ts("2024-01-22"), 4.0, 13),   # appears late -> new
        ],
        ["k", "ts", "v", "eid"],
    )
    out = {
        r["k"]: (r["change_type"], r["old_id"], r["new_id"], r["new_value"])
        for r in materialize_delta(
            events, ["k"], "ts", "eid", "v", "2024-01-20", "2024-01-31"
        ).collect()
    }
    assert out == {
        1: ("updated", 10, 11, 2.0),
        3: ("new", None, 13, 4.0),
    }
