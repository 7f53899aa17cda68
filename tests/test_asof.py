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


def test_scd2_build_collapses_and_intervals(spark):
    """No-change events collapse into the open version; every change
    closes the prior interval at exactly the new valid_from; exactly
    one open (is_current) version per key."""
    from feast_hive_spark.plans.asof import scd2_build

    rows = [
        (1, _ts("2024-01-01"), 1, "a"),
        (1, _ts("2024-01-02"), 2, "a"),  # no change -> collapsed
        (1, _ts("2024-01-03"), 3, "b"),  # change
        (1, _ts("2024-01-04"), 4, "a"),  # back to a -> NEW version
        (2, _ts("2024-01-01"), 5, "x"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "attr"])
    out = (
        scd2_build(df, ["k"], "ts", ["attr"], tiebreak_col="eid")
        .toPandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    out = out.astype(object).where(out.notna(), None)  # NaT -> None
    got = list(
        map(tuple, out[["k", "attr", "valid_from", "valid_to", "is_current"]].values)
    )
    assert got == [
        (1, "a", _ts("2024-01-01"), _ts("2024-01-03"), False),
        (1, "b", _ts("2024-01-03"), _ts("2024-01-04"), False),
        (1, "a", _ts("2024-01-04"), None, True),
        (2, "x", _ts("2024-01-01"), None, True),
    ]
    assert out.groupby("k").is_current.sum().eq(1).all()


def test_scd2_same_ts_tiebreak_deterministic(spark):
    """Two changes at the SAME timestamp: the tiebreak column orders
    them, the earlier one gets a zero-length interval."""
    from feast_hive_spark.plans.asof import scd2_build

    rows = [
        (1, _ts("2024-01-01"), 1, "a"),
        (1, _ts("2024-01-05"), 2, "b"),
        (1, _ts("2024-01-05"), 3, "c"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "attr"])
    out = (
        scd2_build(df, ["k"], "ts", ["attr"], tiebreak_col="eid")
        .toPandas()
        .sort_values(["valid_from", "attr"])
    )
    assert out.attr.tolist() == ["a", "b", "c"]
    b = out[out.attr == "b"].iloc[0]
    assert b.valid_from == b.valid_to == _ts("2024-01-05")
    assert out[out.attr == "c"].iloc[0].is_current


def test_asof_nearest_matches_pandas(spark):
    """Nearest-direction as-of vs pandas merge_asof on a fixture with
    backward-closer, forward-closer, exact-tie, and no-backward
    probes."""
    import pandas as pd

    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-10"), 10.0, 1),
            (1, _ts("2024-01-20"), 20.0, 2),
            (2, _ts("2024-01-05"), 5.0, 3),
        ],
        ["k", "ts", "v", "eid"],
    )
    probes = spark.createDataFrame(
        [
            (1, _ts("2024-01-11")),  # backward closer
            (1, _ts("2024-01-19")),  # forward closer
            (1, _ts("2024-01-15")),  # exact tie -> backward wins
            (2, _ts("2024-01-01")),  # no backward -> forward
            (3, _ts("2024-01-01")),  # no events at all -> NULLs
        ],
        ["k", "pts"],
    )
    from feast_hive_spark.plans.asof import asof_nearest_join

    got = (
        asof_nearest_join(probes, events, ["k"], "pts", "ts", ["v"], "eid")
        .toPandas()
        .sort_values(["k", "probe_ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        probes.toPandas().rename(columns={"pts": "probe_ts"})
        .sort_values("probe_ts"),
        events.toPandas().sort_values("ts"),
        left_on="probe_ts",
        right_on="ts",
        by="k",
        direction="nearest",
    ).sort_values(["k", "probe_ts"]).reset_index(drop=True)
    assert got.nearest_ts.tolist() == exp.ts.tolist()
    for g, e in zip(got.nearest_v.tolist(), exp.v.tolist()):
        assert (pd.isna(g) and pd.isna(e)) or g == e


def test_asof_nearest_null_value_row_consistent(spark):
    """A NULL value column in the NEAREST source row must stay NULL in
    the output (matched-row semantics, like pandas merge_asof) — not
    silently fall back to an older row's non-NULL value while
    nearest_ts reports the nearest row.  Regression for the stitched
    per-column IGNORE-NULLS construction."""
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-10"), 10.0, 1),
            (1, _ts("2024-01-20"), None, 2),  # nearest to the probe, NULL v
        ],
        "k int, ts timestamp, v double, eid int",
    )
    probes = spark.createDataFrame(
        [(1, _ts("2024-01-19"))], "k int, pts timestamp"
    )
    from feast_hive_spark.plans.asof import asof_nearest_join

    row = asof_nearest_join(
        probes, events, ["k"], "pts", "ts", ["v"], "eid"
    ).collect()[0]
    assert row.nearest_ts == _ts("2024-01-20")
    assert row.nearest_v is None  # NOT 10.0 stitched from the older row


def test_apply_cdc_semantics(spark):
    """MERGE semantics: later upsert replaces snapshot, delete removes
    the key, key untouched by changes survives, insert-only key
    appears, and a delete followed by a later upsert resurrects."""
    from feast_hive_spark.plans.asof import apply_cdc

    snapshot = spark.createDataFrame(
        [(1, _ts("2024-01-01"), 10.0), (2, _ts("2024-01-01"), 20.0),
         (3, _ts("2024-01-01"), 30.0), (5, _ts("2024-01-01"), 50.0)],
        ["k", "ts", "v"],
    )
    changes = spark.createDataFrame(
        [
            (1, _ts("2024-01-10"), 11.0, "upsert", 1),   # replaces
            (2, _ts("2024-01-10"), 0.0, "delete", 2),    # removes
            (4, _ts("2024-01-10"), 40.0, "upsert", 3),   # new key
            (5, _ts("2024-01-10"), 0.0, "delete", 4),    # delete...
            (5, _ts("2024-01-11"), 55.0, "upsert", 5),   # ...then back
        ],
        ["k", "ts", "v", "op", "eid"],
    )
    got = {
        r.k: (r.v, r.ts)
        for r in apply_cdc(
            snapshot, changes, ["k"], "ts", "op", ["v"], "eid"
        ).collect()
    }
    assert got == {
        1: (11.0, _ts("2024-01-10")),
        3: (30.0, _ts("2024-01-01")),
        4: (40.0, _ts("2024-01-10")),
        5: (55.0, _ts("2024-01-11")),
    }


def test_apply_cdc_same_ts_change_beats_snapshot(spark):
    """A change at exactly the snapshot timestamp wins (src ordering),
    and among simultaneous changes the tiebreak decides."""
    from feast_hive_spark.plans.asof import apply_cdc

    t = _ts("2024-01-05")
    snapshot = spark.createDataFrame([(1, t, 1.0)], ["k", "ts", "v"])
    changes = spark.createDataFrame(
        [(1, t, 2.0, "upsert", 1), (1, t, 3.0, "upsert", 9)],
        ["k", "ts", "v", "op", "eid"],
    )
    [r] = apply_cdc(snapshot, changes, ["k"], "ts", "op", ["v"], "eid").collect()
    assert r.v == 3.0  # highest tiebreak among coincident changes


def test_bitemporal_hides_late_arrivals(spark):
    """A version valid at probe time but created AFTER the knowledge
    cutoff must not serve; the best VISIBLE version serves instead;
    ties on (event_ts, created_ts) break on the tiebreak column."""
    from datetime import datetime

    from feast_hive_spark.plans.asof import bitemporal_asof_join

    T = datetime(2024, 1, 10, 12, 0, 0)
    K = datetime(2024, 1, 10, 12, 30, 0)
    probes = spark.createDataFrame(
        [(1, 7, T, K), (2, 8, T, K)],
        "probe_id long, k long, pts timestamp, kts timestamp",
    )
    src = spark.createDataFrame(
        [
            # key 7: newest version created too late -> older one wins
            (7, datetime(2024, 1, 10, 11, 0), datetime(2024, 1, 10, 13, 0),
             100.0, 1),
            (7, datetime(2024, 1, 10, 10, 0), datetime(2024, 1, 10, 10, 5),
             50.0, 2),
            # key 7: same (event, created) as the winner, higher tb wins
            (7, datetime(2024, 1, 10, 10, 0), datetime(2024, 1, 10, 10, 5),
             55.0, 3),
            # key 8: nothing known by K -> NULLs
            (8, datetime(2024, 1, 10, 11, 0), datetime(2024, 1, 11, 0, 0),
             9.0, 4),
        ],
        "k long, ets timestamp, cts timestamp, v double, tb long",
    )
    out = {
        r.probe_id: r
        for r in bitemporal_asof_join(
            probes, src, ["k"], "probe_id", "pts", "kts", "ets", "cts",
            ["v"], ttl_seconds=0, tiebreak_col="tb",
        ).collect()
    }
    assert out[1].v == 55.0
    assert out[1].served_created_ts == datetime(2024, 1, 10, 10, 5)
    assert out[2].v is None and out[2].served_event_ts is None
    # with a TTL excluding the 10:00 version, key 7 has nothing visible
    out_ttl = {
        r.probe_id: r
        for r in bitemporal_asof_join(
            probes, src, ["k"], "probe_id", "pts", "kts", "ets", "cts",
            ["v"], ttl_seconds=3600, tiebreak_col="tb",
        ).collect()
    }
    assert out_ttl[1].v is None


def test_bitemporal_reserved_value_col_names(spark):
    """r13 review: a value column legally named 'ets'/'cts' must not
    shadow the reserved served-timestamp struct fields."""
    from datetime import datetime

    from feast_hive_spark.plans.asof import bitemporal_asof_join

    T = datetime(2024, 1, 10, 12, 0, 0)
    probes = spark.createDataFrame(
        [(1, 7, T, T)],
        "probe_id long, k long, pts timestamp, kts timestamp",
    )
    src = spark.createDataFrame(
        [(7, datetime(2024, 1, 10, 10, 0), datetime(2024, 1, 10, 10, 5),
          42.0, 1)],
        "k long, e timestamp, c timestamp, ets double, tb long",
    )
    row = bitemporal_asof_join(
        probes, src, ["k"], "probe_id", "pts", "kts", "e", "c",
        ["ets"], ttl_seconds=0, tiebreak_col="tb",
    ).collect()[0]
    assert row.ets == 42.0
    assert row.served_event_ts == datetime(2024, 1, 10, 10, 0)
    assert row.served_created_ts == datetime(2024, 1, 10, 10, 5)
