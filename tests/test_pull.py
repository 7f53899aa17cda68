"""pull_latest tests (reference entry point 2, hive.py:143-190) on the
driver's events table + the reference's 5-row correctness fixture
(FIXTURES.md F4, feast_tests_funcs.py:370-390)."""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from feast_hive_spark.plans.pull import DUMMY_ENTITY_ID, pull_latest
from feast_hive_spark.sources.tables import read_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def test_pull_latest_per_user(spark, events):
    start, end = datetime(2020, 1, 1), datetime(2030, 1, 1)
    got = pull_latest(
        events,
        join_key_columns=["user_id"],
        feature_name_columns=["value", "event_type"],
        event_timestamp_column="ts",
        created_timestamp_column=None,
        start_date=start,
        end_date=end,
        tiebreak_columns=["event_id"],
    ).toPandas()

    pdf = events.toPandas()
    pdf = pdf[(pdf.ts >= start) & (pdf.ts <= end)]
    expected = (
        pdf.sort_values(["ts", "event_id"], ascending=False)
        .groupby("user_id", as_index=False)
        .first()
    )
    assert len(got) == len(expected)
    merged = got.merge(expected, on="user_id", suffixes=("", "_exp"))
    assert (merged.ts == merged.ts_exp).all()
    assert (merged.value == merged.value_exp).all()


def test_pull_latest_time_window_filter(spark, events):
    pdf = events.toPandas()
    mid = pdf.ts.quantile(0.5)
    start, end = pdf.ts.min(), mid
    got = pull_latest(
        events,
        ["user_id"],
        ["value"],
        "ts",
        None,
        start.to_pydatetime(),
        end.to_pydatetime(),
    ).toPandas()
    assert (got.ts <= end).all() and (got.ts >= start).all()


def test_pull_latest_correctness_fixture(spark):
    """F4 semantics probes: materialize [now-5h, now-2h] => driver 1 ->
    0.3, driver 2 absent (its only row is outside), driver 3 -> 4."""
    now = datetime(2024, 5, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        {
            "driver_id": [1, 2, 1, 3, 3],
            "value": [0.1, None, 0.3, 4.0, 5.0],
            "ts": [
                now - timedelta(hours=4),
                now,
                now - timedelta(hours=3),
                now - timedelta(hours=4),
                now - timedelta(hours=1),
            ],
            "created_ts": [now] * 5,
        }
    )
    df = spark.createDataFrame(pdf)
    got = pull_latest(
        df,
        ["driver_id"],
        ["value"],
        "ts",
        "created_ts",
        now - timedelta(hours=5),
        now - timedelta(hours=2),
    ).toPandas()
    vals = got.set_index("driver_id")["value"]
    assert vals[1] == 0.3
    assert vals[3] == 4.0
    assert 2 not in vals.index


def test_pull_latest_dummy_entity(spark, events):
    start, end = datetime(2020, 1, 1), datetime(2030, 1, 1)
    got = pull_latest(
        events,
        [],
        ["value"],
        "ts",
        None,
        start,
        end,
        tiebreak_columns=["event_id"],
    ).toPandas()
    assert len(got) == 1
    assert DUMMY_ENTITY_ID in got.columns
    pdf = events.toPandas()
    assert got.ts.iloc[0] == pdf.ts.max()


def test_pull_latest_created_equals_event_ts(spark, events):
    """created_timestamp_column == event_timestamp_column must not emit
    a duplicate output column (reference guard, hive.py:164)."""
    got = pull_latest(
        events,
        join_key_columns=["user_id"],
        feature_name_columns=["value"],
        event_timestamp_column="ts",
        created_timestamp_column="ts",
        start_date=datetime(2020, 1, 1),
        end_date=datetime(2030, 1, 1),
        tiebreak_columns=["event_id"],
    )
    assert got.columns.count("ts") == 1
    got.limit(5).collect()  # resolvable end-to-end
