"""SparkOfflineStore facade tests — the reference-parity public API
(offline/online consistency shape from feast_tests_funcs.py:451-501)."""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from feast_hive_spark.plans.pit import FeatureView
from feast_hive_spark.sources import TableSource
from feast_hive_spark.store import SparkOfflineStore, SparkOfflineStoreConfig


@pytest.fixture(scope="module")
def config():
    return SparkOfflineStoreConfig(app_name="feast_hive_spark_tests")


def test_pull_latest_via_store(spark, config):
    """F4 consistency probes through the public API: materialize
    [now-5h, now-2h] => driver 1 -> 0.3, driver 2 absent, driver 3 -> 4;
    then the incremental window picks driver 3 -> 5."""
    now = datetime(2024, 5, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        {
            "driver_id": [1, 2, 1, 3, 3],
            "value": [0.1, None, 0.3, 4.0, 5.0],
            "ts_1": [
                now - timedelta(hours=4),
                now,
                now - timedelta(hours=3),
                now - timedelta(hours=4),
                now - timedelta(hours=1),
            ],
            "created_ts": [now] * 5,
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("f4_fixture")
    src = TableSource(
        "f4_fixture",
        event_timestamp_column="ts",
        created_timestamp_column="created_ts",
        field_mapping={"ts_1": "ts", "id": "driver_id"},
    )
    job = SparkOfflineStore.pull_latest_from_table_or_query(
        config,
        src,
        ["driver_id"],
        ["value"],
        "ts",
        "created_ts",
        now - timedelta(hours=5),
        now - timedelta(hours=2),
    )
    vals = job.to_df().set_index("driver_id")["value"]
    assert vals[1] == 0.3 and vals[3] == 4.0 and 2 not in vals.index

    incr = SparkOfflineStore.pull_latest_from_table_or_query(
        config,
        src,
        ["driver_id"],
        ["value"],
        "ts",
        "created_ts",
        now - timedelta(hours=2),
        now,
    ).to_df()
    assert incr.set_index("driver_id")["value"][3] == 5.0


def test_get_historical_features_via_store(spark, config):
    base = datetime(2024, 1, 10, 12, 0)
    entity_pdf = pd.DataFrame(
        {"driver_id": [1, 2], "event_timestamp": [base, base]}
    )
    feat = pd.DataFrame(
        {
            "driver_id": [1, 2],
            "ts": [base - timedelta(hours=1)] * 2,
            "conv_rate": [0.5, 0.7],
        }
    )
    spark.createDataFrame(feat).createOrReplaceTempView("driver_stats_tbl")
    fv = FeatureView(
        name="driver_stats",
        source=TableSource("driver_stats_tbl", event_timestamp_column="ts"),
        join_keys=["driver_id"],
        features=["conv_rate"],
        ttl_seconds=7200,
    )
    job = SparkOfflineStore.get_historical_features(
        config, [fv], entity_pdf, full_feature_names=True
    )
    out = job.to_df().set_index("driver_id")
    assert out.loc[1, "driver_stats__conv_rate"] == 0.5
    assert out.loc[2, "driver_stats__conv_rate"] == 0.7
