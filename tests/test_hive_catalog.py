"""Hive-metastore catalog parity: the reference's S1 source is a
*metastore* table (hive_source.py:224-237, get_table_schema at :235).
These tests exercise a real catalog round trip — saveAsTable into an
embedded Derby metastore, then TableSource("db.tbl") through schema
introspection and the PIT join end-to-end."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_hive_spark.plans.pit import FeatureView, get_historical_features
from feast_hive_spark.sources.source import (
    DataSourceNotFoundException,
    TableSource,
    source_from_json,
)

DB = "fhs_cat_test"


@pytest.fixture(scope="module")
def feature_table(spark):
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    now = datetime(2024, 3, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        {
            "driver_id": [1001, 1001, 1002, 1003],
            "conv_rate": [0.1, 0.5, 0.7, 0.9],
            "ts": [
                now - timedelta(hours=5),
                now - timedelta(hours=1),
                now - timedelta(hours=2),
                now - timedelta(hours=3),
            ],
            "created": [now] * 4,
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").saveAsTable(
        f"{DB}.driver_stats"
    )
    yield f"{DB}.driver_stats", now
    spark.sql(f"DROP TABLE IF EXISTS {DB}.driver_stats")
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def test_metastore_schema_introspection(spark, feature_table):
    table, _ = feature_table
    src = TableSource(table, event_timestamp_column="ts",
                      created_timestamp_column="created")
    cols = {k: v.upper() for k, v in src.get_table_column_names_and_types(spark)}
    assert cols["driver_id"] == "BIGINT"
    assert cols["conv_rate"] == "DOUBLE"
    assert cols["ts"].startswith("TIMESTAMP")
    src.validate(spark)  # must not raise


def test_metastore_missing_table_raises(spark):
    src = TableSource(f"{DB}_nope.missing_tbl")
    with pytest.raises(DataSourceNotFoundException):
        src.validate(spark)


def test_metastore_source_json_roundtrip(spark, feature_table):
    table, _ = feature_table
    src = TableSource(table, event_timestamp_column="ts")
    back = source_from_json(src.to_json())
    assert back == src
    assert back.to_df(spark).count() == 4


def test_pit_against_metastore_table(spark, feature_table):
    """saveAsTable -> TableSource("db.tbl") -> PIT as-of join, the
    reference's tests/test_all.py:132-185 shape against a real
    catalog."""
    table, now = feature_table
    src = TableSource(
        table, event_timestamp_column="ts", created_timestamp_column="created"
    )
    fv = FeatureView(
        name="driver_stats",
        source=src,
        join_keys=["driver_id"],
        features=["conv_rate"],
        ttl_seconds=0,
        )
    entity_df = pd.DataFrame(
        {
            "driver_id": [1001, 1002, 1004],
            "event_timestamp": [now, now - timedelta(hours=3), now],
        }
    )
    got = (
        get_historical_features(spark, entity_df, [fv])
        .to_df()
        .sort_values("driver_id")
        .reset_index(drop=True)
    )
    # 1001: latest row at/before now -> 0.5; 1002: its only row is 2h
    # before now but AFTER the entity ts (now-3h) -> miss (NaN);
    # 1004: unknown driver -> NaN
    assert got.driver_id.tolist() == [1001, 1002, 1004]
    assert got.conv_rate.iloc[0] == 0.5
    assert pd.isna(got.conv_rate.iloc[1])
    assert pd.isna(got.conv_rate.iloc[2])


def test_bucketed_tables_colocated_join(spark, sf_dir):
    """Bucketed catalog tables co-locate the join: writing both fact
    tables bucketed by the join key into the metastore lets the
    sort-merge join run with NO Exchange on either side - the
    pre-shuffled layout every repeated 100 TB fact-fact join should
    use. (spark.sql.sources.v2.bucketing / bucketed scan is on by
    default for the v1 saveAsTable path.)"""
    from feast_hive_spark.sources.tables import read_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}_bkt")
    try:
        read_table(spark, sf_dir, "orders").write.mode("overwrite").bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").saveAsTable(f"{DB}_bkt.orders_b")
        read_table(spark, sf_dir, "lineitem").write.mode("overwrite").bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").saveAsTable(f"{DB}_bkt.lineitem_b")

        o = spark.table(f"{DB}_bkt.orders_b")
        li = spark.table(f"{DB}_bkt.lineitem_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        # at test scale the optimizer would broadcast; disable it so
        # the plan shows the co-located SMJ a fact-fact join takes
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # the join itself consumes the bucketed layout - no shuffle
        # below the join (the aggregate above it may still exchange)
        smj_idx = plan.find("SortMergeJoin")
        below_join = plan[smj_idx:]
        assert "Exchange hashpartitioning" not in below_join, below_join[:500]

        # and the result is still right
        expected = (
            read_table(spark, sf_dir, "lineitem")
            .join(
                read_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .count()
            .toPandas()
            .sort_values("o_orderstatus")
            .reset_index(drop=True)
        )
        got = joined.toPandas().sort_values("o_orderstatus").reset_index(drop=True)
        assert got.equals(expected)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {DB}_bkt CASCADE")
