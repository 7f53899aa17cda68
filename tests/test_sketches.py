"""Mergeable-sketch operator tests: the property the 100 TB pattern
rests on is that UNION-of-partial-sketches equals the sketch of the
union — rollups over persisted daily sketches must estimate the same
as a from-scratch sketch over the raw data."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_hive_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def events(spark):
    base = datetime(2024, 3, 1)
    rows = []
    for i in range(5000):
        rows.append(
            {
                "event_type": ["view", "click"][i % 2],
                "ts": base + timedelta(hours=i % 240),  # 10 days
                "user_id": i % 700,  # heavy cross-day overlap
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def test_union_of_daily_sketches_matches_direct_sketch(spark, events):
    daily = SK.hll_daily_sketches(events, ["event_type"], "ts", "user_id")
    rolled = SK.hll_rollup(daily, ["event_type"]).toPandas()
    direct = (
        events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(SK.HLL_LG_K))
            ).alias("direct")
        )
        .toPandas()
    )
    m = rolled.merge(direct, on="event_type")
    # identical sketch parameters + deterministic hash -> identical
    # estimates, not merely close ones
    assert (m.approx_distinct == m.direct).all()
    assert (m.n_buckets == 10).all()


def test_rollup_estimate_within_bound(spark, events):
    daily = SK.hll_daily_sketches(events, ["event_type"], "ts", "user_id")
    rolled = SK.hll_rollup(daily, ["event_type"]).toPandas()
    exact = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
        .toPandas()
    )
    m = rolled.merge(exact, on="event_type")
    rel_err = (m.approx_distinct - m.n_exact).abs() / m.n_exact
    assert (rel_err <= 3 * SK.HLL_RSE).all()
