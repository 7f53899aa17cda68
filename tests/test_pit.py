"""PIT as-of join tests against a pure-Python oracle.

The oracle reimplements the reference's golden oracle
(``find_asof_record``, tests/feast_tests_funcs.py:263-269;
``get_expected_training_df``, :279-367): per entity row, linear scan
keeping the record with max event_ts in [entity_ts - ttl, entity_ts]
matching the key; missing -> NaN/None; comparison row/column-sorted,
dtype-lenient (test_all.py:369-382).
"""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from feast_hive_spark.plans.pit import (
    EntityDFMissingColumnsError,
    EntityTimestampInferenceException,
    FeatureView,
    get_historical_features,
    infer_event_timestamp_col,
)


def find_asof_record(feature_rows, keys, entity_ts, ttl, event_col="ts", created_col=None):
    """Pure-Python as-of oracle (engine-independent)."""
    best = None
    lower = entity_ts - timedelta(seconds=ttl) if ttl else None
    for r in feature_rows:
        if any(r[k] != v for k, v in keys.items()):
            continue
        ts = r[event_col]
        if ts > entity_ts:
            continue
        if lower is not None and ts < lower:
            continue
        if best is None:
            best = r
            continue
        if ts > best[event_col]:
            best = r
        elif ts == best[event_col] and created_col and r[created_col] > best[created_col]:
            best = r
    return best


def _sorted(pdf):
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(by=cols)
        .reset_index(drop=True)
    )


def assert_frames_match(got, expected):
    got, expected = _sorted(got), _sorted(expected)
    assert list(got.columns) == list(expected.columns)
    assert len(got) == len(expected)
    for c in got.columns:
        g, e = got[c], expected[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            g = pd.to_numeric(g, errors="coerce")
            e = pd.to_numeric(e, errors="coerce")
            assert np.allclose(g.fillna(-9e18), e.fillna(-9e18), rtol=1e-9), c
        else:
            assert g.astype(str).tolist() == e.astype(str).tolist(), c


@pytest.fixture(scope="module")
def tiny(spark):
    base = datetime(2024, 1, 10, 12, 0, 0)
    entity_pdf = pd.DataFrame(
        {
            "driver_id": [1, 1, 2, 3, 1],
            "event_timestamp": [
                base,
                base + timedelta(hours=1),
                base,
                base,
                base,  # duplicate entity row — must be preserved
            ],
            "order_id": [100, 101, 102, 103, 104],
        }
    )
    feature_pdf = pd.DataFrame(
        {
            "driver_id": [1, 1, 1, 2, 2, 9],
            "ts": [
                base - timedelta(minutes=30),
                base - timedelta(minutes=10),
                base + timedelta(minutes=30),  # between the two entity ts
                base - timedelta(days=2),  # outside 1-day ttl for entity at base
                base - timedelta(minutes=5),
                base,
            ],
            "created": [
                base - timedelta(minutes=30),
                base - timedelta(minutes=10),
                base + timedelta(minutes=30),
                base - timedelta(days=2),
                base - timedelta(minutes=5),
                base,
            ],
            "conv_rate": [0.1, 0.2, 0.3, 0.4, 0.5, 0.9],
        }
    )
    return entity_pdf, feature_pdf


def _expected(entity_pdf, feature_pdf, ttl, full=False, fv_name="driver_stats"):
    rows = feature_pdf.to_dict("records")
    out = []
    feat_col = f"{fv_name}__conv_rate" if full else "conv_rate"
    for _, er in entity_pdf.iterrows():
        rec = find_asof_record(
            rows,
            {"driver_id": er.driver_id},
            er.event_timestamp,
            ttl,
            created_col="created",
        )
        out.append(
            {
                "driver_id": er.driver_id,
                "event_timestamp": er.event_timestamp,
                "order_id": er.order_id,
                feat_col: rec["conv_rate"] if rec else np.nan,
            }
        )
    return pd.DataFrame(out)


@pytest.mark.parametrize("full_feature_names", [False, True])
@pytest.mark.parametrize("ttl", [0, 86400])
def test_pit_matches_oracle(spark, tiny, ttl, full_feature_names):
    entity_pdf, feature_pdf = tiny
    fv = FeatureView(
        name="driver_stats",
        source=spark.createDataFrame(feature_pdf),
        join_keys=["driver_id"],
        features=["conv_rate"],
        ttl_seconds=ttl,
        event_timestamp_column="ts",
        created_timestamp_column="created",
    )
    job = get_historical_features(
        spark, entity_pdf, [fv], full_feature_names=full_feature_names
    )
    got = job.to_df()
    expected = _expected(entity_pdf, feature_pdf, ttl, full=full_feature_names)
    assert_frames_match(got, expected)


def test_pit_dedup_by_created_ts(spark):
    """Two rows at the same event_ts: the one with the larger
    created_ts must win (reference dedup step, hive.py:645-654)."""
    base = datetime(2024, 1, 10, 12, 0, 0)
    entity_pdf = pd.DataFrame({"k": [1], "event_timestamp": [base]})
    feature_pdf = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": [base - timedelta(hours=1)] * 2,
            "created": [base - timedelta(hours=1), base],
            "v": [111.0, 222.0],
        }
    )
    fv = FeatureView(
        name="fv",
        source=spark.createDataFrame(feature_pdf),
        join_keys=["k"],
        features=["v"],
        event_timestamp_column="ts",
        created_timestamp_column="created",
    )
    got = get_historical_features(spark, entity_pdf, [fv]).to_df()
    assert got["v"].tolist() == [222.0]


def test_pit_multiple_feature_views(spark, tiny):
    entity_pdf, feature_pdf = tiny
    fv1 = FeatureView(
        name="a",
        source=spark.createDataFrame(feature_pdf),
        join_keys=["driver_id"],
        features=["conv_rate"],
        event_timestamp_column="ts",
        created_timestamp_column="created",
    )
    other = feature_pdf.assign(acc_rate=feature_pdf.conv_rate * 2)
    fv2 = FeatureView(
        name="b",
        source=spark.createDataFrame(other),
        join_keys=["driver_id"],
        features=["acc_rate"],
        ttl_seconds=3600,
        event_timestamp_column="ts",
        created_timestamp_column="created",
    )
    got = get_historical_features(
        spark, entity_pdf, [fv1, fv2], full_feature_names=True
    ).to_df()
    assert "a__conv_rate" in got.columns and "b__acc_rate" in got.columns
    assert len(got) == len(entity_pdf)


def test_pit_mixed_tz_entity_df(spark):
    """4-flavor tz fixture (feast_tests_funcs.py:15-30): naive, UTC,
    fixed offset, US/Pacific in one column -> normalized to naive UTC."""
    base = pd.Timestamp("2024-01-10 12:00:00")
    entity_pdf = pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "event_timestamp": [
                base,
                base.tz_localize("UTC"),
                base.tz_localize("UTC").tz_convert("+01:00"),
                base.tz_localize("UTC").tz_convert("US/Pacific"),
            ],
            "row": [0, 1, 2, 3],
        }
    )
    feature_pdf = pd.DataFrame(
        {"k": [1, 2, 3, 4], "ts": [base - pd.Timedelta(hours=1)] * 4, "v": [1.0, 2.0, 3.0, 4.0]}
    )
    fv = FeatureView(
        name="fv",
        source=spark.createDataFrame(feature_pdf),
        join_keys=["k"],
        features=["v"],
        event_timestamp_column="ts",
    )
    got = get_historical_features(spark, entity_pdf, [fv]).to_df()
    # all four flavors represent the same instant -> all match
    assert sorted(got["v"].tolist()) == [1.0, 2.0, 3.0, 4.0]
    assert got["event_timestamp"].nunique() == 1


def test_pit_missing_column_error(spark, tiny):
    entity_pdf, feature_pdf = tiny
    fv = FeatureView(
        name="fv",
        source=spark.createDataFrame(feature_pdf),
        join_keys={"driver_id": "renamed_id"},
        features=["conv_rate"],
        event_timestamp_column="ts",
    )
    with pytest.raises(EntityDFMissingColumnsError):
        get_historical_features(spark, entity_pdf, [fv])


def test_pit_entity_df_as_sql(spark, tiny):
    entity_pdf, feature_pdf = tiny
    spark.createDataFrame(entity_pdf).createOrReplaceTempView("entity_tbl")
    fv = FeatureView(
        name="fv",
        source=spark.createDataFrame(feature_pdf),
        join_keys=["driver_id"],
        features=["conv_rate"],
        event_timestamp_column="ts",
        created_timestamp_column="created",
    )
    got = get_historical_features(
        spark, "SELECT * FROM entity_tbl", [fv]
    ).to_df()
    expected = _expected(entity_pdf, feature_pdf, ttl=0)
    assert_frames_match(got, expected)


def test_pit_entityless_feature_view(spark):
    """Entity-less fv: global latest row as of each entity ts
    (dummy-entity branch, hive.py:543-544)."""
    base = datetime(2024, 1, 10, 12, 0, 0)
    entity_pdf = pd.DataFrame(
        {"event_timestamp": [base, base + timedelta(hours=2)], "row": [1, 2]}
    )
    feature_pdf = pd.DataFrame(
        {
            "ts": [base - timedelta(hours=1), base + timedelta(hours=1)],
            "v": [10.0, 20.0],
        }
    )
    fv = FeatureView(
        name="global",
        source=spark.createDataFrame(feature_pdf),
        join_keys=[],
        features=["v"],
        event_timestamp_column="ts",
    )
    got = get_historical_features(spark, entity_pdf, [fv]).to_df()
    by_row = got.set_index("row")["v"]
    assert by_row[1] == 10.0 and by_row[2] == 20.0


def test_infer_event_timestamp_col(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": [1], "ts_only": [datetime(2024, 1, 1)]})
    )
    assert infer_event_timestamp_col(df) == "ts_only"
    df2 = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises(EntityTimestampInferenceException):
        infer_event_timestamp_col(df2)


def test_to_arrow_consistency(spark, tiny):
    entity_pdf, feature_pdf = tiny
    fv = FeatureView(
        name="fv",
        source=spark.createDataFrame(feature_pdf),
        join_keys=["driver_id"],
        features=["conv_rate"],
        event_timestamp_column="ts",
        created_timestamp_column="created",
    )
    job = get_historical_features(spark, entity_pdf, [fv])
    pdf = job.to_df()
    at = get_historical_features(spark, entity_pdf, [fv]).to_arrow()
    assert at.num_rows == len(pdf)
    assert set(at.column_names) == set(pdf.columns)
    # native toArrow() keeps Spark-schema fidelity: microsecond
    # timestamps, and no pandas dtype mangling on the value columns
    import pyarrow as pa

    # TIMESTAMP (LTZ) arrives as microsecond + explicit UTC (the
    # session zone the engine pins) - no silent unit/zone mangling
    assert at.schema.field("event_timestamp").type == pa.timestamp("us", tz="UTC")
    assert at.schema.field("conv_rate").type == pa.float64()


def test_to_arrow_nullable_int_fidelity(spark):
    """A nullable integer feature must arrive as an Arrow int64 column
    with a null - NOT float64 with NaN (the toPandas() round-trip
    mangling the native path avoids)."""
    import pyarrow as pa

    from feast_hive_spark.retrieval import RetrievalJob

    df = spark.createDataFrame(
        [(1, None), (2, 7)], "k long, v long"
    )
    at = RetrievalJob(df).to_arrow()
    assert at.schema.field("v").type == pa.int64()
    assert at.column("v").null_count == 1


def test_entity_bounds_memo_exact_and_distinct(spark):
    """The bounds memo must reuse ONLY semantically-identical entity
    frames: two different frames get their own bounds, identical
    rebuilds hit the memo (no second job observable via cache list)."""
    import pandas as pd

    from feast_hive_spark.plans import pit as P

    df1 = pd.DataFrame(
        {"user_id": [1, 2], "event_timestamp": pd.to_datetime(["2024-01-01", "2024-02-01"])}
    )
    df2 = pd.DataFrame(
        {"user_id": [1, 2], "event_timestamp": pd.to_datetime(["2023-01-01", "2023-06-01"])}
    )
    s1 = P.entity_df_to_spark(spark, df1)
    s2 = P.entity_df_to_spark(spark, df2)
    b1 = P._entity_bounds(spark, s1, "event_timestamp")
    b2 = P._entity_bounds(spark, s2, "event_timestamp")
    assert b1["mx"].year == 2024 and b2["mx"].year == 2023
    assert b1["cnt"] == b2["cnt"] == 2
    # identical rebuild -> memo hit: cache length unchanged
    n = len(P._BOUNDS_CACHE)
    s1b = P.entity_df_to_spark(spark, df1.copy())
    b1b = P._entity_bounds(spark, s1b, "event_timestamp")
    assert b1b == b1
    assert len(P._BOUNDS_CACHE) == n


def test_plan_cache_hit_and_miss(spark):
    """Prepared-retrieval cache: identical rebuilds return the SAME
    plan object; changing the entity data, the fv spec, or closing the
    job forces a rebuild."""
    import pandas as pd

    from feast_hive_spark.plans import pit as P
    from feast_hive_spark.plans.pit import FeatureView, get_historical_features

    feat = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2],
                "ts": pd.to_datetime(["2024-01-01", "2024-01-05", "2024-01-02"]),
                "v": [10.0, 20.0, 30.0],
            }
        )
    )
    ent = pd.DataFrame(
        {"user_id": [1, 2], "event_timestamp": pd.to_datetime(["2024-01-06", "2024-01-03"])}
    )

    def mkfv(ttl=0):
        return FeatureView(
            name="fv", source=feat, join_keys=["user_id"], features=["v"],
            ttl_seconds=ttl, event_timestamp_column="ts",
        )

    j1 = get_historical_features(spark, ent, [mkfv()])
    d1 = j1.to_spark_df()
    j2 = get_historical_features(spark, ent.copy(), [mkfv()])
    d2 = j2.to_spark_df()
    assert d2 is d1  # memo hit on an identical rebuild
    # different fv spec -> miss
    j3 = get_historical_features(spark, ent, [mkfv(ttl=86400)])
    assert j3.to_spark_df() is not d1
    # different entity data -> miss
    ent2 = ent.assign(event_timestamp=pd.to_datetime(["2024-01-04", "2024-01-03"]))
    j4 = get_historical_features(spark, ent2, [mkfv()])
    assert j4.to_spark_df() is not d1
    # results still correct on the memoized plan
    got = {r["user_id"]: r["v"] for r in d2.collect()}
    assert got == {1: 20.0, 2: 30.0}
    # close() evicts: next identical build is a fresh plan
    j2.close()
    j5 = get_historical_features(spark, ent, [mkfv()])
    assert j5.to_spark_df() is not d1


def test_concurrent_plan_builds_bind_correct_views(spark):
    """The SQL build path overwrites three session-global temp views
    (__pit_sql_*); concurrent plan builds must not interleave the
    bindings (r8 advice — guarded by plans.pit._SQL_VIEW_LOCK). Two
    threads build DIFFERENT retrievals many times; each result must
    reflect its OWN feature table."""
    import threading

    base = datetime(2024, 3, 1, 12, 0, 0)
    entity_pdf = pd.DataFrame(
        {"k": [1, 2], "event_timestamp": [base, base]}
    )

    def make_fv(tag, value):
        feature_pdf = pd.DataFrame(
            {
                "k": [1, 2],
                "ts": [base - timedelta(hours=1)] * 2,
                "v": [value, value + 1.0],
            }
        )
        return FeatureView(
            name=f"fv_{tag}",
            source=spark.createDataFrame(feature_pdf),
            join_keys=["k"],
            features=["v"],
            event_timestamp_column="ts",
        )

    fva, fvb = make_fv("a", 100.0), make_fv("b", 500.0)
    errs = []

    def run(fv, lo):
        try:
            for _ in range(6):
                got = get_historical_features(
                    spark, entity_pdf, [fv], full_feature_names=False
                ).to_df()
                assert sorted(got["v"].tolist()) == [lo, lo + 1.0]
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ta = threading.Thread(target=run, args=(fva, 100.0))
    tb = threading.Thread(target=run, args=(fvb, 500.0))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errs, errs


def test_multi_view_different_key_tuples_single_statement(spark):
    """The r9 whole-retrieval SQL path registers one ekeys view per
    DISTINCT key tuple — two views joining on different entity keys
    must each bind their own dedup table and assemble correctly."""
    base = datetime(2024, 5, 1, 12, 0, 0)
    entity_pdf = pd.DataFrame(
        {
            "user": [1, 1, 2],
            "shop": [10, 20, 10],
            "event_timestamp": [base, base, base + timedelta(hours=1)],
        }
    )
    user_feats = pd.DataFrame(
        {"user": [1, 2], "ts": [base - timedelta(hours=2)] * 2,
         "u_score": [0.5, 0.7]}
    )
    shop_feats = pd.DataFrame(
        {"shop": [10, 20], "ts": [base - timedelta(hours=3)] * 2,
         "s_rank": [3.0, 9.0]}
    )
    fvs = [
        FeatureView(name="u", source=spark.createDataFrame(user_feats),
                    join_keys=["user"], features=["u_score"],
                    event_timestamp_column="ts"),
        FeatureView(name="s", source=spark.createDataFrame(shop_feats),
                    join_keys=["shop"], features=["s_rank"],
                    event_timestamp_column="ts"),
    ]
    got = get_historical_features(
        spark, entity_pdf, fvs, full_feature_names=False
    ).to_df()
    got = got.sort_values(["user", "shop"]).reset_index(drop=True)
    assert got["u_score"].tolist() == [0.5, 0.5, 0.7]
    assert got["s_rank"].tolist() == [3.0, 9.0, 3.0]


def test_small_feature_side_drops_forced_broadcast(spark):
    """r10 auto-policy second arm: with every feature side under the
    size threshold the forced broadcast hints are dropped (Catalyst
    plans freely); with the threshold disabled (0) the explicit
    broadcast shape is restored. Catalyst's own auto-broadcast is
    silenced for the probe so the two regimes are distinguishable at
    test scale."""
    base = datetime(2024, 1, 10, 12, 0)
    entity_pdf = pd.DataFrame(
        {"k": [1, 2], "event_timestamp": [base, base]}
    )
    feature_pdf = pd.DataFrame(
        {"k": [1, 2], "ts": [base - timedelta(hours=1)] * 2,
         "v": [1.0, 2.0]}
    )
    fv = FeatureView(
        name="fv", source=spark.createDataFrame(feature_pdf),
        join_keys=["k"], features=["v"], event_timestamp_column="ts",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        free = get_historical_features(
            spark, entity_pdf, [fv], plan_cache=False
        ).to_spark_df()
        forced = get_historical_features(
            spark, entity_pdf, [fv], plan_cache=False,
            shuffle_small_features_bytes=0,
        ).to_spark_df()
        free_plan = free._jdf.queryExecution().executedPlan().toString()
        forced_plan = (
            forced._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in free_plan
        assert "BroadcastHashJoin" in forced_plan
        # both physical shapes return identical results
        a = free.toPandas().sort_values("k").reset_index(drop=True)
        b = forced.toPandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                      b[sorted(b.columns)])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_duplicate_output_names_fall_back_to_chain(spark):
    """ADVICE r9 #3: two views emitting the SAME output feature name
    under full_feature_names=False used to fail the one-statement SQL
    assembly with AMBIGUOUS_REFERENCE at the second nesting level.
    Collisions now route to the DataFrame chain, which carries
    duplicate columns positionally (the pre-r9 behavior)."""
    base = datetime(2024, 1, 10, 12, 0)
    entity_pdf = pd.DataFrame(
        {"k": [1, 2], "event_timestamp": [base, base]}
    )
    f1 = pd.DataFrame(
        {"k": [1, 2], "ts": [base - timedelta(hours=1)] * 2,
         "score": [1.0, 2.0]}
    )
    f2 = pd.DataFrame(
        {"k": [1, 2], "ts": [base - timedelta(hours=1)] * 2,
         "score": [10.0, 20.0]}
    )
    fvs = [
        FeatureView(name="a", source=spark.createDataFrame(f1),
                    join_keys=["k"], features=["score"],
                    event_timestamp_column="ts"),
        FeatureView(name="b", source=spark.createDataFrame(f2),
                    join_keys=["k"], features=["score"],
                    event_timestamp_column="ts"),
    ]
    got = get_historical_features(
        spark, entity_pdf, fvs, full_feature_names=False,
        plan_cache=False,
    ).to_df()
    assert list(got.columns).count("score") == 2
    by_k = got.sort_values("k").reset_index(drop=True)
    # positional: first 'score' from view a, second from view b
    scores = by_k.loc[:, by_k.columns == "score"]
    assert scores.iloc[:, 0].tolist() == [1.0, 2.0]
    assert scores.iloc[:, 1].tolist() == [10.0, 20.0]
    # and full_feature_names=True keeps the one-statement path working
    named = get_historical_features(
        spark, entity_pdf, fvs, full_feature_names=True,
        plan_cache=False,
    ).to_df()
    assert {"a__score", "b__score"} <= set(named.columns)
