"""Property-based PIT test (SURVEY §5 port plan item d): random
entity/feature timestamp layouts, engine output must equal the pure-
Python as-of oracle for every generated case."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feast_hive_spark.plans.pit import FeatureView, get_historical_features

BASE = datetime(2024, 6, 1, 12, 0, 0)


@st.composite
def pit_case(draw):
    n_keys = draw(st.integers(1, 3))
    n_entities = draw(st.integers(1, 6))
    n_features = draw(st.integers(0, 10))
    ttl = draw(st.sampled_from([0, 3600, 86400]))
    entity = {
        "k": [draw(st.integers(1, n_keys)) for _ in range(n_entities)],
        "event_timestamp": [
            BASE + timedelta(minutes=draw(st.integers(-300, 300)))
            for _ in range(n_entities)
        ],
        "row_id": list(range(n_entities)),
    }
    feature = {
        "k": [draw(st.integers(1, n_keys)) for _ in range(n_features)],
        "ts": [
            BASE + timedelta(minutes=draw(st.integers(-3000, 300)))
            for _ in range(n_features)
        ],
        "created": [
            BASE + timedelta(minutes=draw(st.integers(-100, 100)))
            for _ in range(n_features)
        ],
        "fid": list(range(n_features)),
        "v": [float(i) for i in range(n_features)],
    }
    return pd.DataFrame(entity), pd.DataFrame(feature), ttl


def oracle(entity_pdf, feature_pdf, ttl):
    out = []
    feats = feature_pdf.to_dict("records")
    for er in entity_pdf.itertuples():
        best = None
        lower = (
            er.event_timestamp - timedelta(seconds=ttl) if ttl else None
        )
        for fr in feats:
            if fr["k"] != er.k or fr["ts"] > er.event_timestamp:
                continue
            if lower is not None and fr["ts"] < lower:
                continue
            cand = (fr["ts"], fr["created"], fr["fid"])
            if best is None or cand > best[0]:
                best = (cand, fr["v"])
        out.append(best[1] if best else None)
    return out


@pytest.mark.slow
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=pit_case())
def test_pit_equals_python_oracle(spark, case):
    entity_pdf, feature_pdf, ttl = case
    if feature_pdf.empty:
        feature_pdf = pd.DataFrame(
            {
                "k": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "created": pd.Series([], dtype="datetime64[us]"),
                "fid": pd.Series([], dtype="int64"),
                "v": pd.Series([], dtype="float64"),
            }
        )
    fv = FeatureView(
        name="fv",
        source=spark.createDataFrame(
            feature_pdf,
            schema="k long, ts timestamp, created timestamp, fid long, v double",
        ),
        join_keys=["k"],
        features=["v"],
        ttl_seconds=ttl,
        event_timestamp_column="ts",
        created_timestamp_column="created",
    )
    got = (
        get_historical_features(
            spark, entity_pdf, [fv], tiebreak_columns=["fid"]
        )
        .to_df()
        .sort_values("row_id")["v"]
        .tolist()
    )
    expected = oracle(entity_pdf, feature_pdf, ttl)
    norm = lambda xs: [None if pd.isna(x) else x for x in xs]
    assert norm(got) == norm(expected)
