"""Property-based pull_latest test: random key/timestamp layouts,
engine output must equal a pure-pandas latest-per-key oracle."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feast_hive_spark.plans.pull import pull_latest

BASE = datetime(2024, 6, 1, 12, 0, 0)


@st.composite
def pull_case(draw):
    n = draw(st.integers(0, 12))
    rows = {
        "k": [draw(st.integers(1, 3)) for _ in range(n)],
        "ts": [
            BASE + timedelta(minutes=draw(st.integers(-200, 200)))
            for _ in range(n)
        ],
        "created": [
            BASE + timedelta(minutes=draw(st.integers(-50, 50)))
            for _ in range(n)
        ],
        "rid": list(range(n)),
        "v": [float(i) for i in range(n)],
    }
    lo = BASE + timedelta(minutes=draw(st.integers(-200, 0)))
    hi = lo + timedelta(minutes=draw(st.integers(0, 250)))
    return pd.DataFrame(rows), lo, hi


@pytest.mark.slow
@settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(case=pull_case())
def test_pull_latest_equals_pandas_oracle(spark, case):
    pdf, lo, hi = case
    if pdf.empty:
        pdf = pd.DataFrame(
            {
                "k": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "created": pd.Series([], dtype="datetime64[us]"),
                "rid": pd.Series([], dtype="int64"),
                "v": pd.Series([], dtype="float64"),
            }
        )
    df = spark.createDataFrame(
        pdf, schema="k long, ts timestamp, created timestamp, rid long, v double"
    )
    got = (
        pull_latest(
            df, ["k"], ["v"], "ts", "created", lo, hi, tiebreak_columns=["rid"]
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    inr = pdf[(pdf.ts >= lo) & (pdf.ts <= hi)]
    exp_rows = []
    for k, grp in inr.groupby("k"):
        best = grp.sort_values(
            ["ts", "created", "rid"], ascending=False
        ).iloc[0]
        exp_rows.append((k, best.v))
    exp = pd.DataFrame(exp_rows, columns=["k", "v"]).sort_values("k").reset_index(
        drop=True
    )
    assert got.k.tolist() == exp.k.tolist()
    assert got.v.tolist() == exp.v.tolist()
