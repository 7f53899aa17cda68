"""Salted-join utility: result parity with the plain join, salt on the
shuffle key in the plan."""

import pandas as pd
from pyspark.sql import functions as F

from feast_hive_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark):
    # one pathologically hot key (0) + a tail
    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [0] * 5000 + list(range(1, 101)),
                "v": list(range(5100)),
            }
        )
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": list(range(101)), "name": [f"n{i}" for i in range(101)]})
    )
    plain = (
        facts.join(dim, "k")
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        salted_join(facts, dim, ["k"], salt=8)
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)

    # the join key in the physical plan must include the salt column
    plan = (
        salted_join(facts, dim, ["k"], salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan


def test_salted_left_join_preserves_unmatched(spark):
    facts = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 99], "v": [1.0, 2.0, 3.0]})
    )
    dim = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "name": ["a", "b"]}))
    got = (
        salted_join(facts, dim, ["k"], salt=4, how="left")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.k.tolist() == [1, 2, 99]
    assert pd.isna(got.name.iloc[2])


def test_heavy_hitters_exact_on_heavy_tail(spark):
    """Two-pass detection must equal the exact HAVING query on a
    heavy-tailed fixture: few hot values + a long tail of singletons
    (the regime the operator exists for)."""
    import pandas as pd

    from feast_hive_spark.operators.skew import heavy_hitters

    rows = []
    rid = 0
    for v, n in [("hot1", 500), ("hot2", 120), ("warm", 99)]:
        for _ in range(n):
            rows.append((rid, v)); rid += 1
    for i in range(2000):  # singleton tail
        rows.append((rid, f"tail{i}")); rid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["rid", "val"])
    )
    got = {
        (r.val, r.n)
        for r in heavy_hitters(df, "val", "rid", min_count=100).collect()
    }
    assert got == {("hot1", 500), ("hot2", 120)}  # warm=99 excluded


def test_key_skew_report_shares(spark):
    """Top-N heaviest keys with exact shares; the whale dominates."""
    import pandas as pd

    from feast_hive_spark.operators.skew import key_skew_report

    rows = [(i, "whale" if i % 2 == 0 else f"k{i % 7}") for i in range(1000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rid", "key"]))
    rep = (
        key_skew_report(df, ["key"], top_n=3)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert rep.key_value.tolist()[0] == "whale"
    assert rep.n_rows.tolist()[0] == 500
    assert rep.share_bp.tolist()[0] == 5000
    assert (rep.total_rows == 1000).all() and (rep.n_keys == 8).all()
    assert rep.top_share_bp.iloc[0] == (500 + 72 + 72) * 10000 // 1000


def test_band_join_exact_vs_theta(spark):
    """Bucketed band join must equal the naive theta join, including
    negative values and pairs straddling bucket boundaries."""
    import numpy as np
    import pandas as pd

    from feast_hive_spark.operators.skew import band_join

    rng = np.random.default_rng(8)
    vals = np.round(rng.uniform(-10, 10, 400), 3)
    a = spark.createDataFrame(
        pd.DataFrame({"ka": range(400), "va": vals})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"kb": range(400), "vb": np.roll(vals, 13) + 0.004})
    )
    eps = 0.01
    got = {
        (r["ka"], r["kb"])
        for r in band_join(a, b, "va", "vb", eps).collect()
    }
    exp = {
        (i, j)
        for i in range(400)
        for j in range(400)
        if abs(vals[i] - (np.roll(vals, 13)[j] + 0.004)) <= eps
    }
    assert got == exp and len(exp) > 0
    # plan shape: a hash join on the bucket, not a nested-loop
    plan = (
        band_join(a, b, "va", "vb", eps)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
