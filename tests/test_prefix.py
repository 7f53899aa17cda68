"""Property tests for the deterministic quantile-bucket scaffolding
(operators/prefix.py) that underlies every prefix-sum operator."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from feast_hive_spark.operators.prefix import quantile_bucket


def _buckets(spark, values, n_buckets, descending=False):
    df = spark.createDataFrame(
        pd.DataFrame({"v": values, "i": range(len(values))})
    )
    expr, n = quantile_bucket(df, "v", n_buckets, descending=descending)
    out = df.select("v", expr.alias("b")).toPandas()
    return out, n


def test_quantile_bucket_monotone_and_stable(spark):
    """Bucket index must be non-decreasing along the sort order, the
    realized bucket count bounded by the request, and a second
    evaluation must agree exactly (determinism is the whole point —
    the offsets collected at build time must match any re-execution)."""
    rng = np.random.default_rng(5)
    for descending in (False, True):
        vals = np.round(rng.normal(0, 100, 4000), 2)
        out, n = _buckets(spark, vals, 16, descending)
        assert 1 <= n <= 16
        s = out.sort_values("v", ascending=not descending)
        assert (np.diff(s["b"].to_numpy()) >= 0).all()
        assert out["b"].nunique() <= n
        out2, _ = _buckets(spark, vals, 16, descending)
        assert out.sort_values(["v", "b"]).reset_index(drop=True).equals(
            out2.sort_values(["v", "b"]).reset_index(drop=True)
        )


def test_quantile_bucket_ties_share_bucket(spark):
    """Heavily-tied values must land in one bucket (monotonicity with
    ties), and a constant column degenerates to a single bucket."""
    # constant column: a single populated bucket (n is an upper bound
    # — one boundary survives dedup, so n == 2 with bucket 1 empty)
    out, n = _buckets(spark, [7.0] * 500, 8)
    assert n <= 2 and (out["b"] == 0).all()
    vals = [1.0] * 400 + [2.0] * 400 + [3.0] * 400
    out, n = _buckets(spark, vals, 8)
    per_val = out.groupby("v")["b"].nunique()
    assert (per_val == 1).all()


def test_quantile_bucket_spreads_uniform(spark):
    """A continuous column must actually spread: with 4000 distinct
    values and 16 requested buckets, at least half the buckets
    materialize and no bucket holds the majority."""
    vals = [i / 7.0 for i in range(4000)]
    out, n = _buckets(spark, vals, 16)
    assert n >= 8
    counts = out.groupby("b").size()
    assert len(counts) >= 8
    assert counts.max() < len(vals) * 0.5


def test_quantile_bucket_non_numeric_degrades_to_one_bucket(spark):
    """Review fix: a string sort key can't be approxQuantile'd; the
    helper must degrade to one bucket (correct single-partition
    window downstream) instead of crashing."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"v": [f"id{i:04d}" for i in range(100)]})
    )
    expr, n = quantile_bucket(df, "v", 8)
    assert n == 1
    out = df.select(expr.alias("b")).toPandas()
    assert (out["b"] == 0).all()

    # end-to-end: padding_efficiency_report with STRING ids must work
    from feast_hive_spark.operators.pack import padding_efficiency_report

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [f"d{i}" for i in range(50)],
             "n_tok": [(i * 7) % 30 + 1 for i in range(50)]}
        )
    )
    r = padding_efficiency_report(docs, "doc_id", "n_tok", batch_size=8).first()
    assert r["n_rows"] == 50 and r["padded_sorted"] <= r["padded_arrival"]


def test_global_running_max_matches_single_window(spark):
    # ground truth: the single-partition window it replaces
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from feast_hive_spark.operators.prefix import global_running_max

    rows = [(i, (i * 2654435761) % 997) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "seq long, v long").repartition(8)
    got = {
        r["seq"]: r["rm"]
        for r in global_running_max(
            df, "seq", "v", n_buckets=16, out_col="rm"
        ).collect()
    }
    w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["seq"]: r["rm"]
        for r in df.withColumn("rm", F.max("v").over(w)).collect()
    }
    assert got == want
    assert got[1] is None  # first arrival has no watermark yet


def test_global_running_max_single_bucket_degenerate(spark):
    from feast_hive_spark.operators.prefix import global_running_max

    df = spark.createDataFrame([(1, 5), (2, 3), (3, 9)], "seq long, v long")
    out = {
        r["seq"]: r["rm"]
        for r in global_running_max(
            df, "seq", "v", n_buckets=1, out_col="rm"
        ).collect()
    }
    assert out == {1: None, 2: 5, 3: 5}


def test_global_running_sums_matches_single_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from feast_hive_spark.operators.prefix import global_running_sums

    rows = [
        (i, (i * 31) % 100, (i * 17) % 7, (i * 13) % 5)
        for i in range(1, 1501)
    ]
    df = spark.createDataFrame(
        rows, "seq long, v long, a long, b long"
    ).repartition(8)
    got = {
        r["seq"]: (r["__rs_a"], r["__rs_b"])
        for r in global_running_sums(
            df, "v", ["v", "seq"], ["a", "b"], 16
        ).collect()
    }
    w = (
        Window.orderBy("v", "seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["seq"]: (r["sa"], r["sb"])
        for r in df.withColumn("sa", F.sum("a").over(w))
        .withColumn("sb", F.sum("b").over(w))
        .collect()
    }
    assert got == want
