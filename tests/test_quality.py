"""Tests for operators/quality.py (constraint suites, winsorization)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feast_hive_spark.operators import quality as Q


@pytest.fixture()
def qdf(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "ok-1"),
            (2, 200.0, "B", "ok-2"),   # out of range
            (3, None, "A", "bad 3"),   # null value, pattern violation
            (3, 30.0, "C", "ok-4"),    # dup id, bad category
        ],
        ["id", "v", "cat", "tag"],
    )


def test_check_constraints_counts(qdf):
    res = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in Q.check_constraints(
            qdf,
            [
                Q.not_null("v"),
                Q.in_range("v", 0, 100),
                Q.accepted_values("cat", ["A", "B"]),
                Q.matches("tag", "^ok-[0-9]$"),
                Q.unique("id"),
            ],
        ).collect()
    }
    assert res["not_null(v)"] == (4, 1, False)
    # in_range counts the null as a violation too
    assert res["in_range(v)"] == (4, 2, False)
    assert res["accepted_values(cat)"] == (4, 1, False)
    assert res["matches(tag)"] == (4, 1, False)
    assert res["unique(id)"] == (4, 1, False)


def test_check_constraints_all_pass(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], ["id", "v"])
    res = Q.check_constraints(df, [Q.not_null("v"), Q.unique("id")]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in res)


def test_check_constraints_rejects_empty(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        Q.check_constraints(df, [])


def test_winsorize_stats_clips_outliers(spark):
    rows = [("a", float(v)) for v in range(1, 100)] + [("a", 10000.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = Q.winsorize_stats(df, "g", "v", 0.01, 0.99).collect()[0]
    assert r["n"] == 100
    assert r["n_clipped"] == 2  # one row below p1, one above p99
    # the raw mean is dragged by the outlier; winsorized is not
    assert r["mean_raw"] > 140
    assert 45 < r["mean_winsorized"] < 60
    assert r["lo_bound"] == pytest.approx(1.99, abs=0.01)


def test_foreign_key_check_counts_orphans(spark):
    from feast_hive_spark.operators.quality import foreign_key_check

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c"), (9, "d"), (None, "e")],
        "fk int, payload string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    [r] = foreign_key_check(
        child, parent, ["fk"], ["pk"], "child->parent"
    ).collect()
    # two rows with fk=9 and the NULL row are all orphans
    assert (r.constraint, r.n_child, r.n_orphans, r.ok) == (
        "child->parent", 5, 3, False,
    )

    clean = spark.createDataFrame([(1, "x")], "fk int, payload string")
    [r2] = foreign_key_check(
        clean, parent, ["fk"], ["pk"], "ok-check"
    ).collect()
    assert (r2.n_orphans, r2.ok) == (0, True)


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from feast_hive_spark.operators.quality import correlation_matrix

    rng = np.random.default_rng(3)
    a = rng.integers(0, 100, 500)
    b = a * 3 + rng.integers(0, 20, 500)  # strongly correlated
    c = rng.integers(0, 1000, 500)  # independent
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"a": a, "b": b, "c": c}))
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    assert len(got) == 3
    assert abs(got[("a", "b")] - np.corrcoef(a, b)[0, 1]) < 1e-6
    assert abs(got[("a", "c")] - np.corrcoef(a, c)[0, 1]) < 1e-6
    assert got[("a", "b")] > 0.9


def test_psi_drift_detects_shift(spark):
    """Identical slices give PSI ~ 0; a shifted current slice gives a
    large PSI; contributions are finite even with empty bins."""
    import pandas as pd

    from feast_hive_spark.operators.profile import psi_drift

    ref = spark.createDataFrame(
        pd.DataFrame({"v": [float(i % 100) for i in range(2000)]})
    )
    same = psi_drift(ref, ref, "v", n_bins=10).toPandas()
    assert abs(same["contrib_e9"].sum()) == 0  # p == q exactly
    shifted = spark.createDataFrame(
        pd.DataFrame({"v": [float(i % 100) * 0.2 + 80 for i in range(2000)]})
    )
    drift = psi_drift(ref, shifted, "v", n_bins=10).toPandas()
    psi = drift["contrib_e9"].sum() / 1e9
    assert psi > 0.25  # classic "significant shift" threshold
    assert len(drift) == 10  # empty bins present and finite


def test_table_diff_classification(spark):
    import pandas as pd

    from feast_hive_spark.operators.quality import table_diff

    old = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, None, 40.0]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"k": [2, 3, 4, 5], "v": [99.0, None, 40.0, 50.0]})
    )
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    # k=1 removed, k=2 changed, k=3 same (NULL == NULL null-safe),
    # k=4 same (filtered), k=5 added
    assert got == {1: "removed", 2: "changed", 5: "added"}


def test_psi_drift_excludes_nulls(spark):
    """Review fix: NULL values must be EXCLUDED from binning, not
    silently counted into the top bin (least/greatest skip nulls)."""
    import pandas as pd

    from feast_hive_spark.operators.profile import psi_drift

    ref = spark.createDataFrame(
        pd.DataFrame({"v": [float(i % 50) for i in range(1000)]})
    )
    vals = [float(i % 50) for i in range(900)] + [None] * 100
    cur = spark.createDataFrame(pd.DataFrame({"v": vals}))
    out = psi_drift(ref, cur, "v", n_bins=10).toPandas()
    # nulls are not a bin: cur totals count only present values
    assert out["n_cur"].sum() == 900
    # identical present-value distributions -> no spurious top-bin mass
    top = out[out["bin"] == 9].iloc[0]
    assert abs(top["n_cur"] / 900 - top["n_ref"] / 1000) < 0.01


def test_ols_fit_matches_numpy_lstsq(spark):
    # independent ground truth: numpy least-squares on the same
    # fixed-point integer design matrix
    import numpy as np
    import pyspark.sql.functions as F

    from feast_hive_spark.operators.profile import ols_fit_2feature

    rng = [(i, (i * 37) % 11, (i * 53) % 7) for i in range(200)]
    rows = [
        (a, b, 5 + 3 * a - 2 * b + ((a * 7 + b * 13) % 5) - 2)
        for _, a, b in rng
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    out = {
        r["term"]: r["coef"]
        for r in ols_fit_2feature(
            df, F.col("x1"), F.col("x2"), F.col("y"), names=("a", "b")
        ).collect()
    }
    X = np.array([[1, a, b] for a, b, _ in rows], dtype=np.float64)
    Y = np.array([y for _, _, y in rows], dtype=np.float64)
    beta = np.linalg.lstsq(X, Y, rcond=None)[0]
    assert abs(out["intercept"] - beta[0]) < 1e-4
    assert abs(out["a"] - beta[1]) < 1e-4
    assert abs(out["b"] - beta[2]) < 1e-4


def test_ols_fit_singular_returns_null(spark):
    import pyspark.sql.functions as F

    from feast_hive_spark.operators.profile import ols_fit_2feature

    # x2 = 2*x1 exactly -> singular normal matrix -> NULL coefs
    df = spark.createDataFrame(
        [(i, 2 * i, i + 1) for i in range(50)], "x1 long, x2 long, y long"
    )
    out = ols_fit_2feature(df, F.col("x1"), F.col("x2"), F.col("y")).collect()
    assert len(out) == 3
    assert all(r["coef"] is None for r in out)


def test_logreg_train_learns_separable_labels(spark):
    # a cleanly separable 1-feature problem: GD must move the feature
    # weight positive and score positives above negatives
    import math

    import pyspark.sql.functions as F

    from feast_hive_spark.operators.profile import logreg_train

    rows = [(i, 900000 if i % 2 else 100000, i % 2) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    w = logreg_train(
        df, [F.lit(1000000), F.col("x")], F.col("y"), iters=5
    )
    assert len(w) == 2
    assert w[1] > 0  # feature pushes toward the positive class
    z_pos = (w[0] * 1000000 + w[1] * 900000) / 1e12
    z_neg = (w[0] * 1000000 + w[1] * 100000) / 1e12
    p_pos = 1 / (1 + math.exp(-z_pos))
    p_neg = 1 / (1 + math.exp(-z_neg))
    assert p_pos > 0.5 > p_neg


def test_logreg_train_deterministic_across_rebuilds(spark):
    import pyspark.sql.functions as F

    from feast_hive_spark.operators.profile import logreg_train
    from feast_hive_spark.plans import memo

    rows = [
        (i, (i * 37) % 1000000, (i * 53) % 1000000, 1 if i % 3 else 0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, y long")
    feats = [F.lit(1000000), F.col("a"), F.col("b")]
    w1 = logreg_train(df, feats, F.col("y"), iters=3)
    memo.clear()
    w2 = logreg_train(df, feats, F.col("y"), iters=3)
    assert w1 == w2


def test_ks_statistic_matches_scipy_style_reference(spark):
    # exact two-sample KS on small samples vs a direct computation
    import pyspark.sql.functions as F

    from feast_hive_spark.operators.prefix import global_running_sums

    xs = [1, 2, 2, 3, 5, 8, 9]
    ys = [2, 3, 3, 4, 4, 7]
    rows = [(i, v, 1, 0) for i, v in enumerate(xs)] + [
        (100 + i, v, 0, 1) for i, v in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "id long, v long, c1 long, c2 long")
    g = df.groupBy("v").agg(
        F.sum("c1").alias("c1"), F.sum("c2").alias("c2")
    )
    rs = global_running_sums(g, "v", ["v"], ["c1", "c2"], 4)
    n1, n2 = len(xs), len(ys)
    m = rs.agg(
        F.max(
            F.abs(F.col("__rs_c1") * n2 - F.col("__rs_c2") * n1)
        ).alias("mx")
    ).first()["mx"]
    got = m / (n1 * n2)
    # direct: max over all sample points of |F1 - F2|
    pts = sorted(set(xs + ys))
    want = max(
        abs(
            sum(1 for x in xs if x <= p) / n1
            - sum(1 for y in ys if y <= p) / n2
        )
        for p in pts
    )
    assert abs(got - want) < 1e-12


def test_gini_known_distributions(spark):
    # perfectly equal values -> gini 0; one whale holding everything
    # -> gini -> (n-1)/n
    import pyspark.sql.functions as F

    from feast_hive_spark.registry import REGISTRY  # noqa: F401  (conventions)

    def gini_micro(rows):
        from feast_hive_spark.operators.prefix import (
            global_row_number,
            global_running_sums,
        )

        u = spark.createDataFrame(rows, "user_id long, v long")
        ranked = global_row_number(
            u, "v", [F.col("v"), F.col("user_id")], 4, out_col="rk"
        )
        agg = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("rk") * F.col("v")).alias("s"),
            F.sum("v").alias("tot"),
        ).first()
        n, s, tot = agg["n"], agg["s"], agg["tot"]
        return (2 * (2 * s - (n + 1) * tot) * 1_000_000 + n * tot) // (
            2 * n * tot
        )

    equal = [(i, 100) for i in range(10)]
    assert gini_micro(equal) == 0
    whale = [(i, 1) for i in range(9)] + [(99, 1_000_000)]
    g = gini_micro(whale)
    assert 850_000 < g < 900_000  # ~0.9 for n=10 with one whale


def test_poisson_bootstrap_weights_distribution(spark):
    # hash-uniform draws through the Poisson(1) inverse CDF: mean
    # weight ~ 1, P(w=0) ~ 1/e, and replicas differ from each other
    import math

    from feast_hive_spark.registry import REGISTRY
    import feast_hive_spark.registry_analytics  # noqa: F401

    out = REGISTRY["bootstrap_mean_value_ci"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 16
    n_events = 0  # n_eff fluctuates around the true count
    means = {r["replica"]: r["mean_micro"] for r in out}
    effs = [r["n_eff"] for r in out]
    avg_eff = sum(effs) / len(effs)
    # Poisson(1) weights: total effective n per replica within ~5% of n
    assert max(effs) < avg_eff * 1.1 and min(effs) > avg_eff * 0.9
    assert len(set(means.values())) > 1  # replicas actually resample


def test_welch_ttest_matches_scipy_formula(spark):
    import math

    import pyspark.sql.functions as F

    from feast_hive_spark.registry import REGISTRY
    import feast_hive_spark.registry_analytics  # noqa: F401
    from feast_hive_spark.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    row = REGISTRY["welch_ttest_click_view"][0](spark, sf).first()
    ev = (
        read_table(spark, sf, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_type", F.round(F.col("value") * 1000000).cast("long").alias("v"))
        .collect()
    )
    import statistics

    a = [r["v"] / 1e6 for r in ev if r["event_type"] == "click"]
    b = [r["v"] / 1e6 for r in ev if r["event_type"] == "view"]
    va, vb = statistics.variance(a) / len(a), statistics.variance(b) / len(b)
    t = (statistics.mean(a) - statistics.mean(b)) / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    assert abs(row["t_stat"] - round(t, 6)) < 1e-4
    assert abs(row["welch_df"] - round(df, 4)) < 0.05
    assert row["n_click"] == len(a) and row["n_view"] == len(b)


def test_markov_reach_monotone_and_bounded(spark):
    # reach probabilities are in [0, 1e6], 'purchase' is absorbing at
    # exactly 1e6, and a hand-built deterministic chain gives exact
    # expected values: a -> b -> purchase with certainty
    from datetime import datetime

    import pyspark.sql.functions as F

    from feast_hive_spark.registry import REGISTRY
    import feast_hive_spark.registry_analytics  # noqa: F401
    from feast_hive_spark.operators import sequences  # noqa: F401

    out = {
        r["event_type"]: r["p_reach_micro"]
        for r in REGISTRY["markov_conversion_reach"][0](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert out["purchase"] == 1_000_000
    assert all(0 <= v <= 1_000_000 for v in out.values())


def test_kaplan_meier_not_vacuous(spark, sf_dir):
    """r7 ADVICE: the one-week censor horizon exceeded the events
    corpus' ~1-2 day span, so zero deaths existed at ANY test scale
    and the whole estimator (hazard logs, n_risk window, cumulative
    sum, exp) ran vacuously. The 1-day horizon must produce real
    death rows, with survival strictly inside (0, 1)."""
    import feast_hive_spark.registry_analytics  # noqa: F401
    from feast_hive_spark.registry import REGISTRY

    out = REGISTRY["kaplan_meier_user_retention"][0](spark, sf_dir).collect()
    assert len(out) > 0, "censor horizon marks zero deaths: vacuous gate"
    for r in out:
        assert r["n_deaths"] >= 1
        assert 0 < r["survival_micro"] < 1_000_000
        assert r["n_at_risk"] >= r["n_deaths"]


def test_event_entropy_rate_matches_numpy_model(spark, sf_dir):
    """The entropy-rate query must equal the same statistic computed
    in numpy from event_transition_matrix's counts (shared extraction
    window), and its normalized complement must sit in [0, 1]."""
    import math

    import numpy as np

    import feast_hive_spark.registry_analytics  # noqa: F401
    from feast_hive_spark.registry import REGISTRY

    cells = REGISTRY["event_transition_matrix"][0](spark, sf_dir).collect()
    n = {(r["event_type"], r["next_type"]): r["n"] for r in cells}
    ns = {}
    for (s, _), c in n.items():
        ns[s] = ns.get(s, 0) + c
    total = sum(ns.values())
    # micro-fixed per-cell terms, exactly as both engines fold them
    tmicro = sum(
        round(c * (math.log(ns[s]) - math.log(c)) * 1e6)
        for (s, _), c in n.items()
    )
    exp_bits = tmicro / 1e6 / total / math.log(2.0)
    row = REGISTRY["event_entropy_rate"][0](spark, sf_dir).first()
    assert row["n_transitions"] == total
    assert row["n_states"] == len(ns)
    assert abs(row["entropy_rate_bits"] - exp_bits) < 1e-6
    assert 0.0 <= row["predictability"] <= 1.0
    assert 0.0 <= row["entropy_rate_bits"] <= np.log2(len(ns)) + 1e-9


def test_dp_noisy_event_counts_matches_laplace_model(spark, sf_dir):
    """The DP release must equal true counts + the seeded inverse-CDF
    Laplace noise computed in pure python, and at least one released
    count must differ from its true count (the mechanism actually
    perturbs at this fixture)."""
    import hashlib
    import math

    import feast_hive_spark.registry_ext  # noqa: F401
    from feast_hive_spark.registry import REGISTRY
    from feast_hive_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    true = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    got = REGISTRY["dp_noisy_event_counts"][0](spark, sf_dir).collect()
    assert len(got) == len(true)
    n_perturbed = 0
    for r in got:
        h48 = int(hashlib.md5(f"dp:{r['event_type']}".encode()).hexdigest()[:12], 16)
        u = (h48 + 0.5) / float(1 << 48)
        v = u - 0.5
        noise = -math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v)) if v != 0 else 0.0
        exp = true[r["event_type"]] + round(noise)
        assert r["released_count"] == exp, (r["event_type"], r["released_count"], exp)
        assert r["nominal_epsilon"] == 1.0
        n_perturbed += int(r["released_count"] != true[r["event_type"]])
    assert n_perturbed >= 1, "all noise rounded to zero: vacuous release"
