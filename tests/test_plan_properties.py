"""Plan-shape regression guards for the round-4 scale decisions.

audit_plans.py checks these over the whole registry and writes
PLANS.md; the handful here run in the normal pytest loop so a
refactor that silently reintroduces a scale hazard (cluster-keyed
windows, pre-aggregation joins, lambda-CSE traps that add exchanges)
fails fast, not at the next manual audit."""

import pytest

from feast_hive_spark.registry import REGISTRY
import feast_hive_spark.registry_analytics  # noqa: F401
import feast_hive_spark.registry_corpus  # noqa: F401
import feast_hive_spark.registry_ext  # noqa: F401
import feast_hive_spark.registry_rel  # noqa: F401

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name][0](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name,must,must_not",
    [
        # q18 aggregates lineitem per orderkey BEFORE the orders join
        # and takes top-20 without a global sort
        ("q18_large_orders", ["TakeOrderedAndProject"], ["CartesianProduct"]),
        # novelty: grouped-min owner table, never a shingle-keyed
        # window (unsplittable on a boilerplate shingle)
        ("shingle_novelty_scores", ["HashAggregate"], ["Window"]),
        # canonical survivor: grouped argmax, never a cluster window
        ("near_dup_canonical_by_quality", ["Aggregate"], ["Window"]),
        # token budget: bucket-local prefix sum over deterministic
        # quantile buckets (operators/prefix.py, r5), no global
        # single-partition running window
        ("token_budget_selection", ["hashpartitioning(__bkt"], ["SinglePartition"]),
        # r11: the trio is folded at build time from the shared
        # fused aggregate (_esr_fold): the RESULT plan is a driver-
        # local LocalTableScan — no rescan, no exchange, no job at
        # exec; the build pipeline is audited via the memo capture
        ("chi2_event_type_segment", ["LocalTableScan"],
         ["Scan parquet", "InMemoryTableScan", "Scan ExistingRDD",
          "Exchange"]),
        ("value_histogram", ["LocalTableScan"],
         ["Scan parquet", "InMemoryTableScan", "Scan ExistingRDD",
          "Exchange"]),
        ("funnel_view_click_purchase", ["LocalTableScan"],
         ["Scan parquet", "InMemoryTableScan", "Scan ExistingRDD",
          "Exchange"]),
        # fused events report (r11: folded like the trio) — the
        # RESULT plan is a LocalTableScan; the one-scan grouping-sets
        # build and the 3x ExistingRDD slice union are captured at
        # build time (audit_plans BUILDTIME_AUDIT)
        ("events_scalar_report", ["LocalTableScan"],
         ["Scan parquet", "InMemoryTableScan", "Scan ExistingRDD",
          "SortMergeJoin", "CartesianProduct"]),
        # media decode queries are map-only: payloads never shuffle
        ("multimodal_jpeg_pixel_stats", ["MapInPandas"], ["Exchange"]),
        ("multimodal_audio_stats", ["MapInPandas"], ["Exchange"]),
        ("multimodal_gif_pixel_stats", ["MapInPandas"], ["Exchange"]),
        ("multimodal_video_frame_stats", ["MapInPandas"], ["Exchange"]),
    ],
)
def test_plan_shape(spark, name, must, must_not):
    plan = _plan(spark, name)
    for token in must:
        assert token in plan, f"{name}: expected {token}"
    for token in must_not:
        assert token not in plan, f"{name}: unexpected {token}"


@pytest.mark.parametrize(
    "name,must,must_not",
    [
        # standalone histogram kernel: literal bounds -> ONE
        # bin-keyed aggregate over the fact, no broadcast-build job,
        # no window, no customer join, no user-level grouping set
        ("value_histogram", ["HashAggregate"],
         ["BroadcastHashJoin", "Window", "CartesianProduct", "Expand"]),
        # standalone chi2 kernel: one broadcast join + aggregate,
        # marginals as whole-partition windows over the cell table
        ("chi2_event_type_segment",
         ["HashAggregate", "BroadcastHashJoin", "Window"],
         ["SortMergeJoin", "Expand"]),
        # standalone funnel kernel: conditional-min aggregate + tiny
        # reduce — no join, no window, no grouping sets
        ("funnel_view_click_purchase", ["HashAggregate"],
         ["Join", "Window", "CartesianProduct", "Expand"]),
    ],
)
def test_standalone_trio_plan_shape(spark, name, must, must_not):
    """The ``standalone=True`` specialized kernels keep their original
    single-query plan shapes (the r11 default routes through the
    shared fused aggregate instead — covered above)."""
    df = REGISTRY[name][0](spark, SF_DIR, standalone=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for token in must:
        assert token in plan, f"{name}: expected {token}"
    for token in must_not:
        assert token not in plan, f"{name}: unexpected {token}"


def test_tfidf_single_data_exchange(spark):
    """The doc-keyed repartition must serve BOTH the tf aggregate and
    the ranking window: exactly one hash exchange on the document id
    in the whole plan (the vocabulary branch's tiny exchanges key on
    the term)."""
    plan = _plan(spark, "tfidf_top_terms")
    doc_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "doc_id" in ln
    ]
    assert len(doc_exchanges) == 1, doc_exchanges
    assert "WindowGroupLimit" in plan


def test_grouping_sets_cache_substitutes_first_reference_only(spark):
    """Documented Spark 4.1 quirk (r10, the reason events_scalar_report
    uses a checkpoint barrier instead of .cache()): a cached GROUPING
    SETS aggregate referenced three times in ONE union substitutes
    only the FIRST reference (later branches silently re-derive from
    source), while a PLAIN aggregate substitutes all three. If this
    test ever fails with 3 substitutions, the quirk is fixed upstream
    and the barrier can be reconsidered."""
    spark.range(100).selectExpr(
        "id % 5 AS a", "id % 3 AS b", "id AS v"
    ).createOrReplaceTempView("__gsq_t")
    plain = spark.sql(
        "SELECT a, count(*) AS n FROM __gsq_t GROUP BY a"
    ).cache()
    plain.createOrReplaceTempView("__gsq_plain")
    gsets = spark.sql(
        "SELECT a, b, grouping_id() AS gid, count(*) AS n "
        "FROM __gsq_t GROUP BY GROUPING SETS ((a), (b))"
    ).cache()
    gsets.createOrReplaceTempView("__gsq_gs")
    try:
        p_plain = spark.sql(
            "SELECT a, n FROM __gsq_plain WHERE a > 1 "
            "UNION ALL SELECT a, n FROM __gsq_plain WHERE a = 0 "
            "UNION ALL SELECT a, n FROM __gsq_plain WHERE n > 2"
        )._jdf.queryExecution().executedPlan().toString()
        p_gs = spark.sql(
            "SELECT a, n FROM __gsq_gs WHERE gid = 1 "
            "UNION ALL SELECT b, n FROM __gsq_gs WHERE gid = 2 "
            "UNION ALL SELECT a, n FROM __gsq_gs WHERE gid = 1 AND n > 2"
        )._jdf.queryExecution().executedPlan().toString()
        assert p_plain.count("InMemoryTableScan") == 3
        assert p_gs.count("InMemoryTableScan") == 1  # the quirk
    finally:
        plain.unpersist()
        gsets.unpersist()


def test_sorted_readout_bound_enforced(spark, monkeypatch):
    """r14 (r13 verdict #8): sorted_readout's report-sized contract is
    mechanical — with the debug probe enabled, a result larger than
    the declared max_rows raises instead of silently serializing a
    fact-sized frame through one partition."""
    from pyspark.sql import functions as F

    from feast_hive_spark.plans.local import sorted_readout

    df = spark.range(100).select(F.col("id").alias("v"))
    monkeypatch.setenv("SPARK_GRAFT_READOUT_CHECK", "1")
    ok = sorted_readout(df, "v", max_rows=100)
    assert [r.v for r in ok.collect()] == list(range(100))
    with pytest.raises(ValueError, match="report-size bound"):
        sorted_readout(df, "v", max_rows=99)
    # production path: no probe job, bound is a declaration only
    monkeypatch.delenv("SPARK_GRAFT_READOUT_CHECK")
    assert sorted_readout(df, "v", max_rows=1).count() == 100
