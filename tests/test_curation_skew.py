"""Whale-key load tests for the novelty / canonical-survivor
operators: a boilerplate shingle shared by EVERY document, and one
near-dup cluster holding most of the corpus. Asserts both correctness
on the hot key and the map-side collapse that makes the plans
skew-immune (the grouped-min/argmax exchanges must move O(distinct
keys x partitions) records, never one record per occurrence — the
reason these operators are aggregates + joins, not keyed windows).

Probe: conftest.shuffle_records, as in tests/test_pit_skew.py.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import shuffle_records
from feast_hive_spark.operators import corpus as C

N_DOCS = 20_000


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """Every doc shares the same leading 3-gram ('terms of service'
    boilerplate) and carries one unique shingle."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(N_DOCS),
            "text": [
                f"terms of service apply here uniquely{i} token{i} end{i}"
                for i in range(N_DOCS)
            ],
        }
    )
    return spark.createDataFrame(pdf).repartition(8).cache()


def test_novelty_hot_shingle_collapses_map_side(spark, boilerplate_docs):
    out = C.shingle_novelty(boilerplate_docs, "doc_id", "text", n=3)
    out.write.format("noop").mode("overwrite").save()
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == N_DOCS
    # doc 0 owns every shared shingle + its unique ones: fully novel
    assert rows[0]["novelty"] == 1.0
    # later docs own only their unique tail shingles, never the
    # shared boilerplate prefix
    assert rows[N_DOCS - 1]["n_novel"] < rows[N_DOCS - 1]["n_shingles"]
    assert rows[N_DOCS - 1]["n_novel"] >= 1
    # the grouped-min exchange must be bounded by
    # distinct shingles x partitions, NOT by total occurrences:
    # shared shingles occur N_DOCS times each but ship <= 8 partials
    recs = shuffle_records(out)
    total_pairs = N_DOCS * 6  # ~6 distinct shingles per doc
    assert recs, "expected shuffle metrics"
    # every occurrence of the 4 shared shingles would be ~80k extra
    # records; the partial-agg exchange stays well under one record
    # per (doc, shingle) occurrence
    assert min(recs) < total_pairs * 0.9


def test_canonical_survivor_giant_cluster(spark):
    """One cluster holds 2k near-identical docs; the argmax exchange
    must collapse map-side and the chosen survivor is the quality
    argmax with the lowest-id tiebreak."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    pdf = pd.DataFrame(
        {
            "doc_id": range(2000),
            # identical text -> jaccard 1.0 -> one cluster; equal
            # quality everywhere so the tiebreak (lowest doc_id) wins
            "text": [base for _ in range(2000)],
        }
    )
    docs = spark.createDataFrame(pdf).repartition(8)
    from feast_hive_spark.operators import dedup as D
    from feast_hive_spark.functions import text as X

    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    comp = D.connected_components_star(pairs).select("doc_id", "component_id")
    scored = comp.join(
        docs.select("doc_id", X.quality_score("text").alias("quality")),
        "doc_id",
    )
    best = scored.groupBy("component_id").agg(
        F.max(
            F.struct(F.col("quality"), (-F.col("doc_id")).alias("__nid"))
        ).alias("__best")
    )
    keep = scored.join(best, "component_id").select(
        "doc_id",
        (
            (F.col("quality") == F.col("__best.quality"))
            & (F.col("doc_id") == -F.col("__best.__nid"))
        ).alias("keep"),
    )
    keep.write.format("noop").mode("overwrite").save()
    kept = [r["doc_id"] for r in keep.filter("keep").collect()]
    assert kept == [0]
    assert keep.count() == 2000
    # the argmax exchange carries <= partitions records for the one
    # cluster, not one per member
    recs = shuffle_records(best)
    assert recs and min(recs) <= 8


def test_grouped_percent_rank_whale_domain(spark):
    """percent_rank without a group-keyed window: one domain owns 90%
    of rows; results must equal the window formulation exactly and
    the whale group must SPREAD across the deterministic value
    buckets (no single hot sort partition: every (bucket, group)
    window partition stays far below the whale's membership)."""
    from pyspark.sql import Window

    n = 30_000
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "source": ["whale" if i % 10 else f"s{i % 7}" for i in range(n)],
            "quality": [(i * 37 % 1000) / 1000.0 for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = C.grouped_percent_rank(
        df, "source", "quality", "doc_id", out_col="pct"
    )
    # the r5 design buckets on value quantiles (operators/prefix.py):
    # the window partition key is (__bkt, source), so the 27k-row
    # whale group must split into many bucket-local partitions
    from feast_hive_spark.operators.prefix import quantile_bucket

    bkt, n_bkt = quantile_bucket(df, "quality", 32)
    assert n_bkt >= 8
    biggest = (
        df.filter(F.col("source") == "whale")
        .groupBy(bkt.alias("b"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert biggest < n * 0.9 / 4  # whale never concentrates
    exp_w = Window.partitionBy("source").orderBy(
        F.col("quality"), F.col("doc_id")
    )
    exp = df.select(
        "doc_id", F.round(F.percent_rank().over(exp_w), 6).alias("pct")
    )
    diff = (
        got.select("doc_id", "pct")
        .join(exp.withColumnRenamed("pct", "pct2"), "doc_id")
        .filter(F.abs(F.col("pct") - F.col("pct2")) > 1e-9)
        .count()
    )
    assert diff == 0
    assert got.count() == n


def test_grouped_percent_rank_property(spark):
    """Hypothesis-style randomized equivalence (fixed seeds, varied
    shapes): the distributed formulation equals the window
    percent_rank on every draw, including singleton groups (pct 0)
    and a group count exceeding the partition count."""
    import numpy as np
    from pyspark.sql import Window

    for seed, n, n_groups in [(1, 17, 1), (2, 400, 40), (3, 1000, 3)]:
        rng = np.random.default_rng(seed)
        pdf = pd.DataFrame(
            {
                "id": range(n),
                "g": rng.integers(0, n_groups, n),
                "v": rng.integers(0, 5, n).astype(float),  # heavy ties
            }
        )
        df = spark.createDataFrame(pdf).repartition(5)
        got = C.grouped_percent_rank(df, "g", "v", "id", out_col="p")
        w = Window.partitionBy("g").orderBy(F.col("v"), F.col("id"))
        exp = df.select(
            "id", F.round(F.percent_rank().over(w), 6).alias("p2")
        )
        bad = (
            got.join(exp, "id")
            .filter(F.abs(F.col("p") - F.col("p2")) > 1e-9)
            .count()
        )
        assert bad == 0, f"seed={seed}"
        assert got.count() == n


def test_grouped_percent_rank_many_groups_guard(spark):
    """r4 verdict #3: above ``max_offset_groups`` the operator must
    route to the plain group-keyed window (the offsets table would be
    driver-sized) and still agree with the window formulation; tiny
    groups can't skew a hash partition, so the direct window is safe
    exactly there."""
    import numpy as np
    from pyspark.sql import Window

    n = 5_000
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "g": [f"g{i % 2000}" for i in range(n)],  # 2000 groups
            "v": rng.integers(0, 100, n).astype(float),
        }
    )
    df = spark.createDataFrame(pdf).repartition(6)
    got = C.grouped_percent_rank(
        df, "g", "v", "id", out_col="p", max_offset_groups=100
    )
    # guard path: plain window -> no broadcast-offsets join in plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    w = Window.partitionBy("g").orderBy(F.col("v"), F.col("id"))
    exp = df.select("id", F.round(F.percent_rank().over(w), 6).alias("p2"))
    bad = (
        got.join(exp, "id")
        .filter(F.abs(F.col("p") - F.col("p2")) > 1e-9)
        .count()
    )
    assert bad == 0
    assert got.count() == n
