"""Tests for operators/layout.py (Z-order clustering keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feast_hive_spark.operators import layout as L


def _sample(spark, n=256):
    return spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") % 16).alias("x"),
        (F.col("id") / 16).cast("long").alias("y"),
    )


def test_zorder_keys_deterministic_and_bounded(spark):
    df = _sample(spark)
    a = {r["rid"]: r["__z"] for r in L.zorder_keys(df, ["x", "y"], bits=4).collect()}
    b = {r["rid"]: r["__z"] for r in L.zorder_keys(df, ["x", "y"], bits=4).collect()}
    assert a == b
    assert all(0 <= z < (1 << 8) for z in a.values())


def test_zorder_interleave_exact():
    # 2-bit grids: x=0b10, y=0b01 -> z bits: x1 y1 x0 y0 = 1 0 0 1
    import pyspark.sql.functions as F  # noqa: F811

    from feast_hive_spark.session import get_spark

    spark = get_spark(app_name="feast_hive_spark_tests")
    df = spark.createDataFrame([(2, 1)], ["gx", "gy"])
    z = df.select(
        L.zvalue([F.col("gx"), F.col("gy")], bits=2).alias("z")
    ).collect()[0]["z"]
    assert z == 0b1001


def test_zorder_buckets_are_locally_tight(spark):
    # a z-bucket (top bits of the key) must span a narrow range of
    # EACH participating column — the pruning property the layout buys
    df = _sample(spark, 1024).select("rid", "x", (F.col("rid") % 64).alias("y"))
    keyed = L.zorder_keys(df, ["x", "y"], bits=6)
    stats = (
        keyed.groupBy(F.shiftright("__z", 8).alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    assert len(stats) > 1
    # every bucket's x-range and y-range are far below the global 15/63
    assert max(r["xr"] for r in stats) <= 7
    assert max(r["yr"] for r in stats) <= 31


def test_zorder_repartition_sorted_and_lossless(spark):
    df = _sample(spark, 512)
    out = L.zorder_repartition(df, ["x", "y"], bits=4, num_partitions=4)
    assert sorted(r["rid"] for r in out.collect()) == list(range(512))
    # partitions cover contiguous, locally-sorted z-ranges
    keyed = L.zorder_keys(df, ["x", "y"], bits=4)
    zs = (
        keyed.repartitionByRange(4, F.col("__z"))
        .sortWithinPartitions("__z")
        .select(F.spark_partition_id().alias("p"), "__z")
        .collect()
    )
    by_part = {}
    for r in zs:
        by_part.setdefault(r["p"], []).append(r["__z"])
    for vals in by_part.values():
        assert vals == sorted(vals)
    bounds = sorted((min(v), max(v)) for v in by_part.values())
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo


def test_zorder_degenerate_and_guards(spark):
    df = spark.createDataFrame([(1, 5, 1.0), (2, 5, 2.0)], ["rid", "c", "v"])
    # constant column collapses to grid 0 and must not divide by zero
    rows = L.zorder_keys(df, ["c", "v"], bits=4).collect()
    assert all(r["__z"] is not None for r in rows)
    with pytest.raises(ValueError):
        L.zorder_keys(df, [], bits=4)
    with pytest.raises(ValueError):
        L.zorder_keys(df, ["c", "v"], bits=32)


def test_bucketed_join_has_no_shuffle(spark):
    """The property write_bucketed exists for: co-bucketed tables join
    with zero exchange on either side (the shuffle was paid at write
    time), and results match the plain join."""
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dims = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    L.write_bucketed(facts, "bk_facts", ["k"], 8, sort_cols=["k"])
    L.write_bucketed(dims, "bk_dims", ["k"], 8, sort_cols=["k"])
    try:
        ta, tb = spark.table("bk_facts"), spark.table("bk_dims")
        # force the non-broadcast path so the bucket layout, not a
        # broadcast, is what elides the exchanges
        joined = ta.hint("merge").join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.replace("ReusedExchange", "")
        assert joined.count() == 500
        got = {r["k"]: (r["v"], r["w"]) for r in joined.collect()}
        assert got[42] == (0, 126)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_facts")
        spark.sql("DROP TABLE IF EXISTS bk_dims")


def test_compact_files_roundtrip_and_recovery(spark, tmp_path):
    import os

    path = str(tmp_path / "frag")
    src = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    src.repartition(40).write.parquet(path)  # 40 tiny files
    before = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}

    stats = L.compact_files(spark, path, target_bytes=1 << 30)
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1
    assert stats["rows"] == 10_000
    after = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert after == before

    # crash window: live dir gone, aside holds the data -> next call
    # must restore it before compacting
    os.rename(path, path + ".__compact_old")
    stats2 = L.compact_files(spark, path, target_bytes=1 << 30)
    assert stats2["rows"] == 10_000
    assert {r["k"]: r["v"] for r in spark.read.parquet(path).collect()} == before

    # sorted compaction tightens layout and preserves data
    stats3 = L.compact_files(spark, path, target_bytes=1024, sort_cols=["k"])
    assert stats3["files_after"] > 1
    assert {r["k"]: r["v"] for r in spark.read.parquet(path).collect()} == before


def test_table_file_report_matches_parquet_footers(spark, tmp_path):
    import duckdb

    path = str(tmp_path / "filerep")
    spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 13).alias("v")
    ).repartition(6).write.parquet(path)
    got = {
        r["file"]: r["n_rows"]
        for r in L.table_file_report(spark, path).collect()
    }
    exp = {
        f.rsplit("/", 1)[-1]: n
        for f, n in duckdb.connect()
        .execute(
            f"SELECT file_name, num_rows FROM parquet_file_metadata('{path}/*.parquet')"
        )
        .fetchall()
    }
    assert got == exp
    assert sum(got.values()) == 5000
    assert len(got) == 6


def test_compact_sorted_files_have_disjoint_ranges(spark, tmp_path):
    """Sorted compaction must produce files whose [min,max] key ranges
    do not overlap — the zone-map-tightness property that makes range
    predicates prune files."""
    import duckdb

    path = str(tmp_path / "zonemap")
    spark.range(0, 20_000).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("k"),
        F.col("id").alias("v"),
    ).repartition(10).write.parquet(path)
    stats = L.compact_files(spark, path, target_bytes=40_000, sort_cols=["k"])
    assert stats["files_after"] > 1
    ranges = duckdb.connect().execute(
        f"""SELECT filename, MIN(k), MAX(k)
            FROM read_parquet('{path}/*.parquet', filename=true)
            GROUP BY filename ORDER BY 2"""
    ).fetchall()
    for (f1, lo1, hi1), (f2, lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"{f1} [{lo1},{hi1}] overlaps {f2} [{lo2},{hi2}]"
    assert spark.read.parquet(path).count() == 20_000
