"""Data-layout operators: Z-order (Morton-curve) clustering keys.

At 100 TB the scan is the bottleneck you can't optimize after the
fact: files laid out in ingest order give min/max zone maps that
prune on (at best) one column. Z-ordering interleaves the bits of
several normalized columns into one sort key so that range predicates
on ANY of the participating columns map to contiguous-ish key ranges
— the same layout step as Delta/Iceberg ``OPTIMIZE ZORDER BY``,
re-expressed as plain DataFrame arithmetic:

- normalization bounds come from ONE 1-row aggregate, broadcast back
  (no second scan at write time if bounds are known a priori);
- the z-value itself is pure integer bit algebra inside whole-stage
  codegen — no UDF, no shuffle;
- ``zorder_repartition`` then range-partitions on the key and sorts
  within partitions, which is exactly what parquet writers need for
  tight per-file zone maps.

Everything is deterministic double/integer arithmetic, so the DuckDB
oracle twin (registry_analytics.py) hash-matches the bucket layout.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grid(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Normalize a numeric column onto the [0, 2^bits) integer grid.

    ``floor((x - min) / (max - min) * (2^bits - 1))`` — evaluated in
    this exact operand order on both engines so the doubles (and
    therefore the floors) are bit-identical. Degenerate min==max
    columns collapse to grid cell 0."""
    span = (mx - mn).cast("double")
    cell = F.floor((col - mn) / span * F.lit((1 << bits) - 1)).cast("long")
    return F.when(span > 0, cell).otherwise(F.lit(0))


def zvalue(grids: Sequence[Column], bits: int) -> Column:
    """Interleave the bits of pre-gridded coordinates (Morton code).

    Bit ``b`` of grid ``i`` lands at output position
    ``b * n_cols + (n_cols - 1 - i)`` — column 0 owns the most
    significant bit of each group, matching the canonical Z-curve."""
    n = len(grids)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, g in enumerate(grids):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(g, b).bitwiseAND(F.lit(1)),
                    b * n + (n - 1 - i),
                )
            )
    return z


def zorder_keys(
    df: DataFrame, cols: Sequence[str], bits: int = 8, out: str = "__z"
) -> DataFrame:
    """Append the Z-order key column computed over ``cols``.

    Bounds are one tiny aggregate broadcast back as a 1-row cross
    join; the key itself is codegen'd bit algebra. ``bits`` per
    column; total key width = ``bits * len(cols)`` (keep <= 63)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    bounds = df.agg(
        *[F.min(c).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    grids = [
        _grid(F.col(c), F.col(f"__mn_{i}"), F.col(f"__mx_{i}"), bits)
        for i, c in enumerate(cols)
    ]
    return with_bounds.withColumn(out, zvalue(grids, bits)).drop(
        *[f"__mn_{i}" for i in range(len(cols))],
        *[f"__mx_{i}" for i in range(len(cols))],
    )


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition and locally sort by the Z-order key — the
    write-side layout step. Each output partition covers a contiguous
    z-range, so every participating column's min/max zone map is
    tight in every file."""
    keyed = zorder_keys(df, cols, bits=bits)
    parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its
    join/aggregation keys — Spark's answer to Hive's CLUSTERED BY.

    The 100 TB payoff: two tables bucketed the same way on the same
    keys join with ZERO exchange on either side (and bucket-local
    sort can elide the sort-merge sort too) — the shuffle is paid
    once at write time, then every downstream join/groupBy on those
    keys reads co-located buckets. This is the standard pre-shuffle
    amortization for fact-to-fact joins that AQE cannot avoid at
    query time. Requires a metastore table (``saveAsTable``): bucket
    metadata lives in the catalog — a plain ``parquet(path)`` write
    silently loses it (Spark would re-shuffle).

    ``test_layout.py`` pins the property this exists for: a join of
    two co-bucketed tables plans with no ShuffleExchange.
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.write.format(format)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_files(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> dict:
    """Small-file compaction for a parquet directory — the OPTIMIZE /
    bin-packing maintenance step every long-lived table needs (years
    of incremental appends leave thousands of KB-sized files whose
    per-file open cost and starved row groups dominate scan time at
    100 TB).

    Rewrites the directory into ``ceil(total_bytes / target_bytes)``
    files (optionally sorted, which also tightens zone maps — pair
    with ``zorder_keys`` for multi-column locality) and swaps it in
    with the same crash-safe two-rename protocol as the online-store
    sink: write to ``<path>.__compact_tmp``, move the live dir aside,
    move tmp in, drop the aside. An orphaned aside from a crash
    between the renames is restored on the next call before anything
    is read (the streaming-sink lesson: a swap is only crash-safe if
    startup repairs the half-swapped state).

    All filesystem operations go through the Hadoop FileSystem API,
    so the same code runs on HDFS/S3A/local. Returns
    ``{files_before, files_after, bytes, rows}``.

    Scope: the path is treated as ONE flat table. For a
    hive-partitioned directory, compact each leaf partition
    directory individually — compacting the root would rewrite the
    partition columns into the data files and flatten the layout.
    """
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(
        spark._jsc.hadoopConfiguration()
    )
    HPath = jvm.org.apache.hadoop.fs.Path
    live, tmp, aside = HPath(path), HPath(path + ".__compact_tmp"), HPath(
        path + ".__compact_old"
    )
    # crash recovery: aside exists but live is gone -> restore
    if fs.exists(aside) and not fs.exists(live):
        if not fs.rename(aside, live):
            raise IOError(f"could not restore {aside} -> {live}")
    for leftover in (tmp, aside):
        if fs.exists(leftover):
            fs.delete(leftover, True)

    def _data_files(p):
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                out.append((name, st.getLen()))
        return out

    before = _data_files(live)
    total = sum(sz for _, sz in before) or 1
    n_out = max(1, -(-total // target_bytes))

    df = spark.read.parquet(path)
    rows = df.count()
    if sort_cols:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.coalesce(n_out) if n_out < 200 else df.repartition(n_out)
    out.write.mode("overwrite").parquet(path + ".__compact_tmp")

    if not fs.rename(live, aside):
        raise IOError(f"could not move {live} aside")
    if not fs.rename(tmp, live):
        fs.rename(aside, live)  # roll back
        raise IOError(f"could not move {tmp} into place")
    fs.delete(aside, True)
    after = _data_files(live)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": int(total),
        "rows": int(rows),
    }


def table_file_report(spark, path: str) -> DataFrame:
    """Per-file observability for a parquet directory: rows and a
    fragmentation summary straight from the data plane
    (``input_file_name`` grouping — no driver-side listing, so the
    report scales with the cluster, not the namenode). The natural
    companion to :func:`compact_files`: run the report, decide, then
    compact. Output: one row per file ``(file, n_rows)`` with the
    basename only (stable across fs schemes/prefixes).

    tests/test_layout.py pins the counts against DuckDB's
    ``parquet_file_metadata`` on the same directory — an independent
    reader of the parquet footers."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
