"""Deterministic scaffolding for distributed prefix sums / ranks.

The r1-r4 prefix-sum operators (pack_sequences, select_token_budget,
grouped_percent_rank, padding_efficiency_report) range-partitioned on
the sort key and keyed their broadcast offsets by
``spark_partition_id()``. Range partitioning samples its boundaries
with an RDD-id-derived seed, so a RE-execution of the same plan can
draw different boundaries than the run that produced the collected
offsets — which is why each operator pinned a ``.cache()`` between the
offsets job and the final window. Those caches were load-bearing for
correctness AND leaked storage across calls in a long-lived session
(ADVICE r4).

This module replaces physical-partition bucketing with DATA-DERIVED
bucketing: collect ``n-1`` approximate quantile boundaries of the
primary sort column once (a driver-side list of literals), and assign
each row ``bucket = #boundaries strictly before it`` — a pure,
deterministic function of the row. Any re-execution agrees with the
offsets collected at build time, so no cache is required, nothing
leaks, and the heavy shuffle (the per-bucket window) runs inside the
measured plan instead of hiding behind a cached intermediate.

Monotonicity contract: the bucket index is non-decreasing along the
requested sort order (ties in the bucket column always share a
bucket), which is exactly what per-bucket windows + cumulative
per-bucket offsets need. NULL sort keys all land in bucket 0 — the
engine's callers bucket on computed non-null columns (token counts,
quality scores); callers with nullable keys must filter or fill first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feast_hive_spark.plans.memo import job_memo


def quantile_bucket(
    df: DataFrame,
    col_name: str,
    n_buckets: int,
    descending: bool = False,
    relative_error: float | None = None,
) -> tuple[Column, int]:
    """Deterministic range-bucket expression over a numeric column.

    Returns ``(bucket_expr, n_distinct_boundaries + 1)``. The
    expression is a chain of ``n-1`` literal comparisons — pure
    whole-stage-codegen arithmetic, evaluated identically on every
    execution. One ``approxQuantile`` job runs at build time (the
    boundaries are baked in as literals). Heavily-tied columns can
    return duplicate quantiles; duplicates are collapsed, so the
    realized bucket count may be smaller than requested — a
    constant-valued column degenerates to one bucket (the same rows
    would have tied into one range partition anyway).
    """
    if n_buckets <= 1:
        return F.lit(0), 1
    # approxQuantile only supports numeric/boolean columns; a
    # non-numeric sort key (string/uuid ids) degrades to ONE bucket —
    # correct (the downstream window is then a single global
    # partition) rather than a crash, with the distribution lost.
    # Callers with string keys that need the distributed path should
    # pre-map them to a numeric surrogate that preserves their order.
    dtype = dict(df.dtypes).get(col_name, "")
    numeric = any(
        t in dtype
        for t in (
            "int", "long", "float", "double", "decimal", "short",
            "byte", "boolean",
        )
    )
    if not numeric:
        return F.lit(0), 1
    probs = [i / n_buckets for i in range(1, n_buckets)]
    err = relative_error if relative_error is not None else 1.0 / (4 * n_buckets)
    # plan-keyed memo: the boundary probe is a pure function of the
    # input plan, and a warm loop rebuilding this operator re-runs it
    # for byte-identical literals (see plans/memo.py)
    bounds = job_memo(
        df.sparkSession,
        df,
        ("quantile_bucket", col_name, n_buckets, descending, err),
        lambda: df.stat.approxQuantile(col_name, probs, err),
    )
    uniq = sorted(set(bounds))
    if not uniq:  # empty input / all-null column
        return F.lit(0), 1
    if descending:
        uniq = list(reversed(uniq))
        terms = [
            F.when(F.col(col_name) < F.lit(b), 1).otherwise(0) for b in uniq
        ]
    else:
        terms = [
            F.when(F.col(col_name) > F.lit(b), 1).otherwise(0) for b in uniq
        ]
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return expr, len(uniq) + 1


def global_row_number(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    n_buckets: int,
    out_col: str = "__rank",
    descending: bool = False,
) -> DataFrame:
    """1-based global row number over ``order_cols`` without a global
    single-partition window: deterministic quantile buckets on
    ``bucket_col`` (the primary sort column), per-bucket counts (the
    only collect, O(buckets) rows), bucket-local ``row_number`` plus
    broadcast offsets. ``order_cols`` must start with ``bucket_col``'s
    direction and include a unique tiebreak so the order is total.

    This is the shared kernel of pack.padding_efficiency_report and
    dense-id assignment; the same pattern with SUM instead of COUNT is
    pack.pack_sequences / corpus.select_token_budget.
    """
    bkt_expr, _ = quantile_bucket(
        df, bucket_col, n_buckets, descending=descending
    )
    bucketed = df.withColumn("__bkt", bkt_expr)
    counts = job_memo(
        df.sparkSession,
        df,
        ("global_row_number.counts", bucket_col, n_buckets, descending),
        lambda: (
            bucketed.groupBy("__bkt")
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect()
        ),
    )
    off = 0
    offsets = {}
    for r in sorted(counts, key=lambda r: r["__bkt"]):
        offsets[r["__bkt"]] = off
        off += r["__c"]
    if offsets:
        off_expr = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[F.col("__bkt")]
    else:
        off_expr = F.lit(0)
    from pyspark.sql import Window

    w = Window.partitionBy("__bkt").orderBy(*order_cols)
    return bucketed.withColumn(
        out_col,
        (F.row_number().over(w) + F.coalesce(off_expr, F.lit(0))).cast("long"),
    ).drop("__bkt")


def global_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    n_buckets: int,
    out_col: str = "__run_max",
) -> DataFrame:
    """Running maximum of ``value_col`` over the STRICTLY PRECEDING
    rows in global ``order_col`` order, without a single-partition
    window: quantile buckets on the order column, one per-bucket max
    aggregate (the only collect, O(buckets) rows), bucket-local
    running max over the (parallel) per-bucket windows, and a
    broadcast prefix-combined offset per bucket. First row globally
    gets NULL (no preceding rows) — the exact frame ``ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING``.

    ``order_col`` must be unique (a total order); ``value_col`` must
    be a type with a defined max (use fixed-point longs for
    cross-engine exactness). Same scaffold as
    :func:`global_row_number` — the shuffle is bucket-keyed, never
    single-partition.
    """
    from pyspark.sql import Window

    bkt_expr, _ = quantile_bucket(df, order_col, n_buckets)
    bucketed = df.withColumn("__bkt", bkt_expr)
    maxes = job_memo(
        df.sparkSession,
        df,
        ("global_running_max.maxes", order_col, value_col, n_buckets),
        lambda: (
            bucketed.groupBy("__bkt")
            .agg(F.max(value_col).alias("__m"))
            .collect()
        ),
    )
    run = None
    offsets = {}
    for r in sorted(maxes, key=lambda r: r["__bkt"]):
        offsets[r["__bkt"]] = run  # max of all STRICTLY EARLIER buckets
        run = r["__m"] if run is None else max(run, r["__m"])
    entries = [
        (b, m) for b, m in offsets.items() if m is not None
    ]
    if entries:
        off_expr = F.create_map(
            *[F.lit(x) for kv in entries for x in kv]
        )[F.col("__bkt")]
    else:
        off_expr = F.lit(None).cast(bucketed.schema[value_col].dataType)
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    return bucketed.withColumn(
        out_col,
        F.greatest(
            F.coalesce(local, off_expr), F.coalesce(off_expr, local)
        ),
    ).drop("__bkt")


def global_running_sums(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    value_cols: "list[str]",
    n_buckets: int,
    prefix: str = "__rs_",
) -> DataFrame:
    """Inclusive running sums of ``value_cols`` over a global total
    order, without a single-partition window: quantile buckets on
    ``bucket_col`` (the primary sort column), ONE per-bucket aggregate
    collecting all value sums (O(buckets) rows), parallel bucket-local
    cumulative windows + broadcast prefix offsets per column. Appends
    ``{prefix}{col}`` long columns.

    ``order_cols`` must start with ``bucket_col`` ascending and
    include a unique tiebreak; ``value_cols`` must be integer columns
    (exact prefix sums — no float order sensitivity). This is the
    ECDF / cumulative-distribution kernel (KS tests, Lorenz curves,
    cumulative-share reports); the same scaffold as
    :func:`global_row_number` / :func:`global_running_max`.
    """
    from pyspark.sql import Window

    bkt_expr, _ = quantile_bucket(df, bucket_col, n_buckets)
    bucketed = df.withColumn("__bkt", bkt_expr)
    sums = job_memo(
        df.sparkSession,
        df,
        (
            "global_running_sums.sums",
            bucket_col,
            tuple(value_cols),
            n_buckets,
        ),
        lambda: (
            bucketed.groupBy("__bkt")
            .agg(*[F.sum(c).alias(c) for c in value_cols])
            .collect()
        ),
    )
    run = {c: 0 for c in value_cols}
    offsets: dict = {}
    for r in sorted(sums, key=lambda r: r["__bkt"]):
        offsets[r["__bkt"]] = dict(run)
        for c in value_cols:
            run[c] += r[c] or 0
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = bucketed
    for c in value_cols:
        if offsets:
            off_expr = F.create_map(
                *[
                    F.lit(x)
                    for b, per in offsets.items()
                    for x in (b, per[c])
                ]
            )[F.col("__bkt")]
        else:
            off_expr = F.lit(0)
        out = out.withColumn(
            f"{prefix}{c}",
            (F.sum(c).over(w) + F.coalesce(off_expr, F.lit(0))).cast(
                "long"
            ),
        )
    return out.drop("__bkt")


def global_rank_and_sums(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    value_cols: "list[str]",
    n_buckets: int,
    rank_col: str = "__rank",
    prefix: str = "__rs_",
) -> DataFrame:
    """:func:`global_row_number` + :func:`global_running_sums` fused
    (r14, guide §2.4): when the SAME total order drives both, one
    bucket probe + ONE per-bucket (count, sums) collect + one window
    pass produce the rank and the inclusive running sums together.
    The two-kernel chain paid a second approxQuantile probe and a
    second per-bucket collect over the already-windowed intermediate
    (each a full re-execution of the input) plus a second window
    exchange. Values are identical by construction: rank and running
    sums depend only on the total order and the integer values, never
    on the bucket decomposition."""
    from pyspark.sql import Window

    bkt_expr, _ = quantile_bucket(df, bucket_col, n_buckets)
    bucketed = df.withColumn("__bkt", bkt_expr)
    stats = job_memo(
        df.sparkSession,
        df,
        (
            "global_rank_and_sums",
            bucket_col,
            tuple(value_cols),
            n_buckets,
        ),
        lambda: (
            bucketed.groupBy("__bkt")
            .agg(
                F.count(F.lit(1)).alias("__c"),
                *[F.sum(c).alias(c) for c in value_cols],
            )
            .collect()
        ),
    )
    run_n = 0
    run = {c: 0 for c in value_cols}
    off_n: dict = {}
    off_v: dict = {}
    for r in sorted(stats, key=lambda r: r["__bkt"]):
        off_n[r["__bkt"]] = run_n
        off_v[r["__bkt"]] = dict(run)
        run_n += r["__c"]
        for c in value_cols:
            run[c] += r[c] or 0
    if off_n:
        off_n_expr = F.create_map(
            *[F.lit(x) for kv in off_n.items() for x in kv]
        )[F.col("__bkt")]
    else:
        off_n_expr = F.lit(0)
    w = Window.partitionBy("__bkt").orderBy(*order_cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = bucketed.withColumn(
        rank_col,
        (F.row_number().over(w) + F.coalesce(off_n_expr, F.lit(0))).cast(
            "long"
        ),
    )
    for c in value_cols:
        if off_v:
            off_expr = F.create_map(
                *[
                    F.lit(x)
                    for b, per in off_v.items()
                    for x in (b, per[c])
                ]
            )[F.col("__bkt")]
        else:
            off_expr = F.lit(0)
        out = out.withColumn(
            f"{prefix}{c}",
            (F.sum(c).over(wsum) + F.coalesce(off_expr, F.lit(0))).cast(
                "long"
            ),
        )
    return out.drop("__bkt")
