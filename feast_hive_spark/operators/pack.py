"""Sequence packing: assign documents to fixed-token-budget bins — the
batch-construction step of an LLM training pipeline (concatenate docs
up to ~context-length tokens per sample).

Semantics: contiguous greedy fill over the global (length desc, id)
order — each doc lands in the bin where its start offset falls
(``floor((cum - len) / capacity)``). Docs are never split; a bin can
overrun by less than one doc (the standard streaming-pack contract,
deterministic and oracle-able, unlike best-fit heuristics).

Scale shape: a global running sum needs a total order, and a single
global window would serialize on one partition. Instead the classic
distributed prefix-sum, with DETERMINISTIC quantile buckets standing
in for physical range partitions (operators/prefix.py): bucket on the
sort key, compute per-bucket totals (tiny, collected once at build),
broadcast the cumulative bucket offsets back, and finish with
bucket-LOCAL window cumsums plus the offset — every heavy step stays
parallel, no load-bearing cache, nothing leaks across calls."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feast_hive_spark.operators.prefix import quantile_bucket
from feast_hive_spark.plans.memo import job_memo, plan_memo


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, len) -> (id, len, bin_id) under contiguous greedy packing.

    ``num_partitions`` defaults to the session's shuffle partitions;
    per-partition totals are the ONLY thing collected (one small row
    per partition)."""
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = df.withColumn("__len", F.col(len_col).cast("long"))
    # Deterministic quantile buckets (operators/prefix.py): bucket
    # assignment is a pure function of __len, so the totals collected
    # here at build time stay valid for every re-execution of the
    # returned plan — no load-bearing cache, no storage leak (ADVICE
    # r4). The upstream plan runs twice (totals + final); callers with
    # an expensive upstream cache it themselves.
    bkt_expr, _ = quantile_bucket(base, "__len", n_part, descending=True)
    bucketed = base.withColumn("__bkt", bkt_expr)

    totals = {
        r["__bkt"]: r["__sum"]
        for r in job_memo(
            spark,
            df,
            ("pack_sequences.totals", id_col, len_col, capacity, n_part),
            lambda: bucketed.groupBy("__bkt")
            .agg(F.sum("__len").alias("__sum"))
            .collect(),
        )
    }
    offset = 0
    offsets = {}
    for bkt in sorted(totals):
        offsets[bkt] = offset
        offset += totals[bkt]
    if offsets:
        offset_expr = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[F.col("__bkt")]
    else:  # empty input: zero-arg create_map is untyped -> plain 0
        offset_expr = F.lit(0)

    w = Window.partitionBy("__bkt").orderBy(
        F.col("__len").desc(), F.col(id_col)
    )
    cum = F.sum("__len").over(w) + F.coalesce(offset_expr, F.lit(0))
    extra = [c for c in df.columns if c not in (id_col, len_col)]
    return (
        bucketed.withColumn(
            "bin_id",
            F.floor((cum - F.col("__len")) / F.lit(capacity)).cast("long"),
        )
        .select(F.col(id_col), F.col("__len").alias(len_col), *extra, "bin_id")
    )


def pack_sequences_grouped(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    group_cols: list[str],
) -> DataFrame:
    """Per-group contiguous greedy packing (monolingual batches: each
    group packs into its own bin space). Same per-doc contract as
    pack_sequences, but the running sum is a per-group window — groups
    pack in parallel with ONE shuffle and no driver-side totals pass.
    A whale group serializes its own sort (the stratified-sample
    caveat); split such a group with the global packer instead."""
    base = df.withColumn("__len", F.col(len_col).cast("long"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__len").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("__len").over(w)
    return base.withColumn(
        "bin_id", F.floor((cum - F.col("__len")) / F.lit(capacity)).cast("long")
    ).drop("__len")


def padding_efficiency_report(
    df: DataFrame,
    id_col: str,
    len_col: str,
    batch_size: int = 32,
    num_partitions: int | None = None,
) -> DataFrame:
    """Quantifies what length-sorted batching saves: pack rows into
    consecutive ``batch_size`` groups twice — in id (arrival) order
    and in (length, id) order — and compare padded token counts
    (each batch pads to its own max length). The one-row report is
    the evidence for inserting a sort/bucketing step before a
    trainer; typical corpora save 30-60%.

    The sorted ranking is the distributed prefix pattern with
    deterministic quantile buckets (operators/prefix.py: bucket-local
    row_number + broadcast offsets from an O(buckets) collect) — no
    global single-partition window and no load-bearing cache. Arrival
    batches derive from the id rank the same way, so neither path
    assumes dense ids.

    Output: (n_rows, real_tokens, padded_arrival, padded_sorted,
    saving_pct)."""
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # cached (r13, guide §1.3): base feeds BOTH rankings (each a
    # quantile probe + an offsets collect + the final windowed plan)
    # plus the totals row — uncached, the caller's token-count scan
    # executed ~5x per run. Two longs per row. plan_memo'd (r14,
    # r13 ADVICE #2): repeated builds on a long-lived session reuse
    # ONE cached frame instead of stacking a new cached block per
    # invocation and waiting on block-manager LRU.
    base = plan_memo(
        spark,
        df,
        ("padding_efficiency.base", id_col, len_col),
        lambda: df.select(
            F.col(id_col).alias("__id"),
            F.col(len_col).cast("long").alias("__len"),
        ).cache(),
    )

    def _ranked(src: DataFrame, bucket_col: str, order_cols) -> DataFrame:
        bkt_expr, _ = quantile_bucket(src, bucket_col, n_part)
        bucketed = src.withColumn("__bkt", bkt_expr)
        counts = job_memo(
            spark,
            src,
            ("padding_efficiency._ranked", bucket_col, n_part),
            lambda: bucketed.groupBy("__bkt")
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect(),
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
        w = Window.partitionBy("__bkt").orderBy(*order_cols)
        return bucketed.withColumn(
            "__rank", F.row_number().over(w) + F.coalesce(off_expr, F.lit(0))
        )

    def _padded(ranked: DataFrame) -> DataFrame:
        return (
            ranked.withColumn(
                "__batch", ((F.col("__rank") - 1) / batch_size).cast("long")
            )
            .groupBy("__batch")
            .agg(
                (F.max("__len") * F.count(F.lit(1))).alias("__padded")
            )
            .agg(F.sum("__padded").alias("padded"))
        )
    arrival = _padded(_ranked(base, "__id", [F.col("__id")]))
    by_len = _padded(_ranked(base, "__len", [F.col("__len"), F.col("__id")]))
    totals = base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__len").alias("real_tokens"),
    )
    return (
        totals.crossJoin(F.broadcast(arrival.withColumnRenamed("padded", "padded_arrival")))
        .crossJoin(F.broadcast(by_len.withColumnRenamed("padded", "padded_sorted")))
        .select(
            "n_rows",
            "real_tokens",
            "padded_arrival",
            "padded_sorted",
            F.round(
                (F.col("padded_arrival") - F.col("padded_sorted"))
                / F.col("padded_arrival"),
                6,
            ).alias("saving_pct"),
        )
    )
