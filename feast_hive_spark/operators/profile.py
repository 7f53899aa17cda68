"""Column-profiling operator: the ANALYZE/data-quality shape every
training-data pipeline runs before ingest (null rates, cardinalities,
ranges per column).

One pass, one aggregate row, unpivoted to a row per column with
``stack`` — the scan reads only the profiled columns and every stat is
a codegen'd aggregate; no per-column jobs, no Python."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, numeric_cols: Sequence[str]) -> DataFrame:
    """Per-column stats for numeric columns: row count, nulls, distinct
    count, min/max/mean (mean rounded to 4 for cross-engine parity).

    Output: (column, n_rows, n_null, n_distinct, min_val, max_val,
    mean_val) — one row per profiled column, computed in a SINGLE
    aggregate over a single scan however many columns are profiled."""
    if not numeric_cols:
        raise ValueError("profile_columns requires at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols:
        col = F.col(c).cast("double")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.countDistinct(col).alias(f"__dist_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
            F.round(F.avg(col), 4).alias(f"__mean_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in numeric_cols:
        stack_args.append(f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}, __mean_{c}")
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(numeric_cols)}, {', '.join(stack_args)}) AS "
            "(column_name, n_null, n_distinct, min_val, max_val, mean_val)"
        ),
    )
    return stacked.select(
        "column_name",
        "n_rows",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
        "mean_val",
    )
