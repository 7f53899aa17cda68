"""Shared column-expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_nonneg_long(col: Column) -> Column:
    """Round a NON-NEGATIVE double to the nearest long, half up —
    ``floor(x + 0.5)`` via the double->long cast.

    Drop-in for ``F.round(col).cast("long")`` on hot per-row paths:
    Spark's ``round`` routes every double through
    ``BigDecimal.valueOf(...).setScale(...)`` (an allocation + decimal
    conversion per row — measured ~2x the cost of the whole moment-sum
    aggregate it feeds in price_quantity_corr), while the add+cast
    stays a single codegen arithmetic op.

    Equivalence holds for the engine's fixed-point uses because the
    inputs are decimal-quantized (prices in cents, values scaled to
    exact milli/centi/micro units): the scaled double lands within
    ~1e-9 of an integer or exactly on a representable .5, where
    HALF_UP (Spark), round-away-from-zero (DuckDB), and floor(x+0.5)
    agree. Negative inputs would floor toward -inf instead of away
    from zero — callers must guarantee x >= 0.
    """
    return (col + F.lit(0.5)).cast("long")
