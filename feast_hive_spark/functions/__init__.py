"""Shared column-expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_away_long(col: Column) -> Column:
    """Round a double to the nearest long, half AWAY FROM ZERO —
    ``sign(x) * floor(|x| + 0.5)`` in plain codegen arithmetic.

    Drop-in for ``F.round(col).cast("long")`` on hot per-row paths:
    Spark's ``round`` routes every double through
    ``BigDecimal.valueOf(...).setScale(...)`` (an allocation + decimal
    conversion per row — measured ~2x the cost of the whole moment-sum
    aggregate it feeds in price_quantity_corr), while abs/floor/
    multiply stay single codegen arithmetic ops.

    Sign-aware on purpose: the previous non-negative-only variant
    floored negatives toward -inf, silently diverging from the DuckDB
    oracles' half-away-from-zero if a fixture ever grew negative
    values. Equivalence with both Spark HALF_UP and DuckDB holds for
    the engine's fixed-point uses because the inputs are
    decimal-quantized (prices in cents, values scaled to exact
    milli/centi/micro units): the scaled double lands within ~1e-9 of
    an integer or exactly on a representable .5, where all three
    conventions agree for x >= 0 and DuckDB/this helper agree for
    x < 0.
    """
    return (F.signum(col) * F.floor(F.abs(col) + F.lit(0.5))).cast("long")


# backwards-compatible alias (pre-r5 name; semantics now sign-aware)
round_nonneg_long = round_half_away_long
