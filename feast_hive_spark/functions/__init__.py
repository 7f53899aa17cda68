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


# Standard-normal survival function, Abramowitz & Stegun 26.2.17
# (|eps| < 7.5e-8) — neither Spark SQL nor DuckDB ships erf, so BOTH
# engines evaluate this exact polynomial with identical literals and
# operand order, making p-values bit-reproducible across the oracle
# boundary. Valid for z >= 0; callers pass |z| and double for
# two-sided tests.
_NORM_PDF_C = 0.3989422804014327  # 1/sqrt(2*pi)
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_T = 0.2316419


def norm_sf(z: Column) -> Column:
    """P(Z > z) for z >= 0 (A&S 26.2.17 polynomial)."""
    from pyspark.sql import functions as F

    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_T) * z)
    poly = (
        F.lit(_AS_B[0]) * t
        + F.lit(_AS_B[1]) * t * t
        + F.lit(_AS_B[2]) * t * t * t
        + F.lit(_AS_B[3]) * t * t * t * t
        + F.lit(_AS_B[4]) * t * t * t * t * t
    )
    return F.lit(_NORM_PDF_C) * F.exp(F.lit(-0.5) * z * z) * poly


def norm_sf_sql(z: str) -> str:
    """DuckDB twin of :func:`norm_sf` — identical literals/order."""
    t = f"(1.0 / (1.0 + {_AS_T} * {z}))"
    poly = (
        f"({_AS_B[0]} * {t} + {_AS_B[1]} * {t} * {t}"
        f" + {_AS_B[2]} * {t} * {t} * {t}"
        f" + {_AS_B[3]} * {t} * {t} * {t} * {t}"
        f" + {_AS_B[4]} * {t} * {t} * {t} * {t} * {t})"
    )
    return f"({_NORM_PDF_C} * exp(-0.5 * {z} * {z}) * {poly})"
