"""Distributed embedding-matrix statistics.

The Gramian (uncentered second-moment matrix) X^T X is the building
block of PCA/whitening/linear-probe fits over embedding tables: a
d×d reduction of an n×d matrix.  The 100 TB shape is
partial-sums-per-partition: each Arrow batch contributes a d×d
partial computed by vectorized BLAS locally, and only d² scalars per
batch ever reach the shuffle — the corpus itself never moves.

Cross-engine determinism: each row's pairwise product is rounded to
micro-units and accumulated as BIGINT, so the sum is
order-independent and the DuckDB twin (a positions×positions
rescan) hash-matches bit-for-bit despite both engines summing in
different orders."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gramian_e6(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """d×d Gramian of an ``array<float>`` column in exact micro-unit
    fixed point: output rows ``(i, j, sum_e6)`` where ``sum_e6 =
    Σ_rows round(v[i]*v[j]*1e6)`` as BIGINT.

    Each ``mapInPandas`` batch emits one d² partial (slab-wise numpy
    outer products, 256 rows at a time, so per-task memory is
    O(slab·d²) regardless of batch size); the final shuffle carries
    #batches × d² small rows."""
    schema = "i int, j int, s long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ii, jj = np.indices((dim, dim))
        for pdf in batches:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = np.zeros((dim, dim), dtype=np.int64)
            for lo in range(0, vecs.shape[0], 256):
                slab = vecs[lo : lo + 256]
                prods = slab[:, :, None] * slab[:, None, :] * 1e6
                acc += np.round(prods).astype(np.int64).sum(axis=0)
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": acc.ravel()}
            )

    partials = df.select(vec_col).mapInPandas(kernel, schema)
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("s").alias("sum_e6"))
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            "sum_e6",
        )
    )


def covariance_num_e6(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Exact integer covariance numerators: ``cov_num[i,j] =
    n * G6[i,j] - s3[i] * s3[j]`` where ``G6`` is the micro-unit
    Gramian and ``s3[i] = Σ round(v[i]*1e3)`` — i.e. n² times the
    covariance in 1e-6 units, defined PURELY over rounded integers so
    both engines agree bit-for-bit (divide by n² client-side for the
    float matrix).

    Overflow safety: the products ``n*G6`` and ``si*sj`` are computed
    in decimal(38,0) — any int64×int64 product has at most 38 digits,
    so the intermediate arithmetic is always exact regardless of
    corpus size.  The result is cast back to BIGINT only after an
    explicit range check; a value outside int64 raises (with the fix:
    rescale the inputs) instead of silently wrapping.  The guard is
    free — this is a d²-row result.

    The marginal sums ride a posexplode + per-position aggregate —
    the explode fans out d× but the partial aggregate collapses it to
    d rows per map partition before the shuffle."""
    g = gramian_e6(df, vec_col, dim)
    s = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "__v"))
        .groupBy("pos")
        .agg(
            F.sum(F.round(F.col("__v") * 1000).cast("long")).alias("s3"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a = s.select(
        F.col("pos").alias("i"), F.col("s3").alias("__si"), "n"
    )
    b = s.select(F.col("pos").alias("j"), F.col("s3").alias("__sj"))
    dec = "decimal(38,0)"
    num = F.col("n").cast(dec) * F.col("sum_e6").cast(dec) - F.col(
        "__si"
    ).cast(dec) * F.col("__sj").cast(dec)
    i64_max = F.lit("9223372036854775807").cast(dec)
    guarded = F.when(F.abs(num) <= i64_max, num.cast("long")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "covariance_num_e6 exceeds int64 — rescale inputs "
                    "or consume the decimal form; value="
                ),
                num.cast("string"),
            )
        )
    )
    return (
        g.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .select("i", "j", guarded.alias("cov_num"))
    )
