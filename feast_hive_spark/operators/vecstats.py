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


def gramian_e6(
    df: DataFrame, vec_col: str, dim: int, with_marginals: bool = False
) -> DataFrame:
    """d×d Gramian of an ``array<float>`` column in exact micro-unit
    fixed point: output rows ``(i, j, sum_e6)`` where ``sum_e6 =
    Σ_rows round(v[i]*v[j]*1e6)`` as BIGINT.

    Each ``mapInPandas`` batch emits one d² partial (slab-wise numpy
    outer products, 256 rows at a time, so per-task memory is
    O(slab·d²) regardless of batch size); the final shuffle carries
    #batches × d² small rows.

    ``with_marginals`` (r13, guide §1.3) additionally emits the
    milli-unit marginal sums ``(i, -1, Σ round(v[i]*1e3))`` and the
    row count ``(-1, -1, n)`` from the SAME kernel pass, so
    :func:`covariance_num_e6` reads the corpus once instead of paying
    a second posexplode+aggregate scan. The marginal rounding is
    half-away-from-zero on float64 (copysign/floor) — exactly
    ``round(CAST(v AS DOUBLE) * 1000)`` as both engines' SQL twins
    define it."""
    schema = "i int, j int, s long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ii, jj = np.indices((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = np.zeros((dim, dim), dtype=np.int64)
            for lo in range(0, vecs.shape[0], 256):
                slab = vecs[lo : lo + 256]
                prods = slab[:, :, None] * slab[:, None, :] * 1e6
                acc += np.round(prods).astype(np.int64).sum(axis=0)
            out_i, out_j, out_s = ii.ravel(), jj.ravel(), acc.ravel()
            if with_marginals:
                v3 = vecs * 1e3
                s3 = (
                    np.copysign(np.floor(np.abs(v3) + 0.5), v3)
                    .astype(np.int64)
                    .sum(axis=0)
                )
                out_i = np.concatenate([out_i, np.arange(dim), [-1]])
                out_j = np.concatenate([out_j, np.full(dim, -1), [-1]])
                out_s = np.concatenate([out_s, s3, [vecs.shape[0]]])
            yield pd.DataFrame({"i": out_i, "j": out_j, "s": out_s})

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


def spectral_summary(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One-row spectral diagnostics of the embedding covariance —
    the feature-collapse / anisotropy audit a training-data pipeline
    runs before trusting an embedding column (Roy & Vetterli's
    effective rank via the participation ratio tr(C)²/tr(C²), which
    needs no eigendecomposition: tr(C²) = ‖C‖²_F for symmetric C).

    Columns: ``n_vectors``, ``dim``, ``total_var`` (trace of the true
    covariance), ``participation_ratio`` (≈ #directions carrying the
    variance — 1 = fully collapsed, ``dim`` = isotropic), and
    ``top_var_share`` (largest single-coordinate share of the trace).

    Determinism: everything derives from the exact integer covariance
    numerators (``covariance_num_e6``). The trace and max-diagonal are
    exact BIGINT folds over 64 entries; only the Frobenius fold sums
    doubles (cov_num² can exceed int64 at large n), where the
    4096-term sum's ~1e-12 relative spread is 6 orders below the
    ROUND(...,6) granularity — the same headroom argument as the
    cosine oracles.

    Scale shape: the corpus appears only inside ``covariance_num_e6``
    (per-batch d² partials, nothing row-sized shuffles); this adds a
    d²-row aggregate on top."""
    cov = covariance_num_e6(df, vec_col, dim, with_n=True)
    diag = F.when(F.col("i") == F.col("j"), F.col("cov_num"))
    agg = cov.agg(
        F.sum(diag).alias("__trace"),
        F.max(diag).alias("__max_diag"),
        F.sum(F.col("cov_num").cast("double") * F.col("cov_num").cast("double")).alias(
            "__frob_sq"
        ),
        # n rides the covariance rows (with_n) — no third corpus scan
        F.max("n").alias("__n"),
    )
    t = F.col("__trace").cast("double")
    return (
        agg
        .select(
            F.col("__n").alias("n_vectors"),
            F.lit(dim).cast("long").alias("dim"),
            F.round(
                t / (F.lit(1000000.0) * F.col("__n") * F.col("__n")), 6
            ).alias("total_var"),
            F.round(t * t / F.col("__frob_sq"), 6).alias(
                "participation_ratio"
            ),
            F.round(
                F.col("__max_diag").cast("double") / t, 6
            ).alias("top_var_share"),
        )
    )


def covariance_num_e6(
    df: DataFrame, vec_col: str, dim: int, with_n: bool = False
) -> DataFrame:
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

    The marginal sums ride the SAME kernel pass as the Gramian
    partials (``gramian_e6(with_marginals=True)``, r13 — the old
    posexplode + per-position aggregate was a second full corpus
    scan per consumer); the combined d²+d+1-row table is cached so
    the three readers below (Gramian cells, i-marginals,
    j-marginals) share one execution."""
    gall = gramian_e6(df, vec_col, dim, with_marginals=True).cache()
    g = gall.filter((F.col("i") >= 0) & (F.col("j") >= 0))
    s = gall.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("pos"), F.col("sum_e6").alias("s3")
    )
    nrow = gall.filter(F.col("i") == -1).select(
        F.col("sum_e6").alias("n")
    )
    a = s.select(
        F.col("pos").alias("i"), F.col("s3").alias("__si")
    ).crossJoin(F.broadcast(nrow))
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
    cols = ["i", "j", guarded.alias("cov_num")]
    if with_n:
        # the marginal aggregate already counted the corpus — callers
        # needing n (spectral_summary) take it from here instead of
        # paying a third corpus scan
        cols.append(F.col("n").cast("long").alias("n"))
    return (
        g.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .select(*cols)
    )
