"""Deduplication operators over document tables (SURVEY §7).

Five dedup families, each designed around its 100 TB shape:

- **exact** — hash-groupBy on the text (one shuffle on md5(text), not
  on the raw text bytes: the shuffle key is 16 bytes instead of the
  document).
- **n-gram Jaccard** — exact pairwise similarity, but candidates come
  from an *inverted shingle index* (explode + self-join on shingle
  hash), never a cross join: only documents sharing >=1 shingle meet.
- **MinHash + LSH** — fixed-size signatures (16 hashes), banded into
  4 buckets; candidate pairs share a band bucket; exact Jaccard
  verification restores precision. The classic sub-quadratic path.
- **SimHash** — 48-bit fingerprint; pigeonhole banding on four 12-bit
  bands guarantees recall for hamming distance <= 3; verification by
  bit_count(xor).
- **embedding cosine** — exact threshold join; the scale path is the
  sign-LSH bucketing in operators/simsearch.py.

All of it is built-in-function DataFrame code (no Python UDFs); every
operator has a DuckDB oracle twin computed with the same constants
(functions/text.py) so the correctness gate hash-matches pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_hive_spark.functions import text as X
from feast_hive_spark.functions import vector as V


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input has
    fewer partitions (e.g. one small parquet file -> 1 partition).

    The text-hashing pipelines are CPU-bound; without this every md5/
    shingle evaluation of a single-file table runs in ONE task while
    31 cores idle. On a real cluster with many files this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --- exact --------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Representative row per distinct text: min(id) wins.

    Shuffle key is md5(text) (16 bytes) rather than the document body —
    at 100 TB this is the difference between shuffling hashes and
    shuffling the corpus."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("__th"))
        .groupBy("__th")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


def exact_dedup_stats(df: DataFrame, text_col: str) -> DataFrame:
    """1-row corpus summary: total rows, distinct texts, duplicate rows."""
    return df.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col(text_col)))).alias(
            "n_dup_rows"
        ),
    )


# --- shared pair verification -------------------------------------------

def _jaccard_pairs(
    with_shingles: DataFrame, candidates: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Join candidate (id_a < id_b) pairs back to shingle sets and keep
    exact Jaccard >= threshold.

    The candidate set is small BY CONSTRUCTION (that is the point of
    LSH banding), so it is broadcast: both verification joins stream
    the corpus-side shingle table with zero shuffles."""
    a = with_shingles.select(
        F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")
    )
    b = with_shingles.select(
        F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    return (
        F.broadcast(candidates)
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- n-gram Jaccard (inverted-index exact) ------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact near-dup pairs via inverted shingle index + count-only
    Jaccard.

    explode(shingle hash) -> self-join on the hash -> groupBy pair
    counting shared shingles. Because the shingle sets are distinct,
    ``|A ∩ B|`` is exactly that count, and
    ``J = inter / (|A| + |B| - inter)`` needs no array materialization
    at all — the verify step is a pure count aggregation (measured 4x
    faster than the array_intersect re-join at sf0.1).

    Scale shape: the self-join shuffles (shingle_hash, doc_id) pairs —
    linear in corpus shingle volume, never quadratic in docs. Hot
    shingles (stop-phrases) are the skew risk; AQE skew-join splitting
    plus an (optional) document-frequency cap on shingles handle it."""
    with_sh = _spread(df.select(id_col, text_col)).select(
        F.col(id_col), X.shingle_hashes(text_col, n).alias("__sh")
    ).cache()
    sizes = with_sh.select(F.col(id_col), F.size("__sh").alias("__n"))
    exploded = with_sh.select(id_col, F.explode("__sh").alias("__h"))
    left = exploded.select(F.col(id_col).alias("id_a"), "__h")
    right = exploded.select(F.col(id_col).alias("id_b"), "__h")
    inter = (
        left.join(right, "__h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter").cast("double")
                / F.greatest(
                    F.col("__na") + F.col("__nb") - F.col("__inter"), F.lit(1)
                ),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- MinHash + LSH ------------------------------------------------------

def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + banded LSH.

    Signature: 16 hash-minima over 3-gram shingle hashes (constants in
    functions/text.py). Banding: 4 bands x 4 rows; a pair is a
    candidate iff some band agrees; exact-Jaccard verification gives
    back precision. At 100 TB the only shuffles are (band_key ->
    bucket) and the verification joins — never all-pairs."""
    rows_per_band = len(X.MINHASH_COEFS) // bands
    with_sh = _spread(df.select(id_col, text_col)).select(
        F.col(id_col), X.shingle_hashes(text_col, n).alias("__sh")
    ).cache()
    sigs = with_sh.select(
        id_col, X.minhash_signature(F.col("__sh")).alias("__sig")
    )
    # band keys = md5 of each signature slice, all emitted in ONE pass
    # via posexplode (a union of per-band selects would re-evaluate the
    # 16-hash signature once per band per join side); the tiny result
    # (bands rows/doc of (band, 16-byte key)) is cached for the
    # self-join.
    band_keys = []
    for bi in range(bands):
        lo = bi * rows_per_band
        band_keys.append(
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col("__sig")[i].cast("string")
                        for i in range(lo, lo + rows_per_band)
                    ],
                )
            )
        )
    banded = sigs.select(
        id_col, F.posexplode(F.array(*band_keys)).alias("__band", "__bkey")
    ).cache()
    left = banded.select(F.col(id_col).alias("id_a"), "__band", "__bkey")
    right = banded.select(F.col(id_col).alias("id_b"), "__band", "__bkey")
    candidates = (
        left.join(right, ["__band", "__bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _jaccard_pairs(with_sh, candidates, id_col, threshold)


# --- SimHash ------------------------------------------------------------

def _simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """48-bit SimHash per document via explode + columnar aggregation.

    Rather than evaluating 48 interpreted per-row array-aggregate
    expressions (functions/text.py:simhash — kept as the reference
    implementation), explode tokens to rows and compute the 48 bit
    votes as ordinary SUM(CASE...) aggregates — whole-stage-codegen'd
    hash aggregation with 48 accumulators, one shuffle keyed by doc id.
    Produces the exact same fingerprint."""
    toks = _spread(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(X.words(text_col)).alias("__t"),
    )
    hashed = toks.select(
        id_col,
        F.conv(F.substring(F.md5("__t"), 1, 12), 16, 10).cast("long").alias("__h"),
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), i) % 2 == 1, 1).otherwise(-1)
            ).alias(f"__v{i}")
            for i in range(X.SIMHASH_BITS)
        ]
    )
    fp = sum(
        [
            F.when(F.col(f"__v{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(1, X.SIMHASH_BITS)
        ],
        F.when(F.col("__v0") >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return votes.select(F.col(id_col), fp.cast("long").alias("__fp"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with 48-bit SimHash fingerprints.

    Candidates: pairs sharing at least one of four 12-bit fingerprint
    bands (pigeonhole: <=3 flipped bits cannot touch all 4 bands, so
    recall is exact for hamming <= 3; 4096-way buckets keep random
    collisions ~16x rarer than byte bands). Verification:
    bit_count(xor) — JVM-side intrinsics."""
    fp = _simhash_fingerprints(df, id_col, text_col).cache()
    banded = fp.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__fp"), 12 * bi).bitwiseAND(F.lit(4095))
                    for bi in range(X.SIMHASH_BITS // 12)
                ]
            )
        ).alias("__band", "__bv"),
    )
    left = banded.select(F.col(id_col).alias("id_a"), "__band", "__bv")
    right = banded.select(F.col(id_col).alias("id_b"), "__band", "__bv")
    candidates = (
        left.join(right, ["__band", "__bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = fp.select(F.col(id_col).alias("id_a"), F.col("__fp").alias("__fa"))
    b = fp.select(F.col(id_col).alias("id_b"), F.col("__fp").alias("__fb"))
    # candidate set small by construction -> broadcast verification
    return (
        F.broadcast(candidates)
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "hamming", F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- embedding cosine ---------------------------------------------------

def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.45
) -> DataFrame:
    """Exact cosine near-dup pairs.

    Kernel: the full (small-side) normalized matrix is broadcast to
    every task; each Arrow batch of rows does ONE numpy matmul against
    it and emits only the above-threshold (id_a < id_b) pairs — dense
    linear algebra is the one place where an Arrow-batched numpy
    kernel beats Spark's interpreted higher-order array functions by
    ~100x (measured: 11.6s -> sub-second at sf0.1). Exact values,
    so the DuckDB oracle still hash-matches (rounded to 6 decimals).

    This is the correctness baseline: at 100 TB the broadcast side no
    longer fits and you run sign-LSH bucketing (simsearch.py) first,
    applying this verification within buckets only."""
    spark = df.sparkSession
    pdf = df.select(id_col, vec_col).toPandas()
    ids_all = pdf[id_col].to_numpy()
    Mn = V.np_normalize(V.np_matrix(pdf[vec_col]))
    b_ids = spark.sparkContext.broadcast(ids_all)
    b_m = spark.sparkContext.broadcast(Mn)

    def mapper(batches):
        all_ids, All = b_ids.value, b_m.value
        for batch in batches:
            ids = batch[id_col].to_numpy()
            if ids.size == 0 or all_ids.size == 0:
                continue
            Bn = V.np_normalize(V.np_matrix(batch[vec_col]))
            S = np.round(Bn @ All.T, 6)
            rows_i, cols_j = np.nonzero(
                (S >= threshold) & (ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": ids[rows_i],
                    "id_b": all_ids[cols_j],
                    "cosine": S[rows_i, cols_j],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        mapper, "id_a long, id_b long, cosine double"
    )
