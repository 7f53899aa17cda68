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
- **SimHash** — 32-bit fingerprint; pigeonhole banding on 4 bytes
  guarantees recall for hamming distance <= 3; verification by
  bit_count(xor).
- **embedding cosine** — exact threshold join; the scale path is the
  sign-LSH bucketing in operators/simsearch.py.

All of it is built-in-function DataFrame code (no Python UDFs); every
operator has a DuckDB oracle twin computed with the same constants
(functions/text.py) so the correctness gate hash-matches pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_hive_spark.functions import text as X
from feast_hive_spark.functions import vector as V


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
    exact Jaccard >= threshold."""
    a = with_shingles.select(
        F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")
    )
    b = with_shingles.select(
        F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    return (
        candidates.join(a, "id_a")
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
    """Exact near-dup pairs via inverted shingle index.

    explode(shingle hash) -> self-join on the hash -> distinct pairs ->
    exact Jaccard verify. The self-join shuffles (shingle_hash, doc_id)
    pairs — linear in corpus shingle count, not quadratic in docs. Hot
    shingles (stop-phrases) are the skew risk at scale; AQE skew-join
    splitting handles the residual."""
    with_sh = df.select(
        F.col(id_col), X.shingle_hashes(text_col, n).alias("__sh")
    ).cache()
    exploded = with_sh.select(id_col, F.explode("__sh").alias("__h"))
    left = exploded.select(F.col(id_col).alias("id_a"), "__h")
    right = exploded.select(F.col(id_col).alias("id_b"), "__h")
    candidates = (
        left.join(right, "__h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _jaccard_pairs(with_sh, candidates, id_col, threshold)


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
    with_sh = df.select(
        F.col(id_col), X.shingle_hashes(text_col, n).alias("__sh")
    ).cache()
    sigs = with_sh.select(
        id_col, X.minhash_signature(F.col("__sh")).alias("__sig")
    )
    # band key = (band index, md5 of the band's signature slice)
    band_rows = []
    for bi in range(bands):
        lo = bi * rows_per_band
        band_key = F.md5(
            F.concat_ws(
                ",",
                *[F.col("__sig")[i].cast("string") for i in range(lo, lo + rows_per_band)],
            )
        )
        band_rows.append(
            sigs.select(
                id_col, F.lit(bi).alias("__band"), band_key.alias("__bkey")
            )
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionAll(br)
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

def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with SimHash fingerprints.

    Candidates: pairs sharing at least one of the 4 fingerprint bytes
    (pigeonhole: <=3 flipped bits cannot touch all 4 bytes, so recall
    is exact for hamming <= 3). Verification: bit_count(xor) —
    JVM-side intrinsics."""
    fp = df.select(F.col(id_col), X.simhash(text_col).alias("__fp")).cache()
    band_rows = []
    for bi in range(4):
        band_rows.append(
            fp.select(
                id_col,
                F.lit(bi).alias("__band"),
                F.shiftright(F.col("__fp"), 8 * bi).bitwiseAND(F.lit(255)).alias("__bv"),
            )
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionAll(br)
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
    return (
        candidates.join(a, "id_a")
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
    """Exact cosine near-dup pairs (brute force).

    Correctness baseline for the LSH variant in simsearch.py — at scale
    you run sign-LSH bucketing first and this verification only within
    buckets. Norms are precomputed once per row before the join."""
    base = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        V.norm(F.col(vec_col)).alias("__n"),
    ).cache()
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(V.dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
