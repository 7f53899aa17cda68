"""Similarity search over embedding columns (SURVEY §7).

Two paths:
- **Brute-force top-k** — exact cosine against every candidate, then a
  per-query row_number window. This is the correctness baseline and
  the oracle-matched operator. The query side is broadcast (queries
  are few); the candidate scan is embarrassingly parallel; the only
  shuffle is the final per-query top-k window, whose input is already
  cut down to k*n_queries rows per partition by a partial sort-limit
  when AQE kicks in.
- **Multi-table sign-LSH top-k** — deterministic random-hyperplane
  sign buckets (functions/vector.py:hyperplanes, md5-derived so they
  are session-independent) across independent tables
  (OR-amplification); candidates share a bucket in >=1 table, then
  exact cosine rerank. Sub-linear candidate sets at scale; recall < 1
  by construction, so no SQL oracle — tested against the brute-force
  baseline (tests/test_simsearch.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feast_hive_spark.functions import vector as V


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest candidate
    vectors (excluding itself when ids collide)."""
    qid = query_id_col or id_col
    q = F.broadcast(
        queries.select(
            F.col(qid).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            V.norm(F.col(vec_col)).alias("__qn"),
        )
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        V.norm(F.col(vec_col)).alias("__cn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                V.dot(F.col("__cv"), F.col("__qv"))
                / (F.col("__cn") * F.col("__qn")),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH + exact rerank.

    OR-amplification: ``n_tables`` independent hash tables, each a
    ``n_planes``-bit sign bucket against deterministic hyperplanes;
    a vector is a candidate for a query iff they share a bucket in at
    least one table. Candidates are then exactly reranked by cosine.

    Scale shape: each table is an equi-join on (table, bucket) — hash
    partitionable, never a cross join; candidate volume per query is
    ~n_tables * n/2^n_planes, tuned by the two knobs. Recall rises as
    1-(1-p^planes)^tables; with near-random vectors (this corpus) the
    honest trade is lower selectivity, with clustered real-world
    embeddings the same knobs give sub-linear candidate sets."""
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        V.norm(F.col(vec_col)).alias("__cn"),
        *[
            V.sign_bucket(F.col(vec_col), V.hyperplanes(n_planes, dim, seed=f"t{t}"))
            .alias(f"__b{t}")
            for t in range(n_tables)
        ],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        V.norm(F.col(vec_col)).alias("__qn"),
        *[
            V.sign_bucket(F.col(vec_col), V.hyperplanes(n_planes, dim, seed=f"t{t}"))
            .alias(f"__qb{t}")
            for t in range(n_tables)
        ],
    )
    # unpivot to (id, table, bucket) rows; one equi-join per logical table
    c_buckets = c.select(
        "neighbor_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"__b{t}").alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("neighbor_id", "tb.tbl", "tb.bucket")
    q_buckets = F.broadcast(
        q.select(
            "query_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"), F.col(f"__qb{t}").alias("bucket")
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select("query_id", "tb.tbl", "tb.bucket")
    )
    cand_ids = (
        c_buckets.join(q_buckets, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    joined = (
        cand_ids.join(
            c.select("neighbor_id", "__cv", "__cn"), "neighbor_id"
        ).join(
            F.broadcast(q.select("query_id", "__qv", "__qn")), "query_id"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        joined.withColumn(
            "cosine",
            F.round(
                V.dot(F.col("__cv"), F.col("__qv"))
                / (F.col("__cn") * F.col("__qn")),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
