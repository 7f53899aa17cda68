"""Skew-mitigation utilities (SURVEY §4 scale hardening).

AQE's skew-join splitting (on in this engine's sessions) handles most
hot keys by splitting oversized *partitions*, but it only applies to
sort-merge joins and can't help when a single KEY is hot on the probe
side of a shuffled hash join. Salting is the classic manual remedy:
spread each fact row across ``salt`` sub-keys and replicate the
(small) dimension side once per sub-key, so one hot key's rows land
in ``salt`` different shuffle partitions instead of one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted shuffle key.

    The fact side gets a per-row salt in ``[0, salt)``; the dimension
    side is exploded into ``salt`` replicas (one per salt value), and
    the join runs on ``on + [salt]``. Row-level results are identical
    to the plain join — each fact row matches exactly the dim replica
    carrying its salt — but a key with 10^9 fact rows now spreads over
    ``salt`` shuffle partitions instead of melting one.

    The salt is derived from ``spark_partition_id`` + a row counter
    hash, which is cheap and uniform; it need not be reproducible
    across runs because it never appears in the output. Cost model:
    dim side grows ``salt``x (it is the SMALL side by assumption —
    for dim small enough to broadcast, just ``F.broadcast`` it and
    skip salting entirely; this helper is for the mid-size dim that
    can't broadcast but joins against a skewed fact table)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # right/full would emit one null-extended row PER UNMATCHED DIM
        # REPLICA - the replication is only transparent on fact-
        # preserving joins
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = list(on)
    f = facts.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt),
        ).cast("int"),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return f.join(d, keys + ["__salt"], how).drop("__salt")


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    row_id_col: str,
    min_count: int,
    sample_bp: int = 1000,
    guard: int = 4,
) -> DataFrame:
    """Two-pass heavy-hitter detection: the values of ``value_col``
    occurring at least ``min_count`` times, with EXACT counts —
    without ever shuffling the full distinct-value set.

    Pass 1 aggregates a deterministic ``sample_bp``/10000 row sample
    (hash of ``row_id_col``; per-ROW sampling, so a value's sample
    count concentrates at rate*count) and keeps candidates whose
    sample count clears ``min_count * rate / guard``.  Pass 2
    broadcast-semi-filters the full scan to candidate values only and
    counts exactly.  At 100 TB with a heavy-tailed key column the
    exact single-pass groupBy shuffles ~every distinct value; here
    pass 1 shuffles a 10x-100x smaller sample and pass 2's shuffle
    carries only rows of the few candidate values.

    The ``guard`` divisor bounds the false-negative risk (a true
    heavy hitter sampling below threshold/guard): with rate*count >=
    10 expected sample occurrences and guard=4, the Chernoff tail is
    < 1e-4 per value — and the hash is deterministic, so a given
    dataset either always passes or always fails its exactness check
    (the registry twin IS the exact query; the gate certifies no
    hitter was missed).  Output: (value_col, n), n >= min_count."""
    rate = sample_bp / 10_000.0
    sample = df.filter(
        F.pmod(F.xxhash64(F.col(row_id_col), F.lit("hh")), F.lit(10_000))
        < F.lit(sample_bp)
    )
    cand = (
        sample.groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("__sn"))
        .filter(F.col("__sn") >= min_count * rate / guard)
        .select(value_col)
    )
    return (
        df.join(F.broadcast(cand), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight skew diagnostic for a planned join/aggregation key:
    the top-N heaviest key values with their row share, plus the
    whole-key-space concentration stats every row repeats (total rows,
    distinct keys, max single-key share, share held by the top N).
    Reading this BEFORE a big join is how you decide between a plain
    shuffle, salting (salted_join), or AQE skew splitting.

    One grouped count (partial agg collapses map-side), one top-N
    (TakeOrdered — no full sort), and a 1-row broadcast of the
    global stats. Output: (rank, key_value, n_rows, share_bp,
    total_rows, n_keys, top{N}_share_bp)."""
    # cached (r13, guide §1.3): keyed feeds the top-N AND the totals
    # scalar, and top feeds the readout AND the top-share scalar —
    # uncached, the fact scan + grouped count executed twice per run.
    # Key-domain-sized (top is top_n rows).
    keyed = df.groupBy(
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).alias(
            "key_value"
        )
    ).agg(F.count(F.lit(1)).alias("n_rows")).cache()
    top = (
        keyed.orderBy(F.col("n_rows").desc(), F.col("key_value"))
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n_rows").desc(), F.col("key_value"))
            ),
        )
        .cache()
    )
    totals = F.broadcast(
        keyed.agg(
            F.sum("n_rows").alias("total_rows"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )
    top_share = F.broadcast(
        top.agg(F.sum("n_rows").alias("__top_rows"))
    )
    return (
        top.crossJoin(totals)
        .crossJoin(top_share)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "key_value",
            "n_rows",
            F.expr("(n_rows * 10000) div total_rows").alias("share_bp"),
            "total_rows",
            "n_keys",
            F.expr("(__top_rows * 10000) div total_rows").alias("top_share_bp"),
        )
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps: float,
) -> DataFrame:
    """Inner join on the band predicate ``|left_val - right_val| <=
    eps`` WITHOUT a cartesian/BNL plan: bucket both sides at width
    ``eps`` (``floor(v / eps)``), replicate the LEFT side into its
    bucket and both neighbors (any pair within eps differs by at most
    one bucket), hash-equi-join on the bucket id, and apply the exact
    band filter post-join.

    This is the standard inequality-to-equi rewrite: Spark plans a
    raw theta join as BroadcastNestedLoopJoin (O(n*m) comparisons, one
    side broadcast whole); the bucket join shuffles on a real key and
    compares only same-neighborhood rows — O(matches + band density).
    Replication is exactly 3x on the left side only. Skewed value
    clusters (everything in one bucket) degrade toward the dense-band
    worst case, which is inherent to the predicate, not the plan.

    Column names must not collide (select/alias first).
    """
    lb = F.floor(F.col(left_val) / F.lit(eps)).cast("long")
    rb = F.floor(F.col(right_val) / F.lit(eps)).cast("long")
    lrep = left.withColumn(
        "__bkt", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    rkey = right.withColumn("__bkt", rb)
    return (
        lrep.join(rkey, "__bkt")
        .filter(
            F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(eps)
        )
        .drop("__bkt")
    )
