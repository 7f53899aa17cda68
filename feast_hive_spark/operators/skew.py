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

from pyspark.sql import DataFrame
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
