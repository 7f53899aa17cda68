"""Latest-per-key pull (materialization query).

Re-expression of ``pull_latest_from_table_or_query``
(feast_hive/hive.py:143-190): within ``[start_date, end_date]``, keep
the newest row per entity key, ordering by event timestamp then
created timestamp, both descending (window at hive.py:181, rank
filter ``feast_row_ = 1`` at hive.py:185, BETWEEN filter at
hive.py:183, dummy-entity branch at hive.py:159-163/:178).

Spark shape: one ``row_number`` window over a partition by the join
keys. Physical plan at scale: the BETWEEN filter is pushed to the
parquet scan (row-group min/max skipping on the timestamp column —
and partition pruning when ``date_partition_column`` is set, the knob
the reference plumbed through but never used, SURVEY §4), then exactly
ONE hash-shuffle by join keys for the window. No join, no temp table.
"""

from __future__ import annotations

from datetime import datetime
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Parity with Feast's DUMMY_ENTITY_* for entity-less feature views
# (reference template else-branch, hive.py:543-544 / :178).
DUMMY_ENTITY_ID = "__dummy_id"
DUMMY_ENTITY_VAL = ""


def pull_latest(
    source_df: DataFrame,
    join_key_columns: Sequence[str],
    feature_name_columns: Sequence[str],
    event_timestamp_column: str,
    created_timestamp_column: Optional[str],
    start_date: datetime,
    end_date: datetime,
    date_partition_column: Optional[str] = None,
    tiebreak_columns: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key in a time range.

    ``tiebreak_columns``: extra descending sort columns after
    (event_ts, created_ts) making row selection deterministic when
    full timestamp ties exist — the reference leaves that choice to
    Hive's nondeterminism; a deterministic engine is strictly better
    and required for oracle hash-matching.
    """
    ts_cols = [event_timestamp_column]
    # Guard against created == event (reference: hive.py:164's
    # "not in timestamps" check) - a duplicate output column name would
    # break downstream resolution.
    if created_timestamp_column and created_timestamp_column not in ts_cols:
        ts_cols.append(created_timestamp_column)

    df = source_df
    if date_partition_column:
        # Partition pruning: prune whole date partitions before the
        # row-level timestamp filter (fixes the reference's unused knob).
        df = df.filter(
            F.col(date_partition_column).between(
                F.lit(start_date.date()), F.lit(end_date.date())
            )
        )
    df = df.filter(
        F.col(event_timestamp_column).between(F.lit(start_date), F.lit(end_date))
    )

    if join_key_columns:
        partition = [F.col(c) for c in join_key_columns]
        out_keys = list(join_key_columns)
    else:
        # Entity-less feature view: constant dummy key, global window
        # (hive.py:159-163, :178). The degenerate single-partition
        # window is fine: it only ever sees the filtered range.
        df = df.withColumn(DUMMY_ENTITY_ID, F.lit(DUMMY_ENTITY_VAL))
        partition = [F.col(DUMMY_ENTITY_ID)]
        out_keys = [DUMMY_ENTITY_ID]

    order = [F.col(c).desc() for c in ts_cols] + [
        F.col(c).desc() for c in tiebreak_columns
    ]
    w = Window.partitionBy(*partition).orderBy(*order)
    return (
        df.withColumn("__feast_row", F.row_number().over(w))
        .filter(F.col("__feast_row") == 1)
        .select(*out_keys, *feature_name_columns, *ts_cols)
    )
