"""Structured Streaming ingest of the events table (SURVEY §7).

The reference has no streaming at all (SURVEY §2.6); this module is
the engine's streaming extension, built on the idiomatic stack:
``readStream`` -> watermark -> windowed aggregation -> sink. The batch
twin of the windowed rollup is registry:events_daily_rollup, so the
semantics are cross-checkable.

Scale notes: windowed aggs with watermarks keep state bounded (late
rows beyond the watermark are dropped); state is hash-partitioned by
(window, keys) across executors. `sessionize` shows
``applyInPandasWithState`` for custom per-key state machines —
timeouts evict idle keys, so state is O(active keys) not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) -> long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch locally; on a cluster this would be a kafka source
    with the same downstream plan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("path", f"{sf_dir}")
        .option("pathGlobFilter", "events.parquet")
        .load()
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding windowed counts + sums per event_type with
    late-data handling via watermark."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: built-in ``session_window`` (gap-based
    merge of activity), the declarative form of a custom stateful
    operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (count, sum) state machine, emitting the updated
    totals on every micro-batch.

    This is the escape hatch for semantics the built-in windowed aggs
    can't express (arbitrary per-key state transitions). State is
    hash-partitioned by key across executors and lives in the state
    store; with a timeout configured, idle keys are evicted so state
    stays O(active keys). Arrow-batched like any Pandas UDF."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(result: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drive a streaming plan to completion against the memory sink
    (local smoke path: one parquet file -> one micro-batch)."""
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
