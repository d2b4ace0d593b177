"""Structured Streaming over the events table: watermarked event-time
windows for late data, and a custom stateful operator via
``applyInPandasWithState``.

These extend the engine's streaming surface beyond the stateless
extraction stream (extract_stream.py): the reference is pure batch, but a
100 TB ingest pipeline needs (a) late-data-correct time aggregation and
(b) arbitrary keyed state (running per-user counters, sessionization).

Scale notes:
- the windowed aggregate shuffles once on (window, event_type) with
  partial aggregation map-side; the watermark bounds state size — without
  it, every window ever seen stays in the state store forever;
- ``applyInPandasWithState`` state lives in the state store keyed by
  user_id; per-batch output is one row per UPDATED key, not per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming form of q_events_hourly: event-time hourly windows with a
    watermark so late rows within ``watermark`` still land in their window
    and state for closed windows is dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("win").start, "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-user
    event count + value sum, persisted in the state store across
    micro-batches AND across restarts from the same checkpoint.  Emits one
    row per user per batch in which that user had events."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
