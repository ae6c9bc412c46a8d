"""Structured Streaming wiring for the window operators (SURVEY §2.9 —
absent from the reference; north-star requirement).

Batch-first design: the transforms in `operators/windows.py` use the
same `F.window` / `F.session_window` builtins Structured Streaming
executes incrementally, so the streaming surface is watermark + sink
wiring around the identical logic. tests/test_streaming.py proves the
streamed result equals the batch result on the same data
(`Trigger.AvailableNow`).

Scale notes: watermarks bound the state store (late data beyond the
watermark is dropped); state is partitioned by the grouping key, so
session state for a user lives on one executor; `availableNow` gives
batch-backfill semantics with the same code that serves live streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import normalize_events_ts


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """`readStream` over a parquet directory of events. Streaming
    sources require an explicit schema; we peek it with a batch read
    of the same directory (footer metadata only, driver-side) so the
    stream tracks whatever physical ts encoding the files carry, then
    normalize ts exactly like the batch reader (oracle parity)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    return normalize_events_ts(spark.readStream.schema(schema).parquet(path))


def streaming_tumbling_counts(
    events: DataFrame,
    length: str = "10 minutes",
    watermark: str = "1 hour",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregate with a watermark: identical grouping
    to `operators.windows.tumbling_window_agg`, plus the late-data
    bound that lets the state store evict closed windows."""
    win = F.window(F.col("ts"), length)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), *(keys or []))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), *(keys or []), "n_events", "sum_value"
        )
    )


def streaming_session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    """Session windows via the native `F.session_window` (stateful
    merge-on-gap). Batch gaps-and-islands (`session_windows_batch`)
    produces the same session boundaries; this variant is the one that
    runs incrementally with bounded state."""
    win = F.session_window(F.col("ts"), gap)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming frame over all currently-available input
    (batch-backfill semantics), collect into an in-memory table, and
    return it as a DataFrame. Complete output mode: aggregates."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
