"""Event-time window operators (batch-first; reused by streaming/).

The reference has no streaming/stateful surface (SURVEY §2.9). These
implement the standard window family with Spark builtins so that the
identical transform runs on a static DataFrame (oracle-checkable) and
under Structured Streaming (`streaming/windows.py` adds watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def tumbling_window_agg(
    df: DataFrame,
    ts: str,
    length: str,
    keys: list[str] | None = None,
    value: str = "value",
) -> DataFrame:
    """Non-overlapping fixed windows via `F.window` (epoch-aligned, so
    DuckDB `time_bucket` assigns identically). Emits window_start plus
    count/sum aggregates.

    Scale: grouping key is (window, *keys) — partial aggregation
    map-side, shuffle carries one row per group per partition."""
    win = F.window(F.col(ts), length)
    return (
        df.groupBy(win.alias("w"), *(keys or []))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *(keys or []), "n_events", "sum_value")
    )


def sliding_window_agg(
    df: DataFrame,
    ts: str,
    length: str,
    slide: str,
    value: str = "value",
) -> DataFrame:
    """Overlapping windows via `F.window(ts, length, slide)` — Spark
    replicates each row into length/slide windows before aggregating.

    Scale: the replication factor is length/slide (here 2×) on the
    map side only; the shuffle still carries aggregated rows."""
    win = F.window(F.col(ts), length, slide)
    return (
        df.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_windows_batch(
    df: DataFrame,
    ts: str,
    key: str,
    gap_minutes: int,
    value: str = "value",
) -> DataFrame:
    """Session windows by inactivity gap — gaps-and-islands on a batch
    frame: lag → new-session flag → running count → group by (key,
    session). Boundary semantics match `F.session_window(ts, gap)`;
    the streaming variant in `streaming/windows.py` uses that builtin.

    Scale: a single hash partition on `key` serves the lag window, the
    running sum, and the final aggregate — Catalyst reuses the
    Exchange, so this is ONE shuffle end-to-end."""
    w = W.partitionBy(key).orderBy(ts, "event_id")
    # Interval-exact comparison (microsecond precision) — unix_timestamp
    # truncates to seconds and would disagree with the oracle on gaps
    # within 1s of the boundary.
    prev = F.lag(ts).over(w)
    new_session = (
        F.when(
            prev.isNull()
            | (F.col(ts) > prev + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
            1,
        ).otherwise(0)
    )
    run = W.partitionBy(key).orderBy(ts, "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        df.select(key, ts, value, "event_id")
        .withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy(key, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 2).alias("sum_value"),
        )
        .select(key, "session_start", "n_events", "sum_value")
    )
