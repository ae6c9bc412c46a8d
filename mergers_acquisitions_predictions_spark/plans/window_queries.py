"""Event-time window queries over the `events` table (SURVEY §2.9).

The reference has no streaming surface; the north star mandates
tumbling/sliding/session windows. These are implemented batch-first
with the exact builtins Structured Streaming uses (`F.window`,
`F.session_window`) so the same transform runs under `readStream`
(see `streaming/windows.py`). Oracles express window assignment with
DuckDB `time_bucket` / gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.windows import session_windows_batch, sliding_window_agg, tumbling_window_agg
from ..sources.readers import load_table
from .registry import query


@query(
    "q17_tumbling_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*)              AS n_events,
           round(sum(value), 2)  AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def q17_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows (`F.window(ts, '10 minutes')`).
    Scale: map-side partial agg per (window, type); the shuffle carries
    one row per group. Streaming variant adds `withWatermark` only."""
    e = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(e, "ts", "10 minutes", keys=["event_type"])


@query(
    "q39_asof_attribution",
    oracle="""
    SELECT purchase_id, user_id, click_id,
           CAST(date_diff('second', click_ts, purchase_ts) AS BIGINT) AS secs_between
    FROM (
        SELECT p.event_id AS purchase_id, p.user_id,
               c.event_id AS click_id, c.ts AS click_ts, p.ts AS purchase_ts,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts > p.ts - INTERVAL '30 minutes'
    )
    WHERE rn = 1
    """,
)
def q39_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (SURVEY §2.3 'not present' list): attribute each
    purchase to the user's most recent click within the preceding 30
    minutes — equi-join on user + time-range residual, then keep the
    latest match per purchase (row_number, deterministic tiebreak).

    Scale: the equi key (user) bounds the join; the range residual
    filters in-stage; one extra shuffle for the per-purchase window.
    The streaming variant is a watermarked stream-stream join
    (tests/test_stream_stream_join.py) with identical match semantics."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = p.join(
        c,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    w = W.partitionBy("purchase_id").orderBy(
        F.desc("click_ts"), F.desc("click_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts"))
            .cast("long")
            .alias("secs_between"),
        )
    )


@query(
    "q18_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                     OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts)              AS session_start,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q18_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-minute inactivity gap, per user — the
    gaps-and-islands formulation (lag → new-session flag → running sum
    → group), which matches `F.session_window` session boundaries and
    is expressible in ANSI SQL for the oracle.

    Scale: one shuffle on user_id feeds both window functions and the
    final agg (same partitioning reused)."""
    e = load_table(spark, sf_dir, "events")
    return session_windows_batch(e, ts="ts", key="user_id", gap_minutes=30, value="value")


@query(
    "q19_sliding_windows",
    oracle="""
    SELECT ws.window_start, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM events e
    CROSS JOIN LATERAL (
        SELECT unnest([
            time_bucket(INTERVAL '5 minutes', e.ts),
            time_bucket(INTERVAL '5 minutes', e.ts) - INTERVAL '5 minutes'
        ]) AS window_start
    ) ws
    GROUP BY ws.window_start
    """,
)
def q19_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide — every event
    lands in exactly 2 windows. Spark's `F.window(ts, '10 minutes',
    '5 minutes')` does the window replication natively; the oracle
    reproduces it by unnesting the two epoch-aligned window starts."""
    e = load_table(spark, sf_dir, "events")
    return sliding_window_agg(e, "ts", "10 minutes", "5 minutes")


@query(
    "q20_user_activity_gaps",
    oracle="""
    SELECT user_id, event_id,
           CAST(date_diff('second', lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), ts) AS BIGINT) AS secs_since_prev
    FROM events
    """,
)
def q20_user_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag()-based as-of lookback within a key — time between a user's
    consecutive events. The per-key sequential dependency the reference
    never needed, but any event pipeline does."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev)).cast("long").alias(
            "secs_since_prev"
        ),
    )
