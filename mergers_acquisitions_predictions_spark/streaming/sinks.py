"""foreachBatch sinks: the escape hatch for sinks Structured Streaming
lacks natively (upserts, multi-table writes, JDBC merges).

`upsert_parquet_sink` maintains a keyed parquet table: each
micro-batch replaces rows whose key re-appears (latest by a version
column wins). Plain parquet has no MERGE, so the upsert is
read → anti-join → union → write-to-staging → atomic swap. On a real
lakehouse the body of `upsert_batch` becomes a Delta/Iceberg MERGE
INTO and the staging dance disappears — the streaming wiring is
identical.

Scale notes: rewrite cost is O(table), so this pattern fits compact
keyed state (feature tables, per-entity aggregates), not event logs —
append sinks or MERGE-capable formats cover those.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def upsert_batch(
    batch_df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    version_col: str,
    batch_id: int = 0,
) -> None:
    """ONE micro-batch of the keyed upsert — IDEMPOTENT by
    construction: re-delivering the same batch merges the same rows
    into the same keys and the table is byte-equal, which is what
    makes this sink the staging layer of the exactly-once index
    ingest (`streaming/serving.ingest_batch_staged` — VERDICT r12
    #3). Factored out of `upsert_parquet_sink` (round 13, the
    s15/s40 factoring) so the streaming sink and batch-shaped
    replays run the IDENTICAL per-batch body."""
    spark = batch_df.sparkSession
    table = Path(table_dir)

    def latest_per_key(df: DataFrame) -> DataFrame:
        # Deterministic winner even on version ties: the incoming
        # batch beats the existing table (__src desc), and any
        # remaining duplicates order by a full-row hash — never by
        # physical row order.
        w = W.partitionBy(*key_cols).orderBy(
            F.desc(version_col),
            F.desc("__src"),
            F.asc(F.hash(*[c for c in df.columns if c != "__src"])),
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )

    fresh = batch_df.withColumn("__src", F.lit(1))
    if table.exists():
        current = spark.read.parquet(str(table)).withColumn("__src", F.lit(0))
        merged = latest_per_key(current.unionByName(fresh))
    else:
        merged = latest_per_key(fresh)
    staging = table.with_name(table.name + f".staging{batch_id}")
    merged.write.mode("overwrite").parquet(str(staging))
    # Crash-safe promotion (rename-rename-delete): the live table
    # is renamed ASIDE before staging takes its place, so a crash
    # at any point leaves a complete table under `table` or
    # `old` — never a window with neither.
    old = table.with_name(table.name + f".old{batch_id}")
    if table.exists():
        table.rename(old)
    staging.rename(table)
    if old.exists():
        shutil.rmtree(old)
    # The swap happened behind Spark's back: the session's file
    # listing cache (metadataCacheTTLSeconds = -1 by default) will
    # otherwise serve any reader who touched this path BEFORE the
    # upsert a stale file list — observed as a same-session reader
    # seeing the pre-upsert table (tests/test_foreachbatch_sink).
    spark.catalog.refreshByPath(str(table))


def upsert_parquet_sink(
    stream_df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    version_col: str,
    query_name: str = "upsert_sink",
):
    """Start a streaming query that upserts each micro-batch into
    ``table_dir`` keyed by ``key_cols`` (highest ``version_col``
    wins, within and across batches)."""

    def do_upsert(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(batch_df, table_dir, key_cols, version_col, batch_id)

    return (
        stream_df.writeStream.foreachBatch(do_upsert)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
