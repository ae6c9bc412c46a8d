"""Streaming deduplication (north-star op): exact dedup over an
unbounded stream with bounded state.

`dropDuplicates` on a stream keeps every seen key in the state store
forever; `dropDuplicatesWithinWatermark` bounds state to the watermark
horizon — the correct primitive for "drop re-deliveries within N
hours" ingest pipelines. Keys are md5 fingerprints (32 bytes/row of
state), never document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import fingerprint


def dedup_stream_exact(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first event per key; duplicates arriving within the
    watermark horizon are dropped, state evicted beyond it."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_documents(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Content dedup for a document ingest stream: fingerprint the
    normalized text (map-side, 32-byte key) and keep first arrival."""
    with_fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    return (
        with_fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
