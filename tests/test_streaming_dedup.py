"""Streaming dedup + watermark late-data semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.streaming.dedup import (
    dedup_stream_documents,
    dedup_stream_exact,
)


def _stream_from_files(spark, tmp_path, dfs, schema):
    # FileStreamSource orders files by modification time; force
    # strictly increasing mtimes so micro-batch order matches list order
    import os

    src = tmp_path / "src"
    stamped: set[str] = set()
    for i, df in enumerate(dfs):
        df.coalesce(1).write.parquet(str(src), mode="overwrite" if i == 0 else "append")
        for p in src.glob("part-*.parquet"):
            if p.name not in stamped:
                os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
                stamped.add(p.name)
    return spark.readStream.option("maxFilesPerTrigger", 1).schema(schema).parquet(
        str(src)
    )


def test_stream_dedup_drops_redeliveries(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    batch1 = spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(minutes=1))], ["k", "ts"]
    )
    # batch 2 redelivers key 1 (within watermark) + a new key 3
    batch2 = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=2)), (3, t0 + dt.timedelta(minutes=3))],
        ["k", "ts"],
    )
    stream = _stream_from_files(spark, tmp_path, [batch1, batch2], batch1.schema)
    q = (
        dedup_stream_exact(stream, ["k"], "ts", "1 hour")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t_dedup").collect()
    assert sorted(r.k for r in out) == [1, 2, 3]  # key 1 exactly once


def test_document_stream_content_dedup(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    docs = spark.createDataFrame(
        [
            (10, "Hello   World", t0),
            (11, "hello world", t0 + dt.timedelta(minutes=1)),  # normalized dup
            (12, "something else", t0 + dt.timedelta(minutes=2)),
        ],
        ["doc_id", "text", "ingest_ts"],
    )
    stream = _stream_from_files(spark, tmp_path, [docs], docs.schema)
    q = (
        dedup_stream_documents(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_doc_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = sorted(r.doc_id for r in spark.table("t_doc_dedup").collect())
    assert len(kept) == 2 and 12 in kept  # one of {10,11} + 12


def test_watermark_finalized_window_not_resurrected_by_late_row(spark, tmp_path):
    """Append-mode windowed agg: after the watermark passes a window's
    end and the window is emitted+evicted, a very-late row for that
    window is dropped — the window is emitted exactly once with the
    on-time sum. (Spark only guarantees the drop once the watermark
    has actually advanced past the window in a PRIOR batch — a late
    row landing in the same batch as the watermark jump may still be
    merged, which is why this test finalizes the window first.)"""
    t0 = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(rows, ["user_id", "ts", "value"])

    batches = [
        mk([(1, t0 + dt.timedelta(minutes=m), 1.0) for m in (0, 1, 2)]),
        mk([(1, t0 + dt.timedelta(hours=3), 1.0)]),  # advances watermark to 2h
        mk([(1, t0 + dt.timedelta(hours=3, minutes=1), 1.0)]),  # evicts window 1
        mk([(1, t0 + dt.timedelta(minutes=4), 100.0)]),  # very late: dropped
        mk([(1, t0 + dt.timedelta(hours=3, minutes=2), 1.0)]),
    ]
    stream = _stream_from_files(spark, tmp_path, batches, batches[0].schema)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.sum("value").alias("s"))
        .select(F.col("w.start").alias("ws"), "s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emissions = [r.s for r in spark.table("t_late").collect() if r.ws == t0]
    assert emissions == [3.0]  # exactly one emission, late 100.0 dropped


def test_stream_near_dedup_drops_signature_collisions(spark, tmp_path):
    from mergers_acquisitions_predictions_spark.streaming.dedup import (
        dedup_stream_near,
    )

    t0 = dt.datetime(2024, 1, 1)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch1 = spark.createDataFrame(
        [(1, base, t0), (2, "totally different words entirely here now", t0)],
        ["doc_id", "text", "ingest_ts"],
    )
    # doc 3 = byte-identical near-dup of doc 1 (same signature);
    # doc 4 = genuinely new; docs 5/6 are shingle-less (too short) and
    # must NOT collide with each other despite both lacking signatures
    batch2 = spark.createDataFrame(
        [
            (3, base, t0 + dt.timedelta(minutes=1)),
            (4, "yet another unrelated document body with words", t0 + dt.timedelta(minutes=1)),
            (5, "tiny", t0 + dt.timedelta(minutes=2)),
            (6, "small", t0 + dt.timedelta(minutes=2)),
        ],
        ["doc_id", "text", "ingest_ts"],
    )
    stream = _stream_from_files(spark, tmp_path, [batch1, batch2], batch1.schema)
    q = (
        dedup_stream_near(stream, "text", "ingest_ts", "1 hour")
        .writeStream.format("memory")
        .queryName("t_near_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = sorted(r.doc_id for r in spark.table("t_near_dedup").collect())
    assert kept == [1, 2, 4, 5, 6]  # 3 collapsed into 1; 5/6 both kept
