"""Streaming = batch equivalence: the same window transforms, run
incrementally with Trigger.AvailableNow, must produce the batch result
(SURVEY §2.9 / streaming/windows.py)."""

from __future__ import annotations

import pytest

from mergers_acquisitions_predictions_spark.operators.windows import (
    session_windows_batch,
    tumbling_window_agg,
)
from mergers_acquisitions_predictions_spark.sources.readers import load_table
from mergers_acquisitions_predictions_spark.streaming.windows import (
    read_event_stream,
    run_available_now,
    streaming_session_windows,
    streaming_tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # streaming file sources require a DIRECTORY of files
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(SF + "/events.parquet", d / "events.parquet")
    return str(d)


def _norm(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streaming_tumbling_equals_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    assert stream.isStreaming
    got = run_available_now(
        streaming_tumbling_counts(stream, "10 minutes", keys=["event_type"]),
        "t_tumbling",
    )
    want = tumbling_window_agg(
        load_table(spark, SF, "events"), "ts", "10 minutes", keys=["event_type"]
    )
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _norm(got, cols) == _norm(want, cols)


def test_streaming_sessions_equal_batch_islands(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_available_now(
        streaming_session_windows(stream, gap="30 minutes"), "t_sessions"
    )
    want = session_windows_batch(
        load_table(spark, SF, "events"), ts="ts", key="user_id", gap_minutes=30
    )
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _norm(got, cols) == _norm(want, cols)


def test_streaming_bpe_encode_equals_batch(spark, tmp_path_factory):
    """The tokenization pass is stateless map work, so its streaming
    form (nightly incremental encode of newly-landed files) must equal
    the batch encode byte-for-byte — append mode, no state, no
    watermark needed."""
    import shutil

    from pyspark.sql import functions as F

    from mergers_acquisitions_predictions_spark.operators.bpe import (
        bpe_segment,
        bpe_token_count,
    )
    from mergers_acquisitions_predictions_spark.plans.text_queries import T26_MERGES

    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(SF + "/documents.parquet", d / "documents.parquet")
    batch = spark.read.parquet(str(d))

    def encode(df):
        seg = bpe_segment("text", [(a, b) for a, b in T26_MERGES])
        return df.select("doc_id", bpe_token_count(seg).alias("n_bpe_tokens"))

    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    q = (
        encode(stream)
        .writeStream.format("memory")
        .queryName("t_bpe_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_bpe_stream")
    cols = ["doc_id", "n_bpe_tokens"]
    assert _norm(got, cols) == _norm(encode(batch), cols)
