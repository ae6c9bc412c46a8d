"""Stream-STATIC join: an incoming document stream deduped against a
fixed corpus index — the streaming face of d12's nightly-ingest shape
(the stream-STREAM join lives in test_stream_stream_join.py). The
static side's banded frame is computed once per plan and joined into
every micro-batch; the streaming side bands without persisting
(caching a streaming frame is illegal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.operators.dedup import (
    incremental_neardup_candidates,
)
from mergers_acquisitions_predictions_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_shard_vs_static_index(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    is_new = F.col("source").isin("src18", "src19")
    shard, index = docs.filter(is_new), docs.filter(~is_new)

    # Batch ground truth.
    want = {
        (r.new_id, r.index_id)
        for r in incremental_neardup_candidates(shard, index).collect()
    }
    assert want  # synthetic sources share near-dup texts

    # Same operator, streaming shard: parquet file source over the
    # shard, static index side unchanged.
    shard_dir = str(tmp_path / "shard")
    shard.write.parquet(shard_dir)
    stream = spark.readStream.schema(docs.schema).parquet(shard_dir)
    out = incremental_neardup_candidates(stream, index)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_stream_static")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.new_id, r.index_id) for r in spark.table("t_stream_static").collect()}
    assert got == want
