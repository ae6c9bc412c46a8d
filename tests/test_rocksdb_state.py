"""RocksDB state-store provider: the scale path for stateful
streaming (bounded-disk state instead of executor heap)."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from mergers_acquisitions_predictions_spark.streaming.conf import (
    disable_rocksdb_state,
    enable_rocksdb_state,
)


def test_stateful_agg_runs_on_rocksdb_provider(spark, tmp_path):
    enable_rocksdb_state(spark)
    try:
        t0 = dt.datetime(2024, 1, 1)
        src = tmp_path / "src"
        spark.createDataFrame(
            [(i % 3, t0 + dt.timedelta(minutes=i)) for i in range(9)], ["k", "ts"]
        ).write.parquet(str(src))
        stream = (
            spark.readStream.schema("k BIGINT, ts TIMESTAMP").parquet(str(src))
        )
        ckpt = tmp_path / "ckpt"
        q = (
            stream.withWatermark("ts", "1 hour")
            .groupBy("k")
            .count()
            .writeStream.format("memory")
            .queryName("t_rocksdb_agg")
            .outputMode("complete")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r.k: r["count"] for r in spark.table("t_rocksdb_agg").collect()}
        assert got == {0: 3, 1: 3, 2: 3}
        # Proof the RocksDB provider actually served the state: its
        # checkpoint artifacts are .zip snapshots / .changelog files,
        # never the HDFS provider's .delta files.
        state_files = [p.name for p in Path(ckpt).glob("state/**/*") if p.is_file()]
        assert state_files, "no state files checkpointed"
        assert not [f for f in state_files if f.endswith(".delta")]
        assert [
            f for f in state_files if f.endswith(".zip") or f.endswith(".changelog")
        ]
    finally:
        disable_rocksdb_state(spark)
