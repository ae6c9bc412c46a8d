"""foreachBatch upsert sink: re-keyed rows across micro-batches must
leave exactly one (latest) row per key."""

from __future__ import annotations

import datetime as dt
import os

from mergers_acquisitions_predictions_spark.streaming.sinks import upsert_parquet_sink


def test_upsert_across_microbatches(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    b1 = spark.createDataFrame(
        [(1, "a", t0), (2, "b", t0)], ["k", "v", "ts"]
    )
    b2 = spark.createDataFrame(
        [(1, "a2", t0 + dt.timedelta(minutes=1)), (3, "c", t0)], ["k", "v", "ts"]
    )
    src = tmp_path / "src"
    stamped = set()
    for i, df in enumerate([b1, b2]):
        df.coalesce(1).write.parquet(str(src), mode="overwrite" if i == 0 else "append")
        for p in src.glob("part-*.parquet"):
            if p.name not in stamped:
                os.utime(p, (1_700_000_000 + i,) * 2)
                stamped.add(p.name)

    stream = spark.readStream.option("maxFilesPerTrigger", 1).schema(b1.schema).parquet(
        str(src)
    )
    q = upsert_parquet_sink(
        stream, str(tmp_path / "table"), key_cols=["k"], version_col="ts"
    )
    q.awaitTermination()

    final = {r.k: r.v for r in spark.read.parquet(str(tmp_path / "table")).collect()}
    # key 1 upserted to its batch-2 value; 2 and 3 present once
    assert final == {1: "a2", 2: "b", 3: "c"}
