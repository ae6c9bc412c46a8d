"""applyInPandasWithState: cumulative state across micro-batches must
converge to the batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.sources.readers import load_table
from mergers_acquisitions_predictions_spark.streaming.stateful import running_user_totals
from mergers_acquisitions_predictions_spark.streaming.windows import read_event_stream

SF = "/root/testdata/sf0.001"


def test_running_totals_across_two_microbatches(spark, tmp_path):
    # split events into two files => with maxFilesPerTrigger=1 the
    # stream processes TWO micro-batches and state must carry across
    events = load_table(spark, SF, "events")
    first, second = events.randomSplit([0.5, 0.5], seed=42)
    src = tmp_path / "src"
    first.coalesce(1).write.parquet(str(src), mode="overwrite")
    second.coalesce(1).write.parquet(str(src), mode="append")

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(events.schema)
        .parquet(str(src))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    # final (cumulative) emission per user == batch ground truth
    emitted = spark.table("t_user_totals")
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events_total").alias("n"),
            F.max("sum_value_total").alias("s"),
        )
        .collect()
    )
    truth = {
        r.user_id: (r.n, round(r.s, 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {r.user_id: (r.n, round(r.s, 6)) for r in final}
    assert got.keys() == truth.keys()
    for uid, (n, s) in truth.items():
        assert got[uid][0] == n, uid
        assert got[uid][1] == pytest.approx(s, abs=1e-6)
    # state genuinely crossed batches: some user must appear twice
    multi = emitted.groupBy("user_id").count().filter("count > 1").count()
    assert multi > 0
