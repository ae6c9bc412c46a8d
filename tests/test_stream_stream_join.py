"""Watermarked stream-stream join: click→purchase pairs joined across
two live streams must equal the batch join on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.sources.readers import load_table
from mergers_acquisitions_predictions_spark.streaming.windows import read_event_stream

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted((r.purchase_id, r.click_id) for r in df.collect())


def test_stream_stream_join_equals_batch(spark, tmp_path):
    import shutil

    d = tmp_path / "events"
    d.mkdir()
    shutil.copy(SF + "/events.parquet", d / "events.parquet")

    def split(df):
        p = df.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        c = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        return p, c

    cond = (
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
    )

    # streaming: both sides watermarked; the time-range condition bounds
    # each side's join state (Spark derives the state horizon from it)
    sp, sc = split(read_event_stream(spark, str(d)))
    stream_join = (
        sp.withWatermark("purchase_ts", "1 hour")
        .join(sc.withWatermark("click_ts", "1 hour"), cond, "inner")
        .select("purchase_id", "click_id")
    )
    q = (
        stream_join.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    bp, bc = split(load_table(spark, SF, "events"))
    batch_join = bp.join(bc, cond, "inner").select("purchase_id", "click_id")

    got = _pairs(spark.table("t_ss_join"))
    want = _pairs(batch_join)
    assert got == want and len(got) > 0
