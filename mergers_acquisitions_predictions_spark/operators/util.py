"""Physical-layout helpers shared by CPU-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def repartition_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round small inputs up to cluster parallelism before expression-
    heavy per-row work (hashing, shingling).

    A 15 MB parquet file arrives as ONE split (`maxPartitionBytes`),
    which serializes minutes of per-row hashing onto a single core. At
    real scale inputs have many splits and this is a no-op; locally it
    is the difference between 1× and 32× CPU. The round-robin shuffle
    it inserts moves only the small input once, before the expensive
    projection."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
