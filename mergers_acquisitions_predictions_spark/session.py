"""SparkSession factory with scale-oriented defaults.

The reference tunes its cluster by hand (64 executors x 16 GB,
``acq_etl_code.scala:1``; manual ``minPartitions``,
``acq_etl_code.scala:37``). We instead lean on AQE — runtime shuffle
coalescing, skew-join splitting, and broadcast-join demotion — so the
same code runs on local[32] test boxes and a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every session we create. All of these are safe
#: on a real cluster; they are *policy*, not local-mode hacks.
ENGINE_CONF: dict[str, str] = {
    # AQE: coalesce post-shuffle partitions, split skewed joins, and
    # convert SMJ->BHJ at runtime when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas interchange (pandas_udf / toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps regardless of host TZ (oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: vectorized reader on, 128 MB split target.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Runtime Bloom-filter join pruning: inject a bloom filter built
    # from the creation side of a selective join into the other
    # side's scan — at 100 TB this prunes shuffle input for the
    # id-keyed joins (dedup cluster joins, shortlist re-rank fetch)
    # the same way DPP prunes partitions. Semantics-preserving
    # (false-positive rows are re-filtered by the join itself), so
    # oracle parity is unaffected.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def get_spark(
    app_name: str = "mergers_acquisitions_predictions_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32) when no
    cluster is configured. ``shuffle_partitions`` defaults to the local
    core count — on a real cluster leave it None and let AQE coalesce
    from a higher initial value.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(ENGINE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    conf["spark.ui.enabled"] = "false"
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
