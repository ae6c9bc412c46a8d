"""State-store configuration for stateful streaming at scale.

The default HDFS-backed state store keeps every key in executor heap
— fine for the test-scale watermark windows, fatal for 100 TB-corpus
streaming dedup where the key space (document fingerprints) exceeds
memory. Spark ships a RocksDB-backed provider (bundled since 3.2, no
extra dependency): state lives off-heap on local SSD with incremental
changelog checkpointing to the checkpoint location, so state size is
bounded by disk, not heap, and recovery replays a changelog instead
of re-downloading full snapshots.

These are runtime SQL confs — they apply to queries STARTED after the
conf is set and are read per-query, so batch work in the same session
is unaffected.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: RocksDB state store + changelog checkpointing: the configuration a
#: production stateful-streaming deployment of this engine runs with.
ROCKSDB_STATE_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    # Upload changelogs per batch instead of full snapshots: turns the
    # per-batch checkpoint cost from O(state size) into O(batch delta).
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    # Bound RocksDB block-cache memory across all state store
    # instances on an executor (off-heap, but still real memory).
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
}


def enable_rocksdb_state(spark: SparkSession) -> None:
    """Switch subsequently-started streaming queries to the RocksDB
    state store. Call once per session before `.start()`."""
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)


def disable_rocksdb_state(spark: SparkSession) -> None:
    """Revert to the default (HDFS-backed, heap) provider."""
    for k in ROCKSDB_STATE_CONF:
        spark.conf.unset(k)
