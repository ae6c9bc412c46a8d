"""Physical-layout helpers shared by CPU-heavy operators."""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def own_caches(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Tie persisted ``frames`` to ``result``'s lifetime: when the
    Python object for ``result`` is garbage-collected, each frame is
    unpersisted — so operators can persist reused intermediates (the
    LSH banded frame, the Jaccard postings frame) without leaking
    cached partitions across a long-lived session that runs many
    queries back-to-back (the driver harness runs 50+).

    Ownership TRANSFERS through composition: if a frame in ``frames``
    itself owns caches (it came from an operator that called
    own_caches), those move to ``result`` and the intermediate's own
    finalizer becomes a no-op — a wrapper plan dying early inside a
    composing operator (e.g. the candidate frame inside
    lsh-then-verify) can then never release a cache the final plan
    still needs. Unpersisting is a perf knob, never a correctness one:
    a released plan silently recomputes."""
    owned: list[DataFrame] = []
    for f in frames:
        inherited = getattr(f, "_owned_caches", None)
        if inherited:
            owned.extend(inherited)
            inherited.clear()
        lvl = f.storageLevel
        if lvl.useMemory or lvl.useDisk:
            owned.append(f)
    result._owned_caches = owned

    def _release(frames: list[DataFrame] = owned) -> None:
        for c in frames:
            try:
                c.unpersist(blocking=False)
            except Exception:  # session already stopped — nothing to free
                pass

    weakref.finalize(result, _release)
    return result


def repartition_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round small inputs up to cluster parallelism before expression-
    heavy per-row work (hashing, shingling).

    A 15 MB parquet file arrives as ONE split (`maxPartitionBytes`),
    which serializes minutes of per-row hashing onto a single core. At
    real scale inputs have many splits and this is a no-op; locally it
    is the difference between 1× and 32× CPU. The round-robin shuffle
    it inserts moves only the small input once, before the expensive
    projection."""
    if df.isStreaming:  # partitioning is the source's concern per micro-batch
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
