"""Sinks (SURVEY §2.1, S6–S8).

The reference's single-file export drops out of Catalyst into the RDD
API (``predictions.scala:39-41``: ``rdd.coalesce(1).map(...).
saveAsTextFile``); ours stays in the DataFrame writer so compression,
schema and stats come for free. ``coalesce(1)`` is only offered for
small final results — at scale, write partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
    dynamic_overwrite: bool = False,
) -> None:
    """Parquet sink (S6, `acq_etl_code.scala:104`). `partition_by` for
    partition-pruned downstream scans at scale.

    ``dynamic_overwrite``: with a partitioned table, replace ONLY the
    partitions present in ``df`` and leave the rest untouched — the
    nightly-ingest idiom at 100 TB (re-run one day's shard without
    rewriting, or accidentally truncating, the whole table; Spark's
    default STATIC overwrite deletes every existing partition first).
    Implemented with the session conf
    `spark.sql.sources.partitionOverwriteMode=dynamic`, scoped to this
    write and restored after."""
    conf = df.sparkSession.conf
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = conf.get(key, None)
    if dynamic_overwrite:
        conf.set(key, "dynamic")
    try:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
    finally:
        if dynamic_overwrite:
            if prev is None:
                conf.unset(key)
            else:
                conf.set(key, prev)


def publish_parquet_atomic(df: DataFrame, path: str) -> None:
    """Overwrite a parquet artifact at ``path`` with a NEAR-ATOMIC
    swap: write to a process-unique staging twin, then promote via two
    directory renames. A plain ``mode('overwrite')`` deletes the old
    files before writing new ones, so a concurrent reader can see a
    partially-written directory for the whole write duration; here the
    reader-visible window is the two renames (ADVICE r5 — the
    artifact-handshake oracles re-read the path their query just
    wrote, and a concurrent evaluator at another SF could otherwise
    catch a partial ``read_parquet``). A torn read is still POSSIBLE
    in the rename gap and across interleaved processes — it yields a
    visible mismatch, never a false pass; the handshake contract is
    single-evaluator-sequential (see plans/handshake.py).

    Renames go through the Hadoop FileSystem API (`sources/fs.py`), so
    the same staged-write → promote → reap plan runs on the local FS,
    HDFS, or an object store (where "rename" is the connector's
    copy+delete — fine for these driver-sized artifacts). Failure
    discipline (ADVICE r6): the previous artifact is deleted ONLY
    after the promote rename succeeds; if the promote fails after the
    original was moved aside, the original is renamed back, so a
    failed publish leaves the OLD artifact at ``path`` — never
    nothing."""
    import os
    import uuid

    from .fs import fs_delete, fs_exists, fs_rename

    spark = df.sparkSession
    tok = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
    staging = f"{path}.staging_{tok}"
    df.write.mode("overwrite").parquet(staging)
    old = f"{path}.old_{tok}"
    moved_aside = False
    try:
        if fs_exists(spark, path):
            fs_rename(spark, path, old)
            moved_aside = True
        fs_rename(spark, staging, path)
    except BaseException:
        if moved_aside and not fs_exists(spark, path):
            try:
                fs_rename(spark, old, path)  # restore the previous artifact
            except OSError:
                pass  # leave .old_<tok> for manual recovery
        fs_delete(spark, staging)
        raise
    if moved_aside:
        fs_delete(spark, old)
    spark.catalog.refreshByPath(path)
    from ..operators.util import invalidate_path_fingerprints

    invalidate_path_fingerprints(path)  # memo layer sees this write NOW


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (S7, `join_acquirers.scala:37`)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_single_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """Single-file CSV sink (S8, `predictions.scala:39-41`) — the
    DataFrame-native version of the reference's RDD detour. Only for
    driver-sized results (top-k exports); everything else should use
    :func:`write_csv`."""
    df.coalesce(1).write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-Lines sink (one JSON object per line, splittable on read).
    Distributed multi-part output like the parquet sink — a single
    consolidated file is an anti-pattern at corpus scale; use
    `write_single_csv`'s coalesce approach only for driver-sized
    finals."""
    df.write.mode(mode).json(path)


def write_token_balanced_shards(
    docs: DataFrame,
    path: str,
    tokens_per_shard: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Materialize a corpus as token-balanced training shards:
    `curation.shard_by_token_budget` assigns shard ids on the NARROW
    (id, token-count) frame (text never rides the ordering shuffles),
    the docs join back by id (one hash join — AQE broadcasts the
    narrow side when it fits), and the write repartitions on `shard`
    so each shard becomes one parquet directory with one writer task:
    `path/shard=N/`. Downstream loaders partition-prune by shard."""
    from ..operators.curation import shard_by_token_budget

    assign = shard_by_token_budget(docs, tokens_per_shard, text_col, id_col)
    (
        docs.join(assign.select(id_col, "shard"), id_col)
        .repartition("shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def write_parquet_observed(
    df: DataFrame,
    path: str,
    metrics: dict,
    mode: str = "overwrite",
    partition_by=None,
) -> dict:
    """Parquet sink with SINGLE-PASS metrics via Spark's Observation
    API: the named aggregate expressions in ``metrics`` (e.g.
    ``{"n_docs": F.count(F.lit(1)), "tokens": F.sum("n_tokens")}``)
    are accumulated DURING the write and returned as a dict — no
    second scan of the data to answer "how many rows/tokens did the
    nightly job emit?". At 100 TB a post-hoc count re-reads the
    table; an observation is free (metrics ride the write tasks).

    Only Observation-legal aggregates apply (no distinct, no order-
    dependent aggs); returns ``{name: value}``.

    SESSION CAVEAT (round 14): SparkSession.observationManager is the
    session's only NON-transient lazy field (Spark 4.1) — the first
    Observation initializes it, and every later Java serialization of
    a session-capturing closure in the same session then fails
    (MLlib models carry their session via trainingSummary:
    `NotSerializableException: ObservationManager`). No registered
    query path uses this sink; keep it out of sessions that later
    ship MLlib models into task closures (see build_bm25_index's
    derived-stats spelling for the workaround)."""
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    named = [expr.alias(name) for name, expr in metrics.items()]
    observed = df.observe(obs, *named)
    w = observed.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return dict(obs.get)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by=None
) -> None:
    """ORC sink — the columnar alternative for Hive-era consumers.
    Same layout discipline as `write_parquet` (multi-part distributed
    output; `partition_by` for pruned downstream scans)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction — the table-maintenance pass every
    long-lived 100 TB dataset needs: streaming ingest, dynamic
    partition overwrites, and per-shard re-runs all accrete small
    parquet files, and scan cost at scale is dominated by file-open
    overhead once files shrink below the split target. Rewrites the
    table at ~``target_file_bytes`` per file (matching the session's
    ``maxPartitionBytes`` scan split by default) with the same
    crash-safe rename promotion as the upsert sink: a complete table
    exists under ``path`` or its ``.old`` twin at every instant (the
    promote gap restores ``.old`` → ``path`` on failure).

    Returns (n_input_files, n_output_files). File sizing and the
    staging swap go through the Hadoop FileSystem API
    (`sources/fs.py`), so the same plan (list → read →
    repartition(n) → staged write → swap) runs against HDFS/S3, not
    just the local FS (VERDICT r6 #2). Compaction is layout-only:
    content equality is asserted by the roundtrip test, and readers
    see the new files immediately (refreshByPath clears the listing
    cache)."""
    import math

    from .fs import fs_delete, fs_list_files, fs_rename

    files = fs_list_files(spark, path, ".parquet")
    if not files:
        raise ValueError(f"no parquet files under {path}")
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".compacting"
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    old = path.rstrip("/") + ".old"
    fs_rename(spark, path, old)
    try:
        fs_rename(spark, staging, path)
    except BaseException:
        # Restore so a complete table stays served. On S3A the promote
        # "rename" is copy+delete, so a mid-copy failure can leave a
        # PARTIAL destination — which the strict no-overwrite restore
        # rename would refuse, masking the original error and
        # stranding the table at .old (ADVICE r7): clear any partial
        # dst first, and if even the restore fails, let the ORIGINAL
        # exception propagate (the .old twin still holds the table).
        try:
            fs_delete(spark, path)
            fs_rename(spark, old, path)
        except OSError:
            pass  # .old keeps the complete table for manual recovery
        raise
    fs_delete(spark, old)
    spark.catalog.refreshByPath(path)
    from ..operators.util import invalidate_path_fingerprints

    invalidate_path_fingerprints(path)  # memo layer sees this write NOW
    return len(files), n_out
