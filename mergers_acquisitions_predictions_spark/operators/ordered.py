"""Globally-ordered computations that avoid the single-partition
window trap.

A plain ``Window.orderBy(key)`` with no ``partitionBy`` collapses the
whole table into ONE task — the canonical Spark scale cliff. The
operators here keep global-order semantics while staying distributed:
range-partition by the order key (so partition i holds keys strictly
below partition i+1), compute per-partition prefix aggregates in
parallel, then shift each partition by the total of the partitions
before it — a two-phase scan, the textbook parallel prefix-sum shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .util import own_local_checkpoint


def _order_cols(order_col: str | Sequence[str]) -> list[str]:
    return [order_col] if isinstance(order_col, str) else list(order_col)


def _ranged_with_pid(df: DataFrame, cols: list[str]) -> DataFrame:
    """Range-partition by the order key(s) — partition i holds keys
    strictly below partition i+1 — stamp the partition id, and
    MATERIALIZE via ``localCheckpoint(eager=True)``.

    The checkpoint is load-bearing for correctness, not a cache:
    the two consumers (per-partition scan and per-partition totals)
    would otherwise each execute their own copy of the range
    exchange, and `repartitionByRange` boundaries come from a
    per-execution reservoir sample (plus AQE coalescing) — the two
    executions are USUALLY identical but not guaranteed, and a
    boundary mismatch silently corrupts every rank/offset (observed
    once at 1M rows with a cached input: Σrow_number was 0.67% high).
    One materialization ⇒ one partitioning ⇒ both consumers read the
    same blocks. Callers transfer block ownership to their result via
    `own_local_checkpoint` / `own_caches` (see that contract)."""
    ranged = df.repartitionByRange(*[F.col(c) for c in cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    return ranged.localCheckpoint(eager=True)


def global_running_sum(
    df: DataFrame,
    order_col: str | Sequence[str],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Running sum of ``value_col`` in global ``order_col`` order,
    INCLUSIVE of the current row, without ever funnelling the table
    through one task.

    Plan: ``repartitionByRange(order_col)`` (range partitioning makes
    partition boundaries respect the global order) → per-partition
    cumulative sum via a window keyed on ``spark_partition_id()`` →
    per-partition totals (one tiny row per partition) turned into
    exclusive prefix offsets on the driver-sized side and broadcast
    back. Two distributed shuffles of the data (range exchange + the
    pid-keyed window exchange), one broadcast of #partitions rows —
    versus the one-task global window that dies at scale.

    ``order_col`` (a column name or a sequence of them) must be unique
    (or ties must be order-insensitive: equal keys land in the same
    partition and their relative order within the running sum is then
    the window's tiebreak on the key itself, i.e. with ties only
    per-key-group totals are meaningful).
    """
    cols = _order_cols(order_col)
    ranged = _ranged_with_pid(df, cols)
    w = (
        W.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = ranged.withColumn("__local_cum", F.sum(value_col).over(w))
    # One row per partition — driver-sized at ANY data scale (bounded
    # by spark.sql.shuffle.partitions), so the single-partition window
    # over it is free, and the join back is a broadcast by size.
    totals = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__ptotal"))
    off_w = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__ptotal").over(off_w), F.lit(0)).alias("__offset"),
    )
    out = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local_cum") + F.col("__offset"))
        .drop("__pid", "__local_cum", "__offset")
    )
    return own_local_checkpoint(out, ranged)


def global_row_number(
    df: DataFrame,
    order_col: str | Sequence[str],
    out_col: str = "row_num",
) -> DataFrame:
    """1-based global row number in ``order_col`` order — the
    distributed replacement for ``row_number() OVER (ORDER BY ...)``,
    whose empty PARTITION BY funnels the whole table through one task.

    Same two-phase shape as :func:`global_running_sum`: range
    partition, per-partition ``row_number`` keyed on the partition id,
    then shift by the preceding partitions' row counts (a broadcast of
    #partitions rows). The order key(s) must form a total order
    (append a unique id as tiebreak) or ranks within ties are
    partition-placement-dependent."""
    cols = _order_cols(order_col)
    ranged = _ranged_with_pid(df, cols)
    w = W.partitionBy("__pid").orderBy(*cols)
    local = ranged.withColumn("__local_rn", F.row_number().over(w))
    totals = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__ptotal"))
    off_w = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__ptotal").over(off_w), F.lit(0)).alias("__offset"),
    )
    out = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local_rn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )
    return own_local_checkpoint(out, ranged)
