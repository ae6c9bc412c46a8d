"""Physical-layout operators for repeated big joins: bucketing and
skew salting (SURVEY §2.10 / the 100 TB playbook).

The reference hand-tunes layout with `minPartitions` and a manual
broadcast (`acq_etl_code.scala:34,37`). At scale the two tools that
actually remove shuffles are:

- **Bucketing**: persist both join sides bucketed by the join key →
  later equi-joins/aggregations on that key read co-located buckets
  and skip the exchange entirely. Worth it when a fact table is
  joined on the same key by many downstream queries.
- **Salting**: when one key value dominates (power-law keys), split it
  across N salt shards so no single task owns the hot key. AQE's
  skew-join handles *join* skew automatically; salting is for
  *aggregation* skew and for engines/paths AQE doesn't cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins and aggregations on `bucket_cols` between tables bucketed
    with the SAME bucket count read bucket-to-bucket — no Exchange in
    the plan (asserted in tests/test_layout.py).

    UNQUALIFIED table names only: a qualified ``db.tbl`` lives at
    ``{warehouse}/{db}.db/{tbl}``, not ``{warehouse}/{db.tbl}``, so
    the orphan handling below would compute the wrong location and
    silently do nothing (ADVICE r7) — rejected explicitly; callers
    use ``spark.catalog.setCurrentDatabase`` for non-default DBs.

    Overwrite is made robust across PROCESSES: a managed table's
    warehouse location can outlive the in-memory catalog entry (a
    previous driver wrote it, this session never registered it), and
    `saveAsTable` then fails with LOCATION_ALREADY_EXISTS. After the
    DROP, a still-existing location has no catalog entry in this
    session — it is moved ASIDE (never blind-deleted: a concurrent
    process's live table is preserved, ADVICE r7) through the Hadoop
    FS API (the warehouse may be remote), reaped only after the new
    write SUCCEEDS, and restored if the write fails — so a failed
    overwrite leaves the previous data at the location, never
    nothing."""
    spark = df.sparkSession
    if "." in table:
        raise ValueError(
            f"write_bucketed takes an unqualified table name, got {table!r} "
            "(a qualified name's warehouse location differs; select the "
            "database with spark.catalog.setCurrentDatabase first)"
        )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    from ..sources.fs import fs_delete, fs_exists, fs_rename

    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = f"{wh.rstrip('/')}/{table.lower()}"
    orphan = None
    if fs_exists(spark, loc):
        import os as _os
        import uuid as _uuid

        orphan = f"{loc}.orphan_{_os.getpid()}_{_uuid.uuid4().hex[:8]}"
        fs_rename(spark, loc, orphan)
    try:
        w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.saveAsTable(table)
    except BaseException:
        if orphan is not None and not fs_exists(spark, loc):
            try:
                fs_rename(spark, orphan, loc)  # restore the previous data
            except OSError:
                pass  # leave the orphan twin for manual recovery
        raise
    if orphan is not None:
        fs_delete(spark, orphan)


def zorder_value(
    bucketed: list, bits: int = 8
):
    """Morton (Z-curve) value from per-column bucket indexes: bit i of
    column c lands at position ``i * n_cols + c``. Pure shift/mask
    expression — map-side, codegen'd.

    The interleave must fit a signed long: Java's shiftleft masks the
    shift amount mod 64, so positions past 63 would silently WRAP onto
    low bits and corrupt the clustering with no error — reject that
    configuration instead."""
    n = len(bucketed)
    if bits * n > 63:
        raise ValueError(
            f"z-order interleave needs bits*n_cols <= 63; got {bits}*{n} = "
            f"{bits * n} — reduce bits (e.g. {63 // n}) or drop columns"
        )
    z = F.lit(0).cast("long")
    for c, col in enumerate(bucketed):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + c
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 8,
    n_files: int = 32,
    mode: str = "overwrite",
    binning: str = "uniform",
) -> None:
    """Z-order clustered parquet write: multi-column data skipping for
    workloads that filter on SEVERAL columns (partitioning prunes one
    hierarchy; a Z-curve keeps every listed column's value range
    narrow within each file, so parquet min/max footer stats prune
    files/row-groups for box predicates on ANY subset of the columns).

    Plan: one tiny min/max aggregate per write (driver-sized), then a
    map-side uniform bucket index per column, bit-interleaved into the
    Z-value, `repartitionByRange` on it (range exchange → files own
    contiguous Z-ranges) and a within-partition sort so row groups are
    tight too. The data shuffles exactly once.

    Numeric columns only (cast dates/timestamps to epoch first).
    ``binning="uniform"`` (default) buckets on min/max — one tiny
    aggregate, right when values are roughly even. Under heavy skew
    (power-law ids, prices) most rows land in a few buckets and the
    curve degenerates; ``binning="quantile"`` draws the 2^bits bucket
    boundaries from ``approxQuantile`` instead (equal-POPULATION
    buckets, driver-sized boundary list folded into the expression as
    a sorted-array rank). Effectiveness is test-asserted by reading
    back parquet footer stats (tests/test_layout.py)."""
    if binning not in ("uniform", "quantile"):
        raise ValueError(f"unknown binning {binning!r} (uniform|quantile)")
    n_buckets = 1 << bits
    bucketed = []
    if binning == "quantile":
        probs = [i / n_buckets for i in range(1, n_buckets)]
        dd = df.select(
            *[F.col(c).cast("double").alias(c) for c in zorder_cols]
        )
        all_bounds = dd.approxQuantile(zorder_cols, probs, 0.001)
        for c, bounds in zip(zorder_cols, all_bounds):
            if not bounds:
                bucketed.append(F.lit(0).cast("long"))
                continue
            from .util import double_array_literal

            arr = double_array_literal(bounds)
            # bucket = #boundaries <= x  (0..n_buckets-1), null -> 0
            idx = F.size(
                F.filter(arr, lambda b: b <= F.col(c).cast("double"))
            ).cast("long")
            bucketed.append(F.coalesce(idx, F.lit(0).cast("long")))
    else:
        stats = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in zorder_cols],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in zorder_cols],
        ).first()
        for c in zorder_cols:
            mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
            if mn is None or mx is None or mx <= mn:
                bucketed.append(F.lit(0).cast("long"))
                continue
            frac = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
            idx = F.floor(frac * n_buckets).cast("long")
            clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(n_buckets - 1))
            # NULL values land in bucket 0 (greatest/least skip nulls,
            # the coalesce pins the invariant) — same deterministic
            # placement as the quantile path's explicit coalesce.
            bucketed.append(F.coalesce(clamped, F.lit(0).cast("long")))
    z = df.withColumn("__z", zorder_value(bucketed, bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def salted_group_count(
    df: DataFrame, key: str, n_salts: int = 16, agg_col: str | None = None
) -> DataFrame:
    """Two-phase aggregation for skewed keys: count/sum per
    (key, salt) — spreading a hot key over `n_salts` reducers — then
    combine per key. The second shuffle carries ≤ n_salts rows per
    key, so the hot key's cost is amortized across the cluster.

    Equivalent to plain groupBy for any input (tests assert this);
    use when one key holds an outsized share of rows.

    The salt is `pmod(hash(monotonically_increasing_id()), n_salts)` —
    hashing the id decorrelates the salt from partition layout (raw
    ids are partition-dense, crowding low salts when n_salts exceeds a
    partition's row count) while still spreading rows that are
    identical in every column (hashing data columns would not)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *( [F.sum(agg_col).alias("__s")] if agg_col else [] ),
    )
    aggs = [F.sum("__n").alias("n_rows")]
    if agg_col:
        aggs.append(F.sum("__s").alias(f"sum_{agg_col}"))
    return partial.groupBy(key).agg(*aggs)
