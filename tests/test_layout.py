"""Physical-layout operators: bucketed joins skip the exchange;
salted aggregation equals plain aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.operators.layout import (
    salted_group_count,
    write_bucketed,
)
from mergers_acquisitions_predictions_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    # tables land in ./spark-warehouse (gitignored); dropped in finally
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], n_buckets=8)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        ["o_custkey"],
        n_buckets=8,
    )
    joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
    # disable broadcast so the co-located-bucket path is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_aggregation_equals_plain(spark):
    li = load_table(spark, SF, "lineitem")
    plain = {
        (r.l_returnflag): (r.n_rows, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n_rows, round(r.sum_l_quantity, 2))
        for r in salted_group_count(li, "l_returnflag", agg_col="l_quantity").collect()
    }
    assert salted == plain


def test_zorder_write_prunes_box_queries(spark, tmp_path):
    """Z-order clustering must make parquet footer min/max stats
    selective for a 2-column box predicate: far fewer files overlap
    the box than under the natural (single-column-clustered) layout,
    and no rows are lost."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from mergers_acquisitions_predictions_spark.operators.layout import (
        write_zordered,
    )

    orders = load_table(spark, SF, "orders")
    zpath, npath = str(tmp_path / "zord"), str(tmp_path / "nat")
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], n_files=16)
    # natural baseline: same file count, clustered by o_orderkey only
    orders.repartitionByRange(16, "o_orderkey").write.parquet(npath)

    lo_k, hi_k, lo_p, hi_p = 1, 150, 1000.0, 20000.0

    def overlapping(path: str) -> tuple[int, int]:
        files = sorted(Path(path).glob("*.parquet"))
        hit = 0
        for f in files:
            md = pq.read_metadata(f)
            mins = {"o_custkey": None, "o_totalprice": None}
            maxs = dict(mins)
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        s = col.statistics
                        mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                        maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
            if (
                mins["o_custkey"] is not None
                and mins["o_custkey"] <= hi_k
                and maxs["o_custkey"] >= lo_k
                and mins["o_totalprice"] <= hi_p
                and maxs["o_totalprice"] >= lo_p
            ):
                hit += 1
        return hit, len(files)

    z_hit, z_total = overlapping(zpath)
    n_hit, n_total = overlapping(npath)
    assert z_total >= 8 and n_total >= 8
    # the natural layout overlaps the box almost everywhere; z-order
    # confines it to a corner of the curve
    assert n_hit >= n_total * 3 // 4
    assert z_hit * 2 <= n_hit, (z_hit, z_total, n_hit, n_total)

    # correctness: the clustered copy is the same table
    back = spark.read.parquet(zpath)
    cond = (
        (F.col("o_custkey").between(lo_k, hi_k))
        & (F.col("o_totalprice").between(lo_p, hi_p))
    )
    assert back.filter(cond).count() == orders.filter(cond).count()
    assert back.count() == orders.count()


def test_zorder_quantile_binning_beats_uniform_under_skew(spark, tmp_path):
    """Power-law values crowd min/max (uniform) buckets: nearly every
    row lands in bucket 0, the curve degenerates, and a box query on
    the dense region overlaps almost every file. Quantile binning
    (equal-population buckets) keeps per-file value ranges narrow."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from mergers_acquisitions_predictions_spark.operators.layout import (
        write_zordered,
    )

    n = 20_000
    df = spark.range(n).select(
        # v: 95% of rows in [0, 1), a long tail reaching 1e6
        F.when(F.col("id") % 20 != 0, (F.col("id") % 1000) / 1000.0)
        .otherwise(F.col("id").cast("double") * 50.0)
        .alias("v"),
        F.pmod(F.hash("id"), F.lit(1000)).cast("double").alias("u"),
    )
    up, qp = str(tmp_path / "uni"), str(tmp_path / "qnt")
    write_zordered(df, up, ["v", "u"], n_files=16, binning="uniform")
    write_zordered(df, qp, ["v", "u"], n_files=16, binning="quantile")

    def files_overlapping_v(path, lo, hi):
        hit = total = 0
        for f in sorted(Path(path).glob("*.parquet")):
            md = pq.read_metadata(f)
            mn = mx = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "v" and col.statistics:
                        s = col.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            total += 1
            if mn is not None and mn <= hi and mx >= lo:
                hit += 1
        return hit, total

    lo, hi = 0.2, 0.3  # a slice of the dense region
    u_hit, u_total = files_overlapping_v(up, lo, hi)
    q_hit, q_total = files_overlapping_v(qp, lo, hi)
    assert u_total >= 8 and q_total >= 8
    # uniform: the whole dense mass shares v-bucket 0, so v contributes
    # no discrimination and (almost) every dense-bearing file overlaps
    assert u_hit >= u_total - 2
    # quantile: equal-population buckets give v real resolution. The
    # margin is deliberately loose: repartitionByRange SAMPLES file
    # boundaries per execution, so the exact hit count varies run to
    # run (the same sampled-exchange behavior NOTES.md documents).
    assert q_hit + 3 <= u_hit, (q_hit, q_total, u_hit, u_total)
    # same table either way
    got = spark.read.parquet(qp)
    assert got.count() == n
    assert got.filter(F.col("v").between(lo, hi)).count() == df.filter(
        F.col("v").between(lo, hi)
    ).count()


def test_zorder_rejects_wrapping_interleave(spark, tmp_path):
    """bits * n_cols > 63 would make Java's mod-64 shiftleft silently
    wrap high bits onto low positions — must raise, not corrupt."""
    from mergers_acquisitions_predictions_spark.operators.layout import (
        write_zordered,
        zorder_value,
    )

    df = spark.range(10).select(*[F.col("id").alias(f"c{i}") for i in range(9)])
    with pytest.raises(ValueError, match="bits"):
        write_zordered(df, str(tmp_path / "z"), [f"c{i}" for i in range(9)], bits=8)
    with pytest.raises(ValueError, match="bits"):
        zorder_value([F.col("c0")] * 9, bits=8)
    # 9 cols fits at 7 bits (63 positions exactly)
    write_zordered(df, str(tmp_path / "ok"), [f"c{i}" for i in range(9)], bits=7)
    assert spark.read.parquet(str(tmp_path / "ok")).count() == 10


def test_zorder_nulls_land_in_bucket_zero_both_binnings(spark, tmp_path):
    """A NULL z-order column value must cluster deterministically (the
    min bucket) under BOTH binning modes, not scatter into a NULL range
    partition."""
    from mergers_acquisitions_predictions_spark.operators.layout import (
        write_zordered,
    )

    df = spark.createDataFrame(
        [(float(i), float(i % 7)) for i in range(100)] + [(None, 3.0), (None, None)],
        "v double, u double",
    )
    for binning in ("uniform", "quantile"):
        p = str(tmp_path / binning)
        write_zordered(df, p, ["v", "u"], n_files=4, binning=binning)
        got = spark.read.parquet(p)
        assert got.count() == 102
        assert got.filter(F.col("v").isNull()).count() == 2


def test_io04_box_predicate_reaches_zordered_scan(spark):
    """io04's docstring claims the box scan over the Z-ordered files
    is the pruned path — bind that to the REGISTERED query: run io04
    (which writes the Z-ordered artifact), then assert the box
    predicate appears as PushedFilters on the parquet scan of those
    files (footer-stat row-group skipping is what the Z-layout buys;
    the generic effectiveness measurement lives in
    test_zorder_write_prunes_box_queries)."""
    from pyspark.sql import functions as F

    from mergers_acquisitions_predictions_spark.plans.io_queries import (
        _IO04_Z,
        io04_layout_roundtrip,
    )

    io04_layout_roundtrip(spark, "/root/testdata/sf0.001").collect()
    box = spark.read.parquet(_IO04_Z).filter(
        F.col("l_partkey").between(1, 50) & F.col("l_suppkey").between(1, 5)
    )
    plan = box._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    # The toString elides long filter lists ("LessThanOrEqual(l_p...")
    # — assert the untruncated head plus the range shape on BOTH
    # columns via the DataFilters clause, which renders first.
    assert "GreaterThanOrEqual(l_partkey,1)" in pushed, pushed
    for frag in (
        "(l_partkey", ">= 1)", "l_suppkey",
    ):
        assert frag in pushed or frag in plan, f"{frag} missing: {pushed}"
    datafilters = [ln for ln in plan.splitlines() if "DataFilters" in ln][0]
    assert "(l_partkey" in datafilters and "l_suppkey" in datafilters


def test_write_bucketed_rejects_qualified_names(spark):
    """ADVICE r7 (medium): db.tbl lives at {wh}/{db}.db/{tbl}, so the
    orphan handling would compute the wrong location — rejected."""
    import pytest

    from mergers_acquisitions_predictions_spark.operators.layout import (
        write_bucketed,
    )

    with pytest.raises(ValueError, match="unqualified"):
        write_bucketed(spark.range(3), "db.tbl", ["id"], n_buckets=2)


def test_write_bucketed_orphan_preserved_until_success(spark, tmp_path):
    """ADVICE r7 (medium): a warehouse location with no catalog entry
    (dead-driver leftover — or a concurrent process's table) is moved
    ASIDE, reaped only after the new write succeeds; a FAILED write
    restores it (never blind-deleted mid-flight)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from mergers_acquisitions_predictions_spark.operators.layout import (
        write_bucketed,
    )

    table = "layout_orphan_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    loc = os.path.join(wh, table.lower())
    os.makedirs(loc, exist_ok=True)
    marker = os.path.join(loc, "previous_data.parquet")
    with open(marker, "wb") as f:
        f.write(b"previous process's table")

    # failed write (sortBy on a nonexistent column) → orphan restored
    with pytest.raises(Exception):
        write_bucketed(
            spark.range(10), table, ["id"], n_buckets=2,
            sort_cols=["no_such_column"],
        )
    assert os.path.exists(marker), "failed write must restore the orphan"
    leftovers = [d for d in os.listdir(wh) if ".orphan_" in d]
    assert leftovers == []

    # successful write → table replaced, orphan reaped
    write_bucketed(
        spark.range(10).withColumn("v", F.col("id") * 2), table, ["id"],
        n_buckets=2,
    )
    assert spark.table(table).count() == 10
    assert not os.path.exists(marker)
    leftovers = [d for d in os.listdir(wh) if ".orphan_" in d]
    assert leftovers == []
    spark.sql(f"DROP TABLE IF EXISTS {table}")
