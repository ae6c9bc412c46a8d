"""Partitioned parquet sink (S6 + scale story): writes partitioned by
a column must yield partition-PRUNED scans for filtered readers."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.sources.readers import load_table
from mergers_acquisitions_predictions_spark.sources.writers import write_parquet

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_reads(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    out = str(tmp_path / "orders_by_status")
    write_parquet(orders, out, partition_by=["o_orderstatus"])

    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the status filter must land in PartitionFilters (pruned dirs),
    # not in the post-scan Filter
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == want
    # only the F=... directory exists under the matched partition path
    dirs = {p.name for p in (tmp_path / "orders_by_status").iterdir() if p.is_dir()}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}


def test_dynamic_partition_overwrite_replaces_only_written_partitions(spark, tmp_path):
    """The nightly-ingest idiom: re-writing one partition's data with
    dynamic_overwrite must replace that partition and leave every
    other partition untouched; a STATIC overwrite of the same frame
    would truncate them."""
    from pyspark.sql import functions as F

    from mergers_acquisitions_predictions_spark.sources.writers import write_parquet

    path = str(tmp_path / "table")
    full = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], ["id", "day", "val"]
    )
    write_parquet(full, path, partition_by=["day"])
    assert spark.read.parquet(path).count() == 30

    # re-run day=1 only, with corrected values
    day1 = spark.createDataFrame(
        [(i, 1, f"fixed{i}") for i in range(1, 30, 3)], ["id", "day", "val"]
    )
    write_parquet(day1, path, partition_by=["day"], dynamic_overwrite=True)

    back = spark.read.parquet(path)
    assert back.count() == 30  # days 0 and 2 survived
    assert back.filter(F.col("day") == 1).filter(
        ~F.col("val").startswith("fixed")
    ).count() == 0  # day 1 fully replaced
    assert back.filter(F.col("day") == 0).count() == 10
    # the conf did not leak into the session
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None) is None
        or spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
    )
