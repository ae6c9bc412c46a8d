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
