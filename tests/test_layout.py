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
