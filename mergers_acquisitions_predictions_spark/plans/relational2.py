"""Relational coverage, batch 2: pivot, subquery shapes, date
bucketing, null handling, extended window functions, cube. All
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.readers import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q21_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q21_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pivot()` with an explicit value list — one shuffle; listing the
    pivot values keeps Catalyst from a discovery pass (at scale, ALWAYS
    list them)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


@query(
    "q22_exists_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
    )
    """,
)
def q22_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join (the declared
    form of what the reference hand-builds with broadcast sets, J6)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(
        l.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_semi"
    ).select("o_orderkey", "o_totalprice")


@query(
    "q23_scalar_subquery",
    oracle="""
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > 1.5 * (SELECT avg(p_retailprice) FROM part)
    """,
)
def q23_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery: the single-row aggregate broadcasts
    into the filter — no driver-side collect of the average (the
    reference collects scalars to the driver, e.g. `lr.scala:14-16`)."""
    p = _t(spark, sf_dir, "part")
    avg_price = p.agg(F.avg("p_retailprice").alias("__avg"))
    return (
        p.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > 1.5 * F.col("__avg"))
        .select("p_partkey", "p_retailprice")
    )


@query(
    "q24_having",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_balance
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) >= 50 AND sum(c_acctbal) > 0
    """,
)
def q24_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("__total"),
        )
        .filter((F.col("n_customers") >= 50) & (F.col("__total") > 0))
        .select(
            "c_nationkey", "n_customers", F.round("__total", 2).alias("total_balance")
        )
    )


@query(
    "q25_monthly_orders",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY order_month
    """,
)
def q25_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing via date_trunc — at scale this is the
    partition key for time-partitioned sinks (S6 partition_by)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q26_null_handling",
    oracle="""
    SELECT
        count(*) AS n_rows,
        CAST(count(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT) AS n_negative,
        round(sum(coalesce(nullif(c_acctbal, 0.0), 0.0)), 2) AS sum_nonzero,
        CAST(count(nullif(c_mktsegment, 'BUILDING')) AS BIGINT) AS n_not_building
    FROM customer
    """,
)
def q26_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface: nullif/coalesce/conditional count (the
    reference's IF-after-left-join at `acq_etl_code.scala:102` is the
    coalesce special case, P7)."""
    c = _t(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        F.round(
            F.sum(F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(0.0))), 2
        ).alias("sum_nonzero"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias(
            "n_not_building"
        ),
    )


@query(
    "q27_string_functions2",
    oracle="""
    SELECT s_suppkey,
           lpad(CAST(s_suppkey AS VARCHAR), 10, '0')  AS padded_key,
           replace(s_name, '#', '-')                  AS name_dashed,
           reverse(s_name)                            AS name_reversed,
           CAST(strpos(s_name, '#') AS BIGINT)        AS hash_pos,
           upper(s_name)                              AS name_upper
    FROM supplier
    """,
)
def q27_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("s_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.reverse("s_name").alias("name_reversed"),
        F.instr("s_name", "#").cast("long").alias("hash_pos"),
        F.upper("s_name").alias("name_upper"),
    )


@query(
    "q28_union_dedup",
    oracle="""
    SELECT k FROM (
        SELECT o_custkey AS k FROM orders
        UNION
        SELECT c_custkey AS k FROM customer
    )
    """,
)
def q28_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (deduplicating) — `union` + `distinct`; map-side partial
    dedup bounds the shuffle."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.union(c).distinct()


@query(
    "q29_window_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER w, 2)  AS delta_prev,
           round(first_value(o_totalprice) OVER w, 2)          AS first_price,
           CAST(ntile(4) OVER w AS BIGINT)                     AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q29_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/first_value/ntile over one window spec — single shuffle on
    the partition key serves all three."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "delta_prev"
        ),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q30_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q30_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
