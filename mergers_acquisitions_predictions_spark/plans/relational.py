"""Relational core queries (SURVEY §2.2–§2.5, §7 Phase 0/1).

Every query here is pure DataFrame builtins — whole-stage-codegen'd,
shuffle-minimal, oracle-checked against DuckDB. Reference citations in
each docstring tie the operator back to the surveyed inventory.

Scale notes (100 TB discipline) appear per query: which side gets
broadcast, where the single shuffle lands, why the plan survives a
1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.readers import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): filter → groupBy agg.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→hash-agg. The only groupBy-style reduction shape the
    reference runs is ML ``fit`` (SURVEY §2.4); this is the general
    `groupBy().agg()` family on top of filter pushdown (P4).

    Scale: the shipdate filter and 7-column projection reach the
    parquet scan (PushedFilters/ReadSchema); partial aggregation
    happens map-side so the shuffle carries ≤ |groups| × partitions
    rows — constant-ish regardless of SF."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — projection + filter pushdown (P1/P4/P6).
# ---------------------------------------------------------------------------
@query(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_extendedprice AS price
    FROM lineitem
    WHERE l_discount >= 0.05 AND l_quantity < 25
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column drop + conjunctive row filter (`join_acquirers.scala:23-24`,
    `lr.scala:51-54`). Declarative so both the predicate and the
    3-column projection push into the parquet reader — the reference's
    RDD-lambda equivalent (`acq_etl_code.scala:38-44`) defeats this."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount") >= 0.05) & (F.col("l_quantity") < 25))
        .select("l_orderkey", "l_partkey", F.col("l_extendedprice").alias("price"))
    )


# ---------------------------------------------------------------------------
# q03 — shipping-priority top-k (TPC-H Q3 shape): 3-way join + agg + top-k.
# ---------------------------------------------------------------------------
@query(
    "q03_top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-joins (J1) + agg + global top-k. The ordering key is
    the ROUNDED revenue with l_orderkey tiebreak so Spark and the
    oracle rank identically despite float summation order.

    Scale: customer (filtered on segment) is the small side → broadcast
    hint; lineitem⋈orders shuffles on orderkey once; top-10 is
    TakeOrdered (no global sort materialization)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — snowflake join chain to region rollup (J1/J4 dimension lookups).
# ---------------------------------------------------------------------------
@query(
    "q04_revenue_by_region",
    oracle="""
    SELECT r.r_name,
           count(*)                       AS n_orders,
           round(sum(o.o_totalprice), 2)  AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n  ON c.c_nationkey = n.n_nationkey
    JOIN region r  ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q04_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-lookup joins (J4: `predictions.scala:27-28` ticker
    lookup) generalized to a snowflake chain.

    Scale: nation (25) and region (5) are broadcast — no shuffle for
    those joins; orders⋈customer shuffles on custkey (or broadcasts
    customer when it fits, AQE decides); one final tiny agg."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q05 — theta join (J5): equi-key + inequality residual, self-join.
# ---------------------------------------------------------------------------
@query(
    "q05_theta_pairs_per_nation",
    oracle="""
    SELECT a.c_nationkey AS nationkey, count(*) AS n_pairs
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey <> b.c_custkey
    GROUP BY a.c_nationkey
    """,
)
def q05_theta_pairs_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's acquirer×target industry pairing
    (`predictions.scala:37`: ``ap.SIC1 = tp.SIC1 AND ap.CIK != tp.CIK``)
    re-shaped onto the star schema: same-nation different-customer
    pairs. Catalyst executes as an equi-join on the nation key with the
    ``!=`` as residual filter — exactly the plan the reference gets.

    Scale: the equi key (nation) is low-cardinality → this is the
    skew-prone shape; AQE skew-join splitting handles the hot keys.
    Counting pairs per key never materializes the full pair set into
    the shuffle — partial counts combine map-side."""
    a = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    b = a.select(
        F.col("c_custkey").alias("b_custkey"), F.col("c_nationkey").alias("b_nationkey")
    )
    return (
        a.join(
            b,
            (a.c_nationkey == b.b_nationkey) & (a.c_custkey != b.b_custkey),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# q06 — FLAGSHIP: the reference's labeling query re-shaped (Phase 0).
# ---------------------------------------------------------------------------
@query(
    "q06_label_within_year",
    oracle="""
    WITH first_order AS (
        SELECT o_custkey, min(o_orderdate) AS first_date
        FROM orders
        GROUP BY o_custkey
    )
    SELECT DISTINCT
           o.o_orderkey,
           o.o_custkey,
           CAST(date_diff('day', f.first_date, o.o_orderdate) AS BIGINT) AS days_since_first,
           CASE WHEN date_diff('day', f.first_date, o.o_orderdate) < 365
                 AND date_diff('day', f.first_date, o.o_orderdate) >= 0
                THEN 1 ELSE 0 END AS within_year
    FROM orders o
    LEFT JOIN first_order f ON o.o_custkey = f.o_custkey
    """,
)
def q06_label_within_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (SURVEY §7 Phase 0): the acquired-within-365-days
    labeling dataflow of `acq_etl_code.scala:92-102` — inner/left joins
    + DATEDIFF + conditional 0/1 label + DISTINCT — on the star schema:
    label each order by whether it falls within a year of its
    customer's first order.

    Operators exercised: S5 scan, P1/P2 project/derive, P7 conditional
    (`IF(diff < 365 AND diff >= 0, 1, 0)`), F6 datediff, J3
    composite-key left join, A2 distinct.

    Scale: the first-order aggregate and the join share the same key
    (custkey) — one shuffle feeds both; DISTINCT on the already-
    partitioned output avoids a second full exchange (Catalyst reuses
    the partitioning). The reference's triple `.distinct` after joins
    (`acq_etl_code.scala:96-100`) collapses to one."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_date"))
    diff = F.datediff(F.col("o_orderdate"), F.col("first_date"))
    return (
        o.join(first, "o_custkey", "left")
        .select(
            "o_orderkey",
            "o_custkey",
            diff.cast("long").alias("days_since_first"),
            F.when((diff < 365) & (diff >= 0), 1).otherwise(0).alias("within_year"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# q07 — distinct projection (A2).
# ---------------------------------------------------------------------------
@query(
    "q07_distinct_flags",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year
    FROM lineitem
    """,
)
def q07_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.distinct()` as hash aggregate (A2, `acq_etl_code.scala:96-100`).
    Scale: map-side partial dedup bounds shuffle rows at |distinct| per
    partition."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).distinct()


# ---------------------------------------------------------------------------
# q08 — per-group top-k via window (describeTopics(5) pattern).
# ---------------------------------------------------------------------------
@query(
    "q08_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS BIGINT) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def q08_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k — the `describeTopics(5)` shape
    (`acq_etl_code.scala:112`, SURVEY §2.5) as Window + row_number.

    Scale: one shuffle on the partition key; rank+filter is pipelined.
    Tie-break on o_orderkey makes row_number deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# q09 — rollup (grouping sets family; free with Catalyst, SURVEY §7).
# ---------------------------------------------------------------------------
@query(
    "q09_rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*)                    AS n_rows,
           round(sum(l_quantity), 2)   AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q09_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# q10 — relational set ops (INTERSECT / EXCEPT).
# ---------------------------------------------------------------------------
@query(
    "q10_nation_setops",
    oracle="""
    SELECT 'both' AS tag, k FROM (
        SELECT DISTINCT c_nationkey AS k FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS k FROM supplier
    )
    UNION ALL
    SELECT 'customer_only' AS tag, k FROM (
        SELECT DISTINCT c_nationkey AS k FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS k FROM supplier
    )
    """,
)
def q10_nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT (absent from the reference — its only set
    op is the array-level distinct union U1; the relational family is
    part of the general engine surface, SURVEY §2.5)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("tag"), "k")
    only = c.exceptAll(s).select(F.lit("customer_only").alias("tag"), "k")
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# q11 — semi / anti joins (J6 family: the stop-word anti-join shape).
# ---------------------------------------------------------------------------
@query(
    "q11_semi_anti_customers",
    oracle="""
    SELECT 'with_orders' AS tag, count(*) AS n
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS tag, count(*) AS n
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q11_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti as first-class join types. The reference
    hand-rolls its anti-semi-join by collecting + broadcasting a set
    into a filter closure (`acq_etl_code.scala:33-41`); declared joins
    let Catalyst broadcast automatically and keep the plan visible."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    semi = (
        c.join(o, "c_custkey", "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("tag"), "n")
    )
    anti = (
        c.join(o, "c_custkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_orders").alias("tag"), "n")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# q12 — conditional aggregation (P7 as aggregate; confusion-matrix shape M10).
# ---------------------------------------------------------------------------
@query(
    "q12_priority_order_stats",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q12_priority_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum aggregation — the one-shuffle replacement for the
    reference's 4-job confusion matrix (`lr.scala:50-54`, SURVEY M10)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
        .cast("long")
        .alias("n_big"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# q13 — range join without an equi key (SURVEY §2.3 "not present" gap).
# ---------------------------------------------------------------------------
@query(
    "q13_orders_near_events",
    oracle="""
    SELECT o.o_orderkey, count(e.event_id) AS n_events
    FROM (SELECT * FROM orders WHERE o_orderkey % 97 = 0) o
    LEFT JOIN events e
      ON e.ts >= o.o_orderdate + INTERVAL 10585 DAYS
     AND e.ts <  o.o_orderdate + INTERVAL 10592 DAYS
    GROUP BY o.o_orderkey
    """,
)
def q13_orders_near_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key) — the direct formulation of the
    reference's 0 ≤ diff < 365 labeling (`acq_etl_code.scala:92-96`),
    which it executes as equi-join-then-filter. Spark would fall back
    to BroadcastNestedLoopJoin here (O(n·m)); instead we implement the
    scalable pattern: discretize the range into day buckets, EXPLODE the
    7 candidate days on the small side, and equi-join on the bucket —
    turning O(n·m) into a hash join.

    (The +10585d offset overlaps the 1995–2001 order dates with the
    2024 event timestamps; the orderkey%97 sample keeps the result
    driver-readable at any SF.)

    Scale: candidate-day explosion multiplies the probe side by the
    window width (7×) but keeps the join an equi hash join — this is
    how interval joins survive 100 TB, vs. the nested-loop O(n·m)."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("win_start"),
        )
        .withColumn("win_start", F.timestamp_add("DAY", F.lit(10585), F.col("win_start")))
    )
    # Explode each order into its 7 candidate calendar days.
    o_days = o.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.to_date("win_start"),
                F.date_add(F.to_date("win_start"), 6),
            )
        ),
    )
    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", F.to_date("ts").alias("day")
    )
    matched = (
        o_days.join(e, "day", "inner")
        .filter(
            (F.col("ts") >= F.col("win_start"))
            & (F.col("ts") < F.timestamp_add("DAY", F.lit(7), F.col("win_start")))
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # LEFT semantics: orders with zero events keep count 0.
    return (
        o.select("o_orderkey")
        .join(matched, "o_orderkey", "left")
        .select("o_orderkey", F.coalesce("n_events", F.lit(0)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# q14 — scalar string/date function surface (F1–F8).
# ---------------------------------------------------------------------------
@query(
    "q14_scalar_functions",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                                   AS name_lower,
           regexp_replace(c_name, '[0-9]', '', 'g')        AS name_alpha,
           string_split(c_name, '#')[2]                    AS name_num,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           CAST(length(c_name) AS BIGINT)                  AS name_len
    FROM customer
    """,
)
def q14_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function parity (SURVEY §2.6): lower (F1), regex replace
    (F3), split+element (F2), concat (F4/F8), length — all JVM-side
    builtins inside one codegen stage, replacing the reference's RDD
    lambdas (`acq_etl_code.scala:38-44`)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.regexp_replace("c_name", "[0-9]", "").alias("name_alpha"),
        F.split("c_name", "#").getItem(1).alias("name_num"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.length("c_name").cast("long").alias("name_len"),
    )


# ---------------------------------------------------------------------------
# q15 — division + truncating cast bucketing (P8).
# ---------------------------------------------------------------------------
@query(
    "q15_size_buckets",
    oracle="""
    SELECT CAST(floor(p_size / 10) AS BIGINT) AS size_bucket,
           count(*)                           AS n_parts,
           round(avg(p_retailprice), 4)       AS avg_price
    FROM part
    GROUP BY size_bucket
    """,
)
def q15_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `(SIC / 10).cast("integer")` industry-prefix
    bucketing (`predictions.scala:18-19`, P8). Spark's int cast
    truncates while DuckDB's rounds, so the engine op is an explicit
    `floor` — same result for positive values, portable semantics."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(F.floor(F.col("p_size") / 10).alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# q16 — running window aggregate (SURVEY §2.5 window family).
# ---------------------------------------------------------------------------
@query(
    "q16_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def q16_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )
