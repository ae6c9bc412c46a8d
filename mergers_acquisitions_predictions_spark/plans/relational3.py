"""Relational coverage, batch 3: JSON extraction, sorted array
aggregation, quantiles. Oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query


@query(
    "q31_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q31_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON path extraction with
    `get_json_object` (JVM-side; no Python JSON parsing). At scale
    prefer `from_json` with a declared schema once per pipeline — this
    query covers the ad-hoc path-extraction surface."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q32_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q32_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_list is order-NONdeterministic by
    contract, so the engine always sorts before exposing the array
    (and joins to a string here so the oracle hash is well-defined)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "q33_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_disc(l_extendedprice, 0.5), 2)  AS median_price,
           round(quantile_disc(l_extendedprice, 0.95), 2) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q33_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles per group. Spark's percentile() returns
    interpolated values, DuckDB's quantile_disc picks an element — the
    engine uses `percentile(..., )`-free logic: sort + row_number vs
    count (the discrete quantile definition both engines agree on:
    smallest element with cum_rank >= q*n).

    Scale: one shuffle on (group); at extreme cardinality switch to
    approx_percentile (t-digest) — exposed in aggregates; a sketch,
    so not oracle-matchable cross-engine."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_returnflag")).alias("n"),
    )

    def disc(q: float):
        # smallest element whose rank reaches ceil(q * n)
        target = F.ceil(F.lit(q) * F.col("n"))
        return F.min(F.when(F.col("rn") >= target, F.col("l_extendedprice")))

    return ranked.groupBy("l_returnflag").agg(
        F.round(disc(0.5), 2).alias("median_price"),
        F.round(disc(0.95), 2).alias("p95_price"),
    )


@query(
    "q40_range_frame_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
           ), 2) AS spend_90d
    FROM orders
    """,
)
def q40_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: each order's customer spend over the
    trailing 90 days (7,776,000 s) — VALUE-based frame bounds, unlike
    the ROWS frames of q16/q29. Ordered on epoch seconds so both
    engines frame identically (ties: all same-instant rows share the
    frame, which is exactly RANGE semantics)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
    )


@query(
    "q41_rank_functions",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(rank() OVER w AS BIGINT)        AS rnk,
           CAST(dense_rank() OVER w AS BIGINT)  AS drnk,
           CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS prnk_ppm,
           CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)    AS cdist_ppm
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q41_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window spec (single
    shuffle): rank with gaps, dense rank, percent_rank
    ((rank−1)/(n−1)), cume_dist — identical definitions both engines,
    deterministic via the custkey tiebreak.

    The fractional ranks are emitted as PARTS-PER-MILLION integers via
    `floor(x*1e6 + 0.5)` — pure IEEE ops on the (bit-identical)
    double, so both engines round the BINARY value. `round(x, 6)`
    diverged at sf0.1: cume_dist yields rationals like 41/640 whose
    shortest decimal rendering '0.0640625' is an exact 6-dp tie —
    Spark's round goes through that decimal string (BigDecimal
    HALF_UP ⇒ …63) while DuckDB rounds the binary double sitting just
    BELOW the tie (⇒ …62). Caught by the one-off full sf0.1 sweep;
    invisible at sf≤0.01 where partition sizes divide powers of two."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    ppm = lambda col: F.floor(col * 1000000 + 0.5).cast("long")  # noqa: E731
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        ppm(F.percent_rank().over(w)).alias("prnk_ppm"),
        ppm(F.cume_dist().over(w)).alias("cdist_ppm"),
    )


@query(
    "q36_stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)                 AS sd_qty,
           round(var_samp(l_quantity), 4)                    AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q36_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance, correlation,
    covariance) — single-pass distributed moments, one shuffle.
    Rounded to absorb partial-aggregation order differences between
    engines (both use numerically-stable one-pass updates, but
    combination order differs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
    )


@query(
    "q37_any_all_semantics",
    oracle="""
    SELECT
        CAST((SELECT count(*) FROM customer
              WHERE c_acctbal > ALL (SELECT s_acctbal FROM supplier WHERE s_nationkey = 0)
             ) AS BIGINT) AS n_above_all,
        CAST((SELECT count(*) FROM customer
              WHERE c_acctbal > ANY (SELECT s_acctbal FROM supplier WHERE s_nationkey = 0)
             ) AS BIGINT) AS n_above_any
    """,
)
def q37_any_all_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY/ALL quantified comparisons, decorrelated the way Catalyst
    does: ALL → compare to max, ANY → compare to min, with the
    empty-subset edge handled exactly (`> ALL (empty)` is vacuously
    TRUE, `> ANY (empty)` is FALSE — at sf0.001 the supplier subset IS
    empty, which a bare max/min comparison gets wrong via NULL). One
    broadcast scalar row — never a per-row subquery."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 0)
    bounds = F.broadcast(
        s.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("s_acctbal").alias("mx"),
            F.min("s_acctbal").alias("mn"),
        )
    )
    j = c.crossJoin(bounds)
    above_all = (F.col("cnt") == 0) | (F.col("c_acctbal") > F.col("mx"))
    above_any = (F.col("cnt") > 0) & (F.col("c_acctbal") > F.col("mn"))
    return j.agg(
        F.sum(F.when(above_all, 1).otherwise(0)).cast("long").alias("n_above_all"),
        F.sum(F.when(above_any, 1).otherwise(0)).cast("long").alias("n_above_any"),
    )


@query(
    "q34_full_outer_join",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           CAST(count(c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(s.s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_supplier_only,
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customer_only
    FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 7 = 0) c
    FULL OUTER JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
      ON c.c_custkey = s.s_suppkey
    GROUP BY nationkey
    """,
)
def q34_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (absent from the reference, SURVEY §2.3 'not
    present' list) — both-side null accounting, aggregated."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", "c_nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = c.join(s, c.c_custkey == s.s_suppkey, "full_outer")
    return j.groupBy(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey")
    ).agg(
        F.count("c_custkey").alias("n_customers"),
        F.count("s_suppkey").alias("n_suppliers"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_supplier_only"),
        F.sum(F.when(F.col("s_suppkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_customer_only"),
    )


@query(
    "q35_cross_join_grid",
    oracle="""
    SELECT r.r_name, t.o_orderstatus,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t
    LEFT JOIN (
        SELECT rr.r_name AS rn, oo.o_orderstatus AS st, count(*) AS n
        FROM orders oo
        JOIN customer c ON oo.o_custkey = c.c_custkey
        JOIN nation nn ON c.c_nationkey = nn.n_nationkey
        JOIN region rr ON nn.n_regionkey = rr.r_regionkey
        GROUP BY rn, st
    ) o ON o.rn = r.r_name AND o.st = t.o_orderstatus
    """,
)
def q35_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN building a dense (region × status) grid with
    zero-filled cells — the dimension-grid pattern for reports. The
    cross join is 5×3 literals; the fact aggregation happens FIRST, so
    the cross product never touches fact rows (grid-last, not
    grid-first, is the scale-safe order)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    statuses = o.select("o_orderstatus").distinct()
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            n.n_regionkey == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("rn"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = r.crossJoin(statuses)
    return (
        grid.join(
            counts,
            (grid.r_name == counts.rn) & (grid.o_orderstatus == counts.st),
            "left",
        )
        .select(
            "r_name",
            "o_orderstatus",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
        )
    )
