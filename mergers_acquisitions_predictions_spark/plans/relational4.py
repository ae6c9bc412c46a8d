"""Relational coverage, batch 4: explicit GROUPING SETS (through the
SQL surface), datetime function breadth, NULL ordering. All
oracle-checked; the datetime query pins down the cross-engine
semantics traps (day-of-week numbering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query


@query(
    "q42_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT)  AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT)  AS g_status,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q42_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators — the member
    of the rollup/cube family that picks exact set combinations.
    Issued through the SQL surface (temp view) deliberately: the
    registry exercises both entry points (SURVEY §1.1 dual-surface),
    and Catalyst expands it to the same Expand node either way."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q42_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS LONG) AS g_flag,
               CAST(grouping(l_linestatus) AS LONG) AS g_status,
               count(*) AS n_rows
        FROM q42_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q45_except_all_multiplicity",
    oracle="""
    SELECT k, count(*) AS n
    FROM (
        SELECT l_suppkey AS k FROM lineitem
        EXCEPT ALL
        SELECT s_suppkey AS k FROM supplier
    )
    GROUP BY k
    ORDER BY k
    LIMIT 50
    """,
)
def q45_except_all_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics (each right-side occurrence cancels
    ONE left-side occurrence), vs the set semantics of q10. lineitem
    references each suppkey many times, supplier once → counts drop by
    exactly one."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return (
        li.exceptAll(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
        .limit(50)
    )


@query(
    "q43_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(isodow(o_orderdate) AS BIGINT)              AS iso_dow,
           CAST(quarter(o_orderdate) AS BIGINT)             AS qtr,
           CAST(dayofyear(o_orderdate) AS BIGINT)           AS doy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTHS AS TIMESTAMP) AS plus3m,
           CAST(epoch(o_orderdate) AS BIGINT)               AS epoch_s
    FROM orders
    WHERE o_orderkey % 53 = 0
    """,
)
def q43_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surface with the cross-engine numbering traps made
    explicit: Spark's `dayofweek` is 1=Sunday while DuckDB's is
    0=Sunday — the engine standardizes on ISO day-of-week (1=Monday)
    via `weekday()+1`, which both engines agree on. quarter/dayofyear/
    last_day/add_months/epoch align directly."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 53 == 0)
    return o.select(
        "o_orderkey",
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        # cast to timestamp: DATE-typed results reach pandas/the hash
        # as date objects on one engine and datetime64 on the other
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).cast("timestamp").alias(
            "plus3m"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "q44_null_ordering",
    oracle="""
    SELECT c_custkey, bal,
           CAST(row_number() OVER (
               ORDER BY bal DESC NULLS LAST, c_custkey
           ) AS BIGINT) AS rn_nulls_last,
           CAST(row_number() OVER (
               ORDER BY bal ASC NULLS FIRST, c_custkey
           ) AS BIGINT) AS rn_nulls_first
    FROM (
        SELECT c_custkey, nullif(round(c_acctbal, 0) % 100, 0.0) AS bal
        FROM customer WHERE c_custkey % 11 = 0
    )
    """,
)
def q44_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST in window ordering — engine defaults
    differ across systems, so the engine spells them out (derived
    nullable column via nullif so the data actually exercises it)."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 11 == 0)
    # `%` (sign of dividend), NOT pmod (always non-negative): SQL `%`
    # keeps negative remainders for negative balances
    bal = F.nullif(F.round("c_acctbal", 0) % 100, F.lit(0.0))
    base = c.select("c_custkey", bal.alias("bal"))
    w_last = W.orderBy(F.col("bal").desc_nulls_last(), F.asc("c_custkey"))
    w_first = W.orderBy(F.col("bal").asc_nulls_first(), F.asc("c_custkey"))
    return base.select(
        "c_custkey",
        "bal",
        F.row_number().over(w_last).cast("long").alias("rn_nulls_last"),
        F.row_number().over(w_first).cast("long").alias("rn_nulls_first"),
    )


@query(
    "q46_unpivot_measures",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(sum(l_discount), 2) AS sum_disc
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    """,
)
def q46_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (`DataFrame.unpivot` / SQL `stack`): one
    aggregated row per returnflag melts into (flag, measure, value)
    rows — the reshape feeding metric-per-row sinks and plotting
    layers. Map-side over the (tiny) aggregate: the melt itself adds
    zero exchanges; keep unpivot AFTER aggregation so the explode
    multiplies grouped rows, never the 600k-row fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "q47_table_profile",
    oracle="""
    WITH base AS (
        SELECT count(*) AS n_rows,
               count(o_orderkey) AS nn_orderkey, count(DISTINCT o_orderkey) AS nd_orderkey,
               CAST(min(o_orderkey) AS VARCHAR) AS mn_orderkey, CAST(max(o_orderkey) AS VARCHAR) AS mx_orderkey,
               count(o_custkey) AS nn_custkey, count(DISTINCT o_custkey) AS nd_custkey,
               CAST(min(o_custkey) AS VARCHAR) AS mn_custkey, CAST(max(o_custkey) AS VARCHAR) AS mx_custkey,
               count(o_orderstatus) AS nn_status, count(DISTINCT o_orderstatus) AS nd_status,
               CAST(min(o_orderstatus) AS VARCHAR) AS mn_status, CAST(max(o_orderstatus) AS VARCHAR) AS mx_status,
               count(o_totalprice) AS nn_price, count(DISTINCT o_totalprice) AS nd_price,
               CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
               CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price,
               count(o_orderdate) AS nn_date, count(DISTINCT o_orderdate) AS nd_date,
               strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn_date,
               strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx_date,
               count(o_orderpriority) AS nn_prio, count(DISTINCT o_orderpriority) AS nd_prio,
               CAST(min(o_orderpriority) AS VARCHAR) AS mn_prio, CAST(max(o_orderpriority) AS VARCHAR) AS mx_prio
        FROM orders
    )
    SELECT 'o_orderkey' AS column, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(nn_orderkey AS BIGINT) AS n_nonnull,
           round((n_rows - nn_orderkey) / greatest(n_rows, 1), 6) AS null_frac,
           CAST(nd_orderkey AS BIGINT) AS ndv, mn_orderkey AS min_str, mx_orderkey AS max_str FROM base
    UNION ALL
    SELECT 'o_custkey', n_rows, nn_custkey,
           round((n_rows - nn_custkey) / greatest(n_rows, 1), 6), nd_custkey, mn_custkey, mx_custkey FROM base
    UNION ALL
    SELECT 'o_orderstatus', n_rows, nn_status,
           round((n_rows - nn_status) / greatest(n_rows, 1), 6), nd_status, mn_status, mx_status FROM base
    UNION ALL
    SELECT 'o_totalprice', n_rows, nn_price,
           round((n_rows - nn_price) / greatest(n_rows, 1), 6), nd_price, mn_price, mx_price FROM base
    UNION ALL
    SELECT 'o_orderdate', n_rows, nn_date,
           round((n_rows - nn_date) / greatest(n_rows, 1), 6), nd_date, mn_date, mx_date FROM base
    UNION ALL
    SELECT 'o_orderpriority', n_rows, nn_prio,
           round((n_rows - nn_prio) / greatest(n_rows, 1), 6), nd_prio, mn_prio, mx_prio FROM base
    """,
)
def q47_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling of the orders table — the
    data-quality gate before a new table drop enters a pipeline: one
    row per column with exact non-null / distinct counts and
    native-type min/max stringified in cross-engine-deterministic
    formats (fractional numerics via DECIMAL(18,2), timestamps via an
    explicit pattern — never a raw double→string cast, whose
    scientific-notation cutover differs between engines).

    Plan (operators/aggregates.table_profile): ONE global aggregate
    (map-side partials, 1-row result); the per-column melt happens on
    that single row. Exact NDVs make Catalyst Expand the scan
    ×n_cols; `approx=True` swaps them for one-pass HLL sketches at
    100 TB — an explicit caller decision, mirrored in the docstring
    and COVERAGE notes, not a silent default."""
    from ..operators.aggregates import table_profile

    o = load_table(spark, sf_dir, "orders")
    return table_profile(o)


@query(
    "q48_percentile_cont",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.5), 6)  AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
           round(quantile_cont(l_discount, 0.5), 6)       AS median_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q48_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED per-group quantiles (`percentile` /
    `quantile_cont`) — the continuous companion of q33's discrete
    quantiles: both engines use the same linear-interpolation rank
    definition ((n−1)·p between order statistics), so the values
    hash-match at 6 dp. One exact-percentile hash aggregation per
    group; at 100 TB swap for `approx_percentile` (t-digest sketch:
    mergeable, constant memory) when the groups are corpus-sized —
    same query shape, sketch-bounded error."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95_price"),
        F.round(F.expr("percentile(l_discount, 0.5)"), 6).alias("median_disc"),
    )


@query(
    "q49_relative_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q49_relative_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window family: percent_rank ((rank−1)/(n−1)),
    cume_dist (rows ≤ current / n), and decile ntile over one window
    spec — the distribution-position trio quality-curation cuts are
    phrased in (t19 implements the same decile cut with the
    distributed two-phase rank; this is the single-partition-key
    window form both engines define identically). The total order
    (price, orderkey) makes every rank deterministic; one shuffle on
    the partition key."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@query(
    "q50_join_key_skew",
    oracle="""
    WITH counts AS (
        SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_count,
           round(quantile_cont(cnt, 0.5), 6) AS p50_count,
           round(quantile_cont(cnt, 0.99), 6) AS p99_count,
           CAST(floor(CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt) * 1e6
                      + 0.5) AS BIGINT) AS skew_ratio_ppm,
           CAST((SELECT l_orderkey FROM counts
                 ORDER BY cnt DESC, l_orderkey LIMIT 1) AS BIGINT) AS top_key,
           CAST(max(cnt) AS BIGINT) AS top_key_count
    FROM counts
    """,
)
def q50_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic (operators/aggregates.
    key_skew_profile) over lineitem's join key — the measurement a
    100 TB pipeline takes BEFORE picking salting / AQE skew
    thresholds / broadcast sides, phrased as a query so it runs in
    the same harness as everything else. One keys-sized shuffle plus
    a one-row aggregate; the hottest key comes from a lexicographic
    struct max in the SAME aggregate (count desc, key asc — no
    second job, no 1-row cross join). skew_ratio is integer ppm
    (floor(x*1e6+0.5), NOTES.md) so the row hashes cross-engine."""
    from ..operators.aggregates import key_skew_profile

    li = load_table(spark, sf_dir, "lineitem")
    return key_skew_profile(li, "l_orderkey")
