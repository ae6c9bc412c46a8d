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
    approx_percentile (t-digest) — exposed in aggregates, rows-only."""
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
