"""The dual-surface claim (SURVEY §1.1): every capability is reachable
through BOTH the DataFrame API and SQL-over-temp-views, producing the
same Catalyst plan family and identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.engine import Engine
from mergers_acquisitions_predictions_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

#: (query name, equivalent Spark-SQL text over the registered views)
SQL_EQUIVALENTS = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q05_theta_pairs_per_nation": """
        SELECT a.c_nationkey AS nationkey, count(*) AS n_pairs
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey != b.c_custkey
        GROUP BY a.c_nationkey
    """,
    "q06_label_within_year": """
        WITH first_order AS (
            SELECT o_custkey, min(o_orderdate) AS first_date
            FROM orders GROUP BY o_custkey
        )
        SELECT DISTINCT o.o_orderkey, o.o_custkey,
               CAST(datediff(o.o_orderdate, f.first_date) AS LONG) AS days_since_first,
               IF(datediff(o.o_orderdate, f.first_date) < 365
                  AND datediff(o.o_orderdate, f.first_date) >= 0, 1, 0) AS within_year
        FROM orders o LEFT JOIN first_order f ON o.o_custkey = f.o_custkey
    """,
}


def test_sql_and_dataframe_surfaces_agree(spark):
    eng = Engine(spark, SF)
    for name, sql in SQL_EQUIVALENTS.items():
        df_rows = sorted(map(tuple, QUERIES[name](spark, SF).collect()))
        sql_rows = sorted(map(tuple, eng.sql(sql).collect()))
        assert df_rows == sql_rows, name
