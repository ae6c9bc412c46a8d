"""Hypothesis fuzz of the oracle-parity methodology itself: random
frames written to parquet, the same aggregation run in Spark and
DuckDB, results compared with the exact harness rules (rounding,
BIGINT casts). Catches parity-engineering regressions the fixed
queries can't — e.g., a rounding or type-mapping change that only
bites on adversarial values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),  # few keys -> real groups
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(rows=rows_strategy)
def test_grouped_agg_parity_on_random_frames(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("fuzz")
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    path = str(tmp / "t.parquet")
    pdf.to_parquet(path)

    got = (
        spark.read.parquet(path)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 2).alias("s"),
            F.round(F.avg("v"), 6).alias("a"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            f"""
            SELECT k, count(*) AS n, round(sum(v), 2) AS s,
                   round(avg(v), 6) AS a, min(v) AS mn, max(v) AS mx
            FROM '{path}' GROUP BY k ORDER BY k
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
