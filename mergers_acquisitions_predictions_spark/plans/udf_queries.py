"""UDF-surface queries (SURVEY §2.7): the engine's three Python escape
hatches — scalar Arrow pandas_udf, grouped-map applyInPandas, and
mapInPandas — each exercised through the driver gate. Where the
Python computation is numerically reproducible in SQL the query is
oracle-checked; the multimodal featurizer is rows-only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query


@query(
    "u01_pandas_udf_charge",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def u01_pandas_udf_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow-vectorized pandas_udf (U4's mechanism — the slot
    the reference fills with its lemmatizer UDF). Double arithmetic
    elementwise in numpy matches the SQL expression bit-for-bit, so
    this one IS oracle-checkable. The builtin-expression form is
    preferred in production (q01); this query exists to keep the UDF
    path tested end-to-end."""

    @F.pandas_udf("double")
    def charge(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1 - discount) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "u02_grouped_minmax_scale",
    oracle="""
    SELECT c_nationkey, c_custkey,
           round(CASE WHEN mx = mn THEN 0.5
                      ELSE (c_acctbal - mn) / (mx - mn) END, 6) AS balance_scaled
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               min(c_acctbal) OVER (PARTITION BY c_nationkey) AS mn,
               max(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx
        FROM customer
    )
    """,
)
def u02_grouped_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDTF-shaped surface, SURVEY
    §2.7): per-nation min-max scaling. Min/max are order-insensitive
    (unlike mean/std), so the pandas computation is exactly
    reproducible by the SQL window formulation — oracle-checked.

    Scale: one shuffle on the group key; each group becomes ONE pandas
    frame in one python worker — groups must fit in memory, which is
    the documented contract of grouped-map (use window functions
    when they don't)."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        scaled = (
            pd.Series(0.5, index=pdf.index)
            if mx == mn
            else (pdf["c_acctbal"] - mn) / (mx - mn)
        )
        return pd.DataFrame(
            {
                "c_nationkey": pdf["c_nationkey"],
                "c_custkey": pdf["c_custkey"],
                "balance_scaled": scaled.round(6),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        scale, schema="c_nationkey int, c_custkey long, balance_scaled double"
    )


@query("u03_multimodal_features")  # rows-only: fake payload bytes aren't SQL
def u03_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas over binary payloads (multimodal/binary.py): the
    Arrow-batched per-partition iterator surface, driven through the
    driver gate as a rows-only check (byte-level invariants are
    asserted in tests/test_multimodal.py)."""
    from ..multimodal.binary import attach_fake_payload, extract_features

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_fake_payload(docs)).drop("feature")
