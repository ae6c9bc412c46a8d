"""Prediction pairing + ranking (SURVEY §2.2 P8/P9, §2.3 J4/J5, §2.7
U3; `predictions.scala`).

The reference's final stage: keep predicted positives, join tickers,
extract P(class=1) from the probability vector, theta-join predicted
acquirers × predicted targets within the same SIC-industry prefix,
rank by joint probability.
"""

from __future__ import annotations

from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def positive_probability(prob_vec: Column) -> Column:
    """U3 (`predictions.scala:29`): element 1 of the probability vector
    — `vector_to_array(col)[1]`, a JVM expression, not the reference's
    Scala UDF (and not a Python UDF)."""
    return vector_to_array(prob_vec).getItem(1)


def industry_prefix(sic: Column, digits_dropped: int = 1) -> Column:
    """P8 (`predictions.scala:18-19`): `(SIC / 10).cast("integer")` —
    implemented as floor-division so the truncation semantics are
    explicit and portable."""
    return F.floor(sic.cast("double") / (10**digits_dropped)).cast("long")


def rank_pairs(
    acquirers: DataFrame,
    targets: DataFrame,
    industry_col: str = "sic1",
    id_col: str = "cik",
    prob_col: str = "prob",
    top_k: int | None = None,
) -> DataFrame:
    """J5+P9 (`predictions.scala:37`): pair acquirers × targets in the
    same industry bucket, excluding self-pairs; score = acq_prob ×
    tgt_prob; optional global top-k.

    Scale: executed as an equi-join on the industry bucket with the
    `!=` residual — exactly Catalyst's plan for the reference SQL.
    Industry buckets are the skew axis (some industries dominate);
    AQE skew-join splitting applies. Top-k is TakeOrdered."""
    a = acquirers.select(
        F.col(id_col).alias("acq_id"),
        F.col(industry_col).alias("industry"),
        F.col(prob_col).alias("acq_prob"),
    )
    t = targets.select(
        F.col(id_col).alias("tgt_id"),
        F.col(industry_col).alias("industry"),
        F.col(prob_col).alias("tgt_prob"),
    )
    pairs = (
        a.join(t, "industry")
        .filter(F.col("acq_id") != F.col("tgt_id"))
        .select(
            "industry",
            "acq_id",
            "tgt_id",
            F.round(F.col("acq_prob") * F.col("tgt_prob"), 6).alias("pair_score"),
        )
    )
    if top_k:
        pairs = pairs.orderBy(
            F.desc("pair_score"), F.asc("acq_id"), F.asc("tgt_id")
        ).limit(top_k)
    return pairs
