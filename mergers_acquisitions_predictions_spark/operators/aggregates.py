"""Aggregation operators (SURVEY §2.4 + the general groupBy family).

The reference's only reductions are `count`, `.distinct`, and ML
`fit()`s; the engine exposes the full family. Everything here is a
hash aggregate with map-side partial aggregation — the shuffle carries
one row per (group × partition), independent of input SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """A2 (`acq_etl_code.scala:96-100`)."""
    return df.dropDuplicates(subset) if subset else df.distinct()


def grouped_stats(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """count/sum/avg/min/max/count-distinct/approx-distinct in one
    shuffle. `approx_count_distinct` (HLL) is the scale path for
    distinct counts — constant memory per group."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(value), 2).alias("sum_value"),
        F.round(F.avg(value), 6).alias("avg_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
        F.count_distinct(F.col(value)).alias("n_distinct"),
        F.approx_count_distinct(value).alias("n_approx_distinct"),
    )


def confusion_matrix(df: DataFrame, label: str, prediction: str) -> DataFrame:
    """M10: the reference runs FOUR filtered counts (`lr.scala:50-54`);
    one groupBy computes the same matrix in a single shuffle."""
    return df.groupBy(
        F.col(label).cast("int").alias("label"),
        F.col(prediction).cast("int").alias("prediction"),
    ).agg(F.count(F.lit(1)).alias("n"))


def document_frequency(
    tokens_df: DataFrame,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_df: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """A3 engine-level vocabulary build — the relational spelling of
    `CountVectorizer.setMinDF/setMaxDF` (`acq_etl_code.scala:73`):
    explode → per-term distinct-doc count → frequency band filter.
    `array_distinct` before the explode keeps the shuffle at one row
    per (doc, distinct term)."""
    term_doc = tokens_df.select(
        F.col(doc_col).alias("doc"),
        F.explode(F.array_distinct(F.col(tokens_col))).alias("term"),
    )
    df_counts = term_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df is not None:
        df_counts = df_counts.filter(F.col("df") >= min_df)
    if max_df is not None:
        df_counts = df_counts.filter(F.col("df") <= max_df)
    return df_counts
