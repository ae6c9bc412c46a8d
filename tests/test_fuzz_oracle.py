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


text_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abc XYZ09 .,!?-_/\\'\"\n\t()[]{}éñü@#&*+=%$")),
        max_size=80,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(texts=text_strategy)
def test_minhash_chain_parity_on_random_text(spark, tmp_path_factory, texts):
    """The whole dedup-oracle stack rides on tokenize→shingle→md5
    agreeing byte-for-byte between engines; fuzz that chain with
    adversarial text (mixed case, unicode, regex metachars,
    whitespace runs) instead of trusting the fixed corpus."""
    from mergers_acquisitions_predictions_spark.functions.text import (
        shingles,
        tokenize,
    )
    from mergers_acquisitions_predictions_spark.operators.dedup import (
        with_minhash_signatures,
    )

    tmp = tmp_path_factory.mktemp("fuzz_text")
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    path = str(tmp / "docs.parquet")
    pdf.to_parquet(path)

    df = spark.read.parquet(path)
    stats = df.select(
        "doc_id",
        F.size(tokenize("text")).alias("n_tok"),
        F.size(shingles(tokenize("text"), 3)).alias("n_sh"),
    )
    sigs = with_minhash_signatures(df, "text", "doc_id", n_hashes=4, shingle_n=3)
    got = (
        stats.join(sigs, "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    sig_sql = ",\n".join(
        f"list_min(list_transform(s, x ->"
        f" substr(md5('0:' || x), {1 + 8 * i}, 8))) AS sig{i}"
        for i in range(4)
    )
    want = (
        duckdb.connect()
        .execute(
            f"""
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tok) - 1),
                       i -> array_to_string(list_slice(tok, i, i + 2), ' '))) AS s,
                   len(tok) AS n_tok
            FROM (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
                  FROM '{path}')
        )
        SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
               CAST(len(s) AS INTEGER) AS n_sh, {sig_sql}
        FROM sh ORDER BY doc_id
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
