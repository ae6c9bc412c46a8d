"""Cross-check our custom MinHash-LSH dedup against MLlib's
MinHashLSH approxSimilarityJoin (SURVEY §4: the library alternative).
Both are candidate generators for the same exact-Jaccard ground truth;
the library join's output must agree with exact Jaccard distances, and
our exact jaccard_pairs must be a superset of high-similarity library
hits."""

from __future__ import annotations

import pytest
from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer
from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.operators.dedup import jaccard_pairs
from mergers_acquisitions_predictions_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_mllib_minhash_agrees_with_exact_jaccard(spark):
    docs = load_table(spark, SF, "documents")
    exact = {
        (r.a_id, r.b_id): r.jaccard
        for r in jaccard_pairs(docs, shingle_n=1, threshold=0.5).collect()
    }
    assert exact  # token-level jaccard >= 0.5 pairs exist in this corpus

    tok = RegexTokenizer(
        inputCol="text", outputCol="tokens", pattern="[^a-z0-9]+", toLowercase=True
    ).transform(docs)
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", binary=True).fit(tok)
    tf = cv.transform(tok).select("doc_id", "tf")
    model = MinHashLSH(inputCol="tf", outputCol="hashes", numHashTables=8, seed=42).fit(
        tf
    )
    sim = (
        model.approxSimilarityJoin(tf, tf, 0.5, distCol="jaccard_dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            (1 - F.col("jaccard_dist")).alias("jaccard"),
        )
        .collect()
    )
    lib = {(r.a_id, r.b_id): r.jaccard for r in sim}
    # distances MLlib reports must match exact jaccard where both found
    for pair, j in lib.items():
        if pair in exact:
            assert exact[pair] == pytest.approx(j, abs=1e-6)
    # library candidates with jaccard >= 0.5 are a subset of exact truth
    assert set(k for k, v in lib.items() if v >= 0.5) <= set(exact)
