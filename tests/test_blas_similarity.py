"""BLAS all-pairs cosine operator: must agree with the JVM-exact d05
plan within float tolerance (BLAS reduction order differs by design)."""

from __future__ import annotations

import pytest

from mergers_acquisitions_predictions_spark.operators.similarity import (
    all_pairs_cosine_blas,
)
from mergers_acquisitions_predictions_spark.plans.dedup_queries import (
    d05_embedding_neardups,
)
from mergers_acquisitions_predictions_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_blas_path_matches_jvm_exact(spark):
    exact = {
        (r.a_id, r.b_id): r.cos_sim for r in d05_embedding_neardups(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings")
    blas = {
        (r.a_id, r.b_id): r.cos_sim
        for r in all_pairs_cosine_blas(emb, emb, threshold=0.4).collect()
    }
    # pair sets may differ only for pairs within 1e-9 of the threshold
    only_exact = {k for k in exact if k not in blas}
    only_blas = {k for k in blas if k not in exact}
    for k in only_exact:
        assert abs(exact[k] - 0.4) < 1e-6, k
    for k in only_blas:
        assert abs(blas[k] - 0.4) < 1e-6, k
    for k in exact.keys() & blas.keys():
        assert exact[k] == pytest.approx(blas[k], abs=1e-6)
    assert len(exact.keys() & blas.keys()) > 0


def test_blas_right_side_cap_guards_collect(spark):
    import pytest

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="exceeds 5 rows"):
        all_pairs_cosine_blas(emb, emb, threshold=0.0, max_right_rows=5)
