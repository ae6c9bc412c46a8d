"""Driver-contract invariants for __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.schema == E.entry(spark).schema


def test_registry_shape():
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every oracle is a non-trivial SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_all_queries_produce_stable_schemas(spark):
    sf = "/root/testdata/sf0.001"
    for name, fn in E.queries().items():
        df = fn(spark, sf)
        assert df.columns, name
        assert len(set(df.columns)) == len(df.columns), f"{name}: duplicate col names"


def test_driver_window_is_the_pinned_manifest():
    """The driver's CORRECTNESS gate verifies only the FIRST 50
    registry entries. Round 3 pins the window as an explicit manifest
    (plans.DRIVER_WINDOW) so a module refactor cannot silently
    reshuffle which queries the driver checks — assert the registry's
    first 50 ARE that manifest, verbatim and in order."""
    from mergers_acquisitions_predictions_spark.plans import DRIVER_WINDOW, QUERIES

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert list(QUERIES)[:50] == DRIVER_WINDOW
    # Round-3 rotation goal: the 14 queries with no driver row in
    # rounds 1-2 must all sit inside the window this round.
    never_checked_before_r3 = {
        "d13_simhash_neardups",
        "d15_winnow_containment",
        "j04_fuzzy_multipass",
        "m05_kmeans_clusters",
        "m08_pca_whiten",
        "q46_unpivot_measures",
        "s05_ivf_kmeans_topk",
        "s06_hard_negatives",
        "t14_token_chunks",
        "t22_funnel_accounting",
        "t23_interleaved_order",
        "t24_shingle_diversity",
        "t25_bpe_merges",
        "t29_bigram_backoff_quality",
    }
    assert never_checked_before_r3 <= set(DRIVER_WINDOW)
    # Queries BUILT in round 3 must also debut inside the window —
    # otherwise they'd repeat the round-2 "never driver-checked"
    # finding verbatim.
    new_in_r3 = {
        "j05_event_window_range_join",
        "d16_dup_span_coverage",
        "d17_components_star",
        "d18_span_trim",
        "s07_ann_recall",
        "s08_ivfpq_topk",
        "s09_ivfpq_kmeans_topk",
        "t30_gopher_rules",
        "t31_importance_sample",
        "t32_vocab_coverage",
        "t33_token_entropy",
        "q48_percentile_cont",
        "q49_relative_rank",
        "q47_table_profile",
        "s10_ivfsq_topk",
        "t34_ccnet_buckets",
        "s11_rrf_fusion",
        "q50_join_key_skew",
        "s12_mmr_rerank",
        "t35_source_overlap_matrix",
        "d19_minhash_estimate",
    }
    assert new_in_r3 <= set(DRIVER_WINDOW)


def test_missing_sf_dir_fails_cleanly(spark):
    """A wrong sf_dir must surface as Spark's AnalysisException (path
    not found) at plan/collect time — never a hang, never a silent
    empty result."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        E.queries()["q01_pricing_summary"](spark, "/nonexistent/sf9").count()
