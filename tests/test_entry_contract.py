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


def test_north_star_queries_inside_driver_correctness_window():
    """The driver's CORRECTNESS gate verifies only the FIRST 50
    registry entries (round-1 verdict: the entire LLM-pipeline surface
    once registered past the window and went driver-unchecked). Guard
    the import order: every dedup/similarity/ml/text/udf/pipeline
    query must register inside the window; only long-green relational
    q* may rotate out."""
    from mergers_acquisitions_predictions_spark.plans import QUERIES

    # Deliberate exceptions, registered late ON PURPOSE in
    # plans/extra_queries.py: rows-only variants (a rows-only row
    # inside the window would displace a full value-parity row), and
    # oracle-backed queries whose MECHANISM already has an in-window
    # representative (the window holds 50; every late entry stays
    # value-checked by the local parity sweep, which has no cutoff).
    deliberate_late = {
        "s05_ivf_kmeans_topk",  # rows-only (k-means fit)
        "m05_kmeans_clusters",  # rows-only (k-means fit)
        "u03_multimodal_features",  # rows-only (binary payloads)
        "u01_pandas_udf_charge",  # scalar pandas_udf: u04 holds the slot
        "d13_simhash_neardups",  # sketch banding: d02/d04/d06 hold slots
        "t22_funnel_accounting",  # funnel: t13 holds the slot
        "t23_interleaved_order",  # ordering: t18/t19 hold the ordered.py slots
        "t24_shingle_diversity",  # corpus stats: t05/t16 hold the slots
        "t02_clean_text",  # r1-driver-green; regex cleaning: t15 holds the slot
        "t01_token_stats",  # r1-driver-green; token counts: t12/t16 hold slots
        "t25_bpe_merges",  # rows-only (iterative fit); t26 holds the BPE slot
        "s06_hard_negatives",  # ANN composition: s02-s04 hold the slots
        "m08_pca_whiten",  # rows-only (eigendecomposition fit)
        "j04_fuzzy_multipass",  # multi-pass ER: j03 holds the window slot
        "t29_bigram_backoff_quality",  # LM family: t28 holds the slot
        "d15_winnow_containment",  # containment: d03/d06/d08 hold postings slots
        "u02_grouped_minmax_scale",  # r1-driver-green; u04/u05 hold UDF slots
        "t14_token_chunks",  # chunking family: t18/t20 hold the slots
    }

    names = list(QUERIES)
    window = set(names[:50])
    outside = [
        n for n in names[50:] if n[0] in "dsmtuj" and n not in deliberate_late
    ]
    assert not outside, f"north-star queries past the driver window: {outside}"
    assert deliberate_late.isdisjoint(window), "late-listed query moved into window"


def test_missing_sf_dir_fails_cleanly(spark):
    """A wrong sf_dir must surface as Spark's AnalysisException (path
    not found) at plan/collect time — never a hang, never a silent
    empty result."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        E.queries()["q01_pricing_summary"](spark, "/nonexistent/sf9").count()
