"""Session conf policy: scale-gated confs stay OUT of the default
profile (their optimizer rules tax every interactive query's planning
— the measured round-3 regression, PERF.md round 4) and IN the
cluster overlay where their thresholds can actually trigger."""

from __future__ import annotations

from mergers_acquisitions_predictions_spark.session import CLUSTER_CONF, ENGINE_CONF

BLOOM = "spark.sql.optimizer.runtime.bloomFilter.enabled"


def test_bloom_filter_is_cluster_gated():
    assert BLOOM not in ENGINE_CONF
    assert CLUSTER_CONF[BLOOM] == "true"


def test_overlay_never_relaxes_engine_defaults():
    # The overlay may only ADD scale-gated keys, never silently
    # override a correctness-relevant engine default (TZ, AQE, Arrow).
    assert not set(CLUSTER_CONF) & set(ENGINE_CONF)
