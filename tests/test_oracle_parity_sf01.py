"""Full oracle sweep at sf0.1 — env-gated (slow: ~4 min on local[16]).

The default suite checks parity at sf0.001/0.01; some divergences only
materialize at larger partition sizes (q41's decimal-tie rounding,
caught exactly this way). Run before shipping query-semantics changes:

    SPARK_GRAFT_FULL_SF01=1 python -m pytest tests/test_oracle_parity_sf01.py -q
"""

from __future__ import annotations

import os

import pytest

from mergers_acquisitions_predictions_spark.plans import ORACLES, QUERIES

from .oracle_utils import assert_query_matches_oracle

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_SF01"),
    reason="set SPARK_GRAFT_FULL_SF01=1 for the full sf0.1 sweep",
)

SF = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_sf01(spark, name):
    assert_query_matches_oracle(spark, name, SF)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_sf01(spark, name):
    assert QUERIES[name](spark, SF).count() >= 0
