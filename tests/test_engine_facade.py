from __future__ import annotations

import pytest

from mergers_acquisitions_predictions_spark.engine import Engine

SF = "/root/testdata/sf0.001"


def test_engine_surfaces(spark):
    eng = Engine(spark, SF)
    assert eng.table("nation").count() == 25
    assert eng.sql("SELECT count(*) AS n FROM region").first().n == 5
    df = eng.run("q01_pricing_summary")
    assert df.count() > 0
    assert "q06_label_within_year" in eng.query_names()


def test_engine_errors(spark):
    eng = Engine(spark)
    with pytest.raises(ValueError, match="attach"):
        eng.table("nation")
    eng.attach(SF)
    with pytest.raises(KeyError, match="unknown query"):
        eng.run("nope")
