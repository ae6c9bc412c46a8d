"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``mergers_acquisitions_predictions_spark/plans/``
and register themselves via the ``@query`` decorator; this module just
re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mergers_acquisitions_predictions_spark.plans import ORACLES, QUERIES

FLAGSHIP = "q06_label_within_year"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 Phase 0: the reference's 365-day
    labeling dataflow re-shaped onto the star schema) on sf0.001."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys
    absent here (m02/m03/m05/m08/s05 MLlib fits, t25 iterative BPE
    fit, u03 binary payloads) get the driver's rows-only check. The
    approximate LSH/IVF queries (s03/s04/d07/s06) ARE value-checked —
    their deterministic constants are emitted into the oracle SQL
    (plans/lsh_oracle.py) — and so is m01: the fitted TF-IDF pipeline's
    vectors are projected to (doc_id, term, weight) rows the oracle
    recomputes relationally."""
    return dict(ORACLES)
