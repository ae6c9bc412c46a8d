"""Query registry backing the driver contract.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus, when
SQL-expressible, a DuckDB oracle SQL string over the same parquet
tables. Registration happens via the :func:`query` decorator so the
inventory in ``__spark_entry__.py`` is assembled automatically.

Column-name discipline (driver contract): the correctness harness
sorts columns by NAME before hashing, so every computed column is
aliased identically in the Spark plan and the oracle SQL. Floating
aggregates are rounded on BOTH sides (sums to 2 decimals, means and
ratios to 4–6) so partial-aggregation order differences between Spark
and DuckDB can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the equivalent
    DuckDB SQL (omit for non-SQL-expressible ops → driver runs the
    weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
