"""Custom stateful streaming operator via `applyInPandasWithState`
(SURVEY §2.9 north-star: the escape hatch for stateful logic the
built-in window aggregates can't express).

Example operator: running per-user totals — each micro-batch updates
a (count, sum) state per user and emits the cumulative row. The same
shape extends to sessionization with custom rules, online feature
accumulation, or CUSUM-style drift detection.

Scale notes: state lives in the state store partitioned by the group
key (one user's state on one executor); an idle-timeout evicts
abandoned keys (set a real timeout in production — NoTimeout here
keeps the example deterministic for tests).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("sum_value_total", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user (count, sum) across micro-batches. Emits
    one row per user per batch with the running totals — downstream
    sinks see monotone state snapshots.

    The update function is deliberately a CLOSURE, not a module-level
    function: cloudpickle serializes closures by value, so Python
    workers need no importable copy of this package (a module-level
    function pickles by reference and breaks under any driver whose
    workers lack the repo on sys.path)."""

    def update_user_totals(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events_total": [n],
                "sum_value_total": [total],
            }
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
