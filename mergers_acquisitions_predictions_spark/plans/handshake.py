"""Fixed-path artifact handshake shared by the value-checked ML and
index queries (m02/m05/s05/s09/m08 + io/auc artifacts).

These oracles re-read a parquet/CSV/text artifact their paired query
just wrote. The path must be STATIC because the oracle SQL string is
assembled at import time (the driver's harness can't thread a session
token into it) — but "static" means static PER PROCESS: the scratch
root honors $SPARK_GRAFT_SCRATCH exactly like the session-keyed index
scratch in plans/similarity_queries (ADVICE r5), so an operator can
point concurrent evaluators at disjoint roots. Within one process the
contract is an evaluation HANDSHAKE: the query overwrites (atomically,
via sources.writers.publish_parquet_atomic), then its paired oracle
re-reads the same files; checks run sequentially per (query, oracle)
pair. Two concurrent evaluator PROCESSES sharing a scratch root can
interleave a write between a query and its oracle read — that yields
a visible mismatch, never a false pass. scripts/seed_artifact_oracles.py
re-seeds every artifact at the driver's correctness SF and must run
LAST in any CI ordering that sweeps other SFs.
"""

from __future__ import annotations

import os

#: Read once at import: the oracle strings interpolate these paths, so
#: a mid-session env change must not split query and oracle.
_SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp")


def handshake_path(name: str) -> str:
    """The fixed artifact path for handshake artifact ``name``."""
    return os.path.join(_SCRATCH, f"mergers_acquisitions_spark_{name}")
