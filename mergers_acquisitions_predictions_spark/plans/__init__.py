"""Named-query registry. Importing this package registers every query
module; the driver contract (`__spark_entry__.py`) reads QUERIES and
ORACLES from here."""

from .registry import ORACLES, QUERIES, query

# Import for side effect: each module registers its queries.
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import udf_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import relational4  # noqa: E402,F401
from . import extra_queries  # noqa: E402,F401
from . import io_queries  # noqa: E402,F401

#: ORDER IS LOAD-BEARING: the driver's CORRECTNESS gate verifies the
#: FIRST 50 registry entries each round. This pinned manifest (not
#: module import order) decides the window; tests/test_entry_contract
#: asserts list(QUERIES)[:50] == DRIVER_WINDOW so a refactor cannot
#: silently reshuffle it.
#:
#: ROTATION RULE (adopted round 4, per VERDICT r3): each round's
#: window contains (a) every query REGISTERED this round, (b) every
#: query whose implementation or oracle CHANGED since its last driver
#: row — a driver row must postdate the code it certifies — and (c)
#: the remaining slots go to the queries with the STALEST last driver
#: row (refreshing r1-era rows first). Rotated-out queries stay
#: value-guarded by tests/test_oracle_parity.py, which sweeps EVERY
#: oracle regardless of position.
#:
#: AMENDMENT (adopted round 7): a change to a SHARED infrastructure
#: layer (the memo/fingerprint machinery, session conf policy) puts
#: REPRESENTATIVE consumers in the window, not every consumer — the
#: layer executes identically inside every consumer's plan, and
#: pinning all ~40 of them each time an infra file changes would
#: starve (c) forever at 145+ registered queries (the binding
#: constraint VERDICT r6 #1 names). Queries whose OWN plan or oracle
#: string changed remain individually (b)-mandatory.
#:
#: Round 11: (a) new = s30 (the persisted-token-index ColBERT serve —
#: §7r-b's deployment route, VERDICT r10 #2), s31 (the materialized
#: token-table serve — the production fix for the serve-time explode,
#: VERDICT r10 #3), s32 (the streaming maxsim-rescore replay —
#: VERDICT r10 #6), and s33 (s30's route on the COMPRESSED IVF-PQ
#: token-index kind, with the kind-sniffing serve dispatch) and s34
#: (the index cell-balance diagnostic — the hash certifies the
#: on-disk partition layout itself); (b)
#: changed since last row = s29 (OWN plan: the learned books now come
#: through the sampled-fit path — VERDICT r10 #4) and s28 (OWN plan:
#: the composite-id injectivity guard rides its token scans — ADVICE
#: r10), plus s24/s15 as representative consumers of the
#: maxsim/serving guard layer (the dim-probe and rerank>=k
#: fail-fasts — validation-only, but the layer is shared);
#: (c) fill = the five never-driver-checked late registrations
#: (s25/s26/s27; s28/s29 already (b)) + the ENTIRE remaining r7-era
#: cohort (14 rows — VERDICT r10 #1) + the 24 alphabetically-first
#: rows of the 43-row r8 cohort (name order makes the tie-break
#: auditable). After this round every registered query has a driver
#: row and none predates round 8; the 19 remaining r8 rows
#: (q24..q43) are round 12's frontier.
DRIVER_WINDOW = [
    # (a): registered this round
    "s30_colbert_persisted_serve",
    "s31_token_table_serve",
    "s32_stream_rescore_replay",
    "s33_colbert_pq_serve",
    "s34_index_cell_stats",
    # (b): implementation changed since their last row
    "s29_pq_learned_index_topk",
    "s28_colbert_token_retrieval",
    "s24_maxsim_rerank_serve",
    "s15_stream_serve_replay",
    # (c): never-driver-checked late registrations (r10)
    "s25_pq_rerank_topk",
    "s26_maxsim_exact_topk",
    "s27_maxsim_token_table",
    # (c): the complete r7-era cohort (stalest rows after round 10)
    "t20_pack_manifest",
    "t21_source_mixture",
    "t22_funnel_accounting",
    "t23_interleaved_order",
    "t24_shingle_diversity",
    "t26_bpe_encode",
    "t27_snapshot_diff",
    "t29_bigram_backoff_quality",
    "t30_gopher_rules",
    "t31_importance_sample",
    "t33_token_entropy",
    "t35_source_overlap_matrix",
    "u04_lemmatize_pandas_udf",
    "u05_frame_sample_stats",
    # (c): the 24 alphabetically-first rows of the r8 cohort
    "d15_winnow_containment",
    "io04_layout_roundtrip",
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_top_revenue_orders",
    "q04_revenue_by_region",
    "q05_theta_pairs_per_nation",
    "q06_label_within_year",
    "q07_distinct_flags",
    "q08_topk_orders_per_customer",
    "q09_rollup_lineitem",
    "q10_nation_setops",
    "q11_semi_anti_customers",
    "q12_priority_order_stats",
    "q13_orders_near_events",
    "q14_scalar_functions",
    "q15_size_buckets",
    "q16_running_customer_spend",
    "q18_session_windows",
    "q19_sliding_windows",
    "q20_user_activity_gaps",
    "q21_pivot_status_by_priority",
    "q22_exists_subquery",
    "q23_scalar_subquery",
]

_missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
if _missing:  # fail at import, not in the driver's harness
    raise RuntimeError(f"DRIVER_WINDOW names unregistered queries: {_missing}")
_ordered = {n: QUERIES[n] for n in DRIVER_WINDOW}
for _n, _f in list(QUERIES.items()):
    if _n not in _ordered:
        _ordered[_n] = _f
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES", "DRIVER_WINDOW", "query"]
