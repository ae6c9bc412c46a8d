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
#: Round 4: changed/new set = s13 (new: persisted-index serving),
#: s04/s08/s10/s11 (auto_cells rewire — s04 also closes the r3
#: "stale row" finding), s12 (bucketed shortlist + typed MMR schema),
#: d03 (max_df cap registered + oracle), d15 (self-join-free capped
#: plan), d19 (oracle zero-overlap symmetry). The other 41 slots
#: refresh r1-green rows (q01–q43 family). Seven r1-stale queries
#: did not fit (q44, q45, t01, t02, u01, u02, u03) — they are first
#: in line for round 5's fill.
DRIVER_WINDOW = [
    # (a)+(b): new or changed since their last driver row
    "s13_persisted_index_topk",
    "s04_ivf_ann_topk",
    "s08_ivfpq_topk",
    "s10_ivfsq_topk",
    "s11_rrf_fusion",
    "s12_mmr_rerank",
    "d03_jaccard_pairs",
    "d15_winnow_containment",
    "d19_minhash_estimate",
    # (c): stalest driver rows (all r1), oldest-first by name
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
    "q24_having",
    "q25_monthly_orders",
    "q26_null_handling",
    "q27_string_functions2",
    "q28_union_dedup",
    "q29_window_lead_lag",
    "q30_cube",
    "q31_json_extract",
    "q32_collect_sorted",
    "q33_quantiles",
    "q34_full_outer_join",
    "q35_cross_join_grid",
    "q36_stats_aggregates",
    "q37_any_all_semantics",
    "q39_asof_attribution",
    "q40_range_frame_window",
    "q41_rank_functions",
    "q42_grouping_sets",
    "q43_datetime_functions",
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
