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
#: Round 12: (a) new = s35 (the ONE-CALL composed persisted ColBERT
#: serve — persisted token index + materialized token table, no
#: in-memory corpus frame, VERDICT r11 #3), s36 (the RAGGED
#: token-count retrieval — per-document variable T through the full
#: persisted route, VERDICT r11 #4), and s37 (the RESIDUAL-encoded
#: IVF-PQ kind — built after §7s measured +0.16 recall@5 at equal
#: bytes on the structured corpus, VERDICT r11 #7; opt-in flag
#: recorded in the geometry), s38 (§7s's winning configuration —
#: LEARNED residual books through the sampled fit, artifact-replayed,
#: + exact rerank), and s39 (the residual flag composed through the
#: COMPRESSED TOKEN-index route — token frames are slices of document
#: embeddings, the structured class §7s measured the win on), and
#: s40 (the streaming INDEX-INGEST sink — nightly ingest as a stream:
#: the foreachBatch per-batch body appending under frozen geometry,
#: wire-format round-trip included, certified by s14's oracle); (b)
#: changed since last row =
#: s30/s33 (OWN serve entry `maxsim_search_tokens_persisted`: the
#: recorded-n_tokens cross-check + token_meta sniff + token-table
#: route, ADVICE r11), s29 and s09 (OWN plans: `pq_kmeans_codebooks`
#: now sizes its sample via the lazy count — memoized key or
#: limit-probe — instead of an unconditional corpus.count(), ADVICE
#: r11), plus s13 as the representative consumer of the
#: `build_ivfsq_index(extra_meta=)` sidecar hook (shared index-build
#: layer; default None is byte-identical, the token-index consumers
#: s30/s33/s35/s36 exercise the non-default path; s37 rides the same
#: hook as (a)); (c) fill = the ENTIRE 19-row r8 cohort (q24..q43 —
#: VERDICT r11 #2, the staleness frontier) + the 20
#: alphabetically-first rows of the 44-row r9 cohort (name order
#: makes the tie-break auditable; q45/s01/s02/s03 moved to the r13
#: frontier as s37/s38/s39/s40's (a)-slots shrank the fill). After
#: this round every registered query's driver row postdates r8; the
#: 24 remaining r9 rows (q45..u02) are round 13's frontier.
DRIVER_WINDOW = [
    # (a): registered this round
    "s35_colbert_one_call_serve",
    "s36_colbert_ragged_tokens",
    "s37_pq_residual_topk",
    "s38_pq_residual_learned_topk",
    "s39_colbert_residual_pq_serve",
    "s40_stream_index_ingest",
    # (b): implementation changed since their last row
    "s30_colbert_persisted_serve",
    "s33_colbert_pq_serve",
    "s29_pq_learned_index_topk",
    "s09_ivfpq_kmeans_topk",
    "s13_persisted_index_topk",
    # (c): the complete r8-era cohort (the staleness frontier)
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
    # (c): the 20 alphabetically-first rows of the r9 cohort
    "d01_minhash_signatures",
    "d02_minhash_lsh_pairs",
    "d03_jaccard_pairs",
    "d04_simhash",
    "d05_embedding_neardups",
    "d06_lsh_verified_neardups",
    "d07_lsh_embedding_neardups",
    "d09_dup_clusters",
    "d10_contamination",
    "d11_semantic_dedup",
    "d14_cluster_canonicals",
    "d17_components_star",
    "d19_minhash_estimate",
    "j02_deal_name_linkage",
    "j03_fuzzy_name_match",
    "m04_pair_ranking",
    "m06_split_assignment",
    "q17_tumbling_windows",
    "q38_deterministic_sample",
    "q44_null_ordering",
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
