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
#: Round 10: (a) new = s22 (the composed dedup+rerank serve — THE
#: production configuration §7o-r9 measured; oracle machinery
#: pre-certified in round 9; VERDICT r9 #1), s23 (the persisted
#: IVF-PQ index — the compressed persisted kind, sharing the
#: generation commit and serving contract with the s13 family), and
#: s24 (the late-interaction maxsim re-rank serve — ColBERT's
#: retrieve-then-rerank architecture over the persisted index);
#: (b) changed since last row = s08/s09/s10, whose OWN plans changed
#: (the in-memory SQ/PQ encode now binds its unit vector once via
#: util.hof_bind — the §7p fix; bit-identical values, different
#: expression tree), plus s13/s14/s18 as the representative consumers
#: of the index-infra changes (the generation-keyed meta memo and the
#: swap-failure retention policy — ADVICE r9; the memo machinery is
#: exactly the shared-layer class the round-7 amendment names, and
#: the three cover its build-prime, append-prime, and
#: compact-prime/serve-peek sites; s15/s17/s20 ride the identical
#: code and keep their r9-fresh rows; s22's serve is (a) anyway);
#: (c) fill = the ENTIRE remaining r6-era cohort (13 rows — VERDICT
#: r9 #2) + the 28 alphabetically-first rows of the 43-row r7 cohort
#: (s09 is r7-stale but already (b)-mandatory; the name order makes
#: the tie-break auditable). After this round no driver row predates
#: round 7; the 14 remaining r7 rows (t20..u05) are round 11's
#: frontier.
DRIVER_WINDOW = [
    # (a): registered this round
    "s22_dedup_rerank_serve",
    "s23_pq_index_topk",
    "s24_maxsim_rerank_serve",
    # (b): implementation changed since their last row
    "s08_ivfpq_topk",
    "s09_ivfpq_kmeans_topk",
    "s10_ivfsq_topk",
    "s13_persisted_index_topk",
    "s14_index_append_topk",
    "s18_index_compact_serve",
    # (c): the complete r6-era cohort (stalest rows after round 9)
    "t10_language_id",
    "t11_quality_scores",
    "t12_bpe_token_count",
    "t13_training_prep_funnel",
    "t15_pii_redaction",
    "t16_repetition_stats",
    "t25_bpe_merges",
    "t28_unigram_logprob_quality",
    "t32_vocab_coverage",
    "t34_ccnet_buckets",
    "t36_stratified_split",
    "t37_epoch_shuffle_shards",
    "u03_multimodal_features",
    # (c): the 30 alphabetically-first rows of the r7 cohort
    "d08_prefix_jaccard_pairs",
    "d12_incremental_neardup",
    "d13_simhash_neardups",
    "d16_dup_span_coverage",
    "d18_span_trim",
    "io01_csv_roundtrip",
    "io02_corpus_dir_scan",
    "io03_jsonl_roundtrip",
    "j04_fuzzy_multipass",
    "j05_event_window_range_join",
    "m01_tfidf_features",
    "m02_lr_confusion",
    "m03_lda_topics",
    "m05_kmeans_clusters",
    "m07_stratified_sample",
    "m08_pca_whiten",
    "m09_auc_rank_sum",
    "q46_unpivot_measures",
    "q47_table_profile",
    "q48_percentile_cont",
    "q49_relative_rank",
    "q50_join_key_skew",
    "s12_mmr_rerank",
    "s16_index_append_drift",
    "t14_token_chunks",
    "t17_winnow_fingerprints",
    "t18_sequence_packing",
    "t19_quality_rank_filter",
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
