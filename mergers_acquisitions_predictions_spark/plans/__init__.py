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
#: Round 13: (a) new = s41 (the EXACTLY-ONCE streaming index ingest —
#: staged idempotent upsert + membership reconcile, a deliberately
#: re-delivered batch appends nothing, VERDICT r12 #3) and s42 (the
#: streaming maintenance loop closed: multi-batch ingest → accretion
#: monitor FIRES `compact_if_accreted` → serve from the committed
#: generation, VERDICT r12 #5); (b) changed since last row =
#: s30/s33/s35/s36/s39 (OWN serve entry
#: `maxsim_search_tokens_persisted`: the warm-session n_tokens
#: cross-check hole — the sidecar is now read unconditionally on a
#: token_meta miss and re-primed, ADVICE r12), s38 (OWN fit
#: `pq_kmeans_residual_codebooks` gained the opt-in BLAS cell
#: assignment — default fold path, VERDICT r12 #2), s40 (OWN plan:
#: `ingest_batch` dropped its unused session parameter, ADVICE r12),
#: plus s13 and s37 as the SQ8- and PQ-side representative consumers
#: of the `_with_extra_meta` collision guard (shared index-build
#: layer; non-colliding callers are byte-identical); (c) fill = the
#: ENTIRE 24-row r9 cohort (q45..u02 — VERDICT r12 #1, the staleness
#: frontier) + the 6 alphabetically-first rows of the 47-row r10
#: cohort (name order makes the tie-break auditable; m07, m05, m03,
#: m02, m01, j05, j04, io03, then io02 moved to the r14 frontier as
#: the round's (a)-slots — s43/s44/s45/s46/s47/t38/t39/t40/t41 —
#: shrank the fill). After this round every registered query's driver
#: row postdates r9; the 41 remaining r10 rows (io02..u03) are round
#: 14's frontier.
DRIVER_WINDOW = [
    # (a): registered this round
    "s41_stream_exactly_once_ingest",
    "s42_stream_ingest_compact_serve",
    "s43_index_recall_probe",
    "s44_stream_append_only_ingest",
    "s45_sharded_index_serve",
    "s46_hybrid_bm25_dense",
    "s47_hybrid_persisted_serve",
    "t38_bm25_topk",
    "t39_bm25_persisted_serve",
    "t40_bm25_append_serve",
    "t41_bm25_stream_ingest",
    # (b): implementation changed since their last row
    "s30_colbert_persisted_serve",
    "s33_colbert_pq_serve",
    "s35_colbert_one_call_serve",
    "s36_colbert_ragged_tokens",
    "s39_colbert_residual_pq_serve",
    "s38_pq_residual_learned_topk",
    "s40_stream_index_ingest",
    "s13_persisted_index_topk",
    "s37_pq_residual_topk",
    # (c): the complete r9-era cohort (the staleness frontier)
    "q45_except_all_multiplicity",
    "s01_embedding_norms",
    "s02_cosine_topk",
    "s03_lsh_ann_topk",
    "s04_ivf_ann_topk",
    "s05_ivf_kmeans_topk",
    "s06_hard_negatives",
    "s07_ann_recall",
    "s11_rrf_fusion",
    "s17_filtered_index_topk",
    "s19_sampled_kmeans_topk",
    "s20_reranked_index_topk",
    "s21_dedup_index_serve",
    "t01_token_stats",
    "t02_clean_text",
    "t03_ngram_stats",
    "t04_stopword_filter",
    "t05_lang_source_stats",
    "t06_doc_fingerprints",
    "t07_exact_dedup_summary",
    "t08_vocabulary",
    "t09_tfidf_top_terms",
    "u01_pandas_udf_charge",
    "u02_grouped_minmax_scale",
    # (c): the 6 alphabetically-first rows of the r10 cohort
    "d08_prefix_jaccard_pairs",
    "d12_incremental_neardup",
    "d13_simhash_neardups",
    "d16_dup_span_coverage",
    "d18_span_trim",
    "io01_csv_roundtrip",
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
