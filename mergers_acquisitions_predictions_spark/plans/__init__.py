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
#: Round 9: (a) new = s20 (the exact-rerank serve — §7o-r8 remedy
#: (b), oracle machinery pre-certified in round 8; VERDICT r8 #2)
#: and s21 (dedup-before-index composite — SemDeDup survivors feed
#: the persisted index build; VERDICT r8 #5);
#: (b) changed since last row = the persisted-index family on the
#: GENERATION-SCOPED geometry + staged-rebuild commit (codes_gN
#: co-locates its _meta, rebuild commits like a compaction with
#: one-cycle retention, numeric generation sort, single resolution
#: per serve, driver-side sidecar I/O — ADVICE r8, all four items;
#: s13/s14/s15/s17/s18 — every registered query that executes
#: build/search/append/compact), plus s05 and s19 as the
#: supplied-centroid representatives of `collect_centroid_rows`'s
#: cell_id sort (the digest/literal canonicalization — ADVICE r8;
#: results bit-identical, the in-memory IVF consumers s03/s04/s08/
#: s10/s11/d07/d11 all ride the (c) fill anyway). s16 stays out of
#: (b) on the r8 precedent: its own plan and oracle are untouched,
#: it composes build+append+search, all certified by the five
#: in-window family members, and its row is r8-fresh;
#: (c) fill = the ENTIRE r5-era staleness frontier (21 rows incl.
#: streaming q17 — VERDICT r8 #1) + the 20 alphabetically-first rows
#: of the 33-row r6 cohort (equal staleness; the name order makes
#: the tie-break auditable). After this round no driver row predates
#: round 6; the 13 remaining r6 rows (t10..u03) are round 10's
#: frontier.
DRIVER_WINDOW = [
    # (a): registered this round
    "s20_reranked_index_topk",
    "s21_dedup_index_serve",
    # (b): implementation changed since their last row
    "s05_ivf_kmeans_topk",
    "s13_persisted_index_topk",
    "s14_index_append_topk",
    "s15_stream_serve_replay",
    "s17_filtered_index_topk",
    "s18_index_compact_serve",
    "s19_sampled_kmeans_topk",
    # (c): the complete r5-era cohort (stalest rows after round 8)
    "d01_minhash_signatures",
    "d03_jaccard_pairs",
    "d04_simhash",
    "d10_contamination",
    "j02_deal_name_linkage",
    "j03_fuzzy_name_match",
    "m04_pair_ranking",
    "m06_split_assignment",
    "q17_tumbling_windows",
    "q38_deterministic_sample",
    "q44_null_ordering",
    "q45_except_all_multiplicity",
    "s01_embedding_norms",
    "s02_cosine_topk",
    "t01_token_stats",
    "t02_clean_text",
    "t03_ngram_stats",
    "t04_stopword_filter",
    "t05_lang_source_stats",
    "u01_pandas_udf_charge",
    "u02_grouped_minmax_scale",
    # (c): the 20 alphabetically-first rows of the r6 cohort
    "d02_minhash_lsh_pairs",
    "d05_embedding_neardups",
    "d06_lsh_verified_neardups",
    "d07_lsh_embedding_neardups",
    "d09_dup_clusters",
    "d11_semantic_dedup",
    "d14_cluster_canonicals",
    "d17_components_star",
    "d19_minhash_estimate",
    "s03_lsh_ann_topk",
    "s04_ivf_ann_topk",
    "s06_hard_negatives",
    "s07_ann_recall",
    "s08_ivfpq_topk",
    "s10_ivfsq_topk",
    "s11_rrf_fusion",
    "t06_doc_fingerprints",
    "t07_exact_dedup_summary",
    "t08_vocabulary",
    "t09_tfidf_top_terms",
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
