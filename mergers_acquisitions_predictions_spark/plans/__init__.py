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
#: Round-3 rotation: the 14 queries that had NO driver row in either
#: round 1 or 2 (d13, d15, j04, m05, m08, q46, s05, s06, t14,
#: t22–t25, t29) move IN, plus every query built new THIS round (j05
#: hour-bucket range join, d16 span coverage, d17 star components,
#: d18 span trim, q47 profile, s07 ANN recall, s08/s09 IVF-PQ, t30 Gopher rules, t31
#: importance sampling, t32 vocab coverage, t33
#: token entropy, q48 cont-quantiles, q49 relative ranks), so every
#: registry
#: entry has a driver row in r01∪r02∪r03. Twenty r1/r2-green queries
#: rotate OUT (d01–d04, d06, d10, s01, q17, q38, t03–t13, t15,
#: t16, t17, t27, j02, j03, m04, u04); they stay value-guarded by
#: tests/test_oracle_parity.py, which sweeps EVERY oracle regardless
#: of position.
#: Later round-3 sessions build MORE queries (s10 IVF-SQ8, t34 CCNet
#: buckets, s11 RRF hybrid fusion, q50 key-skew profile, s12 MMR
#: rerank, t35 source-overlap matrix, d19 MinHash calibration); each
#: debuts in the window by rotating out an r1/r2-green entry (d05,
#: s02, s04, m06, t18, t20, t19), keeping the r01∪r02∪r03 invariant.
DRIVER_WINDOW = [
    # dedup family
    "d07_lsh_embedding_neardups",
    "d08_prefix_jaccard_pairs",
    "d09_dup_clusters",
    "d11_semantic_dedup",
    "d12_incremental_neardup",
    "d13_simhash_neardups",
    "d14_cluster_canonicals",
    "d15_winnow_containment",
    "d16_dup_span_coverage",
    "d17_components_star",
    "d18_span_trim",
    "d19_minhash_estimate",
    # similarity / ANN family
    "s03_lsh_ann_topk",
    "s05_ivf_kmeans_topk",
    "s06_hard_negatives",
    "s07_ann_recall",
    "s08_ivfpq_topk",
    "s09_ivfpq_kmeans_topk",
    "s10_ivfsq_topk",
    "s11_rrf_fusion",
    "s12_mmr_rerank",
    # ML family
    "m01_tfidf_features",
    "m02_lr_confusion",
    "m03_lda_topics",
    "m05_kmeans_clusters",
    "m07_stratified_sample",
    "m08_pca_whiten",
    # text / curation family
    "t14_token_chunks",
    "t21_source_mixture",
    "t22_funnel_accounting",
    "t23_interleaved_order",
    "t24_shingle_diversity",
    "t25_bpe_merges",
    "t26_bpe_encode",
    "t28_unigram_logprob_quality",
    "t29_bigram_backoff_quality",
    "t30_gopher_rules",
    "t31_importance_sample",
    "t32_vocab_coverage",
    "t33_token_entropy",
    "t34_ccnet_buckets",
    "t35_source_overlap_matrix",
    # joins / ER, UDF surface, relational newcomers
    "j04_fuzzy_multipass",
    "j05_event_window_range_join",
    "u05_frame_sample_stats",
    "q46_unpivot_measures",
    "q47_table_profile",
    "q48_percentile_cont",
    "q49_relative_rank",
    "q50_join_key_skew",
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
