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
#: Round 5: (a) new = s14 (index append), s15 (stream-serve
#: replay), s16 (append-vs-rebuild drift);
#: (b) changed since last row = d03 (adaptive capped plan), d07/s03/
#: s12 (k_max 8→12, regenerated oracle constants), s04/s05 (ivf_topk
#: memoization restructure), s08/s10 (coded-corpus memoization in
#: pq/sq), s06/s07/s11 (compose the changed s03/s04 paths), s13
#: (applicationId-keyed path + primed meta), m02/m05
#: (materialized-output oracles — rows-only → value-checked), s05/
#: s09/m08 (centroid/codebook/weights artifact oracles — rows-only
#: → value-checked), d02/d06/d09/d14/d17/d19 (shared memoized banded
#: frame);
#: (c) fill = the seven r1-era stragglers queued by the r4 note
#: (q44, q45, t01, t02, u01–u03), then r2-era rows oldest-first by
#: name. Sixteen r2 rows did not fit (t06–t13, t15–t20, t27, u04) —
#: first in line for round 6, along with the r3-era family.
DRIVER_WINDOW = [
    # (a): registered this round
    "s14_index_append_topk",
    "s15_stream_serve_replay",
    "s16_index_append_drift",
    # (b): implementation or oracle changed since their last row
    "d03_jaccard_pairs",
    "d07_lsh_embedding_neardups",
    "d09_dup_clusters",
    "d14_cluster_canonicals",
    "d17_components_star",
    "d19_minhash_estimate",
    "s03_lsh_ann_topk",
    "s04_ivf_ann_topk",
    "s05_ivf_kmeans_topk",
    "s06_hard_negatives",
    "s07_ann_recall",
    "s08_ivfpq_topk",
    "s09_ivfpq_kmeans_topk",
    "s10_ivfsq_topk",
    "s11_rrf_fusion",
    "s12_mmr_rerank",
    "s13_persisted_index_topk",
    "m02_lr_confusion",
    "m05_kmeans_clusters",
    "m08_pca_whiten",
    "t28_unigram_logprob_quality",
    "t32_vocab_coverage",
    "t34_ccnet_buckets",
    # (c): stalest driver rows — the seven r1-era stragglers first
    "q44_null_ordering",
    "q45_except_all_multiplicity",
    "t01_token_stats",
    "t02_clean_text",
    "u01_pandas_udf_charge",
    "u02_grouped_minmax_scale",
    "u03_multimodal_features",
    # (c) cont.: r2-era rows, oldest-first by name
    "d01_minhash_signatures",
    "d02_minhash_lsh_pairs",
    "d04_simhash",
    "d05_embedding_neardups",
    "d06_lsh_verified_neardups",
    "d10_contamination",
    "j02_deal_name_linkage",
    "j03_fuzzy_name_match",
    "m04_pair_ranking",
    "m06_split_assignment",
    "q17_tumbling_windows",
    "q38_deterministic_sample",
    "s01_embedding_norms",
    "s02_cosine_topk",
    "t03_ngram_stats",
    "t04_stopword_filter",
    "t05_lang_source_stats",
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
