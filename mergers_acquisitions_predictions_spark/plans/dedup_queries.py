"""Deduplication queries over `documents` (north-star ops; operators
in `operators/dedup.py`). All hashes are md5-derived so the DuckDB
oracle recomputes signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..operators.dedup import (
    dup_clusters,
    jaccard_pairs,
    lsh_candidate_pairs,
    prefix_jaccard_pairs,
    simhash,
    with_minhash_signatures,
)
from ..operators.similarity import lsh_neardup_pairs
from ..sources.readers import load_table
from .lsh_oracle import SQL_DOT, SQL_SQNORM, auto_buckets_cte_sql, buckets_cte_sql
from .registry import query

#: DuckDB spelling of `shingles(tokenize(text), 3)` — distinct word
#: trigrams; keep in sync with functions/text.py.
SQL_SHINGLES = """
    list_distinct(list_transform(range(1, len(tok) - 1),
                  i -> array_to_string(list_slice(tok, i, i + 2), ' ')))
"""
_TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# sig_i = min over shingles of the i-th 8-hex-char slice of
# md5((i//4):shingle) — keep in sync with operators/dedup.py.
_SIG_SQL = ",\n".join(
    f"           list_min(list_transform(s, x ->"
    f" substr(md5('{i // 4}:' || x), {1 + 8 * (i % 4)}, 8))) AS sig{i}"
    for i in range(8)
)

_SIGS_CTE = f"""
    WITH sh AS (
        SELECT doc_id, {SQL_SHINGLES} AS s
        FROM (SELECT doc_id, {_TOK} AS tok FROM documents)
    ),
    sigs AS (
        SELECT doc_id,
{_SIG_SQL}
        FROM sh
    )
"""


@query(
    "d01_minhash_signatures",
    oracle=_SIGS_CTE + "SELECT * FROM sigs",
)
def d01_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-hash MinHash signatures per document — computed entirely
    map-side (`array_min` over per-shingle md5s): the signature stage
    of near-dup dedup costs ZERO shuffles at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return with_minhash_signatures(d, "text", "doc_id", n_hashes=8, shingle_n=3)


@query(
    "d02_minhash_lsh_pairs",
    oracle=_SIGS_CTE
    + """
    , bands AS (
        SELECT doc_id, 0 AS band, sig0 || '|' || sig1 AS band_key FROM sigs
        UNION ALL SELECT doc_id, 1, sig2 || '|' || sig3 FROM sigs
        UNION ALL SELECT doc_id, 2, sig4 || '|' || sig5 FROM sigs
        UNION ALL SELECT doc_id, 3, sig6 || '|' || sig7 FROM sigs
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
    WHERE a.band_key IS NOT NULL AND a.band_key <> '|'
    """,
)
def d02_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: 4 bands × 2 rows. Documents
    meet only when a whole band matches → the O(n²) pair space becomes
    an equi-join on (band, band_key). This is THE scalable near-dup
    plan for 100 TB corpora."""
    d = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(
        d,
        "text",
        "doc_id",
        n_bands=4,
        rows_per_band=2,
        corpus_cache_key=(sf_dir, "documents"),
    )


@query(
    "d03_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {SQL_SHINGLES} AS s
        FROM (SELECT doc_id, {_TOK} AS tok FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    hot AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > 32),
    pruned AS (SELECT * FROM ex ANTI JOIN hot USING (shingle)),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM pruned a JOIN pruned b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, len(s) AS n FROM sh),
    common AS (
        SELECT c.a_id, c.b_id, count(*) AS n_common
        FROM cand c
        JOIN ex ea ON ea.doc_id = c.a_id
        JOIN ex eb ON eb.doc_id = c.b_id AND eb.shingle = ea.shingle
        GROUP BY c.a_id, c.b_id
    )
    SELECT a_id, b_id,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.1
    """,
)
def d03_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard pairs ≥ 0.1 via the inverted-index join —
    only documents sharing a shingle ever meet in the shuffle. Since
    round 4 the REGISTERED config caps postings at ``max_df=32`` (the
    d15 stop-gram recipe, mirrored into the oracle): shingles in more
    than 32 documents are dropped from CANDIDATE GENERATION — the
    Σdf² pair-explosion that is the one quadratic exposure of the
    postings plan — while surviving pairs keep their EXACT Jaccard:
    common counts come from the map-side combo explosion of the
    ≤32-doc inverted lists, plus (only when hot shingles exist) a
    per-candidate join against the hot postings that recovers the
    stop-gram contribution — the plan is ADAPTIVE on the hot count
    (see `jaccard_pairs`). At every driver SF the corpus's max
    shingle df is ≤25, so the cap changes no result here and the
    fast no-hot branch runs; at 100× it is the difference between a
    bounded postings join and a hot-key blowup. `d08_prefix_jaccard_pairs`
    remains the exact-AND-sub-quadratic sibling; the uncapped
    exhaustive form stays available as `jaccard_pairs(max_df=None)`."""
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.1, max_df=32)


@query(
    "d04_simhash",
    oracle=f"""
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 60), b ->
               CASE WHEN list_sum(list_transform(tok, t ->
                         CASE WHEN (('0x' || substr(md5(t), 1, 15))::BIGINT
                                    & (1::BIGINT << b)) != 0
                              THEN 1 ELSE -1 END)) > 0
                    THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash64
    FROM (SELECT doc_id, {_TOK} AS tok FROM documents)
    """,
)
def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (near-dup sketch; Hamming-close
    hashes ⇒ similar token multisets). Map-side expression; the
    dedup join on the sketch is a cheap equi/band join downstream."""
    from ..operators.util import repartition_for_compute

    d = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.coalesce(simhash(tokenize("text")), F.lit(0).cast("long")).alias("simhash64"),
    )


@query(
    "d06_lsh_verified_neardups",
    oracle=_SIGS_CTE
    + """
    , bands AS (
        SELECT doc_id, 0 AS band, sig0 || '|' || sig1 AS band_key FROM sigs
        UNION ALL SELECT doc_id, 1, sig2 || '|' || sig3 FROM sigs
        UNION ALL SELECT doc_id, 2, sig4 || '|' || sig5 FROM sigs
        UNION ALL SELECT doc_id, 3, sig6 || '|' || sig7 FROM sigs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
        WHERE a.band_key IS NOT NULL
    ),
    sz AS (SELECT doc_id, len(s) AS n FROM sh),
    common AS (
        SELECT c.a_id, c.b_id, count(*) AS n_common
        FROM cand c
        JOIN (SELECT doc_id, unnest(s) AS shingle FROM sh) ea ON ea.doc_id = c.a_id
        JOIN (SELECT doc_id, unnest(s) AS shingle FROM sh) eb
          ON eb.doc_id = c.b_id AND eb.shingle = ea.shingle
        GROUP BY c.a_id, c.b_id
    )
    SELECT a_id, b_id,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.1
    """,
)
def d06_lsh_verified_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE scale path for near-dup dedup: MinHash-LSH candidate
    generation (d02) followed by exact-Jaccard verification of ONLY
    the candidates. Sub-quadratic end to end — the exact d03 plan
    touches every shingle-sharing pair; this touches only band
    collisions (recall is the LSH S-curve, ~1−(1−j²)⁴ here).

    Oracle-checkable BECAUSE the hash family is md5-portable: DuckDB
    regenerates the identical candidate set, so this is a full
    value-parity query, not a rows-only check. The verify stage is the
    map-side `size(array_intersect)` formulation (jaccard_verify_pairs)
    — no per-pair aggregation shuffle; the oracle's explode/groupBy SQL
    computes the same set-intersection count."""
    from ..functions.text import shingles
    from ..operators.dedup import jaccard_verify_pairs, lsh_candidate_pairs
    from ..operators.util import own_caches, repartition_for_compute

    d = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(
        d,
        "text",
        "doc_id",
        n_bands=4,
        rows_per_band=2,
        corpus_cache_key=(sf_dir, "documents"),
    )
    sh = (
        repartition_for_compute(d)
        .select("doc_id", tokenize(F.col("text")).alias("__tok"))
        .select(F.col("doc_id").alias("doc"), shingles(F.col("__tok"), 3).alias("sh"))
        .persist()  # both verify sides read it — shingle once, not twice
    )
    out = jaccard_verify_pairs(cand, sh, threshold=0.1)
    # `cand` carries the banded cache from lsh_candidate_pairs;
    # ownership (and sh's cache) transfers to the final plan.
    return own_caches(out, cand, sh)


@query(
    "d08_prefix_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {SQL_SHINGLES} AS s
        FROM (SELECT doc_id, {_TOK} AS tok FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    sz AS (SELECT doc_id, len(s) AS n FROM sh),
    common AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.7
    """,
)
def d08_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard ≥ 0.7 with sub-quadratic candidate generation via
    prefix filtering (AllPairs/PPJoin): only each document's rarest
    |A|−⌈0.7|A|⌉+1 shingles are indexed, structurally excluding the
    hot-shingle quadratic blowup that makes d03 `weak` at 100×, while
    provably losing no qualifying pair. The ORACLE is the plain
    all-pairs Jaccard — exactness of the pruned plan is the checked
    property, not an approximation bound."""
    d = load_table(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.7)


#: CTE chain ending in ``clusters(doc_id, cluster_id)``: the d02 LSH
#: pair graph closed transitively (recursive CTE), min-doc_id labels,
#: singletons labeled by themselves. Shared by the d09/d14 oracles —
#: the DuckDB replay of ``operators/dedup.dup_clusters``.
_CLUSTER_CTES = (
    _SIGS_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , bands AS (
        SELECT doc_id, 0 AS band, sig0 || '|' || sig1 AS band_key FROM sigs
        UNION ALL SELECT doc_id, 1, sig2 || '|' || sig3 FROM sigs
        UNION ALL SELECT doc_id, 2, sig4 || '|' || sig5 FROM sigs
        UNION ALL SELECT doc_id, 3, sig6 || '|' || sig7 FROM sigs
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
        WHERE a.band_key IS NOT NULL AND a.band_key <> '|'
    ),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION ALL SELECT b_id, a_id FROM pairs
    ),
    reach AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    clusters AS (
        SELECT d.doc_id,
               least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
        FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
        GROUP BY d.doc_id
    )
"""
)


@query(
    "d09_dup_clusters",
    oracle=_CLUSTER_CTES + "SELECT doc_id, cluster_id FROM clusters",
)
def d09_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    pair graph (d02), each component labeled by its min doc_id —
    iterative min-label propagation, O(diameter) rounds of equi-joins
    (operators/dedup.py:dup_clusters). The oracle replays the same
    components via a recursive transitive-closure CTE. Downstream
    "keep one per cluster" is `WHERE doc_id = cluster_id`."""
    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        d,
        "text",
        "doc_id",
        n_bands=4,
        rows_per_band=2,
        corpus_cache_key=(sf_dir, "documents"),
    )
    return dup_clusters(d, pairs, "doc_id")


_SQL_SQNORM = SQL_SQNORM


@query(
    "d05_embedding_neardups",
    oracle=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(
             list_sum(list_transform(range(1, len(a.embedding) + 1),
                      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt({_SQL_SQNORM.format(v='a.embedding')})
                * sqrt({_SQL_SQNORM.format(v='b.embedding')})), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(
             list_sum(list_transform(range(1, len(a.embedding) + 1),
                      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt({_SQL_SQNORM.format(v='a.embedding')})
                * sqrt({_SQL_SQNORM.format(v='b.embedding')})), 6) >= 0.4
    """,
)
def d05_embedding_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.4), exact. The
    theta self-join (`vec_id <` residual) streams one side against the
    other; the per-pair dot product runs in the Arrow-vectorized
    verify stage (operators/similarity.arrow_pair_cosines), whose
    accumulation is order-preserving and therefore bit-identical to
    the JVM fold AND to the SQL oracle's list_sum — rounding and the
    threshold filter stay JVM-side for HALF_UP/NaN parity.

    Scale: exact all-pairs is O(n²) by definition — usable to ~10⁵
    vectors per partition-group; beyond that d07 (sign-LSH prefilter +
    exact verify of collisions only) is the registered scale path.
    No broadcast hint: the join side is the FULL table, so the size
    decision belongs to AQE (a forced broadcast OOMs executors at
    10⁷+ vectors); at this query's documented small-n envelope AQE
    broadcasts it anyway.

    Per-pair work is ONE dot product: the norms are precomputed per
    ROW (map-side) instead of per PAIR (the naive cosine() would fold
    3× per pair — measured 150 s → 8.5 s at sf0.1)."""
    from ..operators.similarity import exact_cosine_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return exact_cosine_pairs(e, threshold=0.4)


@query(
    "d07_lsh_embedding_neardups",
    oracle=f"""
    WITH {auto_buckets_cte_sql(dim=64, k_max=12, n_tables=8)},
    cand AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM buckets a
        JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
                      AND a.vec_id < b.vec_id
    ),
    v AS (SELECT vec_id, embedding,
                 sqrt({SQL_SQNORM.format(v='embedding')}) AS nrm
          FROM embeddings)
    SELECT a_id, b_id, cos_sim FROM (
        SELECT c.a_id, c.b_id,
               round({SQL_DOT.format(a='va.embedding', b='vb.embedding')}
                     / (va.nrm * vb.nrm), 6) AS cos_sim
        FROM cand c
        JOIN v va ON va.vec_id = c.a_id
        JOIN v vb ON vb.vec_id = c.b_id
    )
    WHERE cos_sim >= 0.4
    """,
)
def d07_lsh_embedding_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE scale path for embedding near-dup (the LSH counterpart of
    d06 for vectors): multi-table sign-LSH candidate generation —
    a narrow (id, table, bucket) self-equi-join, never all-pairs —
    then exact cosine verification of only the collisions. Replaces
    d05's O(n²) plan beyond ~10⁵ vectors.

    The plane count is SIZE-AWARE: k = auto_planes(count) keeps
    expected bucket occupancy (and hence the candidate-pair space)
    ~n·target instead of n²/2^k — a fixed k is the config that
    thrashes at 100× (SCALE.md §7b/§7c). Fully value-checkable
    DESPITE being approximate AND auto-sized: plane chunks are
    prefix-stable (`lsh_tables(k_max=12)`) and the oracle recomputes
    the same k from count(*) (plans/lsh_oracle.auto_buckets_cte_sql),
    so DuckDB reproduces the identical candidate set at every SF."""
    from ..operators.similarity import auto_planes
    from ..operators.util import memoized_literal

    e = load_table(spark, sf_dir, "embeddings")
    k = auto_planes(
        memoized_literal(
            ("count", (sf_dir, "embeddings"), "vec_id"), lambda: e.count()
        )
    )
    return lsh_neardup_pairs(
        e,
        threshold=0.4,
        dim=64,
        n_planes=k,
        n_tables=8,
        k_max=12,
        corpus_cache_key=(sf_dir, "embeddings"),
    )


@query(
    "d10_contamination",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source, {SQL_SHINGLES} AS s
        FROM (SELECT doc_id, source, {_TOK} AS tok FROM documents)
    ),
    ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE source = 'src0'),
    tr AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE source <> 'src0'),
    sz AS (SELECT doc_id, len(s) AS n FROM sh WHERE source <> 'src0'),
    hits AS (
        SELECT doc_id, count(*) AS n_shared
        FROM tr JOIN ev USING (shingle)
        GROUP BY doc_id
    )
    SELECT h.doc_id,
           CAST(h.n_shared AS BIGINT) AS n_shared,
           round(h.n_shared / sz.n, 6) AS contamination
    FROM hits h JOIN sz ON sz.doc_id = h.doc_id
    """,
)
def d10_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION: flag training documents that share
    any word-trigram shingle with a held-out evaluation set (here the
    ``source = 'src0'`` slice stands in for the benchmark corpus).
    The op every training-data pipeline runs before a model sees the
    corpus — eval n-grams leaking into training data corrupt the
    benchmark.

    Scale shape (operators/curation.contamination): the eval side is
    SMALL by construction (benchmarks are thousands of documents, the
    corpus is billions), so its distinct-shingle set is broadcast and
    the train side is pruned in ONE map-side semi-join pass over the
    scan — no shuffle touches the full corpus' postings. The per-doc
    overlap count then aggregates only the surviving rows."""
    from ..operators.curation import contamination

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("source") == "src0"
    return contamination(d.filter(~is_eval), d.filter(is_eval))


from .lsh_oracle import ivf_assign_sql, ivf_cent_cte_sql  # noqa: E402


@query(
    "d11_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE cent AS ({ivf_cent_cte_sql(8)}
    ),
    assign AS ({ivf_assign_sql("", "vec_id", 1)}
    ),
    pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM assign a JOIN assign b
          ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
        WHERE round({SQL_DOT.format(a='a.vec', b='b.vec')}
                    / (a.nrm * b.nrm), 6) >= 0.4
    ),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION ALL SELECT b_id, a_id FROM pairs
    ),
    reach AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    clusters AS (
        SELECT e.vec_id,
               least(e.vec_id, coalesce(min(r.v), e.vec_id)) AS cluster_id
        FROM embeddings e LEFT JOIN reach r ON r.u = e.vec_id
        GROUP BY e.vec_id
    )
    SELECT c.vec_id, a.cell_id, c.cluster_id,
           c.vec_id = c.cluster_id AS keep
    FROM clusters c JOIN assign a ON a.vec_id = c.vec_id
    """,
)
def d11_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup in the SemDeDup shape (operators/similarity.
    semantic_dedup): embeddings → 8 IVF cells → WITHIN-cell cosine
    pairs ≥ 0.4 → connected components → keep the min-id member of
    each component. The clustering bounds the quadratic pair space to
    Σ|cell|² — the structure that makes embedding dedup feasible at
    10⁹ vectors where all-pairs (d05) is impossible. Deterministic
    centroids make the approximate result fully value-checkable: the
    oracle replays cells, pairs, and the transitive closure."""
    from ..operators.similarity import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(e, threshold=0.4, n_cells=8)


@query(
    "d12_incremental_neardup",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source, {SQL_SHINGLES} AS s
        FROM (SELECT doc_id, source, {_TOK} AS tok FROM documents)
    ),
    sigs AS (
        SELECT doc_id, source,
{_SIG_SQL}
        FROM sh
    ),
    bands AS (
        SELECT doc_id, source, 0 AS band, sig0 || '|' || sig1 AS band_key FROM sigs
        UNION ALL SELECT doc_id, source, 1, sig2 || '|' || sig3 FROM sigs
        UNION ALL SELECT doc_id, source, 2, sig4 || '|' || sig5 FROM sigs
        UNION ALL SELECT doc_id, source, 3, sig6 || '|' || sig7 FROM sigs
    )
    SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS index_id
    FROM bands n
    JOIN bands i ON n.band = i.band AND n.band_key = i.band_key
    WHERE n.source IN ('src18', 'src19')
      AND i.source NOT IN ('src18', 'src19')
      AND n.band_key IS NOT NULL AND n.band_key <> '|'
    """,
)
def d12_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup — the nightly-ingest shape every
    production corpus runs: an incoming shard (here sources src18/19
    stand in for today's crawl) is checked against the EXISTING corpus
    index without ever self-joining the full corpus
    (operators/dedup.py:incremental_neardup_candidates). Band the
    shard, equi-join against the index's banded frame on (band,
    band_key) — incremental cost is |shard| banding + a shard-sized
    join; in production the index's banded frame is a maintained
    table, so only the shard is ever re-hashed."""
    from ..operators.dedup import incremental_neardup_candidates

    d = load_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin("src18", "src19")
    return incremental_neardup_candidates(d.filter(is_new), d.filter(~is_new))


@query(
    "d14_cluster_canonicals",
    oracle=_CLUSTER_CTES
    + f"""
    , scored AS (
        SELECT doc_id,
               CASE WHEN len(tok) = 0 THEN 0.0
                    ELSE round(
                        least(len(tok) / 100.0, 1.0)
                        * greatest(0.0, 1.0 - abs(
                            list_sum(list_transform(tok,
                                     t -> CAST(length(t) AS DOUBLE)))
                            / len(tok) - 5.0) / 10.0), 6)
               END AS quality
        FROM (SELECT doc_id, {_TOK} AS tok FROM documents)
    ),
    ranked AS (
        SELECT c.cluster_id, c.doc_id, s.quality,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY s.quality DESC, c.doc_id) AS rn,
               count(*) OVER (PARTITION BY c.cluster_id) AS n_members
        FROM clusters c JOIN scored s USING (doc_id)
    )
    SELECT cluster_id, doc_id AS canonical_id, quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def d14_cluster_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keep-policy over the d09 near-dup clusters: one
    row per cluster keeping the HIGHEST-quality member (t11's scoring
    formula; min doc_id on ties) with the member count — dedup that
    discards the worst copies instead of whichever sorted last, the
    finisher a curation pipeline actually deploys. Composition of
    dup_clusters (component labels) + quality_score (map-side) +
    curation.select_canonicals (one id join, one cluster-keyed
    window exchange). Quality is ROUNDED before ranking so the keep
    decision is engine-portable (round-before-rank, NOTES.md)."""
    from ..functions.textstats import quality_score
    from ..operators.curation import select_canonicals

    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        d,
        "text",
        "doc_id",
        n_bands=4,
        rows_per_band=2,
        corpus_cache_key=(sf_dir, "documents"),
    )
    clusters = dup_clusters(d, pairs, "doc_id")
    tok = d.select("doc_id", tokenize("text").alias("tok"))
    scored = tok.select(
        "doc_id",
        F.when(F.size("tok") == 0, F.lit(0.0))
        .otherwise(F.round(quality_score(F.col("tok")), 6))
        .alias("quality"),
    )
    return select_canonicals(clusters, scored)


@query(
    "d16_dup_span_coverage",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    win AS (
        SELECT doc_id, CAST(u.pos AS INTEGER) AS pos,
               array_to_string(
                   list_slice(tok, CAST(u.pos AS INTEGER),
                              CAST(u.pos AS INTEGER) + 4), ' ') AS gram
        FROM tok, unnest(CASE WHEN len(tok) >= 5
                              THEN range(1, len(tok) - 5 + 2)
                              ELSE [] END) AS u(pos)
    ),
    dup AS (SELECT gram FROM win GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    mk AS (SELECT doc_id, pos FROM win JOIN dup USING (gram)),
    cv AS (
        SELECT doc_id, pos,
               pos + 5 - greatest(pos, coalesce(max(pos + 5) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS c
        FROM mk
    ),
    cov AS (SELECT doc_id, count(*) AS dup_windows, sum(c) AS dup_tokens
            FROM cv GROUP BY doc_id),
    sz AS (SELECT doc_id, len(tok) AS n_tokens FROM tok)
    SELECT s.doc_id,
           CAST(s.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(c.dup_windows, 0) AS BIGINT) AS dup_windows,
           CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(coalesce(c.dup_tokens, 0) / greatest(s.n_tokens, 1), 6) AS dup_fraction
    FROM sz s LEFT JOIN cov c USING (doc_id)
    """,
)
def d16_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication coverage per document (Lee et al.
    2022, token-window granularity): for every document, how many of
    its token positions sit inside a 5-token run that appears verbatim
    in at least one OTHER document — the statistic a curation pipeline
    thresholds to drop or trim boilerplate-heavy documents. Distinct
    from the sketch family: winnowing (d15) SAMPLES fingerprints to
    rank containing PAIRS; this measures exact coverage per document
    and never materializes a pair.

    Plan (operators/dedup.dup_span_coverage): map-side window hashing
    (only a 32-char md5 + int position ride the shuffles), one
    hash-keyed countDistinct to find cross-doc windows, a join back
    that touches only the duplicated subset, and a PER-DOCUMENT
    interval-union sweep (cummax window partitioned by doc id — never
    a global sort)."""
    from ..operators.dedup import dup_span_coverage

    d = load_table(spark, sf_dir, "documents")
    return dup_span_coverage(d, window=5)


@query(
    "d17_components_star",
    oracle=_CLUSTER_CTES + "SELECT doc_id, cluster_id FROM clusters",
)
def d17_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the SAME MinHash-LSH pair graph as
    d09, via alternating large-star/small-star rounds (Kiveris et al.
    2014) instead of min-label propagation — the adversarial-depth
    scale path: O(log² n) rounds regardless of component DIAMETER,
    where propagation pays O(diameter) (a crawl-graph chain of 10⁶
    nodes is 10⁶ propagation rounds but ~10 star rounds; the split is
    demonstrated on a 512-chain in tests/test_operators.py). Labels
    are identical by construction — component min id — so this query
    shares d09's transitive-closure oracle verbatim, and the suite
    additionally equivalence-tests the two operators on seeded random
    graphs (operators/dedup.connected_components_star)."""
    from ..operators.dedup import connected_components_star

    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        d,
        "text",
        "doc_id",
        n_bands=4,
        rows_per_band=2,
        corpus_cache_key=(sf_dir, "documents"),
    )
    return connected_components_star(d, pairs, "doc_id")


@query(
    "d18_span_trim",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    win AS (
        SELECT doc_id, CAST(u.pos AS INTEGER) AS pos,
               array_to_string(
                   list_slice(tok, CAST(u.pos AS INTEGER),
                              CAST(u.pos AS INTEGER) + 4), ' ') AS gram
        FROM tok, unnest(CASE WHEN len(tok) >= 5
                              THEN range(1, len(tok) - 5 + 2)
                              ELSE [] END) AS u(pos)
    ),
    dup AS (SELECT gram FROM win GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    keeper AS (
        SELECT gram, min(doc_id) AS k_doc FROM win JOIN dup USING (gram) GROUP BY gram
    ),
    k_pos AS (
        SELECT w.gram, w.doc_id AS k_doc, min(w.pos) AS k_pos
        FROM win w JOIN keeper k ON w.gram = k.gram AND w.doc_id = k.k_doc
        GROUP BY w.gram, w.doc_id
    ),
    drops AS (
        SELECT DISTINCT w.doc_id, CAST(u.p AS INTEGER) AS pos
        FROM win w
        JOIN keeper k ON w.gram = k.gram
        JOIN k_pos kp ON w.gram = kp.gram
        CROSS JOIN unnest(range(w.pos, w.pos + 5)) AS u(p)
        WHERE NOT (w.doc_id = kp.k_doc AND w.pos = kp.k_pos)
    ),
    toks AS (
        SELECT doc_id, CAST(u.p AS INTEGER) AS pos, tok[CAST(u.p AS INTEGER)] AS t
        FROM tok, unnest(CASE WHEN len(tok) >= 1
                              THEN range(1, len(tok) + 1) ELSE [] END) AS u(p)
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.t
        FROM toks t ANTI JOIN drops d ON t.doc_id = d.doc_id AND t.pos = d.pos
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(t, ' ' ORDER BY pos)) AS clean_fp
        FROM kept GROUP BY doc_id
    ),
    sz AS (SELECT doc_id, len(tok) AS n_tokens FROM tok)
    SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(s.n_tokens - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped,
           coalesce(a.clean_fp, md5('')) AS clean_fp
    FROM sz s LEFT JOIN agg a USING (doc_id)
    """,
)
def d18_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Destructive exact-substring dedup (Lee et al. 2022): REMOVE
    every cross-document duplicated 5-token span except its
    globally-first occurrence (min (doc, pos) — deterministic) and
    reassemble each document from the surviving tokens. d16 measures
    the duplication; this query performs the edit — the output md5s
    the trimmed token stream, so the EDITED TEXT itself is
    value-checked cross-engine, not just its size.

    Plan (operators/dedup.trim_dup_spans): map-side window hashing;
    ONE `min(struct(doc, pos))` aggregate per duplicated hash picks
    keepers (lexicographic struct min — no second pass); the
    drop-position explode and (doc, pos)-keyed token anti-join touch
    only duplicated spans; reassembly is a per-document
    sort_array(collect_list) bounded by doc length."""
    from ..operators.dedup import trim_dup_spans

    d = load_table(spark, sf_dir, "documents")
    return trim_dup_spans(d, window=5)


@query(
    "d19_minhash_estimate",
    oracle=_SIGS_CTE
    + """
    , bands AS (
        SELECT doc_id, 0 AS band, sig0 || '|' || sig1 AS band_key FROM sigs
        UNION ALL SELECT doc_id, 1, sig2 || '|' || sig3 FROM sigs
        UNION ALL SELECT doc_id, 2, sig4 || '|' || sig5 FROM sigs
        UNION ALL SELECT doc_id, 3, sig6 || '|' || sig7 FROM sigs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
        WHERE a.band_key IS NOT NULL
    ),
    sz AS (SELECT doc_id, len(s) AS n FROM sh),
    common AS (
        SELECT c.a_id, c.b_id, count(*) AS n_common
        FROM cand c
        JOIN (SELECT doc_id, unnest(s) AS shingle FROM sh) ea ON ea.doc_id = c.a_id
        JOIN (SELECT doc_id, unnest(s) AS shingle FROM sh) eb
          ON eb.doc_id = c.b_id AND eb.shingle = ea.shingle
        GROUP BY c.a_id, c.b_id
    ),
    est AS (
        SELECT c.a_id, c.b_id,
               (CASE WHEN sa.sig0 = sb.sig0 THEN 1 ELSE 0 END
              + CASE WHEN sa.sig1 = sb.sig1 THEN 1 ELSE 0 END
              + CASE WHEN sa.sig2 = sb.sig2 THEN 1 ELSE 0 END
              + CASE WHEN sa.sig3 = sb.sig3 THEN 1 ELSE 0 END
              + CASE WHEN sa.sig4 = sb.sig4 THEN 1 ELSE 0 END
              + CASE WHEN sa.sig5 = sb.sig5 THEN 1 ELSE 0 END
              + CASE WHEN sa.sig6 = sb.sig6 THEN 1 ELSE 0 END
              + CASE WHEN sa.sig7 = sb.sig7 THEN 1 ELSE 0 END) AS n_match
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.a_id
        JOIN sigs sb ON sb.doc_id = c.b_id
    )
    SELECT e.a_id, e.b_id,
           CAST(floor(e.n_match / 8.0 * 1e6 + 0.5) AS BIGINT) AS est_ppm,
           CAST(floor(round(coalesce(co.n_common, 0)
                            / (sa.n + sb.n - coalesce(co.n_common, 0)), 6)
                      * 1e6 + 0.5)
                AS BIGINT) AS exact_ppm,
           CAST(abs(CAST(floor(e.n_match / 8.0 * 1e6 + 0.5) AS BIGINT)
                    - CAST(floor(round(coalesce(co.n_common, 0)
                                       / (sa.n + sb.n - coalesce(co.n_common, 0)),
                                       6)
                                 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS err_ppm
    FROM est e
    LEFT JOIN common co ON co.a_id = e.a_id AND co.b_id = e.b_id
    JOIN sz sa ON sa.doc_id = e.a_id
    JOIN sz sb ON sb.doc_id = e.b_id
    """,
)
def d19_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch CALIBRATION for the MinHash index — s07's role, played
    for the dedup side: per LSH candidate pair, the signature-based
    Jaccard estimate (matching hash fraction, the estimator whose
    s-curve every band_config threshold is derived from) next to the
    exact shingle Jaccard, with the absolute error. This is how a
    deployment answers "are 8 hashes enough at my threshold?" with a
    measurement instead of the textbook variance bound (j(1−j)/k):
    widen n_hashes until the observed error at the decision boundary
    is acceptable, then stop paying for more.

    Composition of tested machinery: d02's candidate generation,
    d06's map-side exact verify (threshold 0 — calibration wants the
    full candidate set, not just accepted pairs), plus one
    signatures join; everything rides equi-joins. Estimates and
    exacts become integer ppm before the hash (floor(x*1e6+0.5),
    NOTES.md)."""
    from ..functions.text import shingles
    from ..operators.dedup import (
        jaccard_verify_pairs,
        lsh_candidate_pairs,
        with_minhash_signatures,
    )
    from ..operators.util import own_caches, repartition_for_compute

    d = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(
        d,
        "text",
        "doc_id",
        n_bands=4,
        rows_per_band=2,
        corpus_cache_key=(sf_dir, "documents"),
    )
    sh = (
        repartition_for_compute(d)
        .select("doc_id", tokenize(F.col("text")).alias("__tok"))
        .select(F.col("doc_id").alias("doc"), shingles(F.col("__tok"), 3).alias("sh"))
        .persist()
    )
    exact = jaccard_verify_pairs(cand, sh, threshold=0.0)
    sigs = with_minhash_signatures(d, "text", "doc_id", n_hashes=8, shingle_n=3)
    sa = sigs.select(
        F.col("doc_id").alias("a_id"), *[F.col(f"sig{i}").alias(f"__a{i}") for i in range(8)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("b_id"), *[F.col(f"sig{i}").alias(f"__b{i}") for i in range(8)]
    )
    n_match = None
    for i in range(8):
        term = F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
        n_match = term if n_match is None else n_match + term
    est_ppm = F.floor(n_match / F.lit(8.0) * F.lit(1e6) + F.lit(0.5)).cast("long")
    exact_ppm = F.floor(
        F.col("jaccard") * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    out = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", est_ppm.alias("est_ppm"))
        .join(exact, ["a_id", "b_id"])
        .select(
            "a_id",
            "b_id",
            "est_ppm",
            exact_ppm.alias("exact_ppm"),
            F.abs(F.col("est_ppm") - exact_ppm).cast("long").alias("err_ppm"),
        )
    )
    return own_caches(out, cand, sh)
