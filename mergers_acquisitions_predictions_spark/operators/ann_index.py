"""Persisted ANN index artifacts — the deployment shape the SCALE.md
§7i measurement argues for: build ONCE (assignment + quantization are
the n·cells cost), persist the coded corpus PARTITIONED BY CELL, and
serve every later query batch as a partition-pruned scan + equi-join.

Layout on disk (any Hadoop-compatible filesystem):

    <path>/meta/      one-row JSON: quantizer stats, centroid table,
                      config (the driver-sized artifacts the operators
                      otherwise collect per invocation)
    <path>/codes/     parquet, partitionBy(cell_id):
                      (candidate_id, sq: array<int>) — the build's
                      generation-0 codes directory
    <path>/codes_gN/  later generations, written by compaction
    <path>/CURRENT    one-line pointer file naming the LIVE codes
                      directory ("codes" or "codes_gN")

POINTER-FILE COMMIT (round 8, VERDICT r7 #4): readers resolve
``CURRENT`` and scan the directory it names; maintenance writes a
complete NEW directory first and swaps the pointer LAST (one
small-file atomic replace — `sources/fs.fs_replace_file`: rename(2)
on POSIX, atomic rename on HDFS, single-object copy on S3). A reader
therefore NEVER sees a missing or partial codes directory — the
previous design's move-aside/promote rename pair had a brief
no-codes-dir window and a restore path; both are retired. The
REPLACED generation is retained until the next compaction
(retention = 1, ≤2 generations on disk), so even a reader that
resolved the pointer just before a swap finishes its scan against
intact files; only a reader idling across TWO compactions can lose
its directory — the standard snapshot-expiry contract. An index
written by the pre-pointer layout (no ``CURRENT``) still serves:
resolution falls back to the newest promoted generation, then the
legacy ``codes/``.

Why partitionBy(cell_id) is the point at 100 TB: a query batch
probes n_probe cells each; the probe cell set is collected from the
(small, by the ANN contract) query side and pushed as an `isin`
PartitionFilter — so the scan reads ONLY the probed cells' files,
never the full index. That turns search cost from O(index) to
O(probed cells), which is the entire reason an IVF index exists.
The pruning is test-asserted from the physical plan
(tests/test_ann_index.py).

Search results are BIT-IDENTICAL to the in-memory
`sq.ivfsq_topk` path (asserted) — same stats, same codes, same fold
orders; only the storage changes.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_CURRENT = "CURRENT"
_GEN_PREFIX = "codes_g"


def _gen_dirs(spark: SparkSession, path: str) -> list[str]:
    """Promoted generation directory names under ``path``, sorted.
    Staging twins (``codes_gN.staging_<tok>``) never match: only an
    all-digit suffix is a promoted generation."""
    from ..sources.fs import fs_list_dirs

    return [
        d
        for d in fs_list_dirs(spark, path)
        if d.startswith(_GEN_PREFIX) and d[len(_GEN_PREFIX):].isdigit()
    ]


def _resolve_codes_name(spark: SparkSession, path: str) -> str:
    """Name of the LIVE codes directory under ``path``: the session-
    primed value if the index was built/appended/compacted this
    session (`util.peek_memoized_literal` — content-fingerprinted, so
    a foreign writer invalidates it), else the ``CURRENT`` pointer
    file, else — for robustness while a non-atomic pointer swap is in
    flight, and for pre-pointer-layout indexes — the newest promoted
    generation, else the legacy ``codes``. Every candidate this
    returns is a COMPLETE index directory by the commit protocol
    (generations are staged and renamed into place before the pointer
    moves; compaction is layout-only, so old-vs-new generation is a
    freshness difference, never a correctness one)."""
    from .util import peek_memoized_literal

    primed = peek_memoized_literal(("ivfsq_codes_dir", path))
    if primed is not None:
        return primed
    from ..sources.fs import fs_read_text

    cur = fs_read_text(spark, f"{path}/{_CURRENT}")
    if cur and cur.strip():
        name = cur.strip()
        # the pointer must name a SIBLING codes directory — a manifest
        # naming anything else (truncated write, foreign scribble, a
        # traversal like "../x") is corruption and must be LOUD, not a
        # scan of an attacker-chosen path
        import re

        if not re.fullmatch(r"codes(_g\d{6,})?", name):
            raise ValueError(
                f"corrupt index manifest {path}/{_CURRENT}: {name!r} is "
                "not a codes generation name — restore it to 'codes' or "
                "'codes_gNNNNNN', or rebuild the index"
            )
        return name
    gens = _gen_dirs(spark, path)
    if gens:
        return gens[-1]
    return "codes"


def _codes_path(spark: SparkSession, path: str) -> str:
    return f"{path}/{_resolve_codes_name(spark, path)}"


def build_ivfsq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_cache_key: tuple | None = None,
    centroids: DataFrame | None = None,
) -> None:
    """Build + persist an IVF-SQ8 index: learn per-dimension stats
    and centroids from the corpus (one pass + driver-sized collects),
    encode every vector (map-side), write codes partitioned by cell.
    Overwrites ``path``. This is the amortized-regime artifact —
    SCALE.md §7i measures the 5.7× scan win it buys at 4k queries.

    ``centroids``: optional caller-supplied centroid table
    (cell_id, cent_vec, cent_norm) — the round-8 completion of the
    sampled-fit adoption (SCALE.md §7o): a deployment fits
    `similarity.kmeans_centroids(fit_sample_per_cell=50)` once and
    builds the PERSISTED index from the learned cells (previously the
    learned fit was only consumable by the in-memory `ivf_topk`).
    The table is materialized into the meta sidecar like the default
    anchors, so search/append/compact need no change — frozen
    geometry flows from whatever the build persisted. Default None
    keeps the deterministic lowest-id anchors (oracle-replayable; all
    registered queries).

    ``corpus_cache_key``: opt-in session memoization of the learned
    quantizer stats / centroid rows / corpus count (the usual
    index-artifact contract — the key must identify corpus content).
    Independently, the build always PRIMES the in-session meta cache
    for ``path`` (`util.prime_memoized_literal` — overwrite, so a
    rebuild never leaves the old sidecar cached): a same-session
    search/append skips one disk-read job; other sessions read the
    sidecar from disk as before."""
    from .similarity import auto_cells, collect_centroid_rows, ivf_centroids
    from .sq import _unit, sq_encode, sq_stats
    from .util import memoized_literal, prime_memoized_literal, repartition_for_compute

    if n_cells is None:
        n = (
            memoized_literal(
                ("count", corpus_cache_key, id_col), lambda: corpus.count()
            )
            if corpus_cache_key is not None
            else corpus.count()
        )
        n_cells = auto_cells(n)
    if corpus_cache_key is not None:
        mns, rngs = memoized_literal(
            ("sq_stats", corpus_cache_key, vec_col), lambda: sq_stats(corpus, vec_col)
        )
    else:
        mns, rngs = sq_stats(corpus, vec_col)
    if centroids is not None:
        # caller-fitted table: driver-sized collect, no memo (the key
        # cannot see the table's provenance; the collect is n_cells
        # rows either way). The table defines the cell count.
        cent_rows = collect_centroid_rows(centroids)
        n_cells = len(cent_rows)
    elif corpus_cache_key is not None:
        cent_rows = memoized_literal(
            ("ivf_cent_rows", corpus_cache_key, n_cells, id_col, vec_col),
            lambda: collect_centroid_rows(
                ivf_centroids(corpus, n_cells, id_col, vec_col)
            ),
        )
    else:
        cent_rows = collect_centroid_rows(
            ivf_centroids(corpus, n_cells, id_col, vec_col)
        )

    from .similarity import ivf_assign_literal

    coded = ivf_assign_literal(
        repartition_for_compute(corpus), cent_rows, "candidate_id", 1, id_col, vec_col
    ).select(
        "candidate_id",
        "cell_id",
        sq_encode(_unit(F.col("__vec"), F.col("__norm")), mns, rngs).alias("sq"),
    )
    # Cluster by cell BEFORE the partitioned write: without it every
    # task holds rows of every cell and the sink fans out to
    # (tasks × cells) small files — measured 9.1 s → ~5 s for the
    # build+serve query at sf0.1. One shuffle, files-per-cell bounded
    # by the repartition width, and the probed-cell reads downstream
    # get contiguous row groups.
    coded.repartition("cell_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{path}/codes")

    spark = corpus.sparkSession
    # An index REBUILD over a path this session already searched must
    # not serve the old file listing to the next search (the round-2
    # upsert-sink lesson, sources/writers.py).
    spark.catalog.refreshByPath(f"{path}/codes")
    meta = {
        "kind": "ivfsq",
        "dim": len(mns),
        "n_cells": n_cells,
        "mns": json.dumps(mns),
        "rngs": json.dumps(rngs),
        "centroids": json.dumps(
            [[int(c), list(map(float, v)), float(n)] for c, v, n in cent_rows]
        ),
    }
    # One-row JSON through Spark so the sidecar lands on the same
    # filesystem as the codes (local, HDFS, S3 — no driver open()).
    # Written as a STRING LITERAL over range(1) — pure JVM plan. The
    # obvious createDataFrame([dict]) is python-RDD-backed, and a job
    # over a parallelized Python list measures ~5 s of worker
    # round-trips for ONE row (the py4j construction-cost lesson,
    # PERF.md round 4); spark.read.json parses the text line
    # identically.
    spark.range(1).select(F.lit(json.dumps(meta)).alias("value")).coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/meta")
    spark.catalog.refreshByPath(f"{path}/meta")
    # Commit: point CURRENT at the fresh generation-0 directory (an
    # atomic small-file replace), then reap generations left by an
    # earlier lifecycle at this path — a rebuild resets the pointer
    # chain. Reaps happen BEFORE priming so the stored fingerprints
    # are post-reap (prime's own invariant).
    from ..sources.fs import fs_delete, fs_replace_file

    fs_replace_file(spark, f"{path}/{_CURRENT}", "codes")
    for stale in _gen_dirs(spark, path):
        fs_delete(spark, f"{path}/{stale}")
    prime_memoized_literal(("ivfsq_codes_dir", path), "codes")
    prime_memoized_literal(
        ("ivfsq_meta", path), (mns, rngs, cent_rows, len(mns), n_cells)
    )


def _read_index_meta(spark: SparkSession, path: str):
    """(mns, rngs, cent_rows, dim, n_cells) for the index at ``path``:
    the value primed by a SAME-SESSION build if there is one (it IS
    what that build just wrote), else parsed from the sidecar on disk
    — never cached here, the disk stays the source of truth for
    artifacts this session didn't build."""
    from .util import peek_memoized_literal

    primed = peek_memoized_literal(("ivfsq_meta", path))
    if primed is not None:
        return primed
    meta = spark.read.json(f"{path}/meta").first()
    mns = json.loads(meta["mns"])
    rngs = json.loads(meta["rngs"])
    cent_rows = [
        (int(c), [float(x) for x in v], float(n))
        for c, v, n in json.loads(meta["centroids"])
    ]
    dim = int(meta["dim"]) if "dim" in meta.__fields__ else len(mns)
    return mns, rngs, cent_rows, dim, int(meta["n_cells"])


def search_ivfsq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Serve top-k from a persisted IVF-SQ8 index. The live codes
    directory is resolved through the ``CURRENT`` pointer (see the
    module docstring — one small read, primed away within a session),
    the query batch is assigned to its ``n_probe`` cells with the
    PERSISTED centroids, and the probed cell ids are collected
    (query-batch-sized — tiny by the ANN contract) and pushed into
    the codes scan as an `isin` partition filter, so only those
    cells' files are read. Scoring,
    rounding, and ranking are the exact expressions of
    `sq.ivfsq_topk` — results are bit-identical to the in-memory
    path.

    ``allowed``: optional FILTERED search (the vector-DB metadata
    predicate: "top-k among candidates matching WHERE ..."): a frame
    whose ``id_col`` column lists the permitted candidate ids. The
    restriction is applied as a left-semi join on the pruned codes
    scan BEFORE scoring — pre-filter semantics, so the returned ranks
    are dense over matching candidates only (never post-filtered
    holes), and non-matching vectors in probed cells are never
    dequantized. Partition pruning is unchanged: the semi join runs
    over only the probed cells' files, and AQE broadcasts a
    dim-table-sized allowed set; a corpus-sized allowed set shuffles
    just the probed partitions, never the whole index.

    ``rerank`` + ``vectors``: EXACT RE-RANK of an overfetched SQ8
    shortlist (the `pq.ivfpq_topk(rerank=...)` pattern brought to the
    persisted index — SCALE.md §7o-r8 remedy (b)): on clone-saturated
    corpora the quantized dot cannot separate near-duplicate cohorts
    (measured: id-overlap recall 0.24 at 1M stacked for ANY centroid
    set), so the top-``rerank`` SQ8 candidates per query join back to
    ``vectors`` (a frame carrying ``id_col``/``vec_col`` — normally
    the corpus the index was built from) and the final top-k ranks on
    the exact rounded cosine with candidate-id tiebreak. Cost: one
    shortlist-sized equi-join (queries × rerank rows) + the exact
    fold over those pairs — never corpus-shaped; partition pruning on
    the codes scan is untouched. The returned schema gains the exact
    score as ``cos_sim`` in place of ``sq_sim``."""
    from .similarity import ivf_assign_literal
    from .sq import _unit, sq_score

    mns, rngs, cent_rows, _dim, _nc = _read_index_meta(spark, path)

    q = ivf_assign_literal(
        queries, cent_rows, "query_id", n_probe, id_col, vec_col
    ).select(
        "query_id",
        "cell_id",
        _unit(F.col("__vec"), F.col("__norm")).alias("qu"),
    )
    probed = sorted({r["cell_id"] for r in q.select("cell_id").distinct().collect()})

    codes = spark.read.parquet(_codes_path(spark, path)).filter(
        F.col("cell_id").isin([int(c) for c in probed])
    )
    if allowed is not None:
        codes = codes.join(
            allowed.select(F.col(id_col).alias("candidate_id")),
            "candidate_id",
            "left_semi",
        )
    joined = codes.join(F.broadcast(q), "cell_id").filter(
        F.col("query_id") != F.col("candidate_id")
    )
    scored = joined.select(
        "query_id",
        "candidate_id",
        F.round(sq_score(F.col("qu"), F.col("sq"), mns, rngs), 6).alias("sq_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sq_sim"), F.asc("candidate_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "candidate_id", "sq_sim", "rank")
        )
    if vectors is None:
        raise ValueError(
            "search_ivfsq_index(rerank=...) needs `vectors` — a frame "
            f"with ({id_col}, {vec_col}) to score the shortlist exactly "
            "(the index stores codes, not vectors)"
        )
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    from ..functions.vectors import l2_norm
    from .similarity import dot

    shortlist = (
        scored.withColumn("__sqrk", F.row_number().over(w))
        .filter(F.col("__sqrk") <= rerank)
        .select("query_id", "candidate_id")
    )
    # q carries one row per probed cell — the shortlist join needs one
    # unit vector per query
    qv = q.select("query_id", "qu").dropDuplicates(["query_id"])
    cand = vectors.select(
        F.col(id_col).alias("candidate_id"),
        _unit(F.col(vec_col), l2_norm(F.col(vec_col))).alias("cu"),
    )
    exact = (
        shortlist.join(cand, "candidate_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "candidate_id",
            F.round(dot(F.col("qu"), F.col("cu")), 6).alias("cos_sim"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("candidate_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )


def append_to_ivfsq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a shard to a persisted IVF-SQ8 index — the nightly-
    ingest shape (the embedding counterpart of d12's incremental
    MinHash index): new vectors are assigned and encoded with the
    index's PERSISTED centroids and quantizer stats (no refit — the
    production behavior: an index's geometry is frozen between
    rebuilds, and quantizer drift is handled by periodic full
    rebuilds, not per-shard refits, so existing codes stay valid and
    comparable). The write appends into the same cell partitions;
    searches immediately see the new vectors."""
    spark = new_vectors.sparkSession
    mns, rngs, cent_rows, dim, _nc = _read_index_meta(spark, path)

    # Fail FAST on dimensionality mismatch: encoding a wrong-dim
    # vector would silently write NULL code elements (element_at past
    # the stats arrays returns NULL), corrupting the index for every
    # future search. limit(1) short-circuits the probe scan.
    bad = new_vectors.filter(F.size(F.col(vec_col)) != dim).limit(1).count()
    if bad:
        raise ValueError(
            f"append_to_ivfsq_index: shard vectors must have dim={dim} "
            f"to match the persisted quantizer at {path}"
        )

    from .similarity import ivf_assign_literal
    from .sq import _unit, sq_encode

    coded = ivf_assign_literal(
        new_vectors, cent_rows, "candidate_id", 1, id_col, vec_col
    ).select(
        "candidate_id",
        "cell_id",
        sq_encode(_unit(F.col("__vec"), F.col("__norm")), mns, rngs).alias("sq"),
    )
    live_name = _resolve_codes_name(spark, path)
    coded.write.mode("append").partitionBy("cell_id").parquet(
        f"{path}/{live_name}"
    )
    # Same file-listing-staleness guard as build: a session that
    # already searched this path must not serve a cached listing
    # missing the new shard's files.
    spark.catalog.refreshByPath(f"{path}/{live_name}")
    # RE-prime the meta sidecar cache: the append changed the path's
    # content fingerprint (new code files), which correctly makes the
    # old primed entry unreachable (util.peek_memoized_literal) — but
    # the META is frozen by the append contract (geometry never
    # changes between rebuilds), so priming the same value under the
    # POST-append fingerprint is exact, and the next search skips the
    # sidecar re-read job (measured ~1 s of spark.read.json per serve
    # otherwise — PERF.md round 6). The live codes-dir name is equally
    # unchanged by an append — re-primed on the same grounds.
    from .util import prime_memoized_literal

    prime_memoized_literal(("ivfsq_codes_dir", path), live_name)
    prime_memoized_literal(
        ("ivfsq_meta", path), (mns, rngs, cent_rows, dim, _nc)
    )


def compact_ivfsq_index(spark: SparkSession, path: str) -> tuple[int, int]:
    """Compact a persisted IVF-SQ8 index's codes — the maintenance
    pass the append path (`append_to_ivfsq_index`) makes necessary:
    every nightly shard adds one file per touched cell partition, and
    after enough appends the probed-cell scan cost is dominated by
    file-open overhead, not bytes (the same accretion economics as
    `sources/writers.compact_parquet`, per partition). Rewrites the
    codes clustered by cell (`repartition("cell_id")` then
    partitionBy — files per cell bounded by the repartition width,
    contiguous row groups per cell).

    POINTER-FILE COMMIT (VERDICT r7 #4 — retires the old two-rename
    swap's no-codes-dir window AND its move-aside/restore machinery):
    the compacted codes are staged, renamed into place as the NEXT
    GENERATION directory (``codes_gN`` — complete the instant the
    name exists), and only then does ``CURRENT`` atomically flip to
    name it (`fs_replace_file` — rename(2)/HDFS-atomic; one
    small-object PUT on S3, where the old two-rename swap was a
    non-atomic directory copy+delete). Failure at ANY step leaves the
    pre-compaction index serving untouched: a failed stage write or
    promote reaps the staging twin; a failed pointer swap reaps the
    promoted-but-unreferenced generation. No restore rename exists
    because nothing is ever moved aside. The REPLACED generation is
    retained until the next compaction (readers mid-scan keep their
    files); older generations are reaped here. Layout-only by
    construction: search results are bit-identical before/after
    (asserted in test_ann_index), and the meta sidecar is untouched —
    frozen geometry — so the primed meta is re-primed under the
    post-compaction fingerprint exactly as the append does. Returns
    (files_before, files_after)."""
    import os
    import uuid

    from ..sources.fs import fs_delete, fs_list_files, fs_rename, fs_replace_file
    from .util import prime_memoized_literal

    def _count_files(p: str) -> int:
        return len(fs_list_files(spark, p, ".parquet"))

    live_name = _resolve_codes_name(spark, path)
    live = f"{path}/{live_name}"
    before = _count_files(live)
    if before == 0:
        raise ValueError(f"no codes parquet under {live}")
    # Read through the partitioned layout so cell_id survives as a
    # column, cluster by cell, rewrite partitioned.
    codes = spark.read.parquet(live)
    gens = _gen_dirs(spark, path)
    next_gen = (int(gens[-1][len(_GEN_PREFIX):]) if gens else 0) + 1
    new_name = f"{_GEN_PREFIX}{next_gen:06d}"
    staging = f"{path}/{new_name}.staging_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    try:
        codes.repartition("cell_id").write.mode("overwrite").partitionBy(
            "cell_id"
        ).parquet(staging)
        fs_rename(spark, staging, f"{path}/{new_name}")
    except BaseException:
        fs_delete(spark, staging)  # serving index untouched
        raise
    try:
        fs_replace_file(spark, f"{path}/{_CURRENT}", new_name)
    except BaseException:
        fs_delete(spark, f"{path}/{new_name}")  # unreferenced — reap
        raise
    spark.catalog.refreshByPath(f"{path}/{new_name}")
    # Retention = 1: keep the generation just replaced (live_name) for
    # readers that resolved the pointer before the swap; reap anything
    # older (including the legacy codes/ once a generation supersedes
    # its successor).
    for d in {*_gen_dirs(spark, path), "codes"} - {new_name, live_name}:
        fs_delete(spark, f"{path}/{d}")
    # Frozen geometry: compaction moved bytes, not meaning. Re-prime
    # the unchanged meta under the new content fingerprint so the
    # next serve skips the sidecar re-read job (append's lesson,
    # PERF.md round 6).
    prime_memoized_literal(("ivfsq_codes_dir", path), new_name)
    meta = _read_index_meta(spark, path)
    prime_memoized_literal(("ivfsq_meta", path), meta)
    return before, _count_files(f"{path}/{new_name}")
