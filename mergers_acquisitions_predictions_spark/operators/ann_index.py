"""Persisted ANN index artifacts — the deployment shape the SCALE.md
§7i measurement argues for: build ONCE (assignment + quantization are
the n·cells cost), persist the coded corpus PARTITIONED BY CELL, and
serve every later query batch as a partition-pruned scan + equi-join.

Layout on disk (any Hadoop-compatible filesystem):

    <path>/codes/       parquet, partitionBy(cell_id):
                        (candidate_id, sq: array<int>) for the
                        IVF-SQ8 kind, (candidate_id, pq: array<int>)
                        for IVF-PQ (round 10 — same layout and commit
                        protocol, geometry JSON differs by "kind" and
                        each reader kind-guards it) — a FRESH build's
                        generation-0 codes directory
    <path>/meta         one-line JSON: quantizer stats, centroid
                        table, config (the driver-sized artifacts the
                        operators otherwise collect per invocation) —
                        generation-0's geometry sidecar
    <path>/codes_gN/    later generations, written by compaction and
                        by REBUILDS at a live path; each carries its
                        OWN geometry as ``codes_gN/_meta`` (the
                        leading underscore hides it from the parquet
                        scan), so a generation name resolves codes
                        AND geometry together — one consistent unit
    <path>/CURRENT      one-line pointer file naming the LIVE codes
                        directory ("codes" or "codes_gN")

POINTER-FILE COMMIT (round 8, VERDICT r7 #4; generation-scoped
geometry since round 9, ADVICE r8): readers resolve ``CURRENT`` and
scan the directory it names; maintenance writes a complete NEW
directory first — codes AND the ``_meta`` geometry staged together,
published by ONE directory rename — and swaps the pointer LAST
(`sources/fs.fs_replace_file`, a small-file replace that is atomic
on HDFS and, where a filesystem implements it as delete-then-rename
— the local FS — leaves at worst a transient missing-pointer window
that resolution's newest-generation fallback covers, see below). A
reader therefore NEVER sees a missing or partial codes directory,
and because a generation carries its own geometry, a reader that
resolved a PRE-swap name keeps scoring those codes with THEIR stats
— a rebuild can change the quantizer without any stale-codes/
new-geometry mix (the cross-file race ADVICE r8 flagged). The
REPLACED generation is retained for one maintenance cycle
(retention = 1, ≤2 generations on disk) by compaction AND by
rebuild, so even a reader that resolved the pointer just before a
swap finishes its scan against intact files; only a reader idling
across TWO maintenance commits can lose its directory — the
standard snapshot-expiry contract. An index written by an earlier
layout still serves: a missing ``CURRENT`` falls back to the newest
promoted generation, then the legacy ``codes/``; a generation
without ``_meta`` (pre-round-9 compactions) falls back to the
sibling ``meta`` sidecar — correct for those generations by the
frozen-geometry append/compact contract — which may itself be the
round-4..8 one-row Spark TEXT DATASET directory rather than a plain
file; all three forms parse to the same dict.

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
_META_FILE = "_meta"


def _with_extra_meta(geometry: dict, extra_meta: dict | None) -> dict:
    """Merge caller-owned ``extra_meta`` into the geometry sidecar
    dict, ENFORCING the no-collision contract (ADVICE r12): a caller
    key shadowing frozen geometry ('dim', 'centroids', 'kind',
    'residual', ...) would silently corrupt every later resolution,
    so it is a hard error, not a last-splat-wins overwrite."""
    if not extra_meta:
        return geometry
    clash = sorted(set(extra_meta) & set(geometry))
    if clash:
        raise ValueError(
            f"extra_meta keys collide with frozen index geometry: {clash}"
        )
    return {**geometry, **extra_meta}


def _gen_dirs(spark: SparkSession, path: str) -> list[str]:
    """Promoted generation directory names under ``path``, sorted
    NUMERICALLY by suffix (ADVICE r8: a lexicographic sort puts
    ``codes_g1000000`` before ``codes_g0999999``, so ``gens[-1]``
    would resolve a stale generation and the next-gen computation
    would collide with an existing name, failing every later
    compaction behind `fs_rename`'s strict no-overwrite). Staging
    twins (``codes_gN.staging_<tok>``) never match: only an all-digit
    suffix is a promoted generation."""
    from ..sources.fs import fs_list_dirs

    return sorted(
        (
            d
            for d in fs_list_dirs(spark, path)
            if d.startswith(_GEN_PREFIX) and d[len(_GEN_PREFIX):].isdigit()
        ),
        key=lambda d: int(d[len(_GEN_PREFIX):]),
    )


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
    moves), and — since round 9 — resolves its OWN geometry
    (`_read_meta_text`), so old-vs-new generation is a freshness
    difference, never a correctness one: even across a REBUILD that
    changed the quantizer, a stale resolution scores its codes with
    the stats they were encoded under."""
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


def _has_live_index(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` already holds an index a reader could be
    serving from — a ``CURRENT`` pointer, any promoted generation, or
    a legacy ``codes/`` directory. Decides whether a build is a FRESH
    write (nothing resolvable, so nothing to protect) or a REBUILD
    that must commit through a staged generation (ADVICE r8: an
    in-place overwrite of the live directory pulls files out from
    under a concurrent reader mid-scan)."""
    from ..sources.fs import fs_exists

    return (
        fs_exists(spark, f"{path}/{_CURRENT}")
        or bool(_gen_dirs(spark, path))
        or fs_exists(spark, f"{path}/codes")
    )


def _read_meta_text(spark: SparkSession, path: str, name: str) -> str:
    """Raw one-line JSON geometry for the generation ``name`` at
    ``path``. Resolution order: the generation's own co-located
    ``<name>/_meta`` (round 9+ — the leading underscore keeps it out
    of the parquet scan's file listing), then the sibling ``meta``
    sidecar as a plain file (round-9 fresh builds), then the legacy
    one-row Spark text-dataset DIRECTORY (rounds 4–8) — all three
    driver-side Hadoop reads, no Spark job (the sidecar read used to
    be a `spark.read.json` job, ~1 s of scheduler latency per cold
    serve at bench scale — PERF.md round 9)."""
    from ..sources.fs import fs_is_dir, fs_list_files, fs_read_text

    if name != "codes":
        txt = fs_read_text(spark, f"{path}/{name}/{_META_FILE}")
        if txt is not None and txt.strip():
            return txt
    sidecar = f"{path}/meta"
    if fs_is_dir(spark, sidecar):  # legacy one-row text dataset
        parts = sorted(
            p for p, _sz in fs_list_files(spark, sidecar, ".txt")
        )
        if not parts:
            raise ValueError(f"no geometry sidecar text under {sidecar}")
        txt = fs_read_text(spark, parts[0])
        if txt is None or not txt.strip():
            raise ValueError(f"empty geometry sidecar at {parts[0]}")
        return txt
    txt = fs_read_text(spark, sidecar)
    if txt is None or not txt.strip():
        raise ValueError(
            f"index at {path} has no geometry for generation {name!r}: "
            f"expected {path}/{name}/{_META_FILE} or a {sidecar} sidecar "
            "— rebuild the index"
        )
    return txt


def build_ivfsq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_cache_key: tuple | None = None,
    centroids: DataFrame | None = None,
    assign_blas: bool = False,
    extra_meta: dict | None = None,
) -> None:
    """Build + persist an IVF-SQ8 index: learn per-dimension stats
    and centroids from the corpus (one pass + driver-sized collects),
    encode every vector (map-side), write codes partitioned by cell.
    At a FRESH path the index lands as generation-0 (``codes/`` + the
    ``meta`` sidecar); at a path already serving an index the build is
    a REBUILD and commits like a compaction — a staged generation
    carrying its own geometry, one pointer flip, the previous
    generation retained one cycle (ADVICE r8: never overwrite what a
    concurrent reader may be scanning). Either way the result fully
    replaces the old index for every reader that resolves after the
    commit. This is the amortized-regime artifact — SCALE.md §7i
    measures the 5.7× scan win it buys at 4k queries.

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
    sidecar from disk as before.

    ``extra_meta``: optional caller-owned JSON-safe fields merged into
    the geometry sidecar (ADVICE r11: `maxsim.build_token_index`
    records the ``n_tokens`` the composite frame was built with, so a
    serve with a mismatched T fails fast instead of decoding candidate
    ids with the wrong divisor). Keys colliding with the geometry's
    own raise ValueError (enforced — ADVICE r12); ``None`` leaves the
    sidecar byte-identical to the pre-round-12 form."""
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

    from .similarity import ivf_assign_blas, ivf_assign_literal

    # ``assign_blas``: route the n×cells assignment — THE dominant
    # build term at deployment scale (SCALE.md §7o-r9 addendum) —
    # through one numpy matmul per Arrow batch instead of codegen'd
    # folds. Opt-in: codes and scoring stay bit-identical (the BLAS
    # path only picks the cell; __vec passes through and __norm is
    # re-derived JVM-side), but a boundary-tie cell choice is not
    # bit-guaranteed, which the registered oracle rows require — see
    # ivf_assign_blas' parity-scope docstring.
    assign = ivf_assign_blas if assign_blas else ivf_assign_literal
    # TWO-STEP ENCODE AROUND THE CELL SHUFFLE (round 9, found by
    # thread-dumping a wedged 1M build): higher-order functions run on
    # the INTERPRETED expression path (no whole-stage codegen), where
    # a collapsed projection re-evaluates its inputs per lambda
    # element — `sq_encode(_unit(vec, norm))` re-derives the full unit
    # TRANSFORM for every one of the d code dimensions (d² work), and
    # when the norm's fold expression is also inlined (nothing between
    # the projections to stop CollapseProject — the BLAS assignment
    # path, which lacks the fold path's explode/Generate barrier) the
    # l2 fold re-evaluates per divide: d³ per row, a >100× blowup at
    # 1M×64d. Computing the unit vector BEFORE the cell shuffle and
    # encoding AFTER it makes the shuffle the materialization barrier:
    # post-shuffle, `__unit` is a concrete attribute and encode is d
    # array reads per row. Unit values, codes, and results are
    # bit-identical — only evaluation count changes. The shuffle
    # itself was already here (clustering by cell bounds
    # files-per-cell by the repartition width and gives probed-cell
    # reads contiguous row groups — measured 9.1 s → ~5 s at sf0.1).
    coded = (
        assign(
            repartition_for_compute(corpus), cent_rows, "candidate_id", 1, id_col, vec_col
        )
        .select(
            "candidate_id",
            "cell_id",
            _unit(F.col("__vec"), F.col("__norm")).alias("__unit"),
        )
        .repartition("cell_id")
        .select(
            "candidate_id",
            "cell_id",
            sq_encode(F.col("__unit"), mns, rngs).alias("sq"),
        )
    )
    spark = corpus.sparkSession
    meta_text = json.dumps(
        _with_extra_meta(
            {
                "kind": "ivfsq",
                "dim": len(mns),
                "n_cells": n_cells,
                "mns": json.dumps(mns),
                "rngs": json.dumps(rngs),
                "centroids": json.dumps(
                    [[int(c), list(map(float, v)), float(n)] for c, v, n in cent_rows]
                ),
            },
            extra_meta,
        )
    )
    live_name = _publish_codes(spark, path, coded, meta_text)
    prime_memoized_literal(("ivfsq_codes_dir", path), live_name)
    prime_memoized_literal(
        ("ivfsq_meta", path, live_name),
        (mns, rngs, cent_rows, len(mns), n_cells),
    )


def _publish_codes(
    spark: SparkSession,
    path: str,
    coded: DataFrame,
    meta_text: str,
) -> str:
    """FRESH-vs-REBUILD publish decision shared by every index KIND
    (IVF-SQ8 and IVF-PQ builds — round 10: the commit protocol is
    quantizer-agnostic, only the coded columns and the geometry JSON
    differ). ``coded`` must already be clustered by cell (both builds
    shuffle upstream of the encode). Returns the live codes name.

    FRESH path: nothing resolvable exists, so no reader can be
    mid-scan — write generation-0 in place, no staging rename; the
    partitioned sink writes contiguous row groups with files-per-cell
    bounded by the shuffle width. The geometry sidecar is ONE
    driver-side Hadoop write (plain file, same filesystem as the
    codes). This replaced the round-4..8 one-row Spark text job
    (range(1).coalesce(1).write.text): correct, but a whole job +
    refresh (~0.3 s at bench scale) to move one line — part of the
    s13-family build-leg cost VERDICT r8 flagged. `spark.read.json`
    accepts the plain file, and `_read_meta_text` still parses the
    legacy dataset-directory form for indexes older sessions wrote.

    REBUILD at a live path (ADVICE r8 — the in-place overwrite raced
    concurrent readers, and reap-everything retention contradicted
    the module contract): commit exactly like a compaction — stage
    codes + co-located _meta geometry as the NEXT generation, publish
    with one directory rename, flip the pointer, retain the
    previously-live generation one cycle, reap everything older. A
    reader that resolved the old name keeps consistent codes+geometry
    until the NEXT maintenance commit; the pointer chain continues
    instead of resetting."""
    if not _has_live_index(spark, path):
        coded.write.mode("overwrite").partitionBy("cell_id").parquet(
            f"{path}/codes"
        )
        spark.catalog.refreshByPath(f"{path}/codes")
        from ..sources.fs import fs_delete, fs_replace_file, fs_write_text

        fs_delete(spark, f"{path}/meta")  # a legacy DIR would block create
        fs_write_text(spark, f"{path}/meta", meta_text)
        fs_replace_file(spark, f"{path}/{_CURRENT}", "codes")
        return "codes"
    return _commit_generation(
        spark, path, coded, meta_text, _resolve_codes_name(spark, path)
    )


def _commit_generation(
    spark: SparkSession,
    path: str,
    coded: DataFrame,
    meta_text: str,
    live_name: str,
) -> str:
    """The staged-generation commit shared by REBUILD and COMPACTION:
    write ``coded`` — which the CALLER must already have clustered by
    cell (both callers shuffle upstream; a second repartition here
    would double-shuffle the rebuild path) — into a staging twin,
    co-locate the ``meta_text`` geometry as ``_meta`` inside it,
    publish with ONE directory rename as the next ``codes_gN``,
    atomically flip ``CURRENT``, retain the previously-live
    generation for one cycle, reap everything older. Returns the new
    generation name.

    Failure at ANY step leaves the pre-commit index serving
    untouched: a failed stage write, meta write, or promote reaps the
    staging twin; a failed pointer SWAP leaves the promoted
    generation in place — unreferenced by the pointer, but complete
    and consistent (codes + ``_meta`` staged before the rename), and
    deliberately NOT reaped (ADVICE r9): on stores where the pointer
    replace is delete-then-rename (local FS, S3A) the old pointer may
    already be gone when the swap fails, and a concurrent reader
    resolving in that window falls back to the NEWEST generation —
    exactly the promoted one — so deleting it would pull the
    directory out from under that reader. The NEXT successful
    maintenance commit reaps it as an ordinary old generation (its
    number is counted by the next-gen computation, so no name
    collision). No restore rename exists because nothing is ever
    moved aside."""
    import os
    import uuid

    from ..sources.fs import fs_delete, fs_rename, fs_replace_file, fs_write_text

    gens = _gen_dirs(spark, path)
    next_gen = (int(gens[-1][len(_GEN_PREFIX):]) if gens else 0) + 1
    new_name = f"{_GEN_PREFIX}{next_gen:06d}"
    staging = f"{path}/{new_name}.staging_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    try:
        coded.write.mode("overwrite").partitionBy("cell_id").parquet(staging)
        fs_write_text(spark, f"{staging}/{_META_FILE}", meta_text)
        fs_rename(spark, staging, f"{path}/{new_name}")
    except BaseException:
        fs_delete(spark, staging)  # serving index untouched
        raise
    # A swap failure propagates as-is: the promoted generation stays
    # (see the docstring's failure contract — reaping it here would
    # break a reader that resolved it through the missing-pointer
    # fallback mid-swap); the next successful commit reaps it.
    fs_replace_file(spark, f"{path}/{_CURRENT}", new_name)
    spark.catalog.refreshByPath(f"{path}/{new_name}")
    # Retention = 1: keep the generation just replaced (live_name) for
    # readers that resolved the pointer before the swap; reap anything
    # older (including the legacy codes/ once a generation supersedes
    # it). The sibling `meta` sidecar is deliberately NOT reaped with
    # codes/: a retained pre-round-9 generation without co-located
    # _meta still resolves its geometry through it, and once every
    # generation carries _meta the sidecar is one dead line a future
    # fresh build overwrites — never resolved ahead of a generation's
    # own _meta.
    for d in {*_gen_dirs(spark, path), "codes"} - {new_name, live_name}:
        fs_delete(spark, f"{path}/{d}")
    return new_name


def _read_index_meta(spark: SparkSession, path: str, name: str):
    """(mns, rngs, cent_rows, dim, n_cells) for generation ``name`` of
    the index at ``path``: the value primed by a SAME-SESSION
    build/append/compact if there is one (it IS what that commit just
    wrote, and the primed codes name matches by the same prime), else
    parsed from the generation's geometry on disk — never cached
    here, the disk stays the source of truth for artifacts this
    session didn't write. Taking the RESOLVED name (round 9) pins
    geometry and codes to one resolution: callers resolve once and
    read both from it, so a pointer flip between two reads can no
    longer pair old codes with new stats (ADVICE r8). The primed memo
    is keyed by ``name`` too (ADVICE r9): a caller holding a STALE
    generation name after a same-session rebuild must fall through to
    that generation's on-disk ``_meta``, never silently receive the
    rebuild's new geometry."""
    from .util import peek_memoized_literal

    primed = peek_memoized_literal(("ivfsq_meta", path, name))
    if primed is not None:
        return primed
    meta = json.loads(_read_meta_text(spark, path, name))
    # kind guard (round 10, with the PQ kind's arrival): serving an
    # IVF-PQ artifact through the SQ8 reader would KeyError on "mns"
    # at best — fail with the actual mistake instead. Legacy metas
    # predate the field; they are all SQ8.
    kind = meta.get("kind", "ivfsq")
    if kind != "ivfsq":
        raise ValueError(
            f"index at {path} ({name}) is kind={kind!r}, not ivfsq — "
            "serve it with the matching search function"
        )
    mns = json.loads(meta["mns"])
    rngs = json.loads(meta["rngs"])
    cent_rows = [
        (int(c), [float(x) for x in v], float(n))
        for c, v, n in json.loads(meta["centroids"])
    ]
    dim = int(meta["dim"]) if "dim" in meta else len(mns)
    return mns, rngs, cent_rows, dim, int(meta["n_cells"])


def _ivfsq_scored_blas(
    codes: DataFrame,
    q_rows: list,
    mns: list[float],
    rngs: list[float],
    cut: int,
) -> DataFrame:
    """`search_ivfsq_index`'s BLAS scoring leg: (query_id,
    candidate_id, sq_sim) rows holding, per partition, the top-``cut``
    candidates per query under the final comparator (6-dp-rounded
    dequantized dot desc, candidate id asc) — the driver-side window
    then ranks partitions × queries × cut rows, never the probed
    pairs. Per Arrow batch, codes reconstruct in one vectorized
    ``mn + (code·rng)/255`` (the JVM expression's per-element order)
    and score against that cell's query matrix with one matmul; the
    partitioned scan makes batches effectively single-cell, so the
    groupby is a cheap passthrough. Self-pairs are masked to −inf (the
    fold path's `query_id != candidate_id`) and boundary ties at the
    cut survive to the id tiebreak. Parity scope = the other
    ``*_blas`` operators: matmul accumulation + float HALF_UP
    replication; opt-in only."""
    import numpy as np
    import pandas as pd

    spark = codes.sparkSession
    by_cell: dict = {}
    for r in q_rows:
        ids, mat = by_cell.setdefault(int(r["cell_id"]), ([], []))
        ids.append(int(r["query_id"]))
        mat.append([float(x) for x in r["qu"]])
    bc = spark.sparkContext.broadcast(
        {
            c: (np.asarray(ids, dtype=np.int64), np.asarray(mat, dtype=np.float64))
            for c, (ids, mat) in by_cell.items()
        }
    )
    MN = np.asarray([float(x) for x in mns], dtype=np.float64)
    RG = np.asarray([float(x) for x in rngs], dtype=np.float64)

    def score(batches):
        groups = bc.value
        acc: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            for cell, sub in pdf.groupby("cell_id"):
                g = groups.get(int(cell))
                if g is None:
                    continue
                qids, Q = g
                C = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in sub["sq"]]
                )
                cand = sub["candidate_id"].to_numpy(dtype=np.int64)
                recon = MN[None, :] + (C * RG[None, :]) / 255.0
                S = recon @ Q.T
                scaled = S * 1e6
                R = (
                    np.where(
                        scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
                    )
                    / 1e6
                )
                R[cand[:, None] == qids[None, :]] = -np.inf
                nb = R.shape[0]
                if nb > cut:
                    thr = np.partition(R, nb - cut, axis=0)[nb - cut]
                    keep = (R >= thr) & np.isfinite(R)
                else:
                    keep = np.isfinite(R)
                rows, cols = np.nonzero(keep)
                order = np.argsort(cols, kind="stable")
                rows, cols = rows[order], cols[order]
                bounds = np.searchsorted(cols, np.arange(len(qids) + 1))
                for j in range(len(qids)):
                    lo, hi = bounds[j], bounds[j + 1]
                    if lo == hi:
                        continue
                    cs, ss = acc.setdefault(int(qids[j]), ([], []))
                    cs.append(cand[rows[lo:hi]])
                    ss.append(R[rows[lo:hi], j])
        out_q, out_c, out_s = [], [], []
        for qid in acc:
            c = np.concatenate(acc[qid][0])
            s = np.concatenate(acc[qid][1])
            sel = np.lexsort((c, -s))[:cut]
            out_q.append(np.full(sel.size, qid, dtype=np.int64))
            out_c.append(c[sel])
            out_s.append(s[sel])
        if out_q:
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "candidate_id": np.concatenate(out_c),
                    "sq_sim": np.concatenate(out_s),
                }
            )

    return codes.select("candidate_id", "cell_id", "sq").mapInPandas(
        score, schema="query_id long, candidate_id long, sq_sim double"
    )


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
    score_blas: bool = False,
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
    score as ``cos_sim`` in place of ``sq_sim``.

    ``score_blas`` (round 10 — the `ivf_assign_blas`/`score_blas`
    lesson applied to THE dominant serve term at batch scale): the
    probed-pair SQ scoring — dequantize + dot per (candidate, query)
    pair — runs as one numpy reconstruct+matmul per Arrow batch with
    per-partition top-k selection, instead of one interpreted JVM
    fold per pair (measured: the 1M×200-query serve spends most of
    its 10 s there). Partition pruning, the allowed-set semi join,
    and the rerank stage are untouched; the query units are collected
    from the SAME JVM expressions, so only the candidate-side
    reconstruct-dot accumulation and the float HALF_UP replication
    differ — the usual opt-in parity scope (boundary roundings not
    bit-guaranteed; registered oracle rows keep the fold path;
    equality on the test corpora is asserted in
    tests/test_ann_index.py)."""
    from .similarity import ivf_assign_literal
    from .sq import _unit, sq_score

    # ONE resolution pins this serve's codes AND geometry to the same
    # generation (round 9): resolving twice — once for meta, once for
    # the scan — could straddle a rebuild's pointer flip and score one
    # generation's codes with another's quantizer stats (ADVICE r8).
    live_name = _resolve_codes_name(spark, path)
    mns, rngs, cent_rows, _dim, _nc = _read_index_meta(spark, path, live_name)

    q = ivf_assign_literal(
        queries, cent_rows, "query_id", n_probe, id_col, vec_col
    ).select(
        "query_id",
        "cell_id",
        _unit(F.col("__vec"), F.col("__norm")).alias("qu"),
    )
    if score_blas:
        # one collect serves both the probe set and the per-cell query
        # matrices (query-batch × probes rows — tiny by contract); the
        # qu values are the JVM fold's own, so only the candidate-side
        # accumulation differs from the fold path
        q_rows = q.collect()
        probed = sorted({int(r["cell_id"]) for r in q_rows})
    else:
        probed = sorted(
            {r["cell_id"] for r in q.select("cell_id").distinct().collect()}
        )

    codes = spark.read.parquet(f"{path}/{live_name}").filter(
        F.col("cell_id").isin([int(c) for c in probed])
    )
    if allowed is not None:
        codes = codes.join(
            allowed.select(F.col(id_col).alias("candidate_id")),
            "candidate_id",
            "left_semi",
        )
    if score_blas:
        scored = _ivfsq_scored_blas(
            codes, q_rows, mns, rngs, cut=max(k, rerank or 0)
        )
    else:
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
    from .util import hof_bind

    shortlist = (
        scored.withColumn("__sqrk", F.row_number().over(w))
        .filter(F.col("__sqrk") <= rerank)
        .select("query_id", "candidate_id")
    )
    # q carries one row per probed cell — the shortlist join needs one
    # unit vector per query
    qv = q.select("query_id", "qu").dropDuplicates(["query_id"])
    # Join RAW vectors through the BROADCAST shortlist and unit-
    # normalize only the survivors (round 10, found by timing the
    # 1M×200-query serve: the previous shape unit-normalized the
    # ENTIRE vectors frame before the join — corpus-shaped work in
    # the "shortlist-sized" stage — and worse, CollapseProject inlined
    # the norm fold into the unit lambda, d² per corpus row: +20.9 s
    # on a 10.0 s serve; now +≈1 s). The broadcast makes the corpus
    # side a map-side probe: non-shortlisted vectors are scanned,
    # never shuffled, never normalized. Per-pair arithmetic is
    # unchanged (same unit divide, same fold order — the norm is
    # hof_bind-bound so it evaluates once per survivor), so results
    # stay bit-identical and the oracle replay is untouched.
    cand = vectors.select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("__cvec")
    )
    exact = (
        cand.join(F.broadcast(shortlist), "candidate_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "candidate_id",
            F.round(
                hof_bind(
                    l2_norm(F.col("__cvec")),
                    lambda n: dot(F.col("qu"), _unit(F.col("__cvec"), n)),
                ),
                6,
            ).alias("cos_sim"),
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
    # One resolution for geometry AND the target directory — the
    # search-path consistency rule (round 9), applied to the writer.
    live_name = _resolve_codes_name(spark, path)
    mns, rngs, cent_rows, dim, _nc = _read_index_meta(spark, path, live_name)

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

    # Two-step encode around a cell shuffle — build's interpreted-HOF
    # lesson (see build_ivfsq_index): post-shuffle, `__unit` is a
    # concrete attribute and encode is d array reads per row instead
    # of d re-evaluations of the unit transform. The shuffle also
    # bounds the shard's file fan-out to one file per touched cell
    # instead of (tasks × cells).
    coded = (
        ivf_assign_literal(
            new_vectors, cent_rows, "candidate_id", 1, id_col, vec_col
        )
        .select(
            "candidate_id",
            "cell_id",
            _unit(F.col("__vec"), F.col("__norm")).alias("__unit"),
        )
        .repartition("cell_id")
        .select(
            "candidate_id",
            "cell_id",
            sq_encode(F.col("__unit"), mns, rngs).alias("sq"),
        )
    )
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
        ("ivfsq_meta", path, live_name), (mns, rngs, cent_rows, dim, _nc)
    )


def compact_ivfsq_index(
    spark: SparkSession, path: str, files_before: int | None = None
) -> tuple[int, int]:
    """Compact a persisted index's codes (BOTH kinds since round 10 —
    compaction never interprets geometry, see the kind branch below;
    the name keeps the original SQ8 spelling for its callers) — the maintenance
    pass the append path (`append_to_ivfsq_index`) makes necessary:
    every nightly shard adds one file per touched cell partition, and
    after enough appends the probed-cell scan cost is dominated by
    file-open overhead, not bytes (the same accretion economics as
    `sources/writers.compact_parquet`, per partition). Rewrites the
    codes clustered by cell (`repartition("cell_id")` then
    partitionBy — files per cell bounded by the repartition width,
    contiguous row groups per cell).

    POINTER-FILE COMMIT (VERDICT r7 #4 — retires the old two-rename
    swap's no-codes-dir window AND its move-aside/restore machinery;
    shared with rebuild as `_commit_generation` since round 9): the
    compacted codes are staged together with a co-located copy of the
    live generation's ``_meta`` geometry (frozen by the compact
    contract — byte-identical text, carried forward so the new
    generation resolves codes AND stats as one unit), renamed into
    place as the NEXT GENERATION directory (``codes_gN`` — complete
    the instant the name exists), and only then does ``CURRENT``
    atomically flip to name it (`fs_replace_file` — HDFS-atomic; one
    small-object copy+delete on S3A and the local FS, whose transient
    missing-pointer window resolution's newest-generation fallback
    covers). Failure at ANY step leaves the pre-compaction index
    serving untouched (see `_commit_generation`). The REPLACED
    generation is retained until the next maintenance commit (readers
    mid-scan keep their files); older generations are reaped.
    Layout-only by construction: search results are bit-identical
    before/after (asserted in test_ann_index), and the geometry is
    untouched — so the primed meta is re-primed under the
    post-compaction fingerprint exactly as the append does. Returns
    (files_before, files_after)."""
    from ..sources.fs import fs_list_files
    from .util import prime_memoized_literal

    def _count_files(p: str) -> int:
        return len(fs_list_files(spark, p, ".parquet"))

    live_name = _resolve_codes_name(spark, path)
    live = f"{path}/{live_name}"
    # ``files_before``: a caller that already LISTED the live codes
    # tree (the accretion monitor — `compact_if_accreted` fires off
    # `index_accretion_stats`' listing) passes its count so the
    # compact does not re-walk the same tree (round 14, guide §6:
    # the listing is driver-side NameNode/LIST work, and an accreted
    # tree is exactly the many-files case where it hurts).
    before = files_before if files_before is not None else _count_files(live)
    if before == 0:
        raise ValueError(f"no codes parquet under {live}")
    meta_text = _read_meta_text(spark, path, live_name)
    # KIND-AGNOSTIC (round 10, with the PQ kind's arrival): compaction
    # never interprets the geometry — it carries the meta TEXT forward
    # byte-identically — so one implementation serves both kinds; only
    # the re-prime below parses it, through the kind's own reader.
    kind = json.loads(meta_text).get("kind", "ivfsq")
    if kind == "ivfpq":
        meta_key, meta = "ivfpq_meta", _read_ivfpq_meta(spark, path, live_name)
    else:
        meta_key, meta = "ivfsq_meta", _read_index_meta(spark, path, live_name)
    # Read through the partitioned layout so cell_id survives as a
    # column, cluster by cell, rewrite partitioned.
    codes = spark.read.parquet(live).repartition("cell_id")
    new_name = _commit_generation(spark, path, codes, meta_text, live_name)
    # Frozen geometry: compaction moved bytes, not meaning. Re-prime
    # the unchanged meta under the new content fingerprint so the
    # next serve skips the sidecar re-read (append's lesson, PERF.md
    # round 6).
    prime_memoized_literal(("ivfsq_codes_dir", path), new_name)
    prime_memoized_literal((meta_key, path, new_name), meta)
    return before, _count_files(f"{path}/{new_name}")


#: kind-neutral spelling — compaction works on both index kinds
compact_index = compact_ivfsq_index


def append_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """KIND-AGNOSTIC append (round 12, for the streaming ingest sink):
    sniff the index's kind from its own meta — the `compact_index` /
    `maxsim_search_tokens_persisted` discipline: never interpret
    geometry here — and dispatch to the matching append. Same-session
    primes answer without a disk read; cold readers pay one sidecar
    read the dispatched append would have paid anyway. Frozen-geometry
    semantics are the kind's own (including the PQ residual flag,
    which `append_to_ivfpq_index` reads from the same meta)."""
    from .util import peek_memoized_literal

    spark = new_vectors.sparkSession
    live = _resolve_codes_name(spark, path)
    if peek_memoized_literal(("ivfpq_meta", path, live)) is not None:
        kind = "ivfpq"
    elif peek_memoized_literal(("ivfsq_meta", path, live)) is not None:
        kind = "ivfsq"
    else:
        kind = json.loads(_read_meta_text(spark, path, live)).get(
            "kind", "ivfsq"
        )
    if kind == "ivfpq":
        append_to_ivfpq_index(new_vectors, path, id_col=id_col, vec_col=vec_col)
    else:
        append_to_ivfsq_index(new_vectors, path, id_col=id_col, vec_col=vec_col)


def append_to_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a shard to a persisted IVF-PQ index — the PQ spelling of
    `append_to_ivfsq_index` (same frozen-geometry contract: new
    vectors are assigned and encoded with the PERSISTED centroids and
    codebooks, no refit; drift is handled by periodic rebuilds). One
    resolution covers geometry and target directory; dim-mismatch
    fails fast before any write; the two-step encode around the cell
    shuffle bounds the shard's file fan-out to one file per touched
    cell and keeps `pq_encode` reading a concrete unit attribute."""
    from .pq import _unit, pq_encode, residual_cent_df, residual_expr
    from .similarity import ivf_assign_literal
    from .util import prime_memoized_literal

    spark = new_vectors.sparkSession
    live_name = _resolve_codes_name(spark, path)
    cbs, cent_rows, dim, _nc, residual = _read_ivfpq_meta(
        spark, path, live_name
    )

    bad = new_vectors.filter(F.size(F.col(vec_col)) != dim).limit(1).count()
    if bad:
        raise ValueError(
            f"append_to_ivfpq_index: shard vectors must have dim={dim} "
            f"to match the persisted codebooks at {path}"
        )
    assigned = ivf_assign_literal(
        new_vectors, cent_rows, "candidate_id", 1, id_col, vec_col
    )
    if residual:
        # frozen geometry includes the residual flag: the shard
        # encodes residuals to the PERSISTED centroids with the
        # PERSISTED residual books (round 12, §7s).
        pre = assigned.join(
            F.broadcast(residual_cent_df(spark, cent_rows)), "cell_id"
        ).select(
            "candidate_id",
            "cell_id",
            residual_expr(
                F.col("__vec"), F.col("__norm"), F.col("__cu")
            ).alias("__unit"),
        )
    else:
        pre = assigned.select(
            "candidate_id",
            "cell_id",
            _unit(F.col("__vec"), F.col("__norm")).alias("__unit"),
        )
    coded = pre.repartition("cell_id").select(
        "candidate_id",
        "cell_id",
        pq_encode(F.col("__unit"), cbs).alias("pq"),
    )
    coded.write.mode("append").partitionBy("cell_id").parquet(
        f"{path}/{live_name}"
    )
    spark.catalog.refreshByPath(f"{path}/{live_name}")
    # Frozen geometry + unchanged live name: re-prime both under the
    # post-append content fingerprint (append_to_ivfsq_index's lesson).
    prime_memoized_literal(("ivfsq_codes_dir", path), live_name)
    prime_memoized_literal(
        ("ivfpq_meta", path, live_name), (cbs, cent_rows, dim, _nc, residual)
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int | None = 16,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_cache_key: tuple | None = None,
    codebooks: list[list[list[float]]] | None = None,
    assign_blas: bool = False,
    extra_meta: dict | None = None,
    residual: bool = False,
) -> None:
    """Build + persist an IVF-PQ index — the COMPRESSED persisted kind
    (round 10), completing the lifecycle family's memory story: the
    SQ8 codes are ``dim`` bytes/vector, the PQ codes ``n_subspaces``
    bytes (8 here vs 64 — at 10⁹ vectors the difference is whether
    the hot index is 64 GB or 8 GB per 10⁹, i.e. whether one
    executor's page cache holds a shard of it). Same layout, same
    pointer-file commit, same FRESH-vs-REBUILD decision as the SQ8
    build (`_publish_codes` — the protocol is quantizer-agnostic):
    codes land partitioned by cell with the geometry co-located, so
    `search_ivfpq_index` serves partition-pruned ADC scans.

    Geometry = IVF centroids + PQ codebooks. ``codebooks=None`` keeps
    the deterministic lowest-id anchor books (`pq_anchor_codebooks` —
    oracle-replayable, the registered-row configuration); a deployment
    passes `pq_kmeans_codebooks`' learned books exactly like the SQ8
    build's ``centroids`` hook. Encoding follows the two-step
    discipline (unit vector computed BEFORE the cell shuffle, encode
    AFTER it — the §7o-r9 interpreted-HOF lesson): post-shuffle the
    unit vector is a concrete attribute, so `pq_encode`'s bound
    slices cost M·d array reads per row, not M·K·d re-derivations.

    ``assign_blas``: same opt-in as the SQ8 build — the n×cells
    assignment as one numpy matmul per Arrow batch; codes are
    bit-identical off tie boundaries (see `ivf_assign_blas`).
    ``extra_meta``: `build_ivfsq_index`'s contract — caller-owned
    JSON-safe fields merged into the geometry sidecar.

    ``residual=True`` (round 12 — SCALE.md §7s, measured first): the
    fine stage encodes x_unit − c_unit(cell(x)) instead of x_unit —
    the classic IVF-ADC refinement. The flag is RECORDED in the
    geometry (serving a residual index with raw ADC tables would be
    silently wrong), `search_ivfpq_index` dispatches on it, appends
    encode with it, and compaction carries it forward with the rest
    of the meta text. Opt-in by measurement: +0.16 recall@5 at equal
    bytes on the structured corpus, a LOSS on the unstructured one
    (§7s — decide per corpus, e.g. via a held-out recall probe).
    Anchor books under the flag come from the lowest-id RESIDUALS;
    caller ``codebooks`` must be residual-fitted."""
    from .pq import (
        _unit,
        pq_anchor_codebooks,
        pq_encode,
        pq_residual_anchor_codebooks,
        residual_cent_df,
        residual_expr,
    )
    from .similarity import (
        auto_cells,
        collect_centroid_rows,
        ivf_assign_blas,
        ivf_assign_literal,
        ivf_centroids,
    )
    from .util import memoized_literal, prime_memoized_literal, repartition_for_compute

    spark = corpus.sparkSession
    memoize = corpus_cache_key is not None
    if n_cells is None:
        n = (
            memoized_literal(
                ("count", corpus_cache_key, id_col), lambda: corpus.count()
            )
            if memoize
            else corpus.count()
        )
        n_cells = auto_cells(n)
    if memoize:
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

    assign = ivf_assign_blas if assign_blas else ivf_assign_literal
    cent_df = residual_cent_df(spark, cent_rows) if residual else None

    def assigned_resids():
        # residual lands as a concrete attribute before the cell
        # shuffle (the two-step-encode discipline below); broadcast
        # centroid join, map-side.
        return assign(
            repartition_for_compute(corpus), cent_rows, "candidate_id", 1, id_col, vec_col
        ).join(F.broadcast(cent_df), "cell_id").select(
            "candidate_id",
            "cell_id",
            residual_expr(
                F.col("__vec"), F.col("__norm"), F.col("__cu")
            ).alias("__resid"),
        )

    if codebooks is not None:
        cbs = codebooks
    elif residual:
        if memoize:
            cbs = memoized_literal(
                ("pq_resid_cbs", corpus_cache_key, n_cells, n_subspaces,
                 n_codes, id_col, vec_col),
                lambda: pq_residual_anchor_codebooks(
                    assigned_resids(), n_subspaces, n_codes
                ),
            )
        else:
            cbs = pq_residual_anchor_codebooks(
                assigned_resids(), n_subspaces, n_codes
            )
    elif memoize:
        cbs = memoized_literal(
            ("pq_anchor_cbs", corpus_cache_key, n_subspaces, n_codes, id_col, vec_col),
            lambda: pq_anchor_codebooks(corpus, n_subspaces, n_codes, id_col, vec_col),
        )
    else:
        cbs = pq_anchor_codebooks(corpus, n_subspaces, n_codes, id_col, vec_col)
    dim = len(cbs) * len(cbs[0][0])
    if codebooks is not None:
        # Caller-supplied books define the geometry; the corpus width
        # must match or F.slice mis-encodes silently — same fail-fast
        # `append_to_ivfpq_index` performs against persisted books.
        bad = corpus.filter(F.size(F.col(vec_col)) != dim).limit(1).count()
        if bad:
            raise ValueError(
                f"build_ivfpq_index: corpus vectors must have dim={dim} "
                f"(= n_subspaces × sub_dim of the supplied codebooks)"
            )

    if residual:
        coded = (
            assigned_resids()
            .repartition("cell_id")
            .select(
                "candidate_id",
                "cell_id",
                pq_encode(F.col("__resid"), cbs).alias("pq"),
            )
        )
    else:
        coded = (
            assign(
                repartition_for_compute(corpus), cent_rows, "candidate_id", 1, id_col, vec_col
            )
            .select(
                "candidate_id",
                "cell_id",
                _unit(F.col("__vec"), F.col("__norm")).alias("__unit"),
            )
            .repartition("cell_id")
            .select(
                "candidate_id",
                "cell_id",
                pq_encode(F.col("__unit"), cbs).alias("pq"),
            )
        )
    meta_text = json.dumps(
        _with_extra_meta(
            {
                "kind": "ivfpq",
                "dim": dim,
                "n_cells": n_cells,
                "n_subspaces": len(cbs),
                "n_codes": len(cbs[0]),
                "codebooks": json.dumps(
                    [[[float(x) for x in code] for code in book] for book in cbs]
                ),
                "centroids": json.dumps(
                    [[int(c), list(map(float, v)), float(n)] for c, v, n in cent_rows]
                ),
                **({"residual": 1} if residual else {}),
            },
            extra_meta,
        )
    )
    live_name = _publish_codes(spark, path, coded, meta_text)
    prime_memoized_literal(("ivfsq_codes_dir", path), live_name)
    prime_memoized_literal(
        ("ivfpq_meta", path, live_name),
        (cbs, cent_rows, dim, n_cells, bool(residual)),
    )


def _read_ivfpq_meta(spark: SparkSession, path: str, name: str):
    """(codebooks, cent_rows, dim, n_cells, residual) for generation
    ``name`` of the IVF-PQ index at ``path`` — `_read_index_meta`'s
    contract (same-session primed value keyed by generation, else the
    generation's on-disk geometry; kind-guarded both ways). The
    5th element (round 12) is the residual-encoding flag: serving
    residual codes with raw ADC tables — or vice versa — would be
    silently wrong, so the geometry carries it and the serve
    dispatches on it; legacy metas predate the field and are raw."""
    from .util import peek_memoized_literal

    primed = peek_memoized_literal(("ivfpq_meta", path, name))
    if primed is not None:
        return primed
    meta = json.loads(_read_meta_text(spark, path, name))
    kind = meta.get("kind", "ivfsq")
    if kind != "ivfpq":
        raise ValueError(
            f"index at {path} ({name}) is kind={kind!r}, not ivfpq — "
            "serve it with the matching search function"
        )
    cbs = [
        [[float(x) for x in code] for code in book]
        for book in json.loads(meta["codebooks"])
    ]
    cent_rows = [
        (int(c), [float(x) for x in v], float(n))
        for c, v, n in json.loads(meta["centroids"])
    ]
    return (
        cbs,
        cent_rows,
        int(meta["dim"]),
        int(meta["n_cells"]),
        bool(meta.get("residual", 0)),
    )


def search_ivfpq_index(
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
    """Serve top-k from a persisted IVF-PQ index: resolve the live
    generation ONCE (codes + geometry as one unit — the round-9
    consistency rule), assign the query batch to its ``n_probe``
    cells with the persisted centroids, compute each query's ADC
    table ONCE from the persisted codebooks, push the probed cell ids
    into the codes scan as a partition filter, and rank candidates on
    the quantized squared-L2 — M table lookups per (candidate, query)
    pair, no vector math in the scan. Results are BIT-IDENTICAL to
    the in-memory `pq.ivfpq_topk` under the same geometry (same
    assignment, same bound-slice ADC folds via `pq.pq_adc_table`,
    same `pq.adc_sum` add order, same rounding and tiebreaks) —
    asserted in tests/test_pq_index.py; the persisted kind only moves
    where the codes live.

    ``allowed``: pre-filter semantics on the pruned scan, exactly
    `search_ivfsq_index`'s contract. ``rerank`` + ``vectors``: the
    EXACT cosine re-rank of an overfetched ADC shortlist — raw
    vectors join through the BROADCAST shortlist (never
    corpus-shaped work; the round-10 rescore discipline), per-pair
    expression identical to `pq.ivfpq_topk(rerank=...)`'s so the
    oracle replay composes unchanged. Output: (query_id,
    candidate_id, adc_dist, rank), or cos_sim in place of adc_dist
    when reranked."""
    from ..functions.vectors import dot, l2_norm
    from .pq import _unit, adc_sum, pq_adc_table
    from .similarity import ivf_assign_literal
    from .util import hof_bind

    live_name = _resolve_codes_name(spark, path)
    cbs, cent_rows, _dim, _nc, residual = _read_ivfpq_meta(
        spark, path, live_name
    )
    n_sub = len(cbs)

    q = ivf_assign_literal(
        queries, cent_rows, "query_id", n_probe, id_col, vec_col
    )
    if residual:
        # residual geometry (round 12, §7s): the ADC table is per
        # (query, probed cell) from q_unit − c_unit(cell) — the cell
        # equi-join below already pairs each candidate with its own
        # cell's table, the classic IVF-ADC serve shape.
        from .pq import residual_cent_df, residual_expr

        q = q.join(
            F.broadcast(residual_cent_df(spark, cent_rows)), "cell_id"
        ).select(
            "query_id",
            "cell_id",
            hof_bind(
                residual_expr(F.col("__vec"), F.col("__norm"), F.col("__cu")),
                lambda r: pq_adc_table(r, cbs),
            ).alias("dtab"),
        )
    else:
        q = q.select(
            "query_id",
            "cell_id",
            hof_bind(
                _unit(F.col("__vec"), F.col("__norm")),
                lambda u: pq_adc_table(u, cbs),
            ).alias("dtab"),
        )
    probed = sorted(
        {r["cell_id"] for r in q.select("cell_id").distinct().collect()}
    )
    codes = spark.read.parquet(f"{path}/{live_name}").filter(
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
        "query_id", "candidate_id", F.round(adc_sum(n_sub), 6).alias("adc_dist")
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("candidate_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w).cast("long"))
    if rerank is None:
        return ranked.filter(F.col("rank") <= k).select(
            "query_id", "candidate_id", "adc_dist", "rank"
        )
    if vectors is None:
        raise ValueError(
            "search_ivfpq_index(rerank=...) needs `vectors` — a frame "
            f"with ({id_col}, {vec_col}) to score the shortlist exactly "
            "(the index stores codes, not vectors)"
        )
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    shortlist = ranked.filter(F.col("rank") <= rerank).select(
        "query_id", "candidate_id"
    )
    # Raw vectors through the broadcast shortlist; per-pair expression
    # identical to pq.ivfpq_topk's rescore (dot over the norm product
    # on RAW vectors — NOT the SQ serve's unit-dot spelling; the PQ
    # oracle's rescore block replays this exact form).
    cv = vectors.select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("c_vec")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    cos = dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("q_norm") * l2_norm(F.col("c_vec"))
    )
    rescored = (
        cv.join(F.broadcast(shortlist), "candidate_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "candidate_id", F.round(cos, 6).alias("cos_sim"))
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("candidate_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )


def search_sharded_indexes(
    spark: SparkSession,
    paths: list[str],
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """FAN-OUT serve over a list of SHARD indexes (round 13): each
    shard is an independent persisted IVF-SQ8 index over its own
    corpus slice (its own stats/cells/centroids — the 100 TB
    deployment shape: one index per ingest window or tenant, built
    and retired independently, never one monolithic fit); a query
    runs the standard pruned serve against EVERY shard and the
    per-shard top-k lists merge to a global top-k on the serve's own
    key (sq_sim DESC, candidate_id ASC).

    Exact w.r.t. the per-shard serves: shards partition the corpus
    (an id lives in exactly one shard), and the global top-k of the
    union is contained in the union of per-shard top-k lists
    (monotone merge — the s13-certified local lists are sufficient),
    so fanning out with the SAME k loses nothing. Cross-shard scores
    are comparable the way any SQ8 scores are: each is that shard's
    quantized approximation of the same rounded unit-dot.

    Scale: each shard's scan stays partition-pruned to its probed
    cells (the s13 plan — nothing about fan-out widens a shard's
    read), the union is k×|shards| rows per query (serving-contract
    sized), and shards are independent jobs — a hot shard bounds
    latency, not total work. ``allowed`` pre-filters candidates
    inside every shard's scan (s17 semantics). Returns
    (query_id, candidate_id, sq_sim, rank) like the single-index
    serve."""
    from functools import reduce

    if not paths:
        raise ValueError("search_sharded_indexes needs at least one shard")
    parts = [
        search_ivfsq_index(
            spark, p, queries, k=k, n_probe=n_probe,
            id_col=id_col, vec_col=vec_col, allowed=allowed,
        ).select("query_id", "candidate_id", "sq_sim")
        for p in paths
    ]
    merged = reduce(DataFrame.unionByName, parts)
    w = W.partitionBy("query_id").orderBy(
        F.desc("sq_sim"), F.asc("candidate_id")
    )
    return (
        merged.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "sq_sim", "rank")
    )


def index_cell_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-cell population of a persisted index — the operational
    cell-balance diagnostic (round 11): rows-per-cell skew is what
    decides whether a probed-cell scan is balanced work or one hot
    partition, and whether ``n_probe``/salting decisions transfer
    from the fit corpus to production traffic. Reads the LIVE codes
    parquet (both kinds — the diagnostic never touches geometry, only
    the ``cell_id`` partition column) and aggregates counts:
    (cell_id, n_rows), one shuffle over a column-pruned scan of the
    partition column alone — metadata-cheap at any index size.

    Hash-checked as s34: the oracle recomputes the assignment
    relationally (the c_assign CTE), so a green row certifies the
    ON-DISK partition layout itself — every vector present exactly
    once, in exactly the cell the geometry assigns (a dropped or
    double-written shard fails the row, which makes this the cheap
    post-append/compact integrity probe at deployment too)."""
    live = _resolve_codes_name(spark, path)
    codes = spark.read.parquet(f"{path}/{live}")
    return codes.groupBy(F.col("cell_id").cast("long").alias("cell_id")).agg(
        F.count("*").alias("n_rows")
    )


def index_accretion_stats(spark: SparkSession, path: str) -> dict:
    """File-accretion profile of the LIVE codes generation — the
    OTHER maintenance monitor (round 13, VERDICT r12 #5), sibling to
    `index_cell_stats` (row balance) and the s16 drift query
    (geometry decay): every append adds one file per touched cell
    partition, so files-per-cell — not bytes — is what degrades the
    probed-cell scan into file-open overhead at scale. One recursive
    listing call (driver-side, NameNode/LIST-page-served — no Spark
    job); cell membership is parsed from the partition directory
    names the codes layout already carries. Returns ``{"n_files",
    "n_cells", "max_files_per_cell"}``."""
    from ..sources.fs import fs_list_files

    per_cell: dict[str, int] = {}
    live = f"{path}/{_resolve_codes_name(spark, path)}"
    for fpath, _sz in fs_list_files(spark, live, ".parquet"):
        cell = next(
            (seg for seg in fpath.split("/") if seg.startswith("cell_id=")),
            "",
        )
        per_cell[cell] = per_cell.get(cell, 0) + 1
    return {
        "n_files": sum(per_cell.values()),
        "n_cells": len(per_cell),
        "max_files_per_cell": max(per_cell.values(), default=0),
    }


def compact_if_accreted(
    spark: SparkSession, path: str, max_files_per_cell: int = 2
) -> tuple[bool, dict]:
    """The ACCRETION-SCHEDULE trigger: compact the index iff any cell
    partition has accreted more than ``max_files_per_cell`` files —
    the decision rule a nightly maintenance job runs after streaming
    ingest (`ingest_vector_stream` / the staged exactly-once sink)
    has been appending shards all day. Compaction is layout-only
    (`compact_index` — pointer-file commit, geometry carried forward
    byte-identically), so firing it never changes results, only scan
    economics; NOT firing it is the common fast path (one listing
    call, no Spark job, no new generation). Returns
    ``(fired, stats_before)``."""
    stats = index_accretion_stats(spark, path)
    if stats["max_files_per_cell"] > max_files_per_cell:
        # hand the monitor's listing down — the compact would
        # otherwise re-walk the very accreted tree the monitor just
        # counted (round 14; one listing per fired trigger, not two)
        compact_index(spark, path, files_before=stats["n_files"])
        return True, stats
    return False, stats


def _sniff_kind(spark: SparkSession, path: str) -> str:
    """The index's own kind, primes first, sidecar cold — the
    `append_index` / `compact_index` discipline (never interpret
    geometry at the dispatch layer)."""
    from .util import peek_memoized_literal

    live = _resolve_codes_name(spark, path)
    if peek_memoized_literal(("ivfpq_meta", path, live)) is not None:
        return "ivfpq"
    if peek_memoized_literal(("ivfsq_meta", path, live)) is not None:
        return "ivfsq"
    return json.loads(_read_meta_text(spark, path, live)).get("kind", "ivfsq")


def index_recall_probe(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the persisted index against EXACT ground truth on a
    probe query set — the monitoring metric the REBUILD schedule runs
    on (round 13, VERDICT r12 #5's other half: s16's drift monitor
    compares two INDEX flows and needs both built; this probe needs
    only the live index plus one exact pass over ``vectors`` for the
    probe queries). Kind-agnostic (meta sniff, never geometry).
    Returns `operators/similarity.topk_recall`'s
    (query_id, n_hits, recall) frame.

    Scale contract: the exact side is deliberately O(probe_queries ×
    corpus) — that IS what a recall probe costs; keep the probe set
    serving-contract-sized (tens of queries) and/or point ``vectors``
    at a sampled sub-corpus, exactly the s07 rule."""
    from .similarity import brute_force_topk, topk_recall

    if _sniff_kind(spark, path) == "ivfpq":
        served = search_ivfpq_index(
            spark, path, queries, k=k, n_probe=n_probe,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        served = search_ivfsq_index(
            spark, path, queries, k=k, n_probe=n_probe,
            id_col=id_col, vec_col=vec_col,
        )
    exact = brute_force_topk(queries, vectors, k=k, id_col=id_col, vec_col=vec_col)
    return topk_recall(exact, served, k=k)


def rebuild_if_drifted(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float = 0.9,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **build_kw,
) -> tuple[bool, float]:
    """The DRIFT-SCHEDULE trigger, completing the maintenance pair
    (round 13): `compact_if_accreted` fires on file accretion
    (layout), this fires on recall decay (geometry) — REBUILD the
    index from ``corpus`` when `index_recall_probe`'s mean recall@k
    over ``queries`` falls below ``threshold``. Frozen-geometry
    appends decay recall as the corpus drifts from the fitted
    quantizer (SCALE.md §7i; s16); the rebuild refits and commits
    through the staged-generation protocol, so readers mid-scan are
    never disturbed and a crash leaves the old index serving. The
    kind is preserved (meta sniff); ``build_kw`` flows to the kind's
    build (n_cells=None re-sizes √n by default). Returns
    (fired, mean_recall_before)."""
    probe = index_recall_probe(
        spark, path, queries, corpus, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )
    mean = float(probe.agg(F.avg("recall").alias("r")).first()["r"])
    if mean >= threshold:
        return False, mean
    if _sniff_kind(spark, path) == "ivfpq":
        build_ivfpq_index(
            corpus, path, n_cells=build_kw.pop("n_cells", None),
            id_col=id_col, vec_col=vec_col, **build_kw,
        )
    else:
        build_ivfsq_index(
            corpus, path, n_cells=build_kw.pop("n_cells", None),
            id_col=id_col, vec_col=vec_col, **build_kw,
        )
    return True, mean
