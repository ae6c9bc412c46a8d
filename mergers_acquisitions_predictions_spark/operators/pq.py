"""Product quantization (PQ) for embedding search at scale — the
compression layer of an IVF-PQ index (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search").

Why this exists at 100 TB: a raw float32 64-dim embedding is 256
bytes; its PQ code here is 8 bytes (one code per subspace). The
corpus-side index a search fleet keeps hot shrinks 32×, and the
asymmetric-distance (ADC) scan compares a full-precision query
against those codes with M table lookups per candidate instead of a
64-dim dot product. Composition with the IVF coarse quantizer
(`operators/similarity.ivf_assign`) keeps the scan sub-linear: only
the query's ``n_probe`` cells are ADC-scanned.

Everything is SPHERICAL: vectors are L2-normalized before encoding,
so squared-L2 ADC distance ranks identically to cosine (‖u−v‖² =
2−2·cos on the unit sphere) and the cosine-based IVF cells are
metric-consistent with the PQ fine stage.

Determinism/oracle contract: codebooks are subspace slices of the
``n_codes`` lowest-id corpus vectors (the `ivf_centroids` anchor
trick), encoding breaks argmin ties toward the lowest code on
6-dp-rounded distances, and every float reduction is a left-to-right
double fold — so DuckDB replays codebooks, codes, and ADC ranks
value-exactly (plans/lsh_oracle.ivfpq_topk_sql), making even this
approximate index hash-checkable. A production deployment swaps the
anchor codebooks for per-subspace k-means (train once, persist —
exactly like `kmeans_centroids` vs `ivf_centroids`); every join
shape below is unchanged.

No reference analogue (the reference has no vector search at all) —
this is part of the training-data-pipeline surface SURVEY §7 Phase 4
calls for alongside sign-LSH (similarity.lsh_topk) and IVF
(similarity.ivf_topk).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.vectors import l2_norm
from .util import hof_bind, repartition_for_compute


def pq_anchor_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the ``n_codes`` lowest-id corpus
    vectors, L2-normalized, sliced into ``n_subspaces`` equal
    subvectors → ``codebooks[m][c]`` is code ``c`` of subspace ``m``.

    Driver-sized by construction (n_codes rows — same class as
    `kmeans_centroids` materializing fitted centers); the one tiny
    collect IS the index-build step a deployment persists once.
    Normalization happens here in Python IEEE doubles with a
    left-to-right squared-sum fold — bit-identical to both the
    engine's `l2_norm` and the oracle's `list_sum` spelling, which is
    what lets DuckDB regenerate the very same codebook values from
    the parquet instead of needing literals."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    )
    dim = len(rows[0][vec_col])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    units: list[list[float]] = []
    for r in rows:
        v = [float(x) for x in r[vec_col]]
        acc = 0.0
        for x in v:  # left-to-right, matches l2_norm / SQL list_sum
            acc += x * x
        nrm = math.sqrt(acc)
        units.append([x / nrm for x in v])
    return [
        [u[m * sub : (m + 1) * sub] for u in units] for m in range(n_subspaces)
    ]


def _unit(vec: Column, norm: Column) -> Column:
    """Normalize an array<float> to unit double: x/‖v‖ per element."""
    return F.transform(vec, lambda x: x.cast("double") / norm)


def residual_cent_df(spark, cent_rows) -> DataFrame:
    """The UNIT-normalized centroid table ``(cell_id, __cu)`` for the
    residual-encoding routes (round 12, SCALE.md §7s) as a
    driver-sized single-partition frame: residual encode/serve joins
    it broadcast on ``cell_id`` (cell ids are anchor vec_ids — NOT
    dense — so a positional literal lookup would be wrong). The
    division happens in Python IEEE doubles — bit-identical to the
    oracle's ``cvec[i]/cnorm`` and to computing it plan-side."""
    from .util import local_rows_df

    return local_rows_df(
        spark,
        [
            (int(c), [float(x) / float(n) for x in v])
            for c, v, n in cent_rows
        ],
        "cell_id BIGINT, __cu ARRAY<DOUBLE>",
    )


def residual_expr(vec: Column, norm: Column, cu: Column) -> Column:
    """x_unit − c_unit(cell(x)) — the residual the compressed fine
    stage encodes under ``residual=True`` (classic IVF-ADC, Jégou et
    al. 2011 §IV.B). ADC between two residuals of the SAME cell
    estimates the same ‖q_u − x_u‖² the raw route estimates, but the
    books only have to code the within-cell spread — §7s measured
    +0.16 recall@5 at equal bytes on the structured corpus (and a
    LOSS on the unstructured one: opt-in, never a default)."""
    return F.zip_with(_unit(vec, norm), cu, lambda a, b: a - b)


def pq_residual_anchor_codebooks(
    resid_frame: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "candidate_id",
    res_col: str = "__resid",
) -> list[list[list[float]]]:
    """`pq_anchor_codebooks` for the residual route: the ``n_codes``
    lowest-id RESIDUAL vectors, sliced per subspace — deterministic
    and oracle-replayable (the oracle recomputes the same residuals
    relationally and takes the same lowest-id LIMIT). The residuals
    arrive computed (assignment + centroid subtract), so this is one
    driver-sized collect like the raw anchor fit; a deployment swaps
    in per-subspace k-means over residuals exactly as for the raw
    kind (scripts/scale_pq_residual.fit_books_on)."""
    rows = (
        resid_frame.select(id_col, res_col)
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    )
    dim = len(rows[0][res_col])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    res = [[float(x) for x in r[res_col]] for r in rows]
    return [
        [v[m * sub : (m + 1) * sub] for v in res] for m in range(n_subspaces)
    ]


def _cb_literal(codebooks: list[list[list[float]]]) -> Column:
    """The codebooks as ONE nested array<array<array<double>>> literal
    column. Keeping the codebook a literal (not a join) keeps
    encoding map-side; keeping it ONE column (not n_subspaces x
    n_codes unrolled sub-expressions) keeps the Catalyst tree small —
    the first formulation here unrolled 128 aggregate expressions and
    spent seconds per query in driver-side analysis alone. The
    ~1k-element literal itself is memoized per session (py4j
    construction cost — util.memoized_literal, PERF.md s03 lesson)."""
    from .util import memoized_literal

    from .util import double_matrix_literal

    frozen = tuple(tuple(tuple(map(float, code)) for code in book) for book in codebooks)
    return memoized_literal(
        ("pq_codebooks", frozen),
        # one F.expr parse per subspace book (n_subspaces py4j calls
        # instead of one per float — util.double_array_literal's
        # round-8 lesson applied to the 3-level codebook shape)
        lambda: F.array(*[double_matrix_literal(book) for book in codebooks]),
    )


def _sqdist(u_slice: Column, code: Column) -> Column:
    """Squared L2 between a unit-vector slice and a codebook
    subvector: left-to-right double fold, the oracle's list_sum
    order."""
    return F.aggregate(
        F.zip_with(u_slice, code, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    unit_vec: Column, codebooks: list[list[list[float]]]
) -> Column:
    """PQ codes for a unit vector: per subspace, the argmin-distance
    code over the codebook, ties → lowest code on 6-dp-rounded
    distances (`array_position` returns the FIRST minimum — the same
    tiebreak the oracle's `list_position` applies). Returns
    ``array<int>`` of length ``n_subspaces`` — the 8-byte compressed
    representation that replaces the 256-byte vector corpus-side.

    One nested higher-order-function expression (transform over
    subspaces -> transform over codes -> zip_with fold over dims)
    against the literal codebook column — semantically identical to
    unrolling every (m, c) pair but ~100x smaller as a Catalyst
    tree (the unrolled form cost seconds of driver-side analysis
    per query; see _cb_literal).

    Evaluation-count discipline (round 10, the §7o-r9 interpreted-HOF
    lesson): the subspace SLICE and the per-subspace DISTANCE array
    are each bound ONCE as lambda variables (`util.hof_bind`) —
    composing them inline re-evaluated the slice per code and the
    whole K-distance array twice (argmin = array_position +
    array_min), and when the CALLER splices a composed unit-transform
    into ``unit_vec`` the re-evaluations multiply through it
    (M·K·d-ish work per row). Callers should pass ``unit_vec`` as a
    concrete attribute or bind it the same way (see `ivfpq_topk`).
    Bit-identical — same arithmetic, fewer evaluations."""
    sub = len(codebooks[0][0])
    n_sub = len(codebooks)
    cbs = _cb_literal(codebooks)

    def code_of(m: Column) -> Column:
        return hof_bind(
            F.slice(unit_vec, m * sub + 1, sub),
            lambda sl: hof_bind(
                F.transform(
                    F.element_at(cbs, (m + 1).cast("int")),
                    lambda code: F.round(_sqdist(sl, code), 6),
                ),
                lambda dd: (F.array_position(dd, F.array_min(dd)) - 1).cast(
                    "int"
                ),
            ),
        )

    return F.transform(F.sequence(F.lit(0), F.lit(n_sub - 1)), code_of)


def pq_adc_table(
    unit_vec: Column, codebooks: list[list[list[float]]]
) -> Column:
    """Per-query ADC distance table: ``dtab[m][c]`` = squared L2
    between the query's subspace-``m`` slice and code ``c`` — the
    classic PQ trick that turns each candidate's distance into M
    array lookups. Computed ONCE per query row (M*K doubles, ~1 KB),
    then carried through the broadcast to every probe pair. The
    subspace slice is bound once per m (`util.hof_bind`) — inline it
    re-sliced (and, for a composed ``unit_vec``, re-derived) the
    query vector per code."""
    sub = len(codebooks[0][0])
    n_sub = len(codebooks)
    cbs = _cb_literal(codebooks)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        lambda m: hof_bind(
            F.slice(unit_vec, m * sub + 1, sub),
            lambda sl: F.transform(
                F.element_at(cbs, (m + 1).cast("int")),
                lambda code: _sqdist(sl, code),
            ),
        ),
    )


def adc_sum(n_sub: int) -> Column:
    """Σ_m dtab[m][pq[m]] over ``n_sub`` subspaces as a left-to-right
    add chain — the oracle's outer `list_sum` order. Reads the
    ``dtab`` (per-query ADC table) and ``pq`` (candidate codes)
    columns of the joined probe frame; shared by the in-memory
    `ivfpq_topk` scan and the persisted `ann_index.search_ivfpq_index`
    serve so the two paths stay bit-identical by construction."""
    adc: Column = F.lit(0.0)
    for m in range(n_sub):
        adc = adc + F.element_at(
            F.element_at("dtab", m + 1), F.element_at("pq", m + 1) + 1
        )
    return adc


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int | None = 16,
    n_probe: int = 2,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    rerank: int | None = None,
    corpus_cache_key: tuple | None = None,
    residual: bool = False,
) -> DataFrame:
    """Approximate top-k via IVF-PQ: cosine IVF cells prune the
    candidate space (equi-join on cell_id — corpus × query never
    cross-joins), then an ADC scan ranks each query's probed
    candidates by quantized squared-L2 on the unit sphere.

    ``rerank=R`` adds the production third stage: the ADC scan keeps
    a per-query shortlist of R candidates (cheap — codes only), then
    EXACT cosine re-scores just those R full vectors and the top-k
    comes from the re-ranked list. This recovers the quantization
    loss almost entirely (measured here: raw ADC recall@5 0.25 vs
    the 0.81 IVF ceiling; R=8k re-ranked 0.80) while still never
    touching more than n_probe cells of codes + R vectors per query.
    Output schema switches to (query_id, candidate_id, cos_sim,
    rank) — the same contract as the other ANN paths.

    Plan shape for 100 TB: cell assignment + PQ encoding are one
    map-side pass over the corpus (broadcast centroids, literal
    codebooks — in a deployment both are precomputed and the coded
    corpus ``(candidate_id, cell_id, pq)`` is the PERSISTED index: 9
    bytes/vector + the partition key). Queries broadcast with their
    precomputed ADC tables; per candidate the score is M element_at
    lookups + M-1 adds — no vector math in the scan. The only
    shuffle is the per-query top-k window, keyed by query_id.

    Returns (query_id, candidate_id, adc_dist, rank); adc_dist is the
    6-dp-rounded quantized distance (≈ 2−2·cos), rank ties broken by
    candidate_id — deterministic, DuckDB-replayable end to end.

    ``corpus_cache_key``: opt-in session memoization of the index
    artifacts (count, centroid rows, the PQ-coded corpus frame) per
    (corpus, config) — the usual contract: the key identifies corpus
    content, results are identical either way. Only applies to the
    coded frame when ``codebooks`` is None (caller-supplied books
    have content the key cannot see).

    ``residual=True`` (round 12 — SCALE.md §7s): the fine stage
    encodes x_unit − c_unit(cell(x)) instead of x_unit, and the
    query's ADC table is computed PER PROBED CELL from the matching
    query residual (the classic IVF-ADC serve shape — n_probe small
    tables per query instead of one; the cell equi-join already
    pairs each candidate with its own cell's table). Same bytes,
    same join shapes, same ranking contract; §7s measured +0.16
    recall@5 on the structured corpus and a LOSS on the unstructured
    one — opt-in by design. Anchor books come from the lowest-id
    RESIDUALS (`pq_residual_anchor_codebooks`); caller-supplied
    ``codebooks`` must have been fitted on residuals."""
    from .similarity import auto_cells, ivf_assign_literal, ivf_centroids
    from .util import memoized_frame, memoized_literal

    memoize = corpus_cache_key is not None
    if n_cells is None:  # √n sizing policy — see similarity.auto_cells
        n = (
            memoized_literal(
                ("count", corpus_cache_key, id_col), lambda: corpus.count()
            )
            if memoize
            else corpus.count()
        )
        n_cells = auto_cells(n)

    # centroids as driver constants (n_cells rows — the same class of
    # collect as the codebooks above): assignment then needs NO
    # broadcast fan-out join and NO per-vector argmax window over the
    # corpus — the whole index build is one map-side pass.
    def collect_cents():
        return [
            (r["cell_id"], [float(x) for x in r["cent_vec"]], float(r["cent_norm"]))
            for r in ivf_centroids(corpus, n_cells, id_col, vec_col).collect()
        ]

    if memoize:
        cent_rows = memoized_literal(
            ("ivf_cent_rows", corpus_cache_key, n_cells, id_col, vec_col),
            collect_cents,
        )
    else:
        cent_rows = collect_cents()

    cent_df = (
        residual_cent_df(corpus.sparkSession, cent_rows) if residual else None
    )

    def corpus_resids() -> DataFrame:
        # residual computed BEFORE the downstream shuffle/encode so it
        # lands as a concrete attribute (the §7o-r9 discipline); the
        # centroid join is broadcast and map-side.
        return ivf_assign_literal(
            repartition_for_compute(corpus),
            cent_rows,
            "candidate_id",
            1,
            id_col,
            vec_col,
        ).join(F.broadcast(cent_df), "cell_id").select(
            "candidate_id",
            "cell_id",
            residual_expr(
                F.col("__vec"), F.col("__norm"), F.col("__cu")
            ).alias("__resid"),
        )

    if residual:
        cbs = (
            codebooks
            if codebooks is not None
            else pq_residual_anchor_codebooks(
                corpus_resids(), n_subspaces, n_codes
            )
        )
    else:
        cbs = (
            codebooks
            if codebooks is not None
            else pq_anchor_codebooks(corpus, n_subspaces, n_codes, id_col, vec_col)
        )
    n_sub = len(cbs)

    def corpus_codes() -> DataFrame:
        if residual:
            return corpus_resids().select(
                "candidate_id",
                "cell_id",
                hof_bind(F.col("__resid"), lambda r: pq_encode(r, cbs)).alias(
                    "pq"
                ),
            )
        return ivf_assign_literal(
            repartition_for_compute(corpus),
            cent_rows,
            "candidate_id",
            1,
            id_col,
            vec_col,
        ).select(
            "candidate_id",
            "cell_id",
            # unit bound ONCE (util.hof_bind): spliced inline it would
            # re-derive the full unit transform per (subspace, code)
            # read inside pq_encode — the §7o-r9 blowup shape.
            hof_bind(
                _unit(F.col("__vec"), F.col("__norm")),
                lambda u: pq_encode(u, cbs),
            ).alias("pq"),
        )

    if memoize and codebooks is None:
        c = memoized_frame(
            (
                "ivfpq_codes",
                corpus_cache_key,
                n_cells,
                n_subspaces,
                n_codes,
                id_col,
                vec_col,
                *(("resid",) if residual else ()),
            ),
            corpus_codes,
        )
    else:
        c = corpus_codes()
    q = ivf_assign_literal(
        queries, cent_rows, "query_id", n_probe, id_col, vec_col
    )
    if residual:
        q = q.join(F.broadcast(cent_df), "cell_id").select(
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

    joined = c.join(F.broadcast(q), "cell_id").filter(
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

    from ..functions.vectors import dot

    shortlist = ranked.filter(F.col("rank") <= rerank).select(
        "query_id", "candidate_id"
    )
    # RAW vectors through the BROADCAST shortlist; norms only for the
    # survivors (round 10 — the same corpus-shaped-rescore fix as
    # `ann_index.search_ivfsq_index`: the previous shape computed
    # l2_norm for every corpus row before the join and left the join
    # strategy to size estimates, which shuffled the corpus). The
    # per-pair expression is unchanged — dot/(q_norm·c_norm), same
    # fold orders — so values stay bit-identical and the oracle
    # replay is untouched.
    cv = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
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


def pq_kmeans_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    fit_sample_per_code: int | None = 6250,
    fit_floor: int | None = None,
    corpus_cache_key: tuple | None = None,
) -> list[list[list[float]]]:
    """LEARNED PQ codebooks — the production replacement for
    `pq_anchor_codebooks`' deterministic anchor slices, exactly as
    `kmeans_centroids` is for `ivf_centroids`: per subspace, k-means
    (fixed seed) fits ``n_codes`` centroids to the distribution of
    that subspace's unit-vector slices, minimizing the quantization
    error the ADC distance carries. Same nested-list shape, so
    `pq_encode`/`pq_adc_table`/`ivfpq_topk` consume it unchanged via
    the ``codebooks=`` parameter.

    The training input is materialized ONCE (all subspace slices in
    one cached frame); each of the ``n_subspaces`` fits is a
    distributed MLlib Lloyd run over its slice column, and the
    resulting centers are driver-sized (n_codes × sub_dim floats per
    subspace) by construction — the index-build artifact a deployment
    persists. The fit itself is iterative MLlib; since round 5 the s09
    configuration is VALUE-checked anyway via the artifact recipe —
    the learned codebooks are materialized and the oracle replays
    encode + ADC + re-rank from the same files — while s08 (anchor
    codebooks) hash-checks the identical join shapes with fully
    regenerable constants.

    SAMPLED FIT (round 11, `kmeans_centroids`' recipe promoted —
    SCALE.md §7q measured it: books fitted on a 100k sample were the
    knob that fixed the ADC cut, fit 26 s): Lloyd cost here is
    n_subspaces × max_iter × n × n_codes distances over the FULL
    corpus; when the corpus exceeds ``fit_sample_per_code × n_codes``
    rows (default 6250 × 16 = the measured 100k sample), each fit
    runs on ONE deterministic content-keyed sample of ~that size
    (``xxhash64(id) % m == 0`` — partitioning-independent; the slices
    frame is built from the sample, so all ``n_subspaces`` fits share
    it) and the learned books encode the FULL corpus through the
    unchanged map-side `pq_encode` — M·K·d per row, a cost that does
    NOT shrink with sampling (the deployment note: encode, not fit,
    dominates once books are frozen). The 100k absolute floor keeps
    small corpora on the full fit; ``fit_floor`` overrides it
    (``0`` forces the sampled branch — how s29 exercises the
    deployment path at oracle scale); ``None`` disables sampling.

    Sizing the sample needs the corpus row count, but small corpora —
    most callers at oracle scale — never take the sampled branch, and
    an unconditional full ``count()`` job per fit just to learn that
    was waste (ADVICE r11). The count is lazy now:
    ``corpus_cache_key`` reuses the index builds' memoized count under
    the SAME key (``("count", key, id_col)`` — a following
    `build_ivfpq_index(corpus_cache_key=...)` then pays no count at
    all); otherwise a ``limit(threshold+1).count()`` probe — an
    early-exit scan bounded by the threshold, never corpus-shaped —
    decides the branch, and only a corpus that actually exceeds the
    threshold pays the full count that sizes its sampling modulus
    (the branch where that count is genuinely needed)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from .similarity import _FIT_SAMPLE_FLOOR
    from .util import fit_released, memoized_literal

    first = corpus.select(vec_col).first()
    dim = len(first[vec_col])
    if fit_sample_per_code is not None:
        target = fit_sample_per_code * n_codes
        floor = _FIT_SAMPLE_FLOOR if fit_floor is None else fit_floor
        thresh = max(target, floor)
        if corpus_cache_key is not None:
            n = memoized_literal(
                ("count", corpus_cache_key, id_col), lambda: corpus.count()
            )
        else:
            n = corpus.limit(thresh + 1).count()
            if n > thresh:
                n = corpus.count()
        if n > thresh:
            m = max(2, round(n / target))
            corpus = corpus.filter(F.xxhash64(F.col(id_col)) % m == 0)
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    unit = _unit(F.col(vec_col), l2_norm(F.col(vec_col)))
    slices = corpus.select(
        *[
            array_to_vector(F.slice(unit, m * sub + 1, sub)).alias(f"__s{m}")
            for m in range(n_subspaces)
        ]
    )
    slices = slices.persist()
    try:
        books: list[list[list[float]]] = []
        for m in range(n_subspaces):
            model = fit_released(
                KMeans(
                    k=n_codes, seed=seed + m, maxIter=max_iter, featuresCol=f"__s{m}"
                ),
                slices,
            )
            books.append(
                [[float(x) for x in c] for c in model.clusterCenters()]
            )
        return books
    finally:
        slices.unpersist()


def pq_kmeans_residual_codebooks(
    corpus: DataFrame,
    cent_rows: list[tuple[int, list[float], float]],
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    fit_sample_per_code: int | None = 6250,
    fit_floor: int | None = None,
    corpus_cache_key: tuple | None = None,
    assign_blas: bool = False,
) -> list[list[list[float]]]:
    """LEARNED books for the RESIDUAL kind (round 12 — §7s's winning
    configuration: learned books over residuals read 0.84 recall@5 vs
    0.68 raw at equal bytes on the structured corpus): per subspace,
    k-means over the RESIDUAL slices x_unit − c_unit(cell(x)) — the
    input is NOT re-normalized (a residual is not a direction; the
    §7s script's `fit_books_on` promoted into the API). ``cent_rows``
    is the SAME collected centroid table the index build uses — the
    residuals the books are fitted on must be the residuals the build
    encodes. Sampling contract identical to `pq_kmeans_codebooks`
    (content-keyed xxhash sample, 100k floor, lazy count).

    ``assign_blas`` (round 13 — VERDICT r12 #2): unlike the raw fit,
    the residual fit must CELL-ASSIGN its training rows before it can
    subtract the centroid — an n×cells term the raw fit doesn't have,
    and at 1M×1000 cells the fold-expression assignment made the
    residual fit pay 472 s where the raw fit paid 88 s (§7s-b). The
    flag routes that one step through `ivf_assign_blas` — the exact
    shape `scale_assign_parity` proves bit-safe off tie boundaries —
    and touches NOTHING downstream: residual subtraction, slicing and
    the Lloyd fits consume the same columns either way. Default off,
    matching every other registered-row fold-path default."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from .similarity import (
        _FIT_SAMPLE_FLOOR,
        ivf_assign_blas,
        ivf_assign_literal,
    )
    from .util import fit_released, memoized_literal

    first = corpus.select(vec_col).first()
    dim = len(first[vec_col])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    if fit_sample_per_code is not None:
        target = fit_sample_per_code * n_codes
        floor = _FIT_SAMPLE_FLOOR if fit_floor is None else fit_floor
        thresh = max(target, floor)
        if corpus_cache_key is not None:
            n = memoized_literal(
                ("count", corpus_cache_key, id_col), lambda: corpus.count()
            )
        else:
            n = corpus.limit(thresh + 1).count()
            if n > thresh:
                n = corpus.count()
        if n > thresh:
            m = max(2, round(n / target))
            corpus = corpus.filter(F.xxhash64(F.col(id_col)) % m == 0)
    sub = dim // n_subspaces
    assign = ivf_assign_blas if assign_blas else ivf_assign_literal
    resid = (
        assign(corpus, cent_rows, "__rid", 1, id_col, vec_col)
        .join(
            F.broadcast(residual_cent_df(corpus.sparkSession, cent_rows)),
            "cell_id",
        )
        .select(
            residual_expr(
                F.col("__vec"), F.col("__norm"), F.col("__cu")
            ).alias("__r")
        )
    )
    slices = resid.select(
        *[
            array_to_vector(F.slice(F.col("__r"), m * sub + 1, sub)).alias(
                f"__s{m}"
            )
            for m in range(n_subspaces)
        ]
    ).persist()
    try:
        books: list[list[list[float]]] = []
        for m in range(n_subspaces):
            model = fit_released(
                KMeans(
                    k=n_codes, seed=seed + m, maxIter=max_iter, featuresCol=f"__s{m}"
                ),
                slices,
            )
            books.append(
                [[float(x) for x in c] for c in model.clusterCenters()]
            )
        return books
    finally:
        slices.unpersist()
