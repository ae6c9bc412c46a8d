"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
(north-star training-data-pipeline ops, SURVEY §7 Phase 4).

Design for 100 TB:

- **Exact dedup** groups on a 32-byte md5 fingerprint, never on the
  document body — the shuffle carries fingerprints, not text.
- **MinHash signatures** are computed entirely map-side as column
  expressions (`array_min` over per-shingle hashes) — zero shuffles to
  build signatures for any corpus size.
- **LSH banding** turns the O(n²) near-dup search into an equi-join on
  (band, band_key): only documents agreeing on a whole band meet in a
  shuffle bucket. Shuffle volume is n_docs × n_bands tiny rows.
- **Hash portability**: md5-derived hashes (not xxhash64) so the DuckDB
  oracle can recompute signatures bit-for-bit.

SimHash uses 60-bit integers from the first 15 hex chars of md5 —
reproducible in the oracle via DuckDB's `('0x'||…)::BIGINT`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import shingles, tokenize
from ..functions.textstats import fingerprint
from .util import own_caches, repartition_for_compute

#: (n_bands, rows_per_band) — 8 hash functions total by default.
DEFAULT_BANDS = 4
DEFAULT_ROWS_PER_BAND = 2


def band_config(threshold: float, n_hashes: int = 64) -> tuple[int, int]:
    """(n_bands, rows_per_band) whose S-curve midpoint best matches a
    target Jaccard ``threshold`` within an ``n_hashes`` signature
    budget: the banding collision curve P(candidate) = 1-(1-j^r)^b
    has its steepest point near t* = (1/b)^(1/r); pick the divisor
    pair minimizing |t* - threshold|. Higher thresholds want more
    rows per band (stricter bands), lower thresholds more bands.
    The counterpart of `similarity.auto_planes` for the MinHash path:
    defaults (4×2, t*=0.5) fit the test corpora; a production dedup
    at j≥0.8 with 128 hashes gets ~(16, 8)."""
    best = (DEFAULT_BANDS, DEFAULT_ROWS_PER_BAND)
    best_err = float("inf")
    for r in range(1, n_hashes + 1):
        b = n_hashes // r
        if b < 1:
            break
        t_star = (1.0 / b) ** (1.0 / r) if b > 1 else 1.0
        err = abs(t_star - threshold)
        if err < best_err:
            best, best_err = (b, r), err
    return best


def with_minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = DEFAULT_BANDS * DEFAULT_ROWS_PER_BAND,
    shingle_n: int = 3,
    keep: list[str] | None = None,
) -> DataFrame:
    """Append `sig0..sig{n-1}` MinHash columns. Pure map-side — the
    plan is scan → project(s), no exchange.

    Hash family: sig_i = min over shingles of the i-th 8-hex-char
    slice of md5((i//4):shingle) — each md5 yields FOUR 32-bit
    hashes (8× fewer md5 calls than one-md5-per-hash; measured 7.7 s
    → 0.9 s for 8 sigs over 5000 docs). Lexicographic min over
    fixed-width hex ≡ numeric min, and any SQL engine with md5 can
    recompute it. NULL sigs for shingle-less docs.

    Built as THREE chained selects (tokens → shingle hashes → mins) so
    the expensive shared subexpressions stay single — composing them
    into one select would inline the tokenize+shingle pipeline into
    every sig column (Catalyst's CollapseProject keeps the split
    because the producers are non-cheap)."""
    n_md5 = (n_hashes + 3) // 4
    carried = [id_col, *(keep or [])]
    toks = repartition_for_compute(df).select(
        *carried, tokenize(F.col(text_col)).alias("__tok")
    )
    sh = toks.select(*carried, shingles(F.col("__tok"), shingle_n).alias("__sh"))
    hcat = F.transform(
        "__sh",
        lambda s: F.concat(*[F.md5(F.concat(F.lit(f"{j}:"), s)) for j in range(n_md5)]),
    )
    hs = sh.select(*carried, hcat.alias("__hs"))
    # Closure factory, NOT `lambda h, i=i`: a 2-arg lambda makes
    # pyspark's transform() pass the array index as the second arg.
    def slice_at(i: int):
        return lambda h: F.substring(h, 1 + 8 * i, 8)

    sigs = [
        F.array_min(F.transform("__hs", slice_at(i))).alias(f"sig{i}")
        for i in range(n_hashes)
    ]
    return hs.select(*carried, *sigs)


def banded_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    shingle_n: int = 3,
    corpus_cache_key: tuple | None = None,
) -> DataFrame:
    """(id, band, band_key) LSH banding rows, PERSISTED for batch
    inputs — the shared index structure behind self-join dedup
    (`lsh_candidate_pairs`) and shard-vs-index dedup
    (`incremental_neardup_candidates`). The frame is tiny (n_docs ×
    n_bands short rows) while its lineage — tokenize → shingle → md5
    array-mins over the corpus — is the expensive part; callers
    transfer the cache to their result via own_caches. STREAMING
    inputs band identically but skip the persist (caching a streaming
    frame is illegal; each micro-batch is read once anyway).

    ``corpus_cache_key``: opt-in SESSION-scoped reuse via
    `util.memoized_frame` — the frame is exactly what its own
    docstring calls it, a shared index structure, and five registered
    queries (d02/d06/d09/d14/d19) band the same corpus per
    invocation. The memoized frame outlives any one result (callers
    must NOT own it); key must identify corpus content, the operator
    appends the banding config."""

    def build() -> DataFrame:
        sigs = with_minhash_signatures(
            df, text_col, id_col, n_bands * rows_per_band, shingle_n
        )
        # F.concat (NOT concat_ws): NULL sigs (shingle-less docs) must
        # poison the band key so those docs drop out, matching SQL `||`.
        band_cols = [
            F.concat(
                *_intersperse(
                    [
                        F.col(f"sig{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                    F.lit("|"),
                )
            ).alias(f"band{b}")
            for b in range(n_bands)
        ]
        return (
            sigs.select(id_col, *band_cols)
            .select(
                id_col,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.col(f"band{b}").alias("band_key"),
                            )
                            for b in range(n_bands)
                        ]
                    )
                ).alias("bk"),
            )
            .select(
                id_col,
                F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key"),
            )
            .filter(F.col("band_key").isNotNull())
        )

    if df.isStreaming:
        return build()
    if corpus_cache_key is not None:
        from .util import memoized_frame

        return memoized_frame(
            (
                "minhash_banded",
                corpus_cache_key,
                text_col,
                id_col,
                n_bands,
                rows_per_band,
                shingle_n,
            ),
            build,
        )
    return build().persist()


def incremental_neardup_candidates(
    new_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    shingle_n: int = 3,
    index_is_banded: bool = False,
) -> DataFrame:
    """Near-dup candidates of an INCOMING SHARD against an EXISTING
    corpus index — the nightly-ingest shape: band only the (small) new
    shard and the index, then equi-join new-vs-index on (band,
    band_key). No self-join of the full corpus ever happens; the
    incremental cost is |shard| banding plus a join whose left side is
    shard-sized. Returns (new_id, index_id) distinct pairs; an
    anti-join of the shard against `new_id` yields the admit list.

    ``index_is_banded``: pass True when ``index_df`` IS the persisted
    banded index — the (id, band, band_key) frame `banded_frame`
    produces, written once and appended per admitted shard (see
    tests/test_operators.py for the roundtrip). That is the production
    configuration: the corpus is never re-tokenized or re-hashed on
    ingest, and a parquet index partitioned by ``band`` makes the
    probe a partition-pruned scan. False (default) bands the raw
    index corpus from scratch — same join shape, for one-shot use."""
    nb = banded_frame(new_df, text_col, id_col, n_bands, rows_per_band, shingle_n)
    if index_is_banded:
        ib = index_df
    else:
        ib = banded_frame(index_df, text_col, id_col, n_bands, rows_per_band, shingle_n)
    pairs = (
        nb.selectExpr(f"{id_col} AS new_id", "band", "band_key")
        .join(ib.selectExpr(f"{id_col} AS index_id", "band", "band_key"), ["band", "band_key"])
        .select("new_id", "index_id")
        .distinct()
    )
    caches = (nb, ib) if not index_is_banded else (nb,)
    return own_caches(pairs, *caches)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    shingle_n: int = 3,
    corpus_cache_key: tuple | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash LSH banding.

    signature → band keys (concat of rows_per_band sigs) → explode one
    row per band → self-equi-join on (band, band_key) → distinct pairs
    with a_id < b_id. The join is a plain hash equi-join, so AQE/skew
    handling applies; no cross join ever materializes.

    The banded frame is PERSISTED before the self-join: it is tiny
    (n_docs × n_bands short rows) while its lineage — tokenize →
    shingle → n_hashes md5 array-mins over the full corpus — is the
    expensive part; without the persist both join sides recompute it
    (measured 53 s vs 0.7 s at sf0.1). ``corpus_cache_key`` upgrades
    the persist to the session-scoped shared index (see
    `banded_frame`); the memoized frame then outlives this result."""
    banded = banded_frame(
        df, text_col, id_col, n_bands, rows_per_band, shingle_n, corpus_cache_key
    )
    a = banded.select(F.col(id_col).alias("a_id"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("b_id"), "band", "band_key")
    pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    if corpus_cache_key is not None:
        return pairs
    # The banded cache lives exactly as long as the returned plan.
    return own_caches(pairs, banded)


def _intersperse(cols, sep):
    out = []
    for i, c in enumerate(cols):
        if i:
            out.append(sep)
        out.append(c)
    return out


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above ``threshold``.

    Inverted-index formulation: explode (doc, shingle) → self-join on
    shingle → count common shingles per pair → Jaccard from per-doc
    shingle counts. The join key is the shingle, so only documents
    sharing at least one shingle ever meet — at scale this is the
    standard "candidate generation by postings list" plan, and hot
    shingles (stop-gram skew) are split by AQE.

    The exploded postings frame is PERSISTED: both self-join sides and
    the per-doc size aggregate reuse it, so tokenize+shingle runs once
    over the corpus instead of three times.

    ``max_df`` (stop-gram pruning): shingles occurring in more than
    ``max_df`` documents are dropped from CANDIDATE GENERATION — the
    hot-postings pair explosion is quadratic in document frequency, so
    this caps the dominant cost at web scale. Found pairs keep their
    EXACT Jaccard: common counts come from a map-side COMBINATION
    EXPLOSION of the (≤max_df-bounded) inverted doc lists (no postings
    self-join, no pair distinct), and the common count over HOT
    shingles is RECOVERED per candidate pair through a join against
    the hot postings — linear in candidates, never quadratic in hot
    df. The documented recall trade is that a pair sharing ONLY
    stop-grams is missed — which for near-dup detection is the pair
    you didn't want anyway. ``prefix_jaccard_pairs`` remains the
    exact-AND-sub-quadratic path.

    The capped plan is ADAPTIVE on one tiny statistic (the hot-shingle
    count, a scalar the cap must compute anyway): when NO shingle
    exceeds ``max_df`` — the common case for natural corpora at
    moderate cap values — the anti-join, the hot-common recovery, and
    the pair-frame persist are all dropped from the plan, leaving one
    cached frame and three shuffles. Both branches produce identical
    results when hot is empty (measured ×1.7 faster at sf0.1).
    """
    toks = repartition_for_compute(df).select(
        F.col(id_col).alias("doc"), tokenize(F.col(text_col)).alias("__tok")
    )
    sh = toks.select("doc", shingles(F.col("__tok"), shingle_n).alias("sh"))
    if max_df is not None:
        # Persist the PRE-explode arrays: dfc, the postings inversion,
        # and both size lookups all read this cache (explode over
        # cached arrays is map-side and cheap), and per-doc set sizes
        # become F.size over the cached array — shingles() is
        # array_distinct, so |array| == |exploded postings| exactly —
        # killing the per-doc groupBy shuffle the round-4 plan paid.
        shp = sh.persist()
        exploded = shp.select("doc", F.explode("sh").alias("shingle"))
        dfc = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        hot = dfc.filter(F.col("__df") > max_df).select("shingle").persist()
        # Materialize the hot set fully into its cache (count, not
        # isEmpty — a limit(1) probe would cache only a partial
        # frame). This is the one eager action in the operator; the
        # cap cannot be applied without knowing the hot set.
        has_hot = hot.count() > 0
        sizes = shp.select("doc", F.size("sh").alias("__n"))

        def pair_combos(grouped: DataFrame) -> DataFrame:
            # Emit candidate pairs MAP-SIDE from each ≤max_df docs
            # array (≤C(32,2)=496 structs per shingle at the default).
            ds = F.sort_array(F.col("docs"))
            combos = F.flatten(
                F.transform(
                    ds,
                    lambda a, i: F.transform(
                        F.slice(ds, i + F.lit(2), F.size(F.col("docs"))),
                        lambda b: F.struct(a.alias("a_id"), b.alias("b_id")),
                    ),
                )
            )
            return (
                grouped.select(F.explode(combos).alias("__p"))
                .select(
                    F.col("__p.a_id").alias("a_id"), F.col("__p.b_id").alias("b_id")
                )
                .groupBy("a_id", "b_id")
                .agg(F.count(F.lit(1)).alias("__nc_kept"))
            )

        if not has_hot:
            # Fast path: the cap is a no-op — every inverted list is
            # already ≤max_df, so invert ALL postings directly and the
            # combo counts ARE the exact common counts. No anti-join,
            # no hot recovery, no second persist (every intermediate
            # is consumed exactly once past the cached arrays).
            hot.unpersist(False)
            grouped = exploded.groupBy("shingle").agg(
                F.collect_list("doc").alias("docs")
            )
            nc_kept = pair_combos(grouped)
            jac = F.col("__nc_kept") / (
                F.col("__n_a") + F.col("__n_b") - F.col("__nc_kept")
            )
            out = (
                nc_kept.join(
                    sizes.select(
                        F.col("doc").alias("a_id"), F.col("__n").alias("__n_a")
                    ),
                    "a_id",
                )
                .join(
                    sizes.select(
                        F.col("doc").alias("b_id"), F.col("__n").alias("__n_b")
                    ),
                    "b_id",
                )
                .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold)
            )
            return own_caches(out, shp)
        # Hot path (the at-scale branch): prune skew-safely (anti-join
        # the tiny cached hot set — a hot shingle never materializes a
        # doc list), invert the retained postings (collect_list
        # bounded by the cap), pair-combos map-side, then recover the
        # hot common counts per surviving pair.
        grouped = (
            exploded.join(hot, "shingle", "left_anti")
            .groupBy("shingle")
            .agg(F.collect_list("doc").alias("docs"))
        )
        # Persisted: the main output AND the hot-common recovery both
        # consume the candidate frame — without the persist the combo
        # explosion + pair groupBy (the dominant stage) runs twice.
        nc_kept = pair_combos(grouped).persist()
        hotposts = exploded.join(hot, "shingle")
        nc_hot = (
            nc_kept.select("a_id", "b_id")
            .join(
                hotposts.select(F.col("doc").alias("a_id"), "shingle"), "a_id"
            )
            .join(
                hotposts.select(F.col("doc").alias("b_id"), "shingle"),
                ["b_id", "shingle"],
            )
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("__nc_hot"))
        )
        n_common = F.col("__nc_kept") + F.coalesce(F.col("__nc_hot"), F.lit(0))
        jac = n_common / (F.col("__n_a") + F.col("__n_b") - n_common)
        out = (
            nc_kept.join(nc_hot, ["a_id", "b_id"], "left")
            .join(
                sizes.select(F.col("doc").alias("a_id"), F.col("__n").alias("__n_a")),
                "a_id",
            )
            .join(
                sizes.select(F.col("doc").alias("b_id"), F.col("__n").alias("__n_b")),
                "b_id",
            )
            .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
        return own_caches(out, shp, hot, nc_kept)
    exploded = sh.select("doc", F.explode("sh").alias("shingle")).persist()
    sizes = exploded.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.select(F.col("doc").alias("a_id"), "shingle")
    b = exploded.select(F.col("doc").alias("b_id"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("a_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("b_id"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    out = (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return own_caches(out, exploded)


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT shingle-Jaccard pairs ≥ ``threshold`` with sub-quadratic
    candidate generation via prefix filtering (the AllPairs/PPJoin
    family) — same answer as :func:`jaccard_pairs`, far fewer pairs
    ever touched.

    Why d03's inverted index breaks down at scale: EVERY shingle two
    documents share makes them meet in the shuffle, so hot shingles
    (stop-grams) grow the candidate-pair space quadratically. Prefix
    filtering restores exactness-with-pruning: order each document's
    shingles by GLOBAL document frequency ascending (rarest first,
    shingle string as tiebreak → a total order), and index only the
    first ``|A| − ⌈t·|A|⌉ + 1`` of them. Theorem (AllPairs): two sets
    with J ≥ t must share at least one *prefix* shingle under any
    common total order — so joining only prefix postings loses no
    qualifying pair, while the hot tail of the postings lists (the
    quadratic part) never enters the join. A length filter
    (``t·max(|A|,|B|) ≤ min(|A|,|B|)``, implied by J ≥ t) prunes
    candidates further before verification.

    Plan: postings → global DF count (one agg) → per-doc rarity rank
    (window keyed by doc) → prefix self-join → length filter →
    exact-Jaccard verify of survivors over the FULL shingle sets.
    Every join is an equi-join; AQE skew handling applies. At t=0.7
    the prefix is ~30% of postings and those are by construction the
    RAREST shingles — the stop-gram blowup is structurally excluded.
    """
    sh = (
        repartition_for_compute(df)
        .select(F.col(id_col).alias("doc"), tokenize(F.col(text_col)).alias("__tok"))
        .select("doc", shingles(F.col("__tok"), shingle_n).alias("sh"))
        .persist()
    )
    ex = sh.select("doc", F.explode("sh").alias("shingle"))
    sizes = sh.select("doc", F.size("sh").alias("n"))
    global_df = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    prefix_len = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    pref = (
        ex.join(global_df, "shingle")
        .withColumn(
            "__rn",
            F.row_number().over(W.partitionBy("doc").orderBy("__df", "shingle")),
        )
        .join(sizes, "doc")
        .filter(F.col("__rn") <= prefix_len)
        .select("doc", "shingle", "n")
        # persisted because the self-join below consumes it TWICE —
        # without this, the explode + global-DF agg + rarity window
        # recompute once per side (measured 6-7 s vs ~3 s at sf0.1).
        .persist()
    )
    a = pref.select(F.col("doc").alias("a_id"), "shingle", F.col("n").alias("n_a"))
    b = pref.select(F.col("doc").alias("b_id"), "shingle", F.col("n").alias("n_b"))
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            F.greatest("n_a", "n_b") * F.lit(threshold) <= F.least("n_a", "n_b")
        )
        .select("a_id", "b_id")
        .distinct()
    )
    out = jaccard_verify_pairs(cand, sh, threshold)
    return own_caches(out, sh, pref)


def jaccard_verify_pairs(
    cand: DataFrame,
    sh: DataFrame,
    threshold: float,
    doc_col: str = "doc",
    sh_col: str = "sh",
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against per-doc
    DISTINCT shingle arrays: join the (doc, shingles) frame to the
    candidates by id twice, then `size(array_intersect)` MAP-SIDE —
    the per-pair common count needs no explode, no shingle-keyed
    shuffle, and no groupBy-per-pair aggregation (the formulation that
    costs 3 extra exchanges in the postings-based verify). Shingle
    arrays are set-valued (array_distinct upstream), so the intersect
    size IS the common-shingle count.

    Shuffle accounting at scale: candidate count × avg shingle-array
    bytes rides the two id joins (the sh side is broadcast when small).
    When documents are huge (arrays ≫ KBs) and candidates few, the
    postings formulation bounds payloads better — that shape lives in
    `jaccard_pairs`, where verify fuses with candidate generation."""
    pa = sh.select(
        F.col(doc_col).alias("a_id"),
        F.col(sh_col).alias("__sh_a"),
        F.size(sh_col).alias("n_a"),
    )
    pb = sh.select(
        F.col(doc_col).alias("b_id"),
        F.col(sh_col).alias("__sh_b"),
        F.size(sh_col).alias("n_b"),
    )
    n_common = F.size(F.array_intersect("__sh_a", "__sh_b"))
    jac = n_common / (F.col("n_a") + F.col("n_b") - n_common)
    return (
        cand.join(pa, "a_id")
        .join(pb, "b_id")
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(tokens: Column, bits: int = 60) -> Column:
    """SimHash over a token multiset: per-token 60-bit md5-derived
    hash; for each bit position sum ±1 across tokens; the sign vector
    packs into a single long. Pure expression → map-side only.

    60 bits (15 hex chars) keeps the value inside a signed int64 for
    both Spark (`conv(hex,16,10)`) and the DuckDB oracle
    (`('0x'||hex)::BIGINT`)."""
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    pow2 = lambda b: F.pow(F.lit(2.0), b.cast("double")).cast("long")  # noqa: E731

    def tok_votes(t):
        h = F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        return F.transform(
            bit_idx,
            lambda b: F.when(h.bitwiseAND(pow2(b)) != 0, 1).otherwise(-1),
        )

    votes = F.aggregate(
        tokens,
        F.transform(bit_idx, lambda b: F.lit(0)),
        lambda acc, t: F.zip_with(acc, tok_votes(t), lambda x, y: x + y),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            bit_idx,
            lambda v, b: F.when(v > 0, pow2(b)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    max_hamming: int = 3,
    min_tokens: int = 1,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming`` —
    the classic web-scale shape (Manku et al., WWW'07): pigeonhole the
    ``bits``-bit sketch into ``max_hamming + 1`` chunks; two hashes
    within distance k must agree EXACTLY on at least one chunk, so
    candidates meet in a chunk-value equi-join and only collisions pay
    the popcount verify. Returns (a_id, b_id, hamming).

    ``min_tokens`` drops docs with fewer tokens BEFORE sketching
    (default 1 = drop empty docs): every empty doc sketches to the
    SAME value (0), so at scale empties form one degenerate bucket
    with C(n_empty, 2) distance-0 pairs — measured 2.2× pair
    superlinearity at 4× corpus in the SCALE.md scaling experiment.
    Empty/near-empty dups belong to exact dedup (t06), not the
    sketch; raise the floor further to also exclude low-entropy
    sketches from one-or-two-token docs.

    Scale shape: the sketch is one map-side expression; the banded
    frame carries (id, chunk_idx, 15-bit chunk) — narrower even than
    MinHash bands — and the verify is `bit_count(xor)` on two longs,
    no text or arrays ever ride the shuffle. The hashed frame is
    persisted (ownership transfers to the result): its lineage — 60
    bit-votes × tokens over the corpus — is the expensive part, and
    the band join + verify both read it."""
    n_chunks = max_hamming + 1
    if bits % n_chunks:
        raise ValueError(f"bits={bits} must divide into {n_chunks} chunks")
    chunk_bits = bits // n_chunks
    mask = (1 << chunk_bits) - 1
    src = repartition_for_compute(df)
    toks = tokenize(F.col(text_col))
    hashed = src.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("__nt"),
        F.coalesce(simhash(toks, bits), F.lit(0).cast("long")).alias("__sh"),
    ).filter(F.col("__nt") >= min_tokens).drop("__nt")
    hashed = hashed if hashed.isStreaming else hashed.persist()
    chunks = hashed.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("__sh", c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cv"),
    ).select("id", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a = chunks.select(F.col("id").alias("a_id"), "chunk", "val")
    b = chunks.select(F.col("id").alias("b_id"), "chunk", "val")
    cand = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    ha = hashed.select(F.col("id").alias("a_id"), F.col("__sh").alias("a_sh"))
    hb = hashed.select(F.col("id").alias("b_id"), F.col("__sh").alias("b_sh"))
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    out = (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .select("a_id", "b_id", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    return own_caches(out, hashed)


def dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Near-duplicate CLUSTERS from pairwise matches: connected
    components over the pair graph, labeled by the component's minimum
    ``id_col``. The canonical dedup finisher — "keep one doc per
    cluster" is a filter on ``doc_id = cluster_id`` downstream.

    Algorithm: iterative min-label propagation. Each round every node
    takes the min of its own label and its neighbors' labels — two
    equi-joins and a groupBy per round, all DataFrame ops, converging
    in O(component diameter) rounds (near-dup clusters are shallow:
    diameter ≤ a few hops). Each round is ``localCheckpoint``-ed so
    lineage stays flat instead of growing a join-tower; convergence is
    detected by the label-sum fixpoint (labels only ever decrease, so
    an unchanged sum means no label moved). The driver-side loop is
    control flow only — per round it moves ONE scalar (the sum), never
    data. Singleton documents keep their own id as cluster_id.

    At extreme scale (billions of edges, adversarially long chains)
    the same loop body admits the large-star/small-star optimization;
    the round structure and join shapes are unchanged.

    Raises after ``max_iter`` non-converged rounds rather than
    returning a partially-merged clustering."""
    from .util import own_local_checkpoint, release_local_checkpoint

    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .union(pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
        .persist()
    )
    labels = df.select(
        F.col(id_col).alias("u"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    # decimal sum: immune to int64 overflow on huge id spaces.
    ssum = lambda d: d.agg(  # noqa: E731
        F.sum(F.col("label").cast("decimal(38,0)"))
    ).first()[0]
    cur = ssum(labels)
    for _ in range(max_iter):
        prop = edges.join(labels.withColumnRenamed("u", "v"), "v").select("u", "label")
        prev_jdf = labels._jdf
        labels = (
            labels.union(prop)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # The new checkpoint materialized eagerly — the previous
        # round's blocks are dead; free them now instead of waiting
        # for the ContextCleaner (they'd otherwise pile up one RDD
        # per round for the JVM GC to notice).
        release_local_checkpoint(prev_jdf)
        new = ssum(labels)
        if new == cur:
            edges.unpersist(blocking=False)
            # The FINAL round's checkpoint is released when the RESULT
            # dies, not here: the returned plan reads its blocks, and a
            # truncated-lineage checkpoint cannot recompute. The
            # finalizer makes the release deterministic (the
            # ContextCleaner would otherwise wait for a JVM full GC).
            out = labels.select(
                F.col("u").alias(id_col), F.col("label").alias("cluster_id")
            )
            return own_local_checkpoint(out, labels)
        cur = new
    edges.unpersist(blocking=False)
    release_local_checkpoint(labels._jdf)
    raise RuntimeError(f"dup_clusters did not converge in {max_iter} rounds")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per distinct normalized text (min ``id_col`` wins).
    Two-step: group on the 32-byte fingerprint (cheap shuffle), keep
    min row id per group — never shuffles document bodies twice."""
    fp = df.withColumn("__fp", fingerprint(F.col(text_col)))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, ["__fp", id_col], "inner").drop("__fp")


def winnow_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    threshold: float = 0.3,
    max_df: int | None = 32,
) -> DataFrame:
    """CONTAINMENT detection via shared winnow fingerprints (the
    MOSS scheme): pairs where one document contains a substantial
    substring of the other — the dup class Jaccard-style resemblance
    misses (a paragraph lifted into an otherwise-unrelated document
    moves global similarity barely, but its winnow fingerprints
    match exactly). Score = |shared fps| / min(|fps_a|, |fps_b|),
    the asymmetric-containment normalizer.

    Plan: winnow sketches are map-side (functions/textstats,
    guarantee: any shared substring of length ≥ k + w - 1 yields ≥ 1
    shared fingerprint). With the default cap, candidate pairs and
    their shared-fingerprint counts come from a map-side COMBINATION
    EXPLOSION of the (≤max_df-bounded) inverted doc lists — no
    postings self-join and no separate verify stage: the combo count
    over the retained index IS n_shared, exact by construction.
    Uncapped (``max_df=None``), pairs meet on a fingerprint equi-join
    of the persisted postings frame instead (both self-join sides
    read the cache — the materialize-before-self-join rule).

    ``max_df`` (DEFAULT ON — the d03 lesson, wired in): fingerprints
    occurring in more than ``max_df`` documents are dropped from the
    INDEX before anything else runs — the published MOSS behavior
    (Schleimer et al. 2003 §5 discard fingerprints "in too many
    documents", exactly like stop words): boilerplate headers and
    license blocks carry no containment signal, and the candidate
    self-join is quadratic in fingerprint document frequency, so one
    boilerplate fp shared by 3k docs alone creates ~10M candidate
    pairs (measured at sf0.1: Σdf² drops 190M → ~1M at the default
    cap). Both n_shared and the sketch sizes are computed over the
    RETAINED index, so scores are a deterministic function of
    (corpus, max_df) — the oracle replays the same cap. Documented
    trade: a pair overlapping ONLY in stop-fingerprints is invisible
    (boilerplate co-occurrence, not lifted content), and scores are
    relative to each doc's distinctive-content sketch.
    ``max_df=None`` scores the exhaustive index."""
    from ..functions.textstats import winnow_fingerprints

    posts = repartition_for_compute(df).select(
        F.col(id_col).alias("doc"),
        F.explode(winnow_fingerprints(F.col(text_col), k=k, w=w)).alias("fp"),
    )
    if max_df is not None:
        # Capped plan (round 4): prune skew-safely FIRST (df counts
        # via a partial-aggregating groupBy, anti-join the tiny hot
        # set — a boilerplate fingerprint with df in the thousands
        # never materializes a doc list), then INVERT the retained
        # postings (collect_list bounded by the cap) and emit
        # candidate pairs MAP-SIDE from each ≤max_df docs array
        # (≤C(32,2)=496 structs per fp at the default — bounded,
        # skew-free) instead of a postings self-join. vs the round-3
        # formulation this deletes the fp-keyed SELF-JOIN (the
        # dominant shuffle; d15 2.85→~2.1 s at sf0.1). Only valid
        # when df is capped: uncapped doc lists would put an
        # unbounded quadratic into one task, which is strictly worse
        # skew than the shuffled self-join below.
        posts = posts.persist()
        dfc = posts.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
        hot = dfc.filter(F.col("__df") > max_df).select("fp")
        grouped = (
            posts.join(hot, "fp", "left_anti")
            .groupBy("fp")
            .agg(F.collect_list("doc").alias("docs"))
            .persist()
        )
        # Persisted (doc-count rows — tiny): n_a and n_b both join it,
        # and without the persist each side re-explodes every docs
        # array (renames pushed into the aggregate defeat
        # ReuseExchange between the two sides).
        sizes = (
            grouped.select(F.explode("docs").alias("doc"))
            .groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_fp"))
            .persist()
        )
        owned = [posts, grouped, sizes]
        ds = F.sort_array(F.col("docs"))
        combos = F.flatten(
            F.transform(
                ds,
                lambda a, i: F.transform(
                    F.slice(ds, i + F.lit(2), F.size(F.col("docs"))),
                    lambda b: F.struct(a.alias("a_id"), b.alias("b_id")),
                ),
            )
        )
        shared = (
            grouped.select(F.explode(combos).alias("__p"))
            .select(F.col("__p.a_id").alias("a_id"), F.col("__p.b_id").alias("b_id"))
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )
    else:
        posts = posts.persist()
        owned = [posts]
        sizes = posts.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp"))
        shared = (
            posts.select(F.col("doc").alias("a_id"), "fp")
            .join(posts.select(F.col("doc").alias("b_id"), "fp"), "fp")
            .filter(F.col("a_id") < F.col("b_id"))
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )
    cont = F.col("n_shared") / F.least("n_a", "n_b")
    out = (
        shared.join(
            sizes.select(F.col("doc").alias("a_id"), F.col("n_fp").alias("n_a")),
            "a_id",
        )
        .join(
            sizes.select(F.col("doc").alias("b_id"), F.col("n_fp").alias("n_b")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(cont, 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    return own_caches(out, *owned)


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 5,
) -> DataFrame:
    """Per-document coverage by CROSS-document duplicated token spans —
    the exact-substring dedup statistic of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), at
    token-window granularity: a position is "duplicated" when it lies
    inside a ``window``-token run that appears verbatim in at least
    one OTHER document. Returns
    (id, n_tokens, dup_windows, dup_tokens, dup_fraction) for EVERY
    input document (zeroes when nothing matches), the per-doc signal a
    curation pipeline thresholds on (drop / trim docs whose text is
    mostly boilerplate copied across the corpus). Complements the
    sketch-based ops: winnowing (d15) SAMPLES fingerprints to find
    containing PAIRS; this measures exact coverage per document
    without materializing pairs at all.

    Plan shape for 100 TB: windows are map-side (one projection:
    tokenize → n-gram slices → md5; only the 32-char hash and an int
    position ride every shuffle, never text). One hash-keyed
    aggregate finds hashes with ≥ 2 distinct docs; the join back
    touches only DUPLICATED windows (at healthy dedup rates a small
    fraction of the corpus — AQE broadcasts it when small). The
    interval-union that converts overlapping windows into covered
    token counts is a PER-DOCUMENT window function (partitioned by
    doc id — thousands of rows max per partition, never a global
    sort): with windows sorted by position, each contributes
    ``end − max(start, furthest end seen)`` tokens, the classic
    running-cummax sweep. Within-doc-only repeats are deliberately
    NOT counted (countDistinct ≥ 2): self-repetition is a quality
    signal (functions/textstats repetition stats), not duplication."""
    toks = repartition_for_compute(df).select(
        F.col(id_col).alias("doc"), tokenize(F.col(text_col)).alias("__tok")
    )
    from ..functions.text import word_ngrams

    wins = (
        toks.select(
            "doc", F.posexplode(word_ngrams(F.col("__tok"), window)).alias("pos", "gram")
        )
        .select("doc", (F.col("pos") + 1).alias("pos"), F.md5("gram").alias("h"))
        .persist()
    )
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("h")
    )
    marked = wins.join(dup, "h")
    sweep = W.partitionBy("doc").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    end = F.col("pos") + F.lit(window)  # exclusive end of [pos, pos+window)
    prev_end = F.max(F.col("pos") + F.lit(window)).over(sweep)
    contrib = end - F.greatest(F.col("pos"), F.coalesce(prev_end, F.lit(0)))
    cov = (
        marked.withColumn("__c", contrib)
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("dup_windows"),
            F.sum("__c").alias("dup_tokens"),
        )
    )
    sizes = toks.select("doc", F.size("__tok").cast("long").alias("n_tokens"))
    out = sizes.join(cov, "doc", "left").select(
        F.col("doc").alias(id_col),
        "n_tokens",
        F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.greatest("n_tokens", F.lit(1)), 6
        ).alias("dup_fraction"),
    )
    return own_caches(out, wins)


def connected_components_star(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond") — the adversarial-depth path: converges in
    O(log² n) rounds REGARDLESS of component diameter, where
    `dup_clusters`' min-label propagation needs O(diameter) rounds (a
    10⁶-node chain — pathological but real in web-crawl link graphs —
    is 10⁶ propagation rounds but ~10 star rounds; the test suite
    demonstrates the split on a 512-chain). Same output contract as
    `dup_clusters`: (id, cluster_id = component min id), singletons
    labeled by their own id. For shallow dup graphs (the common case)
    prefer `dup_clusters` — fewer jobs per round.

    Round body, pure DataFrame ops, no collect_list (a hub node's
    neighborhood never materializes in one row — per-node minima come
    from a groupBy MIN, and the star re-wiring is an equi-join back
    on the grouped key):

    - large-star: m(u) = min(Γ(u) ∪ {u}) over BOTH edge directions;
      every strictly-larger neighbor re-attaches to m: (v, m(u)).
      Keeps components connected while collapsing long tails.
    - small-star: orient edges (larger → smaller); m(u) = min of
      u's smaller neighborhood ∪ {u}; u and every smaller neighbor
      attach to m. Turns each local tree into a star.

    Convergence = edge-set fixpoint, checked EXACTLY (count equality
    + one-sided exceptAll emptiness — no checksum collisions), one
    localCheckpoint per round with deterministic release of the
    previous round's blocks (the dup_clusters hygiene pattern)."""
    from .util import own_local_checkpoint, release_local_checkpoint

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        ori = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = ori.groupBy("u").agg(F.min("v").alias("m"))  # m <= every v <= u
        return (
            ori.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    converged = n_edges == 0
    for _ in range(max_iter):
        if converged:
            break
        prev_jdf, prev = edges._jdf, edges
        edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        new_n = edges.count()
        if new_n == n_edges and edges.exceptAll(prev).limit(1).count() == 0:
            converged = True
        release_local_checkpoint(prev_jdf)
        n_edges = new_n
    if not converged:
        release_local_checkpoint(edges._jdf)
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # Fixpoint edge set = star edges (node -> component min) for every
    # non-root member; roots and singletons label themselves.
    labels = edges.select(F.col("u").alias(id_col), F.col("v").alias("cluster_id"))
    out = (
        df.select(id_col)
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    return own_local_checkpoint(out, edges)


def trim_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 5,
    return_text: bool = False,
) -> DataFrame:
    """REMOVE cross-document duplicated token spans, keeping the
    globally-first occurrence — the destructive half of Lee et al.
    2022 exact-substring dedup (`dup_span_coverage` is the
    measurement half): for every ``window``-token run appearing in
    ≥ 2 documents, exactly one occurrence survives (min (doc, pos)
    lexicographically — deterministic, engine-portable), every other
    occurrence's positions are dropped, and each document is
    reassembled from its surviving tokens in order. Returns
    (id, n_tokens, n_kept, n_dropped, clean_fp) — ``clean_fp`` is
    the md5 of the space-joined surviving tokens, so the TRIMMED TEXT
    itself is value-checkable cross-engine; ``return_text=True`` adds
    the reassembled ``clean_text`` column (the production output; the
    fingerprint column is what the oracle hashes).

    Greedy-by-gram semantics, stated plainly: a keeper occurrence of
    one gram may still lose positions to a DIFFERENT overlapping
    duplicated gram whose keeper lives elsewhere — "first occurrence
    per gram wins", not an interval covering problem (which would be
    order-dependent and non-portable).

    Plan shape for 100 TB: everything keyed rides as (md5, int) or
    (doc, int) pairs — never text. Window hashing and the
    drop-position explode (×window per dropped window) are map-side;
    the keeper choice is one `min(struct(doc, pos))` aggregate per
    duplicated hash (lexicographic struct min — no second pass); the
    token-level anti-join is (doc, pos)-keyed and AQE-sized; the
    reassembly `sort_array(collect_list(struct(pos, token)))` is
    PER-DOCUMENT (bounded by doc length, the same bound every per-doc
    op here lives under)."""
    from ..functions.text import word_ngrams

    toks = repartition_for_compute(df).select(
        F.col(id_col).alias("doc"), tokenize(F.col(text_col)).alias("__tok")
    )
    wins = (
        toks.select(
            "doc", F.posexplode(word_ngrams(F.col("__tok"), window)).alias("pos", "gram")
        )
        .select("doc", (F.col("pos") + 1).alias("pos"), F.md5("gram").alias("h"))
        .persist()
    )
    keepers = (
        wins.groupBy("h")
        .agg(
            F.countDistinct("doc").alias("__nd"),
            F.min(F.struct("doc", "pos")).alias("k"),
        )
        .filter(F.col("__nd") >= 2)
        .select("h", F.col("k.doc").alias("k_doc"), F.col("k.pos").alias("k_pos"))
    )
    drops = (
        wins.join(keepers, "h")
        .filter(~((F.col("doc") == F.col("k_doc")) & (F.col("pos") == F.col("k_pos"))))
        .select(
            "doc",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))).alias(
                "p"
            ),
        )
        .distinct()
    )
    tpos = toks.select(
        "doc", F.posexplode(F.col("__tok")).alias("p0", "t")
    ).select("doc", (F.col("p0") + 1).alias("p"), "t")
    kept = tpos.join(drops, ["doc", "p"], "left_anti")
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("p", "t"))), lambda s: s["t"]
    )
    agg = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(ordered, " ").alias("__clean"),
    )
    sizes = toks.select("doc", F.size("__tok").cast("long").alias("n_tokens"))
    joined = sizes.join(agg, "doc", "left")
    cols = [
        F.col("doc").alias(id_col),
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.md5(F.coalesce("__clean", F.lit(""))).alias("clean_fp"),
    ]
    if return_text:
        cols.append(F.coalesce("__clean", F.lit("")).alias("clean_text"))
    return own_caches(joined.select(*cols), wins)
