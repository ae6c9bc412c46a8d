"""Corpus-curation operators for training-data pipelines: benchmark
decontamination and sequence packing as library calls (the registered
queries d10/t18 delegate here, so engine users get the same plans
without going through the registry)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sampling import hash_bucket
from ..functions.text import shingles, tokenize
from .ordered import global_row_number, global_running_sum
from .util import own_caches, repartition_for_compute


def contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Flag training documents sharing any word-``shingle_n``-gram with
    an evaluation corpus: (id, n_shared, contamination∈[0,1]).

    Scale shape: the eval side is SMALL by construction (benchmarks
    are thousands of documents, the corpus is billions), so its
    distinct-shingle set is broadcast and the train side is pruned in
    ONE map-side semi-join pass over the scan — no shuffle ever
    carries the full corpus' postings. Decontaminate with an anti-join
    of the corpus against the returned ids."""
    ev = (
        repartition_for_compute(eval_docs)
        .select(F.explode(shingles(tokenize(F.col(text_col)), shingle_n)).alias("shingle"))
        .distinct()
    )
    tr = repartition_for_compute(train_docs).select(
        id_col, shingles(tokenize(F.col(text_col)), shingle_n).alias("__sh")
    )
    hits = (
        tr.select(id_col, F.size("__sh").alias("__n"), F.explode("__sh").alias("shingle"))
        .join(F.broadcast(ev), "shingle")
        .groupBy(id_col, "__n")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.select(
        id_col,
        F.col("n_shared").cast("long").alias("n_shared"),
        F.round(F.col("n_shared") / F.col("__n"), 6).alias("contamination"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing — assign every document its
    position in the fixed-``seq_len``-token training-sequence stream
    (documents concatenated in global ``id_col`` order, boundaries may
    split a document): (id, n_tokens, start_offset, first_pack,
    last_pack, n_packs).

    The global running token offset uses `ordered.global_running_sum`
    (range partition + per-partition scan + broadcast prefix offsets)
    — never a one-task global window. Zero-token documents are
    dropped (they occupy no stream positions)."""
    d = repartition_for_compute(docs).select(
        id_col, F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens")
    )
    cum = global_running_sum(d, id_col, "n_tokens", out_col="cum_tokens")
    start = F.col("cum_tokens") - F.col("n_tokens")
    first_pack = F.floor(start / F.lit(float(seq_len)))
    last_pack = F.floor((F.col("cum_tokens") - 1) / F.lit(float(seq_len)))
    out = cum.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        start.alias("start_offset"),
        first_pack.alias("first_pack"),
        last_pack.alias("last_pack"),
        (last_pack - first_pack + 1).alias("n_packs"),
    )
    # cum owns the prefix-sum checkpoint (ordered.py); the derived
    # plan must inherit it or the blocks release while it is alive.
    return own_caches(out, cum)


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 100_000,
) -> DataFrame:
    """Token-budget-weighted source-mixture sampling — the corpus-
    mixing step of a training run (the Pile/DoReMi shape): each source
    ``s`` should contribute ``weights[s] × token_budget`` tokens, so
    its keep-rate is ``min(1, target_tokens / source_tokens)`` and
    membership is decided by the deterministic doc-id hash bucket
    (reproducible across reruns, partitionings, and engines — never
    `rand()`). Sources absent from ``weights`` get rate 0 (dropped).

    Plan shape for 100 TB: pass 1 is a per-source token aggregate —
    n_sources rows, map-side partials, one tiny shuffle. The rate
    table is then BROADCAST back onto the corpus scan, so the sample
    itself is a map-side filter: the full corpus is read twice but
    shuffled never. (With a persisted token-count column, pass 1
    collapses into a metadata-sized agg.) Rates adapt to the data —
    an upweighted small source clips at 1.0 (can't mint tokens), a
    dominant source is down-sampled to its share.

    Returns the sampled docs: (id, source, n_tokens, keep_rate)."""
    d = repartition_for_compute(docs).select(
        id_col,
        source_col,
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = F.lit(0.0)
    for s, wt in weights.items():
        w = F.when(F.col(source_col) == s, F.lit(float(wt))).otherwise(w)
    rates = (
        d.groupBy(source_col)
        .agg(F.sum("n_tokens").alias("__src_tokens"))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                w
                * F.lit(float(token_budget))
                / F.col("__src_tokens").cast("double"),
            ).alias("keep_rate"),
        )
    )
    return (
        d.join(F.broadcast(rates), source_col)
        .filter(
            hash_bucket(F.col(id_col), buckets).cast("double")
            < F.col("keep_rate") * F.lit(float(buckets))
        )
        .select(id_col, source_col, "n_tokens", "keep_rate")
    )


def shard_by_token_budget(
    docs: DataFrame,
    tokens_per_shard: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a training-shard id such that shards hold
    ~``tokens_per_shard`` tokens of WHOLE documents in global
    ``id_col`` order (unlike `pack_sequences`, a document is never
    split: it belongs to the shard where its start offset lands, so a
    shard overshoots by at most one document). Returns
    (id, n_tokens, shard) — narrow on purpose: the assignment runs on
    (id, token-count) pairs through the distributed prefix-sum
    (`ordered.global_running_sum`), so the TEXT never rides the two
    ordering shuffles; join the result back by id to materialize
    (see `sources.writers.write_token_balanced_shards`).

    This is the shard-file sizing step before a training run: byte- or
    doc-count sharding yields wildly uneven token counts per file;
    budgeting on tokens makes every shard a near-equal unit of work
    for the data loader. Zero-token documents land in the shard at
    their offset (they cost nothing)."""
    d = repartition_for_compute(docs).select(
        id_col, F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens")
    )
    cum = global_running_sum(d, id_col, "n_tokens", out_col="__cum")
    start = F.col("__cum") - F.col("n_tokens")
    out = cum.select(
        id_col,
        "n_tokens",
        F.floor(start / F.lit(float(tokens_per_shard))).cast("long").alias("shard"),
    )
    return own_caches(out, cum)


def interleaved_order(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted-interleave serving order — the loader
    schedule AFTER mixing: source ``s``'s ``r``-th document is served
    at virtual time ``r / weights[s]`` (weighted fair queuing), so a
    weight-0.5 source appears 5× as often as a weight-0.1 source at
    every prefix of the stream, not just in aggregate. Returns
    (id, source, src_rank, position) with ``position`` the 1-based
    global serving index. Sources absent from ``weights`` are
    excluded.

    Scale shape: the per-source rank is a window partitioned by
    source (parallel across sources; AQE splits a skewed one); the
    global order is `ordered.global_row_number` over (vt, source, id)
    — range partition + per-partition rank + broadcast offsets, never
    the one-task empty-PARTITION-BY window. Everything is a pure
    function of (id, source), so the schedule is stable across reruns
    and cluster sizes — the property a resumable training run needs."""
    from pyspark.sql import Window as W

    w = F.lit(None).cast("double")
    for s, wt in weights.items():
        w = F.when(F.col(source_col) == s, F.lit(float(wt))).otherwise(w)
    ranked = (
        repartition_for_compute(docs)
        .select(id_col, source_col)
        .filter(F.col(source_col).isin(*weights))
        .withColumn(
            "src_rank",
            F.row_number()
            .over(W.partitionBy(source_col).orderBy(id_col))
            .cast("long"),
        )
        .withColumn("__vt", F.col("src_rank").cast("double") / w)
    )
    from .ordered import global_row_number

    positioned = global_row_number(
        ranked, ["__vt", source_col, id_col], out_col="position"
    )
    out = positioned.select(
        id_col, source_col, "src_rank", F.col("position").cast("long").alias("position")
    )
    return own_caches(out, positioned)


def select_canonicals(
    clusters: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
) -> DataFrame:
    """Canonical-representative selection — the keep-policy half of
    near-dup dedup: one row per cluster keeping the highest-scoring
    member (min ``id_col`` on score ties), plus the member count.
    "Keep one per cluster" by min id is a special case (constant
    score); this is the quality-aware policy a curation pipeline
    actually wants: dedup should discard the WORST copies, not
    whichever happened to sort last.

    Inputs: ``clusters`` is (id, cluster) as produced by
    ``dedup.dup_clusters``; ``scored`` is (id, score). Callers who
    rank on a float score should pre-round it so the keep decision is
    engine-portable (round-before-rank, NOTES.md).

    Scale shape: one id-keyed equi-join, then ONE cluster-keyed
    exchange serving both window frames (row_number and the member
    count share the partitioning; Spark plans a single Exchange).
    Near-dup clusters are shallow and small, so the window partition
    never skews beyond AQE's comfort. Cache/checkpoint ownership of
    ``clusters`` (dup_clusters returns a localCheckpoint-backed plan)
    transfers to the result via own_caches."""
    from pyspark.sql import Window as W

    j = clusters.join(scored, id_col)
    by_cluster = W.partitionBy(cluster_col)
    pick = by_cluster.orderBy(F.col(score_col).desc(), F.col(id_col))
    out = (
        j.select(
            cluster_col,
            id_col,
            score_col,
            F.row_number().over(pick).alias("__rn"),
            F.count(F.lit(1)).over(by_cluster).cast("long").alias("n_members"),
        )
        .filter(F.col("__rn") == 1)
        .select(
            cluster_col,
            F.col(id_col).alias("canonical_id"),
            score_col,
            "n_members",
        )
    )
    return own_caches(out, clusters, scored)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Corpus delta between two snapshots keyed by ``id_col`` with a
    content fingerprint ``fp_col`` (e.g. `functions/textstats.
    fingerprint`): one full-outer join → status
    ``added | removed | changed | unchanged`` per id. The nightly
    incremental-pipeline primitive — downstream stages (re-tokenize,
    re-embed, re-index) consume only the non-``unchanged`` slice
    instead of the whole corpus.

    Scale shape: one id-keyed shuffle; the payload is a 32-byte
    fingerprint, never the document text (same discipline as exact
    dedup). Both sides project to (id, fp) before the join."""
    o = old.select(F.col(id_col), F.col(fp_col).alias("__fp_old"))
    n = new.select(F.col(id_col), F.col(fp_col).alias("__fp_new"))
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, id_col, "full_outer").select(
        id_col, status.alias("status")
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 10_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.7,
    min_stop_hits: int = 1,
) -> DataFrame:
    """Gopher-style document-quality rule table (Rae et al. 2021
    §A1.1): per document, the rule signals (word count, mean word
    length, alphabetic-word fraction, stop-word hits) plus the
    combined ``keep`` flag. Signals are emitted alongside the flag so
    a pipeline can audit WHY a document was dropped and re-tune
    thresholds without re-scanning.

    Scale shape: pure map-side column expressions over one tokenize —
    runs inside the scan stage, zero shuffles, linear at 100 TB.
    Registered as t30 with every threshold mirrored into the oracle
    SQL."""
    from ..functions.textstats import (
        alpha_token_frac,
        marker_hits,
        mean_token_len,
    )

    t = docs.select(id_col, tokenize(F.col(text_col)).alias("tok"))
    n_words = F.size("tok").cast("long")
    mwl = mean_token_len(F.col("tok"))
    alpha = alpha_token_frac(F.col("tok"))
    stops = marker_hits(F.col("tok"), "en")
    keep = (
        n_words.between(min_words, max_words)
        & mwl.between(min_mean_word_len, max_mean_word_len)
        & (alpha >= min_alpha_frac)
        & (stops >= min_stop_hits)
    )
    return t.select(
        id_col,
        n_words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(alpha, 6).alias("alpha_frac"),
        stops.alias("stop_hits"),
        keep.alias("keep"),
    )


def importance_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    boost: float = 1.0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Weighted reproducible sampling: keep each row with probability
    ``clip(boost · weight, 0, 1)``, realized as `hash_bucket(key) <
    round(boost · weight · buckets)` — membership is a pure function
    of (key, weight), so the sample is identical across reruns,
    partitionings, cluster sizes, and engines (`rand()` is none of
    those, and resampling a 100 TB corpus must be replayable).

    The weight column should already be rounded to a fixed number of
    decimals if cross-engine bit-parity of the threshold compare
    matters (see t31). Map-side only: the predicate folds into the
    scan."""
    thresh = F.round(
        F.col(weight_col) * F.lit(float(boost)) * F.lit(buckets), 0
    ).cast("long")
    return df.filter(hash_bucket(F.col(key_col), buckets) < thresh)


def stratified_split(
    df: DataFrame,
    strata_cols: list[str],
    fractions: list[tuple[str, float]],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """EXACT-proportion stratified train/val/test split: within each
    stratum, rows are ordered by the seeded key hash
    (md5(f"{seed}|{key}") — deterministic, engine-portable, uniform)
    and assigned to splits by cumulative-quota cutoffs on that rank,
    so every stratum lands within ±0.5 rows of its target fraction.
    This is the exact-quota complement of `randomSplit` (M7): MLlib's
    split is per-row Bernoulli — fine for one big corpus, but at
    per-language / per-source stratum sizes the binomial noise moves
    small-stratum eval sets by whole percents, and reruns reshuffle
    membership. Here membership is a pure function of
    (seed, key, stratum population), replayable across reruns,
    partitionings, cluster sizes, and engines.

    ``fractions``: ordered (name, fraction) pairs; fractions must sum
    to 1, and the LAST split absorbs the remainder rows so coverage
    is total regardless of float dust. Cutoff k for cumulative
    fraction c is floor(n·c + 0.5) — pure IEEE, identical in any
    engine.

    Scale shape: one hash-partitioned shuffle on the strata columns +
    a per-stratum sort (the price of exact quotas — any exact method
    needs a dense per-stratum order; when approximate is acceptable
    use `hash_bucket(key) < frac·buckets` / `importance_sample`,
    which is map-side only). Strata are typically language×source —
    thousands of groups, so the sort parallelizes; a single
    mega-stratum is the skew case and AQE splits its sort spill, or
    pre-salt by hash_bucket(key, k) and re-aggregate quotas."""
    from pyspark.sql import Window as W

    if abs(sum(f for _, f in fractions) - 1.0) > 1e-9:
        raise ValueError("stratified_split: fractions must sum to 1")
    order = F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string")))
    strata = [F.col(c) for c in strata_cols]
    # Rank a NARROW (strata, key) projection and join the assignment
    # back by key: document bodies must not ride the per-stratum sort
    # (measured 2× wide-data movement the other way — SCALE.md §7n,
    # the round-2 token-balanced-shard lesson). The wide side moves
    # once, in the join's hash exchange. Inputs that are ALREADY just
    # the ranking columns skip the join (it would only re-shuffle).
    already_narrow = set(df.columns) <= set(strata_cols) | {key_col}
    narrow = df if already_narrow else df.select(*strata_cols, key_col)
    rn = F.row_number().over(
        W.partitionBy(*strata).orderBy(order, F.col(key_col))
    )
    cnt = F.count(F.lit(1)).over(W.partitionBy(*strata))
    ranked = narrow.withColumn("__rn", rn).withColumn("__cnt", cnt)
    expr = None
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        cutoff = F.floor(F.col("__cnt") * F.lit(cum) + F.lit(0.5))
        cond = F.col("__rn") <= cutoff
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = fractions[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    assigned = ranked.withColumn("split", split).drop("__rn", "__cnt")
    if already_narrow:
        return assigned
    return df.join(assigned.select(key_col, "split"), key_col)


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 42,
    out_col: str = "shard",
    pos_col: str = "position",
) -> DataFrame:
    """Seeded GLOBAL shuffle + balanced shard assignment — the
    write-order randomization step before materializing training
    shards: rows are placed in a deterministic pseudo-random global
    order (md5(f"{seed}|{key}"), tiebroken by the key) and dealt
    round-robin to ``n_shards`` shards (sizes balanced to ±1), so a
    sequential reader of any shard sees an unbiased sample and the
    epoch order is a replayable pure function of (seed, key) —
    reshuffling an epoch is just a new seed, and task retries /
    repartitioning cannot perturb it (the `rand()` trap again).

    Adds ``pos_col`` (1-based global shuffle position) and
    ``out_col`` (shard id). The global rank comes from
    `ordered.global_row_number` — range partition on the hash +
    per-partition scan + broadcast prefix offsets, never a one-task
    global window; the hash key makes the range partitioning
    uniform by construction (no skew salt needed). At 100 TB this is
    two data shuffles, then the shard writer partitions by
    ``out_col``."""
    if n_shards < 1:
        raise ValueError("shuffle_shards: n_shards must be >= 1")
    # Rank a NARROW key projection and join (position, shard) back:
    # document bodies must not ride the range exchange + prefix
    # checkpoint + pid window (measured 2× wide-data movement the
    # other way — SCALE.md §7n). The wide side moves once, in the
    # join's hash exchange. Inputs that are ALREADY just the key
    # skip the join (it would only re-shuffle).
    already_narrow = set(df.columns) <= {key_col}
    shuf = (df if already_narrow else df.select(key_col)).withColumn(
        "__shuf",
        F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string"))),
    )
    rn = global_row_number(shuf, ["__shuf", key_col], out_col=pos_col)
    assign = rn.withColumn(
        out_col, F.pmod(F.col(pos_col) - 1, F.lit(n_shards)).cast("int")
    ).select(key_col, pos_col, out_col)
    if already_narrow:
        return own_caches(assign, rn)
    out = df.join(assign, key_col)
    # rn owns the prefix checkpoint (ordered.py contract)
    return own_caches(out, rn)
