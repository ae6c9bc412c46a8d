"""BM25 lexical retrieval over a document table — the sparse half of
a hybrid (lexical + vector) retrieval stack (Robertson & Zaragoza
2009, "The Probabilistic Relevance Framework: BM25 and Beyond"; the
IDF form is Lucene's ln(1 + (N − df + ½)/(df + ½)), positive for
every term).

Why this exists alongside the dense s-family: embedding retrieval
misses exact-term matches (rare entities, codes, numbers) that
lexical scoring nails, and vice versa — which is why production
stacks fuse both (the engine's `similarity.rrf_fuse` is the
combiner). BM25 is also the standard quality-filter scorer for
"does this document actually contain the query terms" curation
passes over a training corpus.

Scale shape (the 100 TB discipline): the query term set is
serving-contract sized, so it BROADCASTS into a semi-join that
prunes the corpus-sized tf/df frames down to query-term rows BEFORE
any wide join; corpus statistics (N, Σdl) ride along as one
broadcast scalar row; the per-(query, doc) score folds contributions
over the SORTED term list (the t33 determinism pattern — both
engines sum in the same order, so the 6-dp score is hash-checkable);
final top-k is one window shuffle keyed by query. No UDFs, no
driver-side loops — everything is builtin column algebra.

No reference analogue (the reference's text surface is TF-IDF for
FEATURES, `acq_etl_code.scala:71-81`, not retrieval) — this is
SURVEY §7 Phase 4 training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import tokenize

#: BM25 constants, pre-folded in Python so both engines consume the
#: same double literals (k1 = 1.2, b = 0.75).
K1 = 1.2
K1_PLUS_1 = 2.2
B = 0.75
ONE_MINUS_B = 0.25


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` is a long-format (query_id, term) frame — one row per
    query term, the shape a tokenized query batch naturally lands in.
    Returns (query_id, doc_id, bm25, rank) with the score rounded to
    6 dp and ranked (bm25 DESC, doc_id ASC) for cross-engine
    determinism. ``exclude_self`` drops doc_id == query_id pairs —
    the convention when queries are derived from corpus documents
    (the s02 self-match rule).

    Scoring: Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + ½)/(df + ½) + 1); the Σ folds left-to-right
    over terms sorted lexicographically."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(term_col).alias("term")
    )
    qterms = q.select("term").distinct()
    # corpus-sized aggregates, pruned to query terms BEFORE joining
    tf = (
        tok.join(F.broadcast(qterms), "term", "left_semi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dfreq = (
        tok.join(F.broadcast(qterms), "term", "left_semi")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    # document length must count EVERY token, not just query terms
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).alias("nn")).crossJoin(
        dl.agg(F.sum("dl").alias("sdl"))
    ).select(
        "nn", (F.col("sdl").cast("double") / F.col("nn")).alias("avgdl")
    )

    contrib = (
        F.broadcast(q)
        .join(tf, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "term", _bm25_weight().alias("w"))
    )
    return _rank_contributions(contrib, k, exclude_self)


def _bm25_weight():
    """idf(t)·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) over columns
    (c, df, dl, nn, avgdl) — ONE spelling shared by the in-memory and
    persisted serves so their 6-dp scores are bit-identical (and both
    match the oracle's arithmetic order)."""
    idf = F.log(
        (F.col("nn") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    num = F.col("c") * F.lit(K1_PLUS_1)
    den = F.col("c") + F.lit(K1) * (
        F.lit(ONE_MINUS_B) + F.lit(B) * F.col("dl") / F.col("avgdl")
    )
    return (idf * num) / den


def _rank_contributions(
    contrib: DataFrame, k: int, exclude_self: bool
) -> DataFrame:
    """Grouped deterministic fold + top-k: contributions sorted by
    term, summed left-to-right (the t33 pattern — DuckDB's list_sum
    over list(w ORDER BY term) folds identically), 6-dp round, rank
    (bm25 DESC, doc_id ASC)."""
    if exclude_self:
        contrib = contrib.filter(F.col("doc_id") != F.col("query_id"))
    scored = (
        contrib.groupBy("query_id", "doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("term", "w"))).alias("tw")
        )
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.aggregate(
                    F.col("tw"),
                    F.lit(0.0),
                    lambda acc, x: acc + x["w"],
                ),
                6,
            ).alias("bm25"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )


def build_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist the BM25 POSTINGS artifact — the lexical sibling of the
    ann_index build (pay the corpus aggregation once, serve many):

    - ``{path}/postings``: one DENORMALIZED row per (term, doc)
      carrying (term, doc_id, c, df, dl) — tf, document frequency and
      document length pre-joined at build time so the serve is a
      single scan with ZERO corpus-sized joins. Range-partitioned and
      sorted by term: every parquet row group covers a tight term
      interval, so a query's `term IN (...)` predicate prunes at the
      footer level (the lexical analogue of the cell-partition
      pruning the ann serve relies on).
    - ``{path}/stats``: the 1-row (nn, avgdl) sidecar.

    Both publish via the atomic staged-rename (`publish_parquet_
    atomic`) — readers never see a torn artifact. Rebuild = re-run
    (the artifact is a pure function of the corpus)."""
    from ..sources.writers import publish_parquet_atomic

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    dfreq = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    postings = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .select("term", "doc_id", "c", "df", "dl")
        .repartitionByRange(8, "term")
        .sortWithinPartitions("term", "doc_id")
    )
    publish_parquet_atomic(postings, f"{path}/postings")
    # sdl is kept as an exact integer so `append_bm25_index` can merge
    # corpus stats without float error; avgdl is derived at read time
    # from the same division the in-memory path performs
    stats = docs.agg(F.count(F.lit(1)).alias("nn")).crossJoin(
        dl.agg(F.sum("dl").alias("sdl"))
    )
    publish_parquet_atomic(stats, f"{path}/stats")


def append_bm25_index(
    docs_new: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """EXACT-MERGE append of a new document shard to a persisted BM25
    index — the lexical counterpart of the ann_index nightly append,
    with a stronger guarantee: where the ANN append encodes under
    FROZEN (stale-by-design) geometry, BM25's corpus statistics are
    all exact integer merges — tf rows are disjoint across shards
    (ids are immutable content, the append-path contract), per-term
    df adds, dl rows are per-doc, and (nn, Σdl) add — so the appended
    index is VALUE-IDENTICAL to a full rebuild over the union, at the
    cost of one pass over the NEW shard's text plus one O(postings)
    merge shuffle (the old corpus is never re-tokenized; re-tokenize
    is the dominant build term at scale). The merged postings and
    stats publish via the same atomic staged-rename, so serves never
    see a half-merged artifact."""
    from ..sources.writers import publish_parquet_atomic

    spark = docs_new.sparkSession
    old_post = spark.read.parquet(f"{path}/postings")
    old_stats = spark.read.parquet(f"{path}/stats")

    tok = docs_new.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf_new = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    dl_new = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_new = tok.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df_add")
    )

    # per-term df delta joins BOTH sides' rows; terms absent from one
    # side contribute 0 (the merge identity)
    df_old = old_post.select("term", "df").dropDuplicates(["term"])
    df_merged = (
        df_old.join(df_new, "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("df_add"), F.lit(0))
            ).alias("df"),
        )
    )
    new_rows = tf_new.join(dl_new, "doc_id").select(
        "term", "doc_id", "c", "dl"
    )
    merged = (
        old_post.select("term", "doc_id", "c", "dl")
        .unionByName(new_rows)
        .join(df_merged, "term")
        .select("term", "doc_id", "c", "df", "dl")
        .repartitionByRange(8, "term")
        .sortWithinPartitions("term", "doc_id")
    )
    add = docs_new.agg(F.count(F.lit(1)).alias("nn_add")).crossJoin(
        dl_new.agg(F.coalesce(F.sum("dl"), F.lit(0)).alias("sdl_add"))
    )
    stats = old_stats.crossJoin(add).select(
        (F.col("nn") + F.col("nn_add")).alias("nn"),
        (F.col("sdl") + F.col("sdl_add")).alias("sdl"),
    )
    # ORDER IS LOAD-BEARING: stats publishes FIRST. Both publishes
    # lazily re-evaluate ``docs_new``, whose lineage may itself READ
    # the live postings (the reconcile path's membership anti-join —
    # `reconcile_bm25_from_snapshot`); publishing postings first
    # swaps the directory out from under the stats job's re-read
    # (FAILED_READ_FILE on the pre-swap file list). Stats-first means
    # every read of the live postings completes before its rename.
    # A crash between the two publishes leaves merged stats over old
    # postings — torn either way round — and the membership reconcile
    # converges on re-run, which is the recovery contract.
    publish_parquet_atomic(stats, f"{path}/stats")
    publish_parquet_atomic(merged, f"{path}/postings")


def search_bm25_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    query_id_col: str = "query_id",
    term_col: str = "term",
    exclude_self: bool = False,
) -> DataFrame:
    """Serve BM25 top-``k`` from the persisted postings artifact: the
    query batch's term set (serving-contract sized — the same rule as
    the ann serve's probed-cell collect) becomes an In-predicate on
    the postings scan, which parquet prunes to the row groups whose
    term range matches; everything else is the broadcast query join +
    the shared weight/fold/rank tail, bit-identical to the in-memory
    `bm25_topk` because postings hold exact integers and the stats
    sidecar's doubles round-trip parquet exactly."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(term_col).alias("term")
    )
    terms = [r["term"] for r in q.select("term").distinct().collect()]
    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("term").isin(terms)
    )
    # avgdl derives from the exact-integer sidecar with the SAME
    # division the in-memory path performs — identical double
    stats = spark.read.parquet(f"{path}/stats").select(
        "nn", (F.col("sdl").cast("double") / F.col("nn")).alias("avgdl")
    )
    contrib = (
        F.broadcast(q)
        .join(post, "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "term", _bm25_weight().alias("w"))
    )
    return _rank_contributions(contrib, k, exclude_self)
