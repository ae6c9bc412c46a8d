"""Training-data-pipeline composite queries (north-star): the ops an
LLM-data pipeline runs end-of-funnel — reproducible sampling, split
assignment, and the full quality-filter funnel. All md5-keyed so the
oracle reproduces them exactly (and so results are stable across
cluster sizes, partitionings, and reruns — `rand()` is none of those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..functions.textstats import fingerprint, quality_score
from ..operators.util import repartition_for_compute
from ..sources.readers import load_table
from .registry import query


# Deterministic md5 hash-bucket membership + its DuckDB spelling —
# shared with operators/curation (see functions/sampling for why
# never rand()).
from ..functions.sampling import SQL_BUCKET as _SQL_BUCKET  # noqa: E402
from ..functions.sampling import hash_bucket as _hash_bucket  # noqa: E402


@query(
    "q38_deterministic_sample",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {_SQL_BUCKET.format(k='o_orderkey', n=10)} = 0
    """,
)
def q38_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% reproducible sample by key hash. Map-side filter — pushes
    into the scan stage, no shuffle, identical membership at any SF,
    partitioning, or engine."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(_hash_bucket(F.col("o_orderkey"), 10) == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "m06_split_assignment",
    oracle=f"""
    SELECT split, count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM (
        SELECT doc_id,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'validation'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, {_SQL_BUCKET.format(k='doc_id', n=100)} AS b
              FROM documents)
    )
    GROUP BY split
    """,
)
def m06_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/validation/test assignment by document-id hash —
    the reproducible counterpart of the reference's `randomSplit(seed
    42)` (`lr.scala:32`): membership is a pure function of the id, so
    it survives reruns, repartitions, and incremental data arrival
    (new docs never move old docs between splits)."""
    d = load_table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(b < 80, "train").when(b < 90, "validation").otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


#: Per-language keep-rates (percent) for stratified corpus sampling.
_STRATA_RATES = {"en": 50, "de": 30, "fr": 30, "es": 30, "zh": 10}


@query(
    "m07_stratified_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM (
        SELECT doc_id, lang, {_SQL_BUCKET.format(k='doc_id', n=100)} AS b
        FROM documents
    )
    WHERE b < CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())}
               ELSE 0 END
    GROUP BY lang
    """,
)
def m07_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified reproducible sampling: per-language keep-rates
    applied via the same doc-id hash bucket as q38 — membership is a
    pure function of (doc_id, lang), so the sample is identical across
    reruns, partitionings, and engines, and DOWN-weights dominant
    languages without a shuffle (the rate lookup is a CASE expression
    folded into the scan; no join, no rand())."""
    d = load_table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"), 100)
    rate = F.lit(0)
    for lang, pct in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return (
        d.filter(b < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


#: Source-mixture weights (t21): fractions of the token budget each
#: source should contribute. src0 is over-weighted past its size so
#: its rate clips at 1.0 (a sampler can't mint tokens).
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.2, "src2": 0.15, "src3": 0.1, "src4": 0.05}
_MIX_BUDGET = 3000
_MIX_BUCKETS = 100_000


@query(
    "t21_source_mixture",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    rates AS (
        SELECT source,
               least(1.0,
                     (CASE source {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())}
                           ELSE 0.0 END * {float(_MIX_BUDGET)})
                     / CAST(sum(n_tokens) AS DOUBLE)) AS keep_rate
        FROM tok GROUP BY source
    )
    SELECT t.source, count(*) AS n_docs,
           CAST(sum(t.n_tokens) AS BIGINT) AS sampled_tokens,
           round(max(r.keep_rate), 6) AS keep_rate
    FROM tok t JOIN rates r USING (source)
    WHERE CAST({_SQL_BUCKET.format(k='t.doc_id', n=_MIX_BUCKETS)} AS DOUBLE)
          < r.keep_rate * {float(_MIX_BUCKETS)}
    GROUP BY t.source
    """,
)
def t21_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-weighted source mixture (`curation.mixture_sample`)
    — the corpus-mixing step of a training run: per-source keep-rates
    derived from ACTUAL token counts (one tiny agg, broadcast back),
    membership by deterministic doc-id hash. Reported per source:
    docs kept, tokens kept, and the derived rate (src0's clips at 1.0
    — over-weighted past its size). Unweighted sources drop out."""
    from ..operators.curation import mixture_sample

    d = load_table(spark, sf_dir, "documents")
    sampled = mixture_sample(d, _MIX_WEIGHTS, _MIX_BUDGET, buckets=_MIX_BUCKETS)
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sampled_tokens"),
        F.round(F.max("keep_rate"), 6).alias("keep_rate"),
    )


_TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_FP = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')))"
)


@query(
    "t13_training_prep_funnel",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               len(tok) AS n_tokens,
               CASE WHEN len(tok) = 0 THEN 0.0
                    ELSE round(least(len(tok) / 100.0, 1.0)
                         * greatest(0.0, 1.0 - abs(
                             list_sum(list_transform(tok, t -> CAST(length(t) AS DOUBLE)))
                             / len(tok) - 5.0) / 10.0), 6)
               END AS quality,
               {_FP} AS fp
        FROM (SELECT doc_id, lang, n_chars, text, {_TOK} AS tok FROM documents)
    ),
    kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM scored
            WHERE lang = 'en' AND quality >= 0.3 AND n_tokens >= 30
        ) WHERE rn = 1
    )
    SELECT count(*) AS n_kept,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(quality), 6) AS avg_quality,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM kept
    """,
)
def t13_training_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite training-data prep funnel in ONE plan: language
    filter → quality threshold → length floor → exact dedup (keep
    min-id per fingerprint) → corpus accounting. Everything before the
    dedup window is map-side; the only shuffle keys on the 32-byte
    fingerprint. This is the query shape a 100 TB corpus-curation run
    executes nightly."""
    d = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        "lang",
        "n_chars",
        tokenize(F.col("text")).alias("tok"),
        fingerprint(F.col("text")).alias("fp"),
    ).select(
        "doc_id",
        "lang",
        "fp",
        F.size("tok").cast("long").alias("n_tokens"),
        F.when(F.size("tok") == 0, F.lit(0.0))
        .otherwise(F.round(quality_score(F.col("tok")), 6))
        .alias("quality"),
    )
    from pyspark.sql import Window as W

    kept = (
        scored.filter(
            (F.col("lang") == "en") & (F.col("quality") >= 0.3) & (F.col("n_tokens") >= 30)
        )
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


def _pivot_year() -> int:
    """SimpleDateFormat's sliding window upper edge (now+20), the
    default inside functions/dates.to_date_pivot — computed once at
    import so the oracle SQL and the Spark plan share the same clock."""
    import datetime as dt

    return dt.date.today().year + 20


@query(
    "j02_deal_name_linkage",
    oracle=f"""
    WITH deals AS (
        SELECT c.c_name AS company_name,
               strftime(o.o_orderdate, '%m/%d/%y') AS announce
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    parsed AS (
        SELECT company_name,
               make_date(
                 CASE WHEN 2000 + yy >= {_pivot_year()} THEN 1900 + yy
                      ELSE 2000 + yy END, mm, dd) AS announce_date
        FROM (SELECT company_name,
                     CAST(substr(announce, 1, 2) AS INTEGER) AS mm,
                     CAST(substr(announce, 4, 2) AS INTEGER) AS dd,
                     CAST(substr(announce, 7, 2) AS INTEGER) AS yy
              FROM deals)
    )
    SELECT DISTINCT c.c_custkey AS cik, c.c_name AS company_name,
           c.c_mktsegment AS ticker, c.c_nationkey AS sic,
           CAST(p.announce_date AS VARCHAR) AS announce_date
    FROM customer c JOIN parsed p ON c.c_name = p.company_name
    """,
)
def j02_deal_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — the reference's deal↔company-master name linkage
    (`join_acquirers.scala:15-37`) made driver-checkable: a deals
    frame is synthesized from `orders` (company name + `MM/dd/yy`
    announce string, urgent orders = the small side), then
    `pipeline.link_deals_to_companies` runs the real Stage-1 operator:
    exact name-equality join (deals broadcast), SimpleDateFormat-
    compatible 2-digit-year pivot parse (Spark 3 alone would put '92'
    in 2092), one announce per (cik, date).

    The oracle replicates the pivot arithmetically (make_date +
    century fold at now+20) rather than via strptime, whose C-style
    69/70 pivot only agrees inside 1970–2045."""
    from ..pipeline import link_deals_to_companies

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    deals = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_name").alias("deal_name"),
            F.date_format("o_orderdate", "MM/dd/yy").alias("announce"),
        )
    )
    companies = cust.select(
        F.col("c_name").alias("name"),
        F.col("c_custkey").alias("cik"),
        F.col("c_mktsegment").alias("ticker"),
        F.col("c_nationkey").alias("sic"),
    )
    linked = link_deals_to_companies(deals, companies, "deal_name", "announce")
    # ISO-string date output (repo convention: DATE columns don't
    # round-trip identically through both engines' pandas bridges).
    return linked.withColumn("announce_date", F.col("announce_date").cast("string"))


@query(
    "j03_fuzzy_name_match",
    oracle="""
    WITH master AS (
        SELECT c_custkey AS master_key, c_name AS master_name FROM customer
    ),
    dirty AS (
        SELECT c_custkey AS dirty_key,
               substr(c_name, 1, length(c_name) - 1)
                 || translate(substr(c_name, length(c_name), 1),
                              '0123456789', 'OIZEASGTBP') AS dirty_name
        FROM customer WHERE c_custkey % 7 = 0
    ),
    pairs AS (
        SELECT d.dirty_key, d.dirty_name, m.master_key, m.master_name,
               CAST(levenshtein(d.dirty_name, m.master_name) AS BIGINT)
                   AS edit_dist
        FROM dirty d JOIN master m
          ON substr(d.dirty_name, 1, 16) = substr(m.master_name, 1, 16)
         AND abs(length(d.dirty_name) - length(m.master_name)) <= 2
        WHERE levenshtein(d.dirty_name, m.master_name) <= 2
    )
    SELECT dirty_key, master_key, master_name, edit_dist
    FROM (SELECT *, row_number() OVER (
              PARTITION BY dirty_key ORDER BY edit_dist, master_key) AS rn
          FROM pairs)
    WHERE rn = 1
    """,
)
def j03_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2's fuzzy generalization — entity resolution under noise. The
    reference links deal names to the company master by EXACT equality
    (`join_acquirers.scala:26`); real deal feeds carry typo/OCR noise,
    so this is the blocked approximate-match version: a dirty side is
    synthesized from `customer` names (every 7th customer, final
    digit OCR-corrupted to a letter — 0→O, 1→I, … — a deterministic
    single-substitution error), then resolved back against the master
    via `operators.joins.fuzzy_join` (name-prefix blocking key → hash
    equi-join; length-band prune; thresholded-Levenshtein verify) and
    a best-match window (min distance, master-key tiebreak) per dirty
    record.

    Scale shape: prefix blocking turns all-pairs O(n·m) into an
    equi-join whose block count grows WITH the corpus (name prefixes,
    not a fixed category set — the `part` table is unusable here: its
    64 distinct names make every block quadratic); the verify is
    JVM-side `levenshtein(l, r, threshold)` with early DP abandon.
    Matches whose first 16 chars differ are missed by construction —
    the standard single-pass blocking recall trade; multi-pass
    blocking (union over different keys) is the documented recall
    path in the operator docstring."""
    from ..operators.joins import fuzzy_join
    from pyspark.sql import Window as W

    # per-pair Levenshtein is CPU-bound: round the single-row-group
    # local scan up to cluster parallelism (no-op at real scale)
    cust = repartition_for_compute(load_table(spark, sf_dir, "customer"))
    master = cust.select(
        F.col("c_custkey").alias("master_key"), F.col("c_name").alias("master_name")
    )
    dirty = cust.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"),
            F.translate(
                F.expr("substring(c_name, length(c_name), 1)"),
                "0123456789",
                "OIZEASGTBP",
            ),
        ).alias("dirty_name"),
    )
    pairs = fuzzy_join(
        dirty,
        master,
        "dirty_name",
        "master_name",
        block_left=F.substring("dirty_name", 1, 16),
        block_right=F.substring("master_name", 1, 16),
        max_dist=2,
    )
    best = pairs.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("dirty_key").orderBy("edit_dist", "master_key")
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "dirty_key", "master_key", "master_name", F.col("edit_dist").cast("long").alias("edit_dist")
    )


@query(
    "t27_snapshot_diff",
    oracle=f"""
    WITH y AS (
        SELECT doc_id, {_FP} AS fp FROM documents
        WHERE {_SQL_BUCKET.format(k='doc_id', n=10)} <> 0
    ),
    tt AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN text || ' edited'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 17 <> 0
    ),
    t AS (SELECT doc_id, {_FP} AS fp FROM tt)
    SELECT COALESCE(y.doc_id, t.doc_id) AS doc_id,
           CASE WHEN y.fp IS NULL THEN 'added'
                WHEN t.fp IS NULL THEN 'removed'
                WHEN y.fp = t.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM y FULL OUTER JOIN t ON y.doc_id = t.doc_id
    """,
)
def t27_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot DELTA — the nightly incremental-pipeline
    primitive (operators/curation.snapshot_diff): per-doc status
    added/removed/changed/unchanged between yesterday's corpus and
    today's, by content fingerprint. Downstream stages (re-tokenize,
    re-embed, re-index, re-dedup via d12) consume only the
    non-unchanged slice instead of re-processing 100 TB.

    Snapshots are synthesized deterministically from `documents`:
    yesterday = a 90% hash-bucket slice (so today holds 'added' docs),
    today drops every 17th doc ('removed') and edits every 13th
    ('changed'). One id-keyed full-outer join; the shuffle carries
    32-byte fingerprints, never text."""
    from ..operators.curation import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    y = docs.filter(_hash_bucket(F.col("doc_id"), 10) != 0).select(
        "doc_id", fingerprint("text").alias("fp")
    )
    today_text = F.when(
        F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" edited"))
    ).otherwise(F.col("text"))
    t = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id", fingerprint(today_text).alias("fp")
    )
    return snapshot_diff(y, t)


#: Importance-sampling geometry (t31): keep-probability = clip(boost ×
#: quality, 0, 1) realized against a 1M-bucket doc-id hash. The boost
#: (>1) shows the clip branch: high-quality docs are kept with
#: certainty, low-quality docs survive at a rate proportional to
#: their score — "soft" quality filtering (the FineWeb/DCLM-style
#: alternative to a hard keep/drop threshold, preserving tail
#: diversity instead of cliffing it).
_IS_BOOST = 1.2
_IS_BUCKETS = 1_000_000

T31_ORACLE = f"""
    SELECT doc_id, quality
    FROM (
        SELECT doc_id,
               CASE WHEN len(tok) = 0 THEN 0.0
                    ELSE round(least(len(tok) / 100.0, 1.0)
                         * greatest(0.0, 1.0 - abs(
                             list_sum(list_transform(tok, t -> CAST(length(t) AS DOUBLE)))
                             / len(tok) - 5.0) / 10.0), 6)
               END AS quality
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
              FROM documents)
    )
    WHERE {_SQL_BUCKET.format(k='doc_id', n=_IS_BUCKETS)}
          < CAST(round(quality * {_IS_BOOST} * {_IS_BUCKETS}, 0) AS BIGINT)
"""


@query("t31_importance_sample", oracle=T31_ORACLE)
def t31_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED reproducible sampling: each document's keep
    probability is proportional to its quality score (clipped at 1 by
    the bucket range), realized as `hash_bucket(doc_id) <
    round(boost·quality·1M)` — soft quality filtering. Deterministic
    by construction (a pure function of doc_id and text), so the
    sample is identical across reruns, partitionings, cluster sizes,
    and engines, unlike anything built on `rand()`.

    Scale shape: map-side only — the quality expression and the
    membership predicate both fold into the scan stage; zero
    shuffles, trivially linear at 100 TB. The quality score is
    rounded to 6 dp BEFORE the threshold multiply so both engines
    compare bit-identical doubles (same parity contract as t11)."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokenize(F.col("text"))
    t = d.select("doc_id", tok.alias("tok"))
    q6 = F.when(F.size("tok") == 0, F.lit(0.0)).otherwise(
        F.round(quality_score(F.col("tok")), 6)
    )
    scored = t.select("doc_id", q6.alias("quality"))
    from ..operators.curation import importance_sample

    return importance_sample(
        scored, "quality", "doc_id", boost=_IS_BOOST, buckets=_IS_BUCKETS
    )


#: t36 split geometry. The oracle embeds the EXACT cumulative-fraction
#: doubles the engine computes (0.8 + 0.1 is 0.9000000000000001 in
#: IEEE — repr() both sides, never a re-typed "0.9"), so the quota
#: cutoff floor(n·c + 0.5) compares bit-identical doubles in both
#: engines.
_T36_FRACS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
_T36_SEED = 42


def _t36_oracle() -> str:
    cuts, cum = [], 0.0
    for name, frac in _T36_FRACS[:-1]:
        cum += frac
        cuts.append(
            f"WHEN rn <= floor(cnt * {cum!r} + 0.5) THEN '{name}'"
        )
    case = "CASE " + " ".join(cuts) + f" ELSE '{_T36_FRACS[-1][0]}' END"
    return f"""
    WITH ranked AS (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(concat('{_T36_SEED}|', CAST(doc_id AS VARCHAR))),
                            doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS cnt
        FROM documents
    )
    SELECT lang, split,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM (SELECT lang, doc_id, {case} AS split FROM ranked)
    GROUP BY lang, split
    ORDER BY lang, split
"""


@query("t36_stratified_split", oracle=_t36_oracle())
def t36_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-proportion stratified 80/10/10 split of the corpus by
    language (`operators/curation.stratified_split`) — the
    training-pipeline complement of M7's `randomSplit`: within each
    language, documents are ordered by a seeded key hash and cut at
    cumulative quotas, so every language's eval slice is exact to
    ±0.5 rows and membership is a replayable pure function of
    (seed, doc_id) — reruns, repartitioning, and engine choice cannot
    move a document between splits (per-row Bernoulli splitting has
    binomial noise that moves small-language eval sets by whole
    percents, and `rand()` reseeds per task attempt). Returns the
    per-(lang, split) audit aggregate — counts AND an id checksum, so
    the oracle certifies the ASSIGNMENT, not just the sizes. One
    shuffle on the strata key + per-stratum sort (the price of exact
    quotas; SCALE note in the operator docstring)."""
    from ..operators.curation import stratified_split

    d = load_table(spark, sf_dir, "documents")
    s = stratified_split(d, ["lang"], _T36_FRACS, "doc_id", seed=_T36_SEED)
    return (
        s.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("lang", "split")
    )


_T37_SHARDS = 8

T37_ORACLE = f"""
    WITH shuffled AS (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY md5(concat('42|', CAST(doc_id AS VARCHAR))),
                            doc_id) AS position
        FROM documents
    )
    SELECT CAST((position - 1) % {_T37_SHARDS} AS INTEGER) AS shard,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM shuffled
    GROUP BY 1
    ORDER BY 1
"""


@query("t37_epoch_shuffle_shards", oracle=T37_ORACLE)
def t37_epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded epoch shuffle + balanced shard deal
    (`operators/curation.shuffle_shards`) — the global write-order
    randomization a training-data materializer runs before writing
    shards: every document gets a deterministic pseudo-random global
    position (seeded key hash, `ordered.global_row_number`'s
    two-phase range-partition + broadcast-offset plan — never a
    one-task global window) and shards are dealt round-robin from
    that order, balanced to ±1. Returns the per-shard audit
    aggregate (count + id checksum): the checksum pins WHICH
    documents landed in each shard, so the oracle certifies the
    global shuffle order assignment itself, not just balance. The
    oracle's single-window row_number is the semantic spec; the
    engine's distributed two-phase plan must (and does) match it
    bit-for-bit."""
    from ..operators.curation import shuffle_shards

    from ..operators.util import own_caches

    d = load_table(spark, sf_dir, "documents")
    s = shuffle_shards(
        repartition_for_compute(d), "doc_id", _T37_SHARDS, seed=42
    )
    out = (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("shard")
    )
    # s owns the prefix checkpoint (ordered.py); the derived aggregate
    # must inherit it or the blocks release while the plan is alive.
    return own_caches(out, s)
