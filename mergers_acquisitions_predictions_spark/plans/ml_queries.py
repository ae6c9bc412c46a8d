"""ML-surface queries (SURVEY §2.8). MLlib fit() results aren't
SQL-expressible directly, but every query here is now VALUE-CHECKED:
the fits' outputs or parameters are materialized to artifact parquet
(measured bit-deterministic — PERF.md rounds 5-6) and the oracle
replays the post-fit plan from the same files (the artifact-handshake
recipe, plans/handshake.py). m04 replays the reference's final
pairing stage with a deterministic score so it is oracle-checkable
without an artifact. Deterministic-seed property tests live in
tests/test_ml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.classify import confusion, train_weighted_lr
from ..ml.lda import fit_lda
from ..ml.pairs import rank_pairs
from ..ml.tfidf import build_tfidf_pipeline
from ..sources.readers import load_table
from .registry import query


#: The m01 oracle embeds the engine's deterministic stop-word list
#: (functions/text.STOPWORDS_EN) so DuckDB replays the exact pipeline
#: configuration without MLlib's resource files.
from ..functions.text import STOPWORDS_EN as _SW  # noqa: E402

_M01_SW_SQL = "(" + ", ".join(f"'{s}'" for s in _SW) + ")"

M01_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id,
               list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                           t -> t NOT IN {_M01_SW_SQL}) AS ct
        FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest(list_distinct(
            ct
            || list_transform(range(1, len(ct)),
                              i -> ct[i] || ' ' || ct[i + 1])
            || list_transform(range(1, len(ct) - 1),
                              i -> ct[i] || ' ' || ct[i + 1] || ' ' || ct[i + 2])
        )) AS term
        FROM tok
    ),
    consts AS (SELECT count(*) AS n FROM documents),
    dfs AS (
        SELECT term, count(*) AS df FROM grams GROUP BY term
        HAVING count(*) >= 2 AND count(*) < (SELECT n FROM consts)
    )
    SELECT g.doc_id, g.term,
           round(ln((c.n + 1.0) / (d.df + 1.0)), 6) AS weight
    FROM grams g JOIN dfs d USING (term) CROSS JOIN consts c
    """


@query("m01_tfidf_features", oracle=M01_ORACLE)
def m01_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's feature ETL (M1–M4) on `documents`: fit the
    tokenize→stopwords→2/3-gram→union→CountVectorizer→IDF pipeline,
    then project the fitted model's OUTPUT VECTORS to hashable
    (doc_id, term, weight) rows — vector_to_array + an index→term join
    against the model's vocabulary, so the oracle value-checks the
    actual MLlib pipeline output, not a relational twin (t08/t09 cover
    that). What makes it replayable: the distinct-union feature array
    (U1, the reference's `mergeArrays`) makes TF binary, so weight =
    idf = ln((N+1)/(df+1)); mapping indices back to TERM strings
    removes any dependence on CountVectorizer's tie-ordering; terms in
    every document (idf = 0, indistinguishable from absent in a dense
    projection) are excluded on both sides; and the stop-word list is
    pinned (STOPWORDS_EN) rather than MLlib's resource default."""
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, sf_dir, "documents")
    model = build_tfidf_pipeline(min_df=2.0, stopwords=list(_SW)).fit(docs)
    out = model.transform(docs)
    vocab = model.stages[-2].vocabulary
    from ..operators.util import local_rows_df

    vocab_df = local_rows_df(
        spark, list(enumerate(vocab)), "term_idx INT, term STRING"
    )
    arr = vector_to_array(F.col("tfidf"))
    # Sparsify BEFORE exploding: zip (idx, weight), keep nonzeros —
    # the explode then carries ~nnz rows, not vocab-size rows per doc.
    pairs = F.filter(
        F.zip_with(
            arr,
            F.sequence(F.lit(0), F.size(arr) - 1),
            lambda w, i: F.struct(
                i.cast("int").alias("term_idx"), w.alias("weight")
            ),
        ),
        lambda s: s["weight"] != 0,
    )
    exploded = out.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.term_idx").alias("term_idx"), F.col("p.weight").alias("weight")
    )
    return exploded.join(F.broadcast(vocab_df), "term_idx").select(
        "doc_id", "term", F.round("weight", 6).alias("weight")
    )


#: m02's prediction artifact: a FIXED (per-process) path because the
#: oracle string is static — see plans/handshake.py for the full
#: handshake contract ($SPARK_GRAFT_SCRATCH-rooted, atomic publish,
#: sequential per check; cross-process interleave yields a visible
#: mismatch, never a false pass).
from .handshake import handshake_path as _handshake_path  # noqa: E402

_M02_PREDS_PATH = _handshake_path("m02_preds")


@query(
    "m02_lr_confusion",
    oracle=f"""
    SELECT CAST(label AS INTEGER) AS label,
           CAST(prediction AS INTEGER) AS prediction,
           CAST(count(*) AS BIGINT) AS n
    FROM read_parquet('{_M02_PREDS_PATH}/*.parquet')
    GROUP BY 1, 2
    """,
)
def m02_lr_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted LR (M5/M7/M9) + confusion matrix (M10) replayed on the
    embeddings table: label = (label >= 5), features = the embedding
    vector. Mirrors `lr.scala` end-to-end with seed 42.

    VALUE-CHECKED since round 5 (VERDICT r4 #7): the fit itself is
    iterative MLlib and stays Spark-side, but its OUTPUTS are
    SQL-expressible once materialized — the per-row predictions are
    written to a parquet artifact, the returned matrix is computed
    FROM that artifact, and the oracle re-aggregates the very same
    files in DuckDB. The check certifies the M10 aggregation and the
    artifact round-trip cross-engine; fit quality remains covered by
    the AUC/golden-label tests in tests/test_ma_pipeline.py.

    Since round 6 the scoring model takes the PERSISTENCE hop (S9,
    reference `acq_etl_code.scala:125-126`): the fitted model is
    saved to an applicationId-keyed scratch path and RELOADED, and
    the reloaded model produces the hash-checked predictions — so
    model save/load runs inside the certified loop (VERDICT r5 #1c;
    a save/load defect now fails the driver row, not just the
    roundtrip test in tests/test_ma_pipeline.py)."""
    import os

    from pyspark.ml.classification import LogisticRegressionModel
    from pyspark.ml.functions import array_to_vector

    from ..operators.aggregates import confusion_matrix

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        array_to_vector(F.col("embedding")).alias("features"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    model, train, test = train_weighted_lr(
        e, features_col="features", label_col="y", threshold=0.5
    )
    from .handshake import scratch_root

    model_path = os.path.join(
        scratch_root(),
        "mergers_acquisitions_spark_m02_model_"
        + spark.sparkContext.applicationId,
    )
    model.write().overwrite().save(model_path)
    model = LogisticRegressionModel.load(model_path)
    from ..sources.writers import publish_parquet_atomic

    publish_parquet_atomic(
        model.transform(test).select(
            "vec_id", F.col("y").alias("label"), F.col("prediction")
        ),
        _M02_PREDS_PATH,
    )
    preds = spark.read.parquet(_M02_PREDS_PATH)
    return confusion_matrix(preds, "label", "prediction").orderBy(
        "label", "prediction"
    )


#: m09's score artifact — same handshake contract as _M02_PREDS_PATH.
_M09_SCORES_PATH = _handshake_path("m09_scores")

#: Exactness argument for the ppm hash: tie-aware average ranks are
#: halves (k or k+0.5, exactly representable), their sum over an
#: eval-sized artifact stays below 2^53 (exact double arithmetic on
#: BOTH engines, any addition order), and the final AUC is a single
#: IEEE division — so the rounded ppm integer is bit-deterministic
#: cross-engine, no float-order caveats (the t28 integer-ppm recipe).
_M09_ORACLE = f"""
    WITH s AS (
        SELECT label, p1 FROM read_parquet('{_M09_SCORES_PATH}/*.parquet')
    ),
    g AS (
        SELECT p1,
               CAST(count(*) AS BIGINT) AS n_tot,
               CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos
        FROM s GROUP BY p1
    ),
    r AS (
        SELECT n_pos, n_tot,
               coalesce(sum(n_tot) OVER (
                   ORDER BY p1
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM g
    ),
    a AS (
        SELECT sum(n_pos * (cum_before + (n_tot + 1) / 2.0)) AS rank_sum,
               sum(n_pos) AS n1,
               sum(n_tot - n_pos) AS n0
        FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos,
           CAST(n0 AS BIGINT) AS n_neg,
           CAST(round((rank_sum - n1 * (n1 + 1) / 2.0) / (n1 * n0) * 1000000)
                AS BIGINT) AS auc_ppm
    FROM a
"""


@query("m09_auc_rank_sum", oracle=_M09_ORACLE)
def m09_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC, cross-engine (M6, `lr.scala:46-48`; VERDICT r5 #6):
    the weighted-LR test scores (P(y=1), from the same seed-42 fit as
    m02) are materialized to a parquet artifact, and AUC is computed
    FROM the artifact via the tie-aware Mann-Whitney rank-sum
    identity — AUC = (Σ avgrank⁺ − n₁(n₁+1)/2) / (n₁n₀), with
    average ranks from a cumulative count over DISTINCT scores (so
    no row-order dependence, and the window is distinct-score-sized).
    The oracle replays the identical formulation in DuckDB over the
    same files; see _M09_ORACLE for why the ppm integer is exact.

    M6's MLlib code path (`ml.classify.evaluate_auc`,
    BinaryClassificationEvaluator) runs INSIDE this query and is
    asserted against the rank-sum value before returning — a
    divergence beyond the evaluator's binning tolerance fails the
    driver row, not just a local test. (The evaluator bins the curve
    at numBins=1000, so it is exact only below 1000 distinct scores;
    the assertion tolerance covers the binned regime.)

    Scale note: the global ordering lives over distinct probability
    values of an EVAL artifact (test-split-sized by design). For a
    corpus-scale score table, swap the single window for the
    two-phase per-partition prefix-sum used by t19 — the rank-sum
    math is unchanged."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import Window

    from ..ml.classify import evaluate_auc
    from ..sources.writers import publish_parquet_atomic

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        array_to_vector(F.col("embedding")).alias("features"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    model, train, test = train_weighted_lr(
        e, features_col="features", label_col="y", threshold=0.5
    )
    scored = model.transform(test)
    publish_parquet_atomic(
        scored.select(
            "vec_id",
            F.col("y").alias("label"),
            vector_to_array(F.col("probability"))[1].alias("p1"),
        ),
        _M09_SCORES_PATH,
    )
    s = spark.read.parquet(_M09_SCORES_PATH)
    g = s.groupBy("p1").agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    w = Window.orderBy("p1").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "n_pos",
        "n_tot",
        F.coalesce(F.sum("n_tot").over(w), F.lit(0)).alias("cum_before"),
    )
    a = r.agg(
        F.sum(
            F.col("n_pos") * (F.col("cum_before") + (F.col("n_tot") + 1) / 2.0)
        ).alias("rank_sum"),
        F.sum("n_pos").alias("n1"),
        F.sum(F.col("n_tot") - F.col("n_pos")).alias("n0"),
    )
    out = a.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        F.round(
            (F.col("rank_sum") - F.col("n1") * (F.col("n1") + 1) / 2.0)
            / (F.col("n1") * F.col("n0"))
            * 1000000
        )
        .cast("long")
        .alias("auc_ppm"),
    )
    # M6 certification: the MLlib evaluator must agree with the exact
    # rank-sum AUC (they are the same statistic; the evaluator's only
    # slack is its 1000-bin curve discretization).
    row = out.first()
    exact_auc = row["auc_ppm"] / 1e6
    mllib_auc = evaluate_auc(model, test, label_col="y")
    if abs(mllib_auc - exact_auc) > 5e-3:
        raise AssertionError(
            f"MLlib AUC {mllib_auc} diverges from rank-sum AUC {exact_auc}"
        )
    return out


#: m03's topic-weight artifact — same handshake contract as
#: _M02_PREDS_PATH (plans/handshake.py).
_M03_TOPICS_PATH = _handshake_path("m03_topics")

_M03_ORACLE = f"""
    WITH t AS (
        SELECT topic, term, w,
               CAST(row_number() OVER (
                   PARTITION BY topic ORDER BY w DESC, term
               ) AS BIGINT) AS rk
        FROM read_parquet('{_M03_TOPICS_PATH}/*.parquet')
    )
    SELECT CAST(topic AS BIGINT) AS topic, term,
           round(w, 6) AS weight
    FROM t WHERE rk <= 5
"""


@query("m03_lda_topics", oracle=_M03_ORACLE)
def m03_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDA (M8, reference config scaled to k=5) + describeTopics(5)
    semantics: top-5 terms per topic from the column-normalized
    topics matrix.

    VALUE-CHECKED since round 6 (VERDICT r5 #4): the online-LDA fit
    was MEASURED bit-deterministic at sf0.01 — same process repeat,
    cross-process, AND cross-partitioning local[8] vs local[32]
    (PERF.md round 6, full k×vocab topicsMatrix compared as hex
    doubles) — so the artifact recipe applies: the normalized
    per-(topic, term) weights are materialized to parquet ONCE
    (normalization done driver-side in numpy so both engines rank
    identical doubles — no cross-engine float-sum in the loop), the
    returned top-5-per-topic is computed FROM the artifact with a
    rank window (weight desc, term asc tiebreak), and the oracle
    replays the identical plan in DuckDB. The fit itself remains
    certified by the determinism measurement + tests/test_ml.py;
    equivalence of this relational top-k with MLlib's
    describeTopics(5) is asserted in tests/test_ml_extra.py. The
    topicsMatrix is driver-sized by construction (k × CountVectorizer
    vocab cap) — a model-parameter collect, never data-sized."""
    from pyspark.ml.feature import CountVectorizer, RegexTokenizer
    from pyspark.sql import Window

    from ..operators.util import local_rows_df
    from ..sources.writers import publish_parquet_atomic

    docs = load_table(spark, sf_dir, "documents")
    tok = RegexTokenizer(
        inputCol="text", outputCol="tokens", pattern="\\W+", toLowercase=True
    ).transform(docs)
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", minDF=2.0).fit(tok)
    tf = cv.transform(tok)
    model = fit_lda(tf, "tf", k=5, max_iter=10, seed=42)
    m = model.topicsMatrix().toArray()  # vocab × k, driver-sized
    totals = m.sum(axis=0)
    rows = [
        (t, cv.vocabulary[j], float(m[j, t] / totals[t]))
        for t in range(m.shape[1])
        for j in range(m.shape[0])
    ]
    publish_parquet_atomic(
        local_rows_df(spark, rows, "topic BIGINT, term STRING, w DOUBLE"),
        _M03_TOPICS_PATH,
    )
    art = spark.read.parquet(_M03_TOPICS_PATH)
    w = Window.partitionBy("topic").orderBy(
        F.col("w").desc(), F.col("term").asc()
    )
    return (
        art.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("topic").cast("long").alias("topic"),
            "term",
            F.round("w", 6).alias("weight"),
        )
    )


#: m05's assignment artifact — same handshake contract as
#: _M02_PREDS_PATH (see plans/handshake.py).
_M05_PREDS_PATH = _handshake_path("m05_preds")

#: Oracle for m05 (attached at its late registration site in
#: plans/extra_queries.py): re-aggregates the materialized cluster
#: assignments cross-engine — the fit stays Spark-side, the M-family
#: aggregation downstream of it is value-checked (the m02 recipe).
M05_ORACLE = f"""
    WITH per AS (
        SELECT prediction, label, count(*) AS n
        FROM read_parquet('{_M05_PREDS_PATH}/*.parquet')
        GROUP BY 1, 2
    )
    SELECT CAST(prediction AS BIGINT) AS cluster,
           CAST(sum(n) AS BIGINT) AS n_points,
           CAST(max(n) AS BIGINT) AS majority_label_n
    FROM per
    GROUP BY 1
"""


# Registered LATE (plans/extra_queries.py) with M05_ORACLE attached.
def m05_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans over the embeddings table (k = 10, seed 42) — the
    iterative-algorithm surface (driver-coordinated Lloyd iterations,
    each a distributed job over the cached frame). Output: cluster
    sizes + how concentrated each cluster is on its majority label
    (quality signal; asserted > random in tests).

    VALUE-CHECKED since round 5 via the m02 recipe: per-row cluster
    assignments are materialized to parquet, the returned stats are
    computed FROM the artifact, and the oracle re-aggregates the same
    files in DuckDB."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", array_to_vector(F.col("embedding")).alias("features")
    )
    # Cached because BOTH the fit's Lloyd iterations and the post-fit
    # transform read it; fit_released sees the caller-owned handle and
    # leaves it alone; released before return (the artifact write is
    # this query's terminal consumer of the lineage).
    e = e.cache()
    from ..operators.util import fit_released

    model = fit_released(KMeans(k=10, seed=42, featuresCol="features"), e)
    from ..sources.writers import publish_parquet_atomic

    publish_parquet_atomic(
        model.transform(e).select("vec_id", "label", "prediction"),
        _M05_PREDS_PATH,
    )
    e.unpersist(blocking=False)
    per_label = (
        spark.read.parquet(_M05_PREDS_PATH)
        .groupBy("prediction", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_label.groupBy(F.col("prediction").cast("long").alias("cluster"))
        .agg(
            F.sum("n").cast("long").alias("n_points"),
            F.max("n").cast("long").alias("majority_label_n"),
        )
        .orderBy("cluster")
    )


@query(
    "m04_pair_ranking",
    oracle="""
    WITH acq AS (
        SELECT c_custkey AS acq_id, c_nationkey AS industry,
               c_acctbal / 10000.0 AS acq_prob
        FROM customer WHERE c_acctbal > 9000
    ),
    tgt AS (
        SELECT s_suppkey AS tgt_id, s_nationkey AS industry,
               s_acctbal / 10000.0 AS tgt_prob
        FROM supplier WHERE s_acctbal > 9000
    )
    SELECT industry, acq_id, tgt_id,
           round(acq_prob * tgt_prob, 6) AS pair_score
    FROM acq JOIN tgt USING (industry)
    WHERE acq_id <> tgt_id
    ORDER BY pair_score DESC, acq_id, tgt_id
    LIMIT 20
    """,
)
def m04_pair_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's acquirer×target pairing and joint-probability
    ranking (`predictions.scala:16-41`: filter positives → theta-join
    on industry → prob product → rank) with a deterministic stand-in
    probability (acctbal/10000) so the oracle can replay it exactly.
    Star-schema casting: customers=acquirers, suppliers=targets,
    nation=industry bucket."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    acq = c.select(
        F.col("c_custkey").alias("cik"),
        F.col("c_nationkey").alias("sic1"),
        (F.col("c_acctbal") / 10000.0).alias("prob"),
    )
    tgt = s.select(
        F.col("s_suppkey").alias("cik"),
        F.col("s_nationkey").alias("sic1"),
        (F.col("s_acctbal") / 10000.0).alias("prob"),
    )
    return rank_pairs(acq, tgt, industry_col="sic1", id_col="cik", top_k=20)
