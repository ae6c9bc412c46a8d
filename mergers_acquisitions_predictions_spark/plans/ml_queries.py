"""ML-surface queries (SURVEY §2.8). MLlib fit() results aren't
SQL-expressible, so m01–m03 are rows-only checks (the driver records
the weaker gate; deterministic-seed property tests live in
tests/test_ml.py). m04 replays the reference's final pairing stage
with a deterministic score so it IS oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.classify import confusion, train_weighted_lr
from ..ml.lda import fit_lda, topics_as_rows
from ..ml.pairs import rank_pairs
from ..ml.tfidf import build_tfidf_pipeline
from ..sources.readers import load_table
from .registry import query


@query("m01_tfidf_features")  # rows-only: Vector columns aren't oracle-hashable
def m01_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's feature ETL (M1–M4) on `documents`: fit the
    tokenize→stopwords→2/3-gram→union→CountVectorizer→IDF pipeline and
    report per-doc vector shape (dim + nnz — deterministic even though
    the Vector itself can't be hashed by the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    model = build_tfidf_pipeline(min_df=2.0).fit(docs)
    out = model.transform(docs)
    # numNonzeros via the ml-vector -> array bridge (SURVEY §1.1).
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("tfidf"))
    return out.select(
        "doc_id",
        F.size(arr).cast("long").alias("vocab_size"),
        F.size(F.filter(arr, lambda x: x != 0)).cast("long").alias("nnz"),
    )


@query("m02_lr_confusion")  # rows-only: model training isn't SQL
def m02_lr_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted LR (M5/M7/M9) + confusion matrix (M10) replayed on the
    embeddings table: label = (label >= 5), features = the embedding
    vector. Mirrors `lr.scala` end-to-end with seed 42."""
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        array_to_vector(F.col("embedding")).alias("features"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    model, train, test = train_weighted_lr(
        e, features_col="features", label_col="y", threshold=0.5
    )
    return confusion(model, test, label_col="y").orderBy("label", "prediction")


@query("m03_lda_topics")  # rows-only: EM-LDA isn't SQL
def m03_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDA (M8, reference config scaled to k=5) + describeTopics(5)
    flattened via the in-plan vocabulary lookup (no driver loop)."""
    from pyspark.ml.feature import CountVectorizer, RegexTokenizer

    docs = load_table(spark, sf_dir, "documents")
    tok = RegexTokenizer(
        inputCol="text", outputCol="tokens", pattern="\\W+", toLowercase=True
    ).transform(docs)
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", minDF=2.0).fit(tok)
    tf = cv.transform(tok)
    model = fit_lda(tf, "tf", k=5, max_iter=10, seed=42)
    return topics_as_rows(model, cv.vocabulary, top_n=5)


# Registered LATE (plans/extra_queries.py): rows-only — a no-oracle row
# inside the driver's 50-entry window would displace a value-parity one.
def m05_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans over the embeddings table (k = 10, seed 42) — the
    iterative-algorithm surface (driver-coordinated Lloyd iterations,
    each a distributed job over the cached frame). Output: cluster
    sizes + how concentrated each cluster is on its majority label
    (quality signal; asserted > random in tests)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", array_to_vector(F.col("embedding")).alias("features")
    )
    # Cached because BOTH the fit's Lloyd iterations and the post-fit
    # transform read it; fit_released sees the caller-owned handle and
    # leaves it alone, own_caches releases it with the result.
    e = e.cache()
    from ..operators.util import fit_released, own_caches

    model = fit_released(KMeans(k=10, seed=42, featuresCol="features"), e)
    scored = model.transform(e)
    per_label = scored.groupBy("prediction", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = (
        per_label.groupBy(F.col("prediction").cast("long").alias("cluster"))
        .agg(
            F.sum("n").cast("long").alias("n_points"),
            F.max("n").cast("long").alias("majority_label_n"),
        )
        .orderBy("cluster")
    )
    return own_caches(out, e)


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
