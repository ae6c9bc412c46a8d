"""LDA topic modeling (SURVEY §2.8 M8; `acq_etl_code.scala:106-117`)."""

from __future__ import annotations

from pyspark.ml.clustering import LDA
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_lda(
    df: DataFrame,
    features_col: str = "tf",
    k: int = 20,
    max_iter: int = 20,
    concentration: float = 0.25,
    seed: int = 42,
):
    """Reference config: k=20, maxIter=20, doc/topic concentration 0.25
    (`acq_etl_code.scala:109`), on term-count vectors. Optimizer is
    the ml.LDA default "online" — the one the reference gets implicitly
    (EM rejects concentrations < 1, so 0.25 implies online)."""
    return LDA(
        featuresCol=features_col,
        k=k,
        maxIter=max_iter,
        docConcentration=[concentration],
        topicConcentration=concentration,
        optimizer="online",
        seed=seed,
    ).fit(df)


def topics_as_rows(model, vocabulary: list[str], top_n: int = 5) -> DataFrame:
    """`describeTopics(5)` (`acq_etl_code.scala:112-117`) flattened to
    (topic, term, weight) rows WITHOUT the reference's driver-side
    vocabulary lookup loop (`:115-117` collects termIndices and
    resolves them in driver memory): the vocabulary array is a literal
    column and the lookup is `element_at` inside the plan."""
    topics = model.describeTopics(top_n)
    vocab = F.array(*[F.lit(v) for v in vocabulary])
    pairs = F.arrays_zip("termIndices", "termWeights")
    return (
        topics.select("topic", F.explode(pairs).alias("tw"))
        .select(
            F.col("topic").cast("long").alias("topic"),
            F.element_at(vocab, F.col("tw.termIndices") + 1).alias("term"),
            F.round(F.col("tw.termWeights"), 6).alias("weight"),
        )
    )
