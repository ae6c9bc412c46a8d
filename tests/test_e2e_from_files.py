"""Full end-to-end from RAW FILES: per-filing text files on disk
(paths carrying cik + date, the reference's EDGAR tree shape) →
whole-file corpus scan → linkage → labeling → TF-IDF → weighted LR →
ranked pairs. The complete reference dataflow with no in-memory
shortcuts."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mergers_acquisitions_predictions_spark.ml.classify import evaluate_auc, train_weighted_lr
from mergers_acquisitions_predictions_spark.ml.tfidf import build_tfidf_pipeline
from mergers_acquisitions_predictions_spark.pipeline import (
    label_filings,
    link_deals_to_companies,
    predict_pairs,
)
from mergers_acquisitions_predictions_spark.sources.readers import read_corpus_dir

from .fixtures import make_fixtures


@pytest.mark.slow
def test_full_pipeline_from_corpus_files(spark, tmp_path):
    companies, filings, deals = make_fixtures(n_companies=25, filings_per_company=4)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i, f in enumerate(filings):
        (corpus / f"{f['report_date']}_filing_{f['cik']}.txt").write_text(
            f["text"] or " "
        )

    # discover the date/cik segment positions from an actual scan URI
    probe = (
        spark.read.format("text")
        .load(str(corpus))
        .select(F.input_file_name().alias("f"))
        .first()
        .f
    )
    segs = re.split(r"/|_", probe)
    date_seg = next(i for i, s in enumerate(segs) if re.fullmatch(r"\d{4}-\d{2}-\d{2}", s)) + 1
    cik_seg = next(i for i, s in enumerate(segs) if s.endswith(".txt")) + 1

    filings_df = (
        read_corpus_dir(spark, str(corpus), date_segment=date_seg, cik_segment=cik_seg)
        .withColumn("cik", F.regexp_replace("cik", r"\.txt$", ""))
        .filter(F.length(F.trim("text")) > 0)
    )
    assert filings_df.count() == sum(1 for f in filings if f["text"].strip())

    linked = link_deals_to_companies(
        spark.createDataFrame(deals), spark.createDataFrame(companies), "acquirer_name"
    )
    labeled = label_filings(filings_df, linked).withColumnRenamed("acquired", "label")
    assert labeled.filter("label = 1").count() > 0

    feats = build_tfidf_pipeline(min_df=2.0).fit(labeled).transform(labeled)
    model, train, test = train_weighted_lr(feats, features_col="tfidf")
    assert 0.0 <= evaluate_auc(model, test) <= 1.0

    scored = model.transform(feats).select("cik", "prediction", "probability")
    pairs = predict_pairs(
        scored, scored, spark.createDataFrame(companies), top_k=10
    ).collect()
    assert pairs and all(r.acq_cik != r.tgt_cik for r in pairs)
