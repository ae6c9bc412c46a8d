"""mergers_acquisitions_predictions_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo
``elliespathtostatistics/mergers_acquisitions_predictions`` (a Spark 2.4
Scala spark-shell M&A-prediction pipeline), built Spark-first:

- every operator is a declarative DataFrame/SQL transform so Catalyst
  can push filters, prune columns, and pick join strategies;
- no RDD stages (the reference's ``wholeTextFiles`` + lambda cleanup,
  ``acq_etl_code.scala:37-44``, becomes DataFrame text sources + column
  expressions);
- UDFs only where no builtin exists, and then Arrow-vectorized;
- the ML surface (TF-IDF, weighted LR, LDA) uses ``pyspark.ml``;
- beyond reference parity: dedup (exact/MinHash-LSH/SimHash/Jaccard),
  embedding similarity search, text analysis, multimodal plumbing, and
  event-window operators — the large-scale training-data-pipeline ops.

Layout:
    sources/    readers & writers (parquet, csv, text, whole-file text)
    operators/  relational + dedup + similarity + window operators
    functions/  column-expression libraries (text, stats, vectors)
    plans/      the named-query registry driving __spark_entry__.py
    ml/         the reference's ML pipeline surface (tfidf, LR, LDA)
    streaming/  Structured Streaming wiring of the window operators
    multimodal/ binary-column (image/audio) plumbing with stub decoders
"""

__version__ = "0.1.0"
