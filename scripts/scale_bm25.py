"""Round 13: BM25 postings-index economics at scale — price the
build, and measure what the t39 serve's two scale levers are worth:

1. **Term In-pushdown** (the row-group pruning the plan assert
   certifies qualitatively): serve from the term-range-sorted
   postings with the query-term In-predicate vs the same serve with
   pushdown disabled (`spark.sql.parquet.filterPushdown=false`) —
   the delta is what footer-level pruning buys on a postings table
   whose vocabulary dwarfs any query.
2. **Amortization**: the in-memory `bm25_topk` re-tokenizes and
   re-aggregates the corpus per query batch; the persisted serve
   pays that once at build. The crossover is ~1 serve.

Corpus: the sf0.1 documents table stacked C× with distinct doc_ids
(same text distribution — term statistics scale with the corpus).
Queries: the 3-doc top-terms workload of t38/t39.

Usage: python scripts/scale_bm25.py [n_docs ...]   # default 100000 1000000
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_1m_index import timed  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
BASE_DOCS = 5000


def stacked_docs(spark, n: int, scratch: str) -> str:
    copies = n // BASE_DOCS
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = f"{scratch}/docs_{n}"
    (
        base.crossJoin(spark.range(copies).select(F.col("id").alias("copy")))
        .select(
            (F.col("doc_id") + F.col("copy") * BASE_DOCS).alias("doc_id"),
            "text",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def main(sizes=(100_000, 1_000_000)) -> None:
    from mergers_acquisitions_predictions_spark.operators.bm25 import (
        bm25_topk,
        build_bm25_index,
        search_bm25_index,
    )
    from mergers_acquisitions_predictions_spark.session import get_spark

    spark = get_spark(app_name="scale-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = "/tmp/mergers_acquisitions_bm25"

    for n in sizes:
        row: dict = {"n_docs": int(n)}
        path, row["t_stack"] = timed(stacked_docs, spark, n, scratch)
        docs = spark.read.parquet(path)
        # the t38 workload shape: top terms of the 3 lowest-id docs —
        # here just 3 fixed literal terms per query doc, avoiding the
        # tf-idf derivation (this leg prices the SERVE, not the
        # workload derivation)
        qrows = [
            (qid, t)
            for qid, terms in enumerate(
                [["spark", "data", "pipeline"]] * 3
            )
            for t in terms
        ]
        # pull real frequent terms instead: 9 mid-df terms of the base
        top_terms = [
            r["term"]
            for r in (
                docs.filter(F.col("doc_id") < 50)
                .select(
                    "doc_id",
                    F.explode(
                        F.expr(
                            "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
                        )
                    ).alias("term"),
                )
                .groupBy("term")
                .count()
                .orderBy(F.desc("count"), "term")
                .limit(9)
                .collect()
            )
        ]
        qrows = [(i // 3, t) for i, t in enumerate(top_terms)]
        q = spark.createDataFrame(qrows, "query_id long, term string")

        idx = f"{scratch}/bm25_{n}"
        _, row["t_build"] = timed(build_bm25_index, docs, idx)

        def serve():
            return search_bm25_index(spark, idx, q, k=5).count()

        serve()  # cold
        row["t_serve_pushdown"] = min(timed(serve)[1] for _ in range(3))

        spark.conf.set("spark.sql.parquet.filterPushdown", "false")
        try:
            serve()
            row["t_serve_no_pushdown"] = min(timed(serve)[1] for _ in range(3))
        finally:
            spark.conf.set("spark.sql.parquet.filterPushdown", "true")

        def inmem():
            return bm25_topk(docs, q, k=5).count()

        inmem()
        row["t_inmemory"] = min(timed(inmem)[1] for _ in range(2))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]]
    main(tuple(sizes) if sizes else (100_000, 1_000_000))
