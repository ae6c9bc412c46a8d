"""Round 14: price the two BM25 postings claims the r13 VERDICT asked
for evidence on (VERDICT r13 #2/#3).

Leg 1 — APPEND IS O(SHARD), NOT O(INDEX): build the postings index at
N docs, then append a FIXED-size shard (10k docs) and time it. Under
the round-13 layout (stored per-row df → full old ∪ new re-range +
rewrite) the append cost grows with N; under the round-14 layout
(df derived at serve time → one job-committed shard write + a 1-row
stats merge) it is flat in N. Run the same script on a pre-change
checkout for the before numbers.

Leg 2 — HOT-TERM RANGE-PARTITION SKEW: a Zipf-shaped corpus (one
stop-term in EVERY doc, power-law tail) through both postings
layouts, measuring rows-per-partition after the range exchange:

  old  repartitionByRange(8, term)          + count-over-term window
       (the df window REQUIRED all rows of a term in one partition —
       AQE cannot split a range-required partition under a window)
  new  repartitionByRange(8, term, doc_id)  (no df, no window)

Reported: max/median partition rows and the write wall time. The old
layout pins the stop-term's entire postings row set on one partition
(guide §2.5's canonical skew); the new splits it at doc_id bounds.

Usage: python scripts/scale_bm25_append.py [n_docs ...]  # default 100000 1000000
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_1m_index import timed  # noqa: E402
from scripts.scale_bm25 import stacked_docs  # noqa: E402

SHARD_DOCS = 10_000


def append_leg(spark, sizes) -> None:
    from mergers_acquisitions_predictions_spark.operators.bm25 import (
        append_bm25_index,
        build_bm25_index,
    )

    scratch = "/tmp/mergers_acquisitions_bm25_append"
    for n in sizes:
        row: dict = {"leg": "append", "n_docs_index": int(n),
                     "n_docs_shard": SHARD_DOCS}
        path = stacked_docs(spark, n, scratch)
        docs = spark.read.parquet(path)
        # fixed-size shard from its own N-INDEPENDENT table (ids
        # disjoint from every index size) — the timed append must not
        # vary with N through its input side
        shard_path = stacked_docs(spark, SHARD_DOCS, scratch)
        shard = spark.read.parquet(shard_path).select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"), "text"
        )
        idx = f"{scratch}/bm25_{n}"
        _, row["t_build"] = timed(build_bm25_index, docs, idx)
        _, row["t_append_10k"] = timed(append_bm25_index, shard, idx)
        print(json.dumps(row), flush=True)


def zipf_skew_leg(spark, n_docs: int = 1_000_000) -> None:
    # Zipf-shaped corpus: term rank per token slot drawn as
    # floor(1/u) with u uniform-ish from a hash — P(rank ≥ k) ~ 1/k —
    # plus the stop-term t0 in EVERY doc. Deterministic (hash-derived,
    # guide §2.5's rule for synthetic keys).
    toks_per_doc = 20
    tok = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(
                F.expr(f"sequence(0, {toks_per_doc - 1})")
            ).alias("slot"),
        )
        .select(
            "doc_id",
            F.when(F.col("slot") == 0, F.lit("t0000")).otherwise(
                F.format_string(
                    "t%04d",
                    F.least(
                        F.lit(9999),
                        F.floor(
                            1e6
                            / (
                                F.pmod(
                                    F.xxhash64("doc_id", "slot"), F.lit(1_000_000)
                                )
                                + 1
                            )
                        ).cast("int"),
                    ),
                )
            ).alias("term"),
        )
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))

    def partition_histogram(df) -> dict:
        sizes = [
            r["n"]
            for r in df.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        return {
            "n_partitions": len(sizes),
            "max_rows": max(sizes),
            "median_rows": int(statistics.median(sizes)),
            "skew_ratio": round(max(sizes) / statistics.median(sizes), 2),
        }

    # OLD layout: range by term only + the df window (count-over-term
    # needs every row of a term co-located — the one-partition-per-
    # term constraint)
    old = tf.repartitionByRange(8, "term").withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("term"))
    )
    row = {"leg": "zipf_skew", "n_docs": n_docs, "layout": "old_term_range+df_window"}
    h, row["t_materialize"] = timed(
        lambda: partition_histogram(old)
    )
    row.update(h)
    print(json.dumps(row), flush=True)

    # NEW layout: range by (term, doc_id), no window — the hot term
    # splits at doc_id boundaries
    new = tf.repartitionByRange(8, "term", "doc_id")
    row = {"leg": "zipf_skew", "n_docs": n_docs, "layout": "new_term_docid_range"}
    h, row["t_materialize"] = timed(lambda: partition_histogram(new))
    row.update(h)
    print(json.dumps(row), flush=True)


def main(sizes=(100_000, 1_000_000)) -> None:
    from mergers_acquisitions_predictions_spark.session import get_spark

    spark = get_spark(app_name="scale-bm25-append")
    spark.sparkContext.setLogLevel("ERROR")
    append_leg(spark, sizes)
    zipf_skew_leg(spark)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]]
    main(tuple(sizes) if sizes else (100_000, 1_000_000))
