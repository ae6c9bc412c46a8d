"""Round 13: SHARD-COUNT economics of the fan-out serve (s45,
`ann_index.search_sharded_indexes`) at 1M vectors — the deployment
question the operator's docstring argues qualitatively: what do S
independent shard indexes cost to build and to serve, and what does
fan-out do to recall, versus one monolithic index?

The moving parts, priced per S ∈ {1, 2, 4, 8} (shard = vec_id % S):

- build: S fits of √(n/S) cells each — total centroid work
  S · (n/S) · √(n/S) = n·√n/√S, so sharding should make the TOTAL
  build CHEAPER (and each shard's fit independently schedulable /
  retirable — the actual reason to shard at 100 TB);
- serve: each query ADC-scans n_probe cells in EVERY shard —
  n_probe · S · (n/S)/√(n/S) = n_probe·√n·√S scanned rows, so
  fan-out serve cost should grow ~√S;
- recall: each shard's coarse quantizer is fitted on its own slice;
  probing n_probe cells per shard means the query effectively sees
  n_probe·S cells' worth of candidates — MORE containment than the
  monolithic n_probe — so recall should not drop (it may rise).

Usage: python scripts/scale_sharded.py [n] [shards ...]
       # default 1000000 1 2 4 8
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_1m_index import stacked_corpus, timed  # noqa: E402


def main(n: int = 1_000_000, shard_counts=(1, 2, 4, 8)) -> None:
    from mergers_acquisitions_predictions_spark.operators.ann_index import (
        build_ivfsq_index,
        search_sharded_indexes,
    )
    from mergers_acquisitions_predictions_spark.operators.similarity import (
        brute_force_topk,
        topk_recall,
    )
    from mergers_acquisitions_predictions_spark.session import get_spark

    spark = get_spark(app_name="scale-sharded")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = "/tmp/mergers_acquisitions_sharded"

    corpus_path, t_stack = timed(stacked_corpus, spark, n, scratch)
    corpus = spark.read.parquet(corpus_path)
    queries = corpus.filter(F.col("vec_id") < 25)
    exact = (
        brute_force_topk(queries, corpus, k=5, score_blas=True)
        .select("query_id", "candidate_id")
        .persist()
    )
    exact.count()

    for S in shard_counts:
        row = {"n": n, "shards": int(S), "t_stack": t_stack}
        paths = []
        import time

        t0 = time.perf_counter()
        for p_i in range(S):
            path = f"{scratch}/shard_{n}_{S}_{p_i}"
            build_ivfsq_index(
                corpus.filter(F.col("vec_id") % S == p_i),
                path,
                n_cells=None,
            )
            paths.append(path)
        row["t_build_total"] = round(time.perf_counter() - t0, 2)

        def serve():
            return search_sharded_indexes(
                spark, paths, queries, k=5, n_probe=2
            ).count()

        serve()  # cold (meta priming, file listings)
        row["t_serve_warm"] = min(timed(serve)[1] for _ in range(3))

        top = search_sharded_indexes(spark, paths, queries, k=5, n_probe=2)
        row["recall@5"] = round(
            float(
                topk_recall(exact, top.select("query_id", "candidate_id"), k=5)
                .agg(F.avg("recall").alias("r"))
                .first()["r"]
            ),
            3,
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    if args:
        main(args[0], tuple(args[1:]) or (1, 2, 4, 8))
    else:
        main()
