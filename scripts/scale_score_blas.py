"""A/B the exact-baseline scoring paths at deployment scale
(VERDICT r9 #4): `brute_force_topk` fold vs `score_blas=True` on a
synthetic 1M×64d corpus with 200 queries — the recall-harness shape
PERF.md r8 measured at ~75 s of interpreted HOF cosine. Also asserts
the two paths return the SAME rows (the parity-scope empirical leg at
scale, mirroring tests/test_blas_similarity.py at the SFs).

Run:  python scripts/scale_score_blas.py [n_corpus] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    dim = 64
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mergers_acquisitions_predictions_spark.operators.similarity import (
        brute_force_topk,
    )

    # deterministic synthetic vectors (no RNG — reproducible rows)
    corpus = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    F.pmod(F.col("id") * F.lit(31) + i.cast("long") * F.lit(17), F.lit(997))
                    / F.lit(997.0)
                    - F.lit(0.5)
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    corpus.count()
    queries = corpus.filter(F.col("vec_id") < nq)

    results = {}
    for label, kwargs in (("fold", {}), ("blas", {"score_blas": True})):
        t0 = time.time()
        rows = sorted(map(tuple, brute_force_topk(queries, corpus, k=5, **kwargs).collect()))
        dt = time.time() - t0
        results[label] = rows
        print(f"{label}: {dt:.1f} s  ({len(rows)} rows)")
    same = results["fold"] == results["blas"]
    print("parity:", "IDENTICAL" if same else "DIVERGED")
    if not same:
        diff = [
            (a, b)
            for a, b in zip(results["fold"], results["blas"])
            if a != b
        ][:10]
        print("first diffs:", diff)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
