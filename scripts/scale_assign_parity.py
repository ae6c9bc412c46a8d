"""The round-loop 1M BLAS-parity leg (VERDICT r9 #6): assert
`ivf_assign_blas` picks the same probed cells as the fold path on a
1M-vector jittered stack — the deployment-default path at scale runs
in no registered oracle row, so this scripted check (plus the seeded
tie-boundary test in tests/test_blas_similarity.py) is its guard.

Uses 100 cells so the FOLD leg stays ~a minute (the parity question
is per-(vector, centroid) rounding, not cell count; the 1000-cell
build-cost story lives in scale_1m_index.py).

Run:  python scripts/scale_assign_parity.py [n_vectors] [n_cells]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    from pyspark.sql import SparkSession

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
        collect_centroid_rows,
        ivf_assign_blas,
        ivf_assign_literal,
        ivf_centroids,
    )

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = n // 2000
    corpus = (
        base.crossJoin(spark.range(copies).select(F.col("id").alias("copy")))
        .select(
            (F.col("vec_id") + F.col("copy") * 2000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + 0.05
                * F.sin(F.col("vec_id") * 131 + F.col("copy") * 17 + i.cast("double")),
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    corpus.count()
    cent_rows = collect_centroid_rows(ivf_centroids(corpus, n_cells))
    for probes in (1, 2):
        t0 = time.time()
        fold = (
            ivf_assign_literal(corpus, cent_rows, "vid", probes)
            .select("vid", "cell_id")
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum(F.hash("vid", "cell_id").cast("long")).alias("h"),
            )
            .first()
        )
        t_fold = time.time() - t0
        t0 = time.time()
        blas = (
            ivf_assign_blas(corpus, cent_rows, "vid", probes)
            .select("vid", "cell_id")
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum(F.hash("vid", "cell_id").cast("long")).alias("h"),
            )
            .first()
        )
        t_blas = time.time() - t0
        same = (fold["n"], fold["h"]) == (blas["n"], blas["h"])
        print(
            f"probes={probes}: fold {t_fold:.1f} s, blas {t_blas:.1f} s, "
            f"n={fold['n']}, parity={'IDENTICAL' if same else 'DIVERGED'}"
        )
        if not same:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
