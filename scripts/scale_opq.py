"""Round 13 (measured-first, the §7s discipline): does an OPQ-style
ORTHOGONAL ROTATION before the subspace split — Ge et al. 2013,
"Optimized Product Quantization", here the classic eigenvalue-
allocation initialization (PCA basis, principal dims dealt to
subspaces so each subspace's log-eigenvalue mass is balanced) — buy
recall at the SAME bytes on our corpora?

Theory: PQ quantizes each dim-slice independently, so its error is
minimized when the subspaces are independent and carry EQUAL
variance. A raw embedding stack concentrates variance in a few
directions that land in whichever slice position they happen to
occupy; rotating into the eigenbasis and DEALING the eigen-dims
across subspaces (greedy log-eigval balancing — the allocation FAISS
uses to initialize OPQ) equalizes the load. A RANDOM orthogonal
rotation is measured as the control: it also spreads variance (every
rotated dim gets an average mix) but does not decorrelate, so the
gap between the two isolates how much of the win is allocation
rather than "any rotation".

Rotation is orthogonal → exact cosine ranks are unchanged, so truth
is computed ONCE on the raw corpus and both rotated routes are
scored against it. Like §7s, all routes score plain ADC over ALL
rows (no probe cut — isolates ENCODING error from shortlist
containment; the coarse quantizer would be shared anyway). Books are
per-subspace k-means fitted on each route's OWN input (raw units vs
rotated units), same M, same K. Prints one JSON line per
(corpus, K, route).

Scale note: the rotation itself is a dim×dim matmul per vector —
one numpy GEMM per Arrow batch (the `ivf_assign_blas` lesson), a
negligible cost next to the fit; at serve time a query pays one
64×64 matmul before its ADC table, also negligible.

Usage: python scripts/scale_opq.py [n]   # default 200000
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_1m_index import stacked_corpus, timed  # noqa: E402
from scripts.scale_pq_residual import decorr_corpus, fit_books_on  # noqa: E402

M = 8
DIM = 64
K_LEGS = (16, 256)


def eig_allocation_rotation(sample: np.ndarray) -> np.ndarray:
    """dim×dim orthogonal R whose columns are the second-moment
    eigenvectors dealt to M subspaces by greedy log-eigenvalue
    balancing (each subspace ends with dim/M dims and near-equal
    eigenvalue product — the OPQ init allocation)."""
    cov = sample.T @ sample / len(sample)  # second moment (no centering:
    # vectors are quantized about the origin, and centering would
    # break the unit sphere the ADC metric lives on)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    sub = DIM // M
    buckets: list[list[int]] = [[] for _ in range(M)]
    load = [0.0] * M
    for j in range(DIM):
        open_b = [m for m in range(M) if len(buckets[m]) < sub]
        m = min(open_b, key=lambda b: load[b])
        buckets[m].append(j)
        load[m] += float(np.log(max(vals[j], 1e-12)))
    cols = [j for b in buckets for j in b]
    return np.ascontiguousarray(vecs[:, cols])


def random_rotation(dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return np.ascontiguousarray(q * np.sign(np.diag(r)))


def rotate_col(Rm: np.ndarray):
    """Arrow-batched y = x @ R (one GEMM per batch)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def rot(vs: pd.Series) -> pd.Series:
        X = np.vstack(vs.to_numpy())
        return pd.Series(list(X @ Rm))

    return rot


def adc_top5(codes, q_dtab, k: int = 5):
    from mergers_acquisitions_predictions_spark.operators.pq import adc_sum

    w = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("candidate_id"))
    return (
        codes.crossJoin(F.broadcast(q_dtab))
        .filter(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id", "candidate_id", F.round(adc_sum(M), 6).alias("adc")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id")
    )


def main(n: int = 200_000) -> None:
    from mergers_acquisitions_predictions_spark.functions.vectors import (
        l2_norm,
    )
    from mergers_acquisitions_predictions_spark.operators.pq import (
        _unit,
        pq_adc_table,
        pq_encode,
    )
    from mergers_acquisitions_predictions_spark.operators.similarity import (
        brute_force_topk,
        topk_recall,
    )
    from mergers_acquisitions_predictions_spark.session import get_spark

    spark = get_spark(app_name="scale-opq")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = "/tmp/mergers_acquisitions_opq"

    for corpus_kind, mk in (
        ("stacked", stacked_corpus),
        ("decorr", decorr_corpus),
    ):
        path = mk(spark, n, scratch)
        corpus = spark.read.parquet(path)
        queries = corpus.filter(F.col("vec_id") < 5)
        exact = (
            brute_force_topk(queries, corpus, k=5)
            .select("query_id", "candidate_id")
            .persist()
        )
        exact.count()

        units = (
            corpus.select(
                F.col("vec_id").alias("candidate_id"),
                _unit(
                    F.transform("embedding", lambda x: x.cast("double")),
                    l2_norm(F.col("embedding")),
                ).alias("unit"),
            )
            .persist()
        )
        t0 = time.perf_counter()
        sample = np.vstack(
            [
                np.asarray(r["unit"])
                for r in units.sample(False, min(1.0, 50_000 / n), seed=42)
                .select("unit")
                .collect()
            ]
        )
        R_pca = eig_allocation_rotation(sample)
        t_fit_rot = round(time.perf_counter() - t0, 2)
        R_rand = random_rotation(DIM)

        frames = {"raw": units}
        for route, Rm in (("rot_pca", R_pca), ("rot_rand", R_rand)):
            frames[route] = units.select(
                "candidate_id", rotate_col(Rm)(F.col("unit")).alias("unit")
            ).persist()
            frames[route].count()

        q_units = {
            "raw": queries.select(
                F.col("vec_id").alias("query_id"),
                _unit(
                    F.transform("embedding", lambda x: x.cast("double")),
                    l2_norm(F.col("embedding")),
                ).alias("unit"),
            )
        }
        for route, Rm in (("rot_pca", R_pca), ("rot_rand", R_rand)):
            q_units[route] = q_units["raw"].select(
                "query_id", rotate_col(Rm)(F.col("unit")).alias("unit")
            )

        for K in K_LEGS:
            for route in ("raw", "rot_pca", "rot_rand"):
                row = {
                    "corpus": corpus_kind,
                    "n": n,
                    "M": M,
                    "K": K,
                    "route": route,
                }
                if route == "rot_pca":
                    row["t_fit_rotation"] = t_fit_rot
                books, row["t_fit_books"] = timed(
                    fit_books_on, frames[route], "unit", K
                )
                codes = frames[route].select(
                    "candidate_id",
                    pq_encode(F.col("unit"), books).alias("pq"),
                )
                qd = q_units[route].select(
                    "query_id",
                    pq_adc_table(F.col("unit"), books).alias("dtab"),
                )
                top = adc_top5(codes, qd)
                _, row["t_score"] = timed(top.count)
                row["recall"] = round(
                    float(
                        topk_recall(exact, top, k=5)
                        .agg(F.avg("recall").alias("r"))
                        .first()["r"]
                    ),
                    3,
                )
                print(json.dumps(row), flush=True)

        for f in frames.values():
            f.unpersist()
        exact.unpersist()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
