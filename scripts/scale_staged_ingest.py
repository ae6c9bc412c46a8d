"""Round 13: price the two exactly-once STAGING layers against each
other at high batch counts — the claim s44 makes qualitatively
(`upsert_batch` rewrites the whole staged table per batch, O(table);
`stage_batch_append_only` writes one subdirectory per batch,
O(batch)) measured as cumulative staging seconds over B batches.

Both layers feed the SAME reconcile (`reconcile_index_from_snapshot`
reads either snapshot shape), so staging cost is the whole
difference; the reconcile itself is timed once at the end for the
record. Expectation: upsert total grows ~quadratically in B (each
batch re-reads and rewrites all prior rows), append-only grows
linearly; the crossover where upsert's keyed-table convenience stops
being free is a few batches.

Usage: python scripts/scale_staged_ingest.py [batches] [rows_per_batch]
       # defaults 32 x 5000
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main(batches: int = 32, rows: int = 5000) -> None:
    from mergers_acquisitions_predictions_spark.session import get_spark
    from mergers_acquisitions_predictions_spark.streaming.serving import (
        stage_batch_append_only,
    )
    from mergers_acquisitions_predictions_spark.streaming.sinks import (
        upsert_batch,
    )

    spark = get_spark(app_name="scale-staged-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = Path("/tmp/mergers_acquisitions_staged_ab")
    if scratch.exists():
        shutil.rmtree(scratch)
    scratch.mkdir()

    def batch_df(i: int):
        # disjoint id ranges per batch — the nominal (no-replay) case
        return spark.range(i * rows, (i + 1) * rows).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda j: F.sin(F.col("id") * 17.0 + j.cast("double")),
            ).alias("embedding"),
        )

    for route in ("upsert", "append_only"):
        per_batch, t0 = [], time.perf_counter()
        target = str(scratch / route)
        for i in range(batches):
            b = batch_df(i)
            bt = time.perf_counter()
            if route == "upsert":
                upsert_batch(
                    b.withColumn("__ver", F.lit(i)),
                    target,
                    ["vec_id"],
                    "__ver",
                    batch_id=i,
                )
            else:
                stage_batch_append_only(target, b, batch_id=i)
            per_batch.append(round(time.perf_counter() - bt, 2))
        total = round(time.perf_counter() - t0, 2)
        snap = spark.read.parquet(target)
        n = snap.count()
        print(
            json.dumps(
                {
                    "route": route,
                    "batches": batches,
                    "rows_per_batch": rows,
                    "staged_rows": n,
                    "t_total_stage": total,
                    "t_first4": per_batch[:4],
                    "t_last4": per_batch[-4:],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 32,
        int(sys.argv[2]) if len(sys.argv) > 2 else 5000,
    )
