"""End-of-round hygiene sweep: run EVERY registered query twice in one
session at sf0.01, md5 the sorted frame per pass, assert pass1 ≡ pass2
bit-identically, then assert zero cached RDDs after
release_memoized_frames(). The cross-query state-leak probe the driver
harness implies (100+ queries back-to-back in one session)."""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"


def frame_md5(df) -> str:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def main(sf_dir: str = SF) -> None:
    from mergers_acquisitions_predictions_spark.operators.util import (
        release_memoized_frames,
    )
    from mergers_acquisitions_predictions_spark.plans import QUERIES
    from mergers_acquisitions_predictions_spark.session import get_spark

    spark = get_spark(app_name="two-pass-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    hashes: list[dict] = [{}, {}]
    for p in range(2):
        t0 = time.perf_counter()
        for name, fn in QUERIES.items():
            hashes[p][name] = frame_md5(fn(spark, sf_dir))
        print(f"pass{p + 1}: {len(hashes[p])} queries in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
    diff = [n for n in hashes[0] if hashes[0][n] != hashes[1][n]]
    print(f"bit-identical: {len(hashes[0]) - len(diff)}/{len(hashes[0])}"
          + (f"; MISMATCHES: {diff}" if diff else ""))
    release_memoized_frames()
    import gc

    gc.collect()
    time.sleep(2)
    leftover = [
        x.name() for x in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]
    print(f"cached RDDs after release: {len(leftover)}"
          + (f" {leftover[:5]}" if leftover else ""))
    spark.stop()
    if diff or leftover:
        sys.exit(1)


if __name__ == "__main__":
    main(*sys.argv[1:])
