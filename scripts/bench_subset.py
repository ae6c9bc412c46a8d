"""Run bench.py's EXACT measurement cycle for a named subset.

Usage: python scripts/bench_subset.py d03_jaccard_pairs d15_winnow_containment

Replicates the harness precisely — warm pass, clearCache, two timed
passes in opposite orders (bench.py's r6 interleave) with per-query
MIN, gc.collect between queries — so numbers recorded here are
directly comparable to BENCH_r{N}.json rows. Prints one JSON line per
invocation.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_subset.py <query> [<query> ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from mergers_acquisitions_predictions_spark.plans import QUERIES
    from mergers_acquisitions_predictions_spark.session import get_spark

    spark = get_spark(app_name="mergers-acquisitions-spark-bench-subset")

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        run(name)
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for _pass in range(2):
        ordered = names if _pass == 0 else list(reversed(names))
        for name in ordered:
            t0 = time.perf_counter()
            run(name)
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            gc.collect()
        spark.catalog.clearCache()

    print(json.dumps({"queries": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
