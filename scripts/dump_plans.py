"""Dump `.explain("formatted")` for named queries to plans/<round>/.

Usage: python scripts/dump_plans.py before t38_bm25_topk t39_bm25_persisted_serve
       python scripts/dump_plans.py after  t38_bm25_topk

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default
r14). NOTE: queries whose bodies run eager build stages (publishes,
index builds) execute those stages at plan-construction time — run
this on a quiet host, not during a bench.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = (
    Path(__file__).resolve().parent.parent
    / "plans"
    / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if tag not in ("before", "after") or not names:
        raise SystemExit("usage: dump_plans.py before|after <query> ...")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mergers_acquisitions_predictions_spark.plans import QUERIES
    from mergers_acquisitions_predictions_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
