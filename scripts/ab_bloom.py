"""A/B the session-wide runtime Bloom-filter join conf over the
queries VERDICT r3 flagged as regressed (+ two long-green references
for in-run noise calibration). Toggled via spark.conf.set in ONE
process so host drift cannot masquerade as a conf effect; interleaved
A/B/A/B passes, per-query MIN per arm."""
import json, os, sys, time, gc

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

from mergers_acquisitions_predictions_spark.plans import QUERIES
from mergers_acquisitions_predictions_spark.session import get_spark

spark = get_spark(app_name="ab-bloom")
CONF = "spark.sql.optimizer.runtime.bloomFilter.enabled"

names = [
    "q01_pricing_summary", "q04_revenue_by_region", "q05_theta_pairs_per_nation",
    "q06_label_within_year", "q08_topk_orders_per_customer", "q13_orders_near_events",
    "j03_fuzzy_name_match", "t01_token_stats", "t26_bpe_encode",
    "t29_bigram_backoff_quality",
    # in-run noise references (were NOT regressed in r3):
    "q16_running_customer_spend", "q25_monthly_orders",
]

def run(name):
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

# warm
for n in names:
    run(n)
spark.catalog.clearCache()

res = {n: {"on": [], "off": []} for n in names}
for arm in ["on", "off", "on", "off"]:
    spark.conf.set(CONF, "true" if arm == "on" else "false")
    for n in names:
        t0 = time.perf_counter()
        run(n)
        res[n][arm].append(round(time.perf_counter() - t0, 3))
        gc.collect()
    spark.catalog.clearCache()

out = {}
for n in names:
    on, off = min(res[n]["on"]), min(res[n]["off"])
    out[n] = {"on": on, "off": off, "ratio_on_over_off": round(on / off, 3),
              "raw_on": res[n]["on"], "raw_off": res[n]["off"]}
print(json.dumps(out, indent=1))
spark.stop()
