#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query is fully materialized via the no-op sink (forces the whole plan,
no driver collect). Set SPARK_GRAFT_CPUS to bound parallelism.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_etl_spark import queries as Q
from py_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "cdc_merge_scd1",
    "a3_last_writer_wins",
    "st_tumbling_window_agg",
    "j2_event_entity_lookup",
    "sessionize_events",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "text_stats",
    "ann_cosine_topk",
    # round 2 additions (headline set was 14 queries in BENCH_r01):
    "q2_min_cost_supplier",
    "q4_order_priority_exists",
    "q10_returned_revenue",
    "o2_case_insensitive_sort",
    "a5_partition_boundaries",
    "ivf_assign_fixed",
    # round 2, second batch:
    "q13_order_count_distribution",
    "quality_filter_gopher",
    "dedup_cc_clusters",
    "ann_ivf_topk_fixed",
    "q8_market_share",
    "q21_last_shipper",
    "range_join_followup_events",
    "q9_product_profit",
    "doc_winnow_fingerprints",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    qs = Q.queries()
    timings: dict[str, float] = {}
    # warm the JVM/codegen paths once with a trivial action
    spark.range(1).count()
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # the headline list GROWS each round (14 in r01, 27 in r02,
                # 29 now) — compare totals across rounds per-query or via
                # this normalized mean, not raw totals
                "n_queries": len(timings),
                "mean_sec_per_query": round(total / max(len(timings), 1), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
