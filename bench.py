#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced through the noop sink (full pipeline runs on
executors, nothing funnels to the driver) — the same shape a cluster
write has, so the timings reflect distributed cost, not collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: one representative per operator family (SURVEY.md §2) — the queries a
#: user of the reference would actually run continuously, plus the [ext]
#: LLM-pipeline workload.
HEADLINE = [
    "cdc_current_state",       # A1/K2: LWW materialization
    "cdc_state_enriched",      # §3.2 whole-pipeline flagship
    "tpch_q1_pricing_summary", # scan+agg throughput
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",  # multi-way broadcast star join
    "tpch_q4_order_priority",  # EXISTS → left-semi join
    "tpch_q13_customer_distribution",  # outer join + double aggregation
    "tpch_q18_large_orders",   # HAVING group-filter + join-back
    "agg_basic",               # groupBy agg catalog
    "window_tumbling",         # A5 windowed agg
    "window_session",          # A7 session windows
    "join_interval",           # J2 interval join
    "window_rank_frames",      # W2 analytic windows
    "scalar_json",             # §2.7 JSON family on events
    "dedup_exact",             # ext: hash dedup
    "dedup_minhash_lsh",       # ext: banded LSH near-dup
    "ann_topk_bruteforce",     # ext: broadcast k-NN
    "text_tfidf_top_terms",    # ext: text analysis
    "corpus_pipeline",         # ext: composed quality→dedup→split flow
]


def main() -> int:
    import re

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0
    from olr_cdc_oracle_no_dbz_spark.session import get_spark
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    spark = get_spark("bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs]

    # JVM/codegen warmup on the smallest table so q1 isn't taxed for it
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
