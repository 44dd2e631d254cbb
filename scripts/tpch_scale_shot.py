#!/usr/bin/env python
"""One honest off-harness TPC-H scale validation (VERDICT r9 item 8).

Every per-round scale receipt is sf0.1 × replication through
scripts/scale_probe.py's ext-table machinery; the TPC-H join/agg plans
themselves had only gate-SF timings. This script builds a ~5× TPC-H
corpus ONCE (key-offset replication that preserves referential
integrity per replica: each replica's orders point at its own
customers, lineitems at its own orders/parts/suppliers, so join
selectivities and group cardinalities scale linearly like a bigger
TPC-H would), runs the 8 headline TPC-H rows once at sf0.1 and once at
×5 in the same session, and checks the PLAN INVARIANT: the adaptive
final plan must keep the same join strategy mix (broadcast dims stay
broadcast, no new SortMergeJoin, no BroadcastNestedLoop regressions)
at 5× the data. Results are recorded in BASELINE.md; any query
superlinear beyond the row-growth ratio gets a named cause.

    python scripts/tpch_scale_shot.py            # writes JSON to stdout

Replicated data lands under /tmp/spark_graft_tpch_x5 (built once,
reused on re-run). region/nation are fixed-size dimensions in TPC-H
(5/25 rows at every SF) and are copied, not replicated.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_tpch_x5"
FACTOR = int(os.environ.get("SPARK_GRAFT_TPCH_FACTOR", "5"))

TPCH_HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
]


def replicate(spark) -> str:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    tables = {
        t: spark.read.parquet(os.path.join(BASE_SF, f"{t}.parquet"))
        for t in (
            "region nation customer supplier part orders lineitem"
        ).split()
    }
    n_cust = tables["customer"].agg(F.max("c_custkey")).first()[0] + 1
    n_supp = tables["supplier"].agg(F.max("s_suppkey")).first()[0] + 1
    n_part = tables["part"].agg(F.max("p_partkey")).first()[0] + 1
    n_ord = tables["orders"].agg(F.max("o_orderkey")).first()[0] + 1

    def rep(name: str, offsets: dict[str, int]) -> None:
        df = tables[name]
        parts = []
        for k in range(FACTOR):
            cols = [
                (F.col(c) + k * n).alias(c) if c in offsets else F.col(c)
                for c, n in [(c, offsets.get(c, 0)) for c in df.columns]
            ]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{name}.parquet"))

    # fixed-size dimensions: copied (every TPC-H SF has 5 regions / 25
    # nations; replicating them would distort the broadcast-dim shape)
    for name in ("region", "nation"):
        tables[name].write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet")
        )
    rep("customer", {"c_custkey": n_cust})
    rep("supplier", {"s_suppkey": n_supp})
    rep("part", {"p_partkey": n_part})
    rep("orders", {"o_orderkey": n_ord, "o_custkey": n_cust})
    rep(
        "lineitem",
        {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp},
    )
    # the ext tables aren't needed by TPC-H rows, but t() loaders only
    # touch what a query references, so nothing else is required here.
    open(os.path.join(OUT, "_DONE"), "w").close()
    return OUT


_JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _plan_mix(df) -> dict[str, int]:
    """Join-strategy histogram of the ADAPTIVE FINAL plan (call after
    the query has executed so AQE has re-planned)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {op: len(re.findall(op, plan)) for op in _JOIN_OPS}


def main() -> int:
    from olr_cdc_oracle_no_dbz_spark.session import get_spark
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "tpch_scale_shot",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same small-file knob as scale_probe: at x5 the files are still
    # few; this measures the algorithm, not the file layout
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    qs = queries()
    x5 = replicate(spark)

    # warm-up (untimed): first query absorbs session cold-start
    qs[TPCH_HEADLINE[0]](spark, BASE_SF).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(sf_dir: str) -> tuple[dict[str, float], dict[str, dict]]:
        times: dict[str, list[float]] = {q: [] for q in TPCH_HEADLINE}
        mixes: dict[str, dict] = {}
        for _ in range(3):
            for q in TPCH_HEADLINE:
                df = qs[q](spark, sf_dir)
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                times[q].append(round(time.monotonic() - t0, 3))
                if q not in mixes:
                    mixes[q] = _plan_mix(df)
        return {q: sorted(ts)[1] for q, ts in times.items()}, mixes

    t_base, mix_base = run(BASE_SF)
    t_x5, mix_x5 = run(x5)

    # row growth of the fact tables (the fair yardstick for "linear")
    rows_base = spark.read.parquet(
        os.path.join(BASE_SF, "lineitem.parquet")
    ).count()
    rows_x5 = spark.read.parquet(os.path.join(x5, "lineitem.parquet")).count()
    growth = rows_x5 / rows_base

    out = {"factor": FACTOR, "lineitem_rows": [rows_base, rows_x5]}
    for q in TPCH_HEADLINE:
        ratio = round(t_x5[q] / max(t_base[q], 1e-3), 2)
        same_mix = mix_base[q] == mix_x5[q]
        out[q] = {
            "t_sf01": t_base[q],
            "t_x5": t_x5[q],
            "ratio": ratio,
            "superlinear": ratio > growth,
            "plan_mix_invariant": same_mix,
            "mix_sf01": {k: v for k, v in mix_base[q].items() if v},
            "mix_x5": {k: v for k, v in mix_x5[q].items() if v},
        }
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
