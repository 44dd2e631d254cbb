#!/usr/bin/env python
"""Solo-gate timing harness for optimization A/B work (r14).

Times the named gates in ONE fresh engine session with the bench's
noop-sink methodology: per gate, one untimed warm-up run (JVM/codegen +
any lazily-built artifacts), then N timed runs whose MEDIAN is
reported. Prints one JSON line. Never run concurrently with bench or
another Spark job (verify SKILL gotcha — shared-container timings
distort).

Usage: python scripts/ab_gate.py gate1 gate2 ... [--runs N]

``AB_GATE_ROOT`` (env) points the import at another checkout (a base
worktree arm) while running THIS file — so a pre-ab_gate base revision
can still be timed with the identical harness (ADVICE r14).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0,
    os.environ.get("AB_GATE_ROOT")
    or os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)


def main() -> int:
    # argparse (ADVICE r14): the old hand-parser only understood
    # --runs=N (the docstring's "--runs N" form became an unknown gate
    # and exited 2) and silently dropped any other --flag.
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("gates", nargs="+", help="registered query names")
    p.add_argument("--runs", type=int, default=3)
    ns = p.parse_args()
    args = ns.gates
    runs = ns.runs
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from olr_cdc_oracle_no_dbz_spark.session import get_spark
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    spark = get_spark("ab_gate")
    qs = queries()
    names = [n for n in args if n in qs]
    missing = [n for n in args if n not in qs]
    if missing:
        print(f"unknown gates: {missing}", file=sys.stderr)
        return 2
    # same warm-up discipline as bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    out: dict[str, object] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"ab_gate warmup {name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"ab_gate {name} run{i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "median": sorted(samples)[len(samples) // 2],
            "samples": samples,
        }
    print(json.dumps({"gates": out, "runs": runs, "sf_dir": sf_dir}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
