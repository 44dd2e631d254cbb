#!/usr/bin/env python
"""Per-stage task-count receipt for the remaining >2s extended queries
(VERDICT r11 item 4): the r11b `_spread` fix patched eight families by
hand, but the CAUSE — single-row-group gate parquet scanning as one
partition, plus AQE coalescing small collapsed-rep exchanges to one
partition — is global, so any stage a fan-out inherits from such a
parent serializes on one core. This probe runs each target query at
sf0.1 with the Spark UI REST API enabled and reports, per query, every
completed stage with its task count and wall duration — flagging
stages that ran >0.5 s on ONE task (the class the verdict asks to
close). Output: one JSON blob to stdout; persist as part of
SCALING_PROBE_r12.json.

Usage: python scripts/stage_probe_r12.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_TARGETS = [
    "graph_triangle_count",
    "corpus_dedup_apply",
    "embedding_pq_codes",
    "dedup_simhash_groups",
    "ann_topk_ivfpq",
]


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        data = json.loads(r.read())
    out = {}
    for s in data:
        sid = (s["stageId"], s["attemptId"])
        dur = None
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
            dur = (
                datetime.strptime(s["completionTime"], fmt)
                - datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            ).total_seconds()
        except Exception:
            pass
        out[sid] = {
            "name": s["name"].split("\n")[0][:80],
            "numTasks": s["numTasks"],
            "duration_sec": round(dur, 3) if dur is not None else None,
            "executorRunTime_sec": round(
                s.get("executorRunTime", 0) / 1000.0, 3
            ),
        }
    return out


def main() -> int:
    from olr_cdc_oracle_no_dbz_spark.session import get_spark
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    targets = sys.argv[1:] or DEFAULT_TARGETS
    spark = get_spark(
        "stage_probe_r12", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    qs = queries()
    report: dict[str, object] = {"sf_dir": SF_DIR}
    for name in targets:
        fn = qs[name]
        # warm run (memoized training, file listing) so the receipt
        # reflects the bench's warm-median shape
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        before = set(_stages(ui, app_id))
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        time.sleep(0.5)
        after = _stages(ui, app_id)
        new = {k: v for k, v in after.items() if k not in before}
        flagged = [
            v
            for v in new.values()
            if v["numTasks"] == 1
            and (
                (v["duration_sec"] or 0) > 0.5
                or v["executorRunTime_sec"] > 0.5
            )
        ]
        report[name] = {
            "wall_sec": wall,
            "n_stages": len(new),
            "stages": sorted(
                new.values(),
                key=lambda v: -(v["duration_sec"] or 0),
            )[:12],
            "single_task_over_500ms": flagged,
        }
        print(
            f"# {name}: {wall}s, {len(new)} stages, "
            f"{len(flagged)} single-task >0.5s",
            file=sys.stderr,
        )
    print(json.dumps(report, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
