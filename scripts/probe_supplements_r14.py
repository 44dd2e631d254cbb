#!/usr/bin/env python
"""Round-14 scale-probe supplements (VERDICT r13 items 2, 3, 4, 8).

Each arm prints one JSON object; assembled into SCALING_PROBE_r14.json.

    python scripts/probe_supplements_r14.py cc_pull_rss
    python scripts/probe_supplements_r14.py auto_quotient
    python scripts/probe_supplements_r14.py fuzzy_topk_residue
    python scripts/probe_supplements_r14.py compaction_ab

Arms:

- ``cc_pull_rss`` — item 2: the driver union-find cutover (1M edges)
  was justified by a "≈16 MB collected" estimate that counted parquet
  bytes while ``collect()`` returns ~100-200 B Row objects. Measure
  REAL driver-process memory for a 1M-edge pull + union-find through
  (a) the r14 Arrow path (``toPandas`` on the two id columns) and
  (b) the old Row-collect path, each in its own fresh subprocess
  (``ru_maxrss`` is a high-water mark, so the paths must not share a
  process). The cutover's byte budget is restated from the measured
  Arrow number (graph.py ``_DRIVER_CC_MAX_EDGES`` comment).
- ``auto_quotient`` — item 3: deep-chain receipt for the r14 ``auto``
  shape. r13's ``auto`` paid the full 12-round labelprop budget and
  then ran star contraction FROM SCRATCH; r14 contracts the graph by
  the partial labels (quotient) so the budget rounds are not wasted.
  Compare, on the same deep-chain∪twins graph past the cutover:
  pure starcontraction, r14 auto (quotient), and the r13 shape
  (labelprop budget + star from raw edges, emulated explicitly).
  Labelings asserted identical.
- ``fuzzy_topk_residue`` — item 8: ``dedup_fuzzy_topk`` was the only
  ×5 family above 1.7× (2.06× at exactly 5.0× output). Decompose the
  growth at ×1 vs ×5 organic corpora (ext_scale_shot's grow):
  distinct-content group count, per-block rep occupancy (Σ n² bound),
  enumerated candidate mass, kernel-bearing pair-refine wall, and the
  full gate wall — naming which phase carries the super-linear
  residue.
- ``compaction_ab`` — item 4: solo warm medians for
  ``cdc_state_compaction`` (raw r12→r13 read 0.41→0.60 s on an
  untouched plan) next to two untouched stable gates under the same
  session + bracketing calibrations, for the one-line normalized
  receipt in BASELINE.md.

Run arms alone (no concurrent Spark) or the numbers are void.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark(name: str = "probe_r14"):
    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    return get_spark(name)


# ---------------------------------------------------------------------------
# cc_pull_rss
# ---------------------------------------------------------------------------

_N_EDGES_RSS = 1_000_000


def _pull_child(path: str) -> dict:
    """Subprocess body: build a 1M-edge materialized graph, then pull +
    union-find via the requested path, reporting the Python process's
    RSS high-water before/after the pull phase."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark import graph as G

    spark = _spark(f"cc_pull_{path}")
    spark.sparkContext.setLogLevel("ERROR")
    # 1M twin edges → 2M distinct bigint vertices: the worst case for
    # the union-find dicts (every vertex enters parent/verts), at the
    # exact edge count the cutover would pull
    e = (
        spark.range(_N_EDGES_RSS)
        .select(
            (F.col("id") * 2).alias("s"), (F.col("id") * 2 + 1).alias("d")
        )
    )
    e = G.truncate_lineage(e)
    e.count()  # materialize blocks before measuring the pull
    rss_before_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    if path == "arrow":
        out = G._driver_union_find(e)
        n_labels = getattr(out, G._KNOWN_ROWS_ATTR, None)
    else:  # the pre-r14 Row path, replicated verbatim for the A/B
        sample = e.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for r in sample:
            s, d = r[0], r[1]
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[max(rs, rd)] = min(rs, rd)
        verts = set()
        for r in sample:
            verts.add(r[0])
            verts.add(r[1])
        n_labels = len(verts)
    wall = round(time.time() - t0, 3)
    rss_after_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    spark.stop()
    return {
        "path": path,
        "n_edges": _N_EDGES_RSS,
        "n_labels": n_labels,
        "pull_plus_union_find_sec": wall,
        "rss_before_mb": round(rss_before_kb / 1024.0, 1),
        "rss_after_mb": round(rss_after_kb / 1024.0, 1),
        "pull_rss_delta_mb": round((rss_after_kb - rss_before_kb) / 1024.0, 1),
    }


def cc_pull_rss() -> dict:
    rows = {}
    for path in ("arrow", "rows"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_pull_child", path],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        line = [
            ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
        ][-1]
        rows[path] = json.loads(line)
    arrow_mb = rows["arrow"]["pull_rss_delta_mb"]
    return {
        "arm": "cc_pull_rss",
        "note": (
            "driver-process RSS high-water growth for the 1M-edge "
            "cutover pull + union-find, per path in a fresh process "
            "(VERDICT r13 item 2). The cutover's byte budget in "
            "graph.py is restated from the measured arrow number."
        ),
        "arrow": rows["arrow"],
        "rows_collect": rows["rows"],
        "rows_over_arrow_rss": round(
            rows["rows"]["pull_rss_delta_mb"] / max(arrow_mb, 0.1), 1
        ),
    }


# ---------------------------------------------------------------------------
# auto_quotient
# ---------------------------------------------------------------------------


def auto_quotient() -> dict:
    from olr_cdc_oracle_no_dbz_spark.graph import (
        _AUTO_LP_ROUNDS,
        _ROUNDS_ATTR,
        LabelPropDidNotConverge,
        _label_propagation,
        _star_contraction,
        connected_components,
        truncate_lineage,
    )
    from pyspark.sql import functions as F

    spark = _spark("auto_quotient_r14")
    spark.sparkContext.setLogLevel("ERROR")
    # the r13 deep-chain adversary, scaled: a 64-diameter path plus
    # ~102k twin edges, past the (probe-forced) cutover
    chain = [(i, i + 1) for i in range(63)]
    offset = 1_000_000
    twins = [(offset + 2 * i, offset + 2 * i + 1) for i in range(102_000)]
    deep = spark.createDataFrame(chain + twins, "s long, d long")

    def run(algo):
        t0 = time.time()
        out = connected_components(
            deep, algorithm=algo, max_rounds=80, driver_cutover=0
        )
        labels = {r[0]: r[1] for r in out.collect()}
        return round(time.time() - t0, 3), labels, getattr(
            out, _ROUNDS_ATTR, None
        )

    star_wall, star_labels, star_rounds = run("starcontraction")
    auto_wall, auto_labels, auto_rounds = run("auto")

    # the r13 shape, emulated explicitly: pay the labelprop budget,
    # discard the partial labels, star-contract the RAW edges
    e0 = truncate_lineage(deep.selectExpr("s", "d")).filter(
        F.col("s").isNotNull() & F.col("d").isNotNull()
    )
    e0.count()
    t0 = time.time()
    try:
        _label_propagation(e0, _AUTO_LP_ROUNDS)
        r13_labels = None  # unexpected: should not converge
    except LabelPropDidNotConverge:
        sc = _star_contraction(e0, 80)
        r13_labels = {r[0]: r[1] for r in sc.collect()}
    r13_wall = round(time.time() - t0, 3)

    spark.stop()
    return {
        "arm": "auto_quotient",
        "n_edges": len(chain) + len(twins),
        "chain_diameter": 63,
        "starcontraction_wall_sec": star_wall,
        "starcontraction_rounds": star_rounds,
        "auto_quotient_wall_sec": auto_wall,
        "auto_total_rounds": auto_rounds,
        "r13_shape_wall_sec": r13_wall,
        "auto_over_star": round(auto_wall / max(star_wall, 1e-3), 2),
        "auto_over_r13_shape": round(auto_wall / max(r13_wall, 1e-3), 2),
        "labels_auto_equals_star": auto_labels == star_labels,
        "labels_auto_equals_r13": (
            r13_labels is None or auto_labels == r13_labels
        ),
    }


# ---------------------------------------------------------------------------
# fuzzy_topk_residue
# ---------------------------------------------------------------------------


def fuzzy_topk_residue() -> dict:
    from pyspark.sql import functions as F

    from scripts.ext_scale_shot import grow

    spark = _spark("fuzzy_residue_r14")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {f: grow(spark, f) for f in (1, 5)}

    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    qs = queries()
    out: dict = {"arm": "fuzzy_topk_residue", "factors": {}}
    for f, sf in dirs.items():
        d = X.t(spark, sf, "documents").select(
            "doc_id",
            F.split("text", " ").getItem(0).alias("blk"),
            F.substring("text", 1, 80).alias("head"),
        )
        groups = d.groupBy("blk", "head").agg(F.count("*").alias("n"))
        n_groups = groups.count()
        occ = (
            groups.groupBy("blk")
            .agg(F.count("*").alias("reps"))
            .agg(
                F.sum(F.col("reps") * F.col("reps")).alias("sum_sq"),
                F.max("reps").alias("max_reps"),
                F.count("*").alias("n_blocks"),
            )
            .first()
        )
        # kernel-bearing refine wall + enumerated/refined pair mass via
        # the shared group pipeline (same block/salt/kernel machinery
        # the topk gate composes)
        t0 = time.time()
        _, _, gpairs = X._fuzzy_blocked_groups(spark, sf)
        gpairs = gpairs.filter(F.col("edit_dist") >= 0)
        n_refined = gpairs.count()
        refine_wall = round(time.time() - t0, 3)
        t0 = time.time()
        gate = qs["dedup_fuzzy_topk"](spark, sf)
        gate.write.format("noop").mode("overwrite").save()
        gate_wall = round(time.time() - t0, 3)
        n_out = qs["dedup_fuzzy_topk"](spark, sf).count()
        out["factors"][f"x{f}"] = {
            "n_groups": n_groups,
            "block_occupancy_sum_sq": int(occ["sum_sq"]),
            "max_block_reps": int(occ["max_reps"]),
            "n_blocks": int(occ["n_blocks"]),
            "refined_pairs": n_refined,
            "refine_wall_sec": refine_wall,
            "gate_wall_sec": gate_wall,
            "n_out": n_out,
        }
    x1, x5 = out["factors"]["x1"], out["factors"]["x5"]
    out["growth"] = {
        k: round(x5[k] / max(x1[k], 1e-9), 2)
        for k in (
            "n_groups",
            "block_occupancy_sum_sq",
            "refined_pairs",
            "refine_wall_sec",
            "gate_wall_sec",
            "n_out",
        )
    }
    spark.stop()
    return out


# ---------------------------------------------------------------------------
# compaction_ab
# ---------------------------------------------------------------------------


def compaction_ab() -> dict:
    from bench import _calibration_mt_sec, _calibration_sec

    spark = _spark("compaction_ab_r14")
    spark.sparkContext.setLogLevel("ERROR")
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    qs = queries()
    names = (
        "cdc_state_compaction",
        "cdc_table_checksum",
        "events_gap_islands",
    )
    calib_before = [_calibration_sec(), _calibration_mt_sec()]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for name in names:  # untimed cold pass
        qs[name](spark, BASE_SF).write.format("noop").mode(
            "overwrite"
        ).save()
    for _ in range(5):
        for name in names:
            t0 = time.time()
            qs[name](spark, BASE_SF).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(round(time.time() - t0, 3))
    calib_after = [_calibration_sec(), _calibration_mt_sec()]
    spark.stop()
    return {
        "arm": "compaction_ab",
        "sf_dir": BASE_SF,
        "calib_1t_mt_before": calib_before,
        "calib_1t_mt_after": calib_after,
        "warm_samples": samples,
        "warm_medians": {
            n: sorted(v)[len(v) // 2] for n, v in samples.items()
        },
    }


ARMS = {
    "cc_pull_rss": cc_pull_rss,
    "auto_quotient": auto_quotient,
    "fuzzy_topk_residue": fuzzy_topk_residue,
    "compaction_ab": compaction_ab,
}


def main() -> int:
    arm = sys.argv[1] if len(sys.argv) > 1 else "cc_pull_rss"
    if arm == "_pull_child":
        print(json.dumps(_pull_child(sys.argv[2])))
        return 0
    print(json.dumps(ARMS[arm]()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
