#!/usr/bin/env python
"""Round-13 scale-probe supplements (VERDICT r12 items 2, 3, 8).

Each arm prints one JSON object; assembled into SCALING_PROBE_r13.json.

    python scripts/probe_supplements_r13.py cc_scale
    python scripts/probe_supplements_r13.py regress_ab

Arms:

- ``cc_scale`` — two receipts in one session:
  (1) item 2 (single execution): a >100k-edge random pair graph whose
  edge pipeline carries a Spark accumulator (incremented once per row
  evaluated), fed to connected_components past the driver cutover.
  The r12 shape executed the pair pipeline TWICE (limit-probe, then
  the distributed rounds recomputing from scratch); the r13 contract
  lineage-cuts at entry, so the accumulator must read ~n_edges, not
  ~2×. Labels are cross-checked against the driver union-find on the
  SAME graph (cutover lifted), and against starcontraction.
  (2) item 8 (deep-chain adversary): a 64-vertex path ∪ ~100k twin
  edges (past the cutover, so the distributed arms own it). Label
  propagation needs O(diameter)=63 rounds; star contraction O(log n).
  Both round counts recorded (``_graft_cc_rounds``), labelings
  asserted identical — certifying the O(log n) path is the escape
  hatch it claims to be, and that labelprop now RAISES (instead of
  silently returning a split component) when max_rounds is too small.
- ``regress_ab`` — item 3: same-session warm medians of the three r12
  raw-regression gates (cdc_join_view_maintenance,
  events_attribution_last_touch, dedup_simhash) with bracketing
  calibrations, for a normalized r11/r12/r13 receipt in BASELINE.md.
  Run alone (no concurrent Spark) or the numbers are void.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark(name: str = "probe_r13"):
    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    return get_spark(name)


def cc_scale() -> dict:
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from olr_cdc_oracle_no_dbz_spark.graph import (
        _ROUNDS_ATTR,
        connected_components,
    )

    spark = _spark()
    out: dict = {"arm": "cc_scale"}

    # ---- (1) single-execution receipt on a >100k-edge graph --------
    rng = random.Random(13)
    n_edges = 120_000
    n_verts = 80_000
    rows = [
        (rng.randrange(n_verts), rng.randrange(n_verts))
        for _ in range(n_edges)
    ]
    acc = spark.sparkContext.accumulator(0)

    @F.udf(returnType=LongType())
    def counted(x):
        acc.add(1)
        return x

    # the "pair pipeline": a repartition + per-row python UDF so every
    # re-execution is visible in the accumulator (one increment per
    # edge row per execution)
    edges = (
        spark.createDataFrame(rows, "s long, d long")
        .repartition(32)
        .select(counted("s").alias("s"), F.col("d"))
    )
    t0 = time.time()
    labels_dist = connected_components(edges)  # 120k > cutover
    dist_wall = round(time.time() - t0, 3)
    dist_rows = {r[0]: r[1] for r in labels_dist.collect()}
    executions = acc.value / float(n_edges)
    out["single_execution"] = {
        "n_edges": n_edges,
        "distributed_wall_sec": dist_wall,
        "labelprop_rounds": getattr(labels_dist, _ROUNDS_ATTR, None),
        "pipeline_row_evals_over_n_edges": round(executions, 3),
        "single_execution_ok": executions < 1.5,
    }
    # same graph through the driver union-find (cutover lifted) and
    # star contraction: all three labelings must agree
    acc2_base = acc.value
    t0 = time.time()
    labels_drv = connected_components(edges, driver_cutover=10**9)
    drv_wall = round(time.time() - t0, 3)
    drv_rows = {r[0]: r[1] for r in labels_drv.collect()}
    t0 = time.time()
    labels_star = connected_components(edges, algorithm="starcontraction")
    star_wall = round(time.time() - t0, 3)
    star_rows = {r[0]: r[1] for r in labels_star.collect()}
    out["single_execution"]["driver_wall_sec"] = drv_wall
    out["single_execution"]["star_wall_sec"] = star_wall
    out["single_execution"]["star_rounds"] = getattr(
        labels_star, _ROUNDS_ATTR, None
    )
    out["single_execution"]["labels_equal_driver"] = dist_rows == drv_rows
    out["single_execution"]["labels_equal_star"] = dist_rows == star_rows
    out["single_execution"]["n_labels"] = len(dist_rows)
    del acc2_base

    # ---- (2) deep-chain adversary past the cutover ------------------
    chain = [(i, i + 1) for i in range(63)]
    offset = 1_000_000
    twins = [(offset + 2 * i, offset + 2 * i + 1) for i in range(102_000)]
    deep = spark.createDataFrame(chain + twins, "s long, d long")
    t0 = time.time()
    lp = connected_components(deep, max_rounds=80)
    lp_wall = round(time.time() - t0, 3)
    lp_rows = {r[0]: r[1] for r in lp.collect()}
    t0 = time.time()
    sc = connected_components(deep, algorithm="starcontraction")
    sc_wall = round(time.time() - t0, 3)
    sc_rows = {r[0]: r[1] for r in sc.collect()}
    # and the convergence guard: the default 30-round budget must
    # RAISE on a 63-deep component, not return a split labeling
    raised = False
    try:
        connected_components(deep, max_rounds=30)
    except RuntimeError:
        raised = True
    out["deep_chain"] = {
        "n_edges": len(chain) + len(twins),
        "chain_diameter": 63,
        "labelprop_rounds": getattr(lp, _ROUNDS_ATTR, None),
        "labelprop_wall_sec": lp_wall,
        "starcontraction_rounds": getattr(sc, _ROUNDS_ATTR, None),
        "starcontraction_wall_sec": sc_wall,
        "labelings_identical": lp_rows == sc_rows,
        "labelprop_raises_at_default_budget": raised,
    }
    spark.stop()
    return out


def regress_ab() -> dict:
    from bench import _calibration_mt_sec, _calibration_sec

    spark = _spark("regress_ab_r13")
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    qs = queries()
    names = (
        "cdc_join_view_maintenance",
        "events_attribution_last_touch",
        "dedup_simhash",
    )
    calib_before = [_calibration_sec(), _calibration_mt_sec()]
    samples: dict[str, list[float]] = {n: [] for n in names}
    # one untimed cold pass, then 5 warm samples interleaved
    for name in names:
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
        "arm": "regress_ab",
        "sf_dir": BASE_SF,
        "calib_1t_mt_before": calib_before,
        "calib_1t_mt_after": calib_after,
        "warm_samples": samples,
        "warm_medians": {
            n: sorted(v)[len(v) // 2] for n, v in samples.items()
        },
    }


def simhash_phase() -> dict:
    """VERDICT r12 item 4: decompose the warm dedup_simhash gate at
    sf0.1 into signature-pipeline / candidate-join / hamming+emit
    phases (the paa_phase pattern), count the row mass at each stage,
    and measure a width+1 banding variant (smaller buckets => less
    false-candidate mass; the 4-band pigeonhole still catches every
    hamming<=3 pair at ANY w — but the signature meaning shifts with
    w, so adoption would be a contract change replayed in the oracle).
    Run alone."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    spark = _spark("simhash_phase_r13")
    qs = queries()
    d = X.t(spark, BASE_SF, "documents")
    n = d.count()

    def wall(df) -> float:
        best = None
        for _ in range(2):  # min-of-2: first sample pays warmup
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    # warm-up (parquet footer/codegen caches)
    full_cold = wall(qs["dedup_simhash"](spark, BASE_SF))
    out: dict = {"arm": "simhash_phase", "sf_dir": BASE_SF, "n_docs": n}
    toks = F.explode(F.split("text", " "))
    sig, w = X._simhash_sig(d, toks, n)
    out["w_bits_per_band"] = w
    out["full_cold_sec"] = full_cold
    out["sig_only_sec"] = wall(sig)
    cand = X._simhash_cand(sig, w)
    out["cand_sec"] = wall(cand)
    out["n_cand"] = cand.count()
    gate = qs["dedup_simhash"](spark, BASE_SF)
    out["full_warm_sec"] = wall(gate)
    out["n_out"] = gate.count()
    # width+1 variant: same signature pipeline with nbits = 4*(w+1)
    # (bucket count x16 per band)
    t0 = time.time()
    sig2, _ = X._simhash_sig(d, toks, n)  # rebuild for fairness
    base_rebuild = round(time.time() - t0, 3)
    del sig2, base_rebuild
    wplus = w + 1
    nbits2 = X._SIMHASH_BANDS * wplus
    tok = (
        X._spread(d, "doc_id")
        .select("doc_id", toks.alias("tk"))
        .groupBy("doc_id", F.expr(X._SPARK_SIMHASH_HV).alias("hv"))
        .agg(F.count("*").alias("cnt"))
    )
    sums = tok.groupBy("doc_id").agg(*X._simhash_cols(nbits2))
    glob = sums.agg(
        *[F.sum(f"s{j}").alias(f"g{j}") for j in range(nbits2)]
    )
    sigp = sums.crossJoin(F.broadcast(glob)).selectExpr(
        "doc_id",
        f"CAST({X._sig_int_centered(n, nbits2)} AS BIGINT) AS sig",
    )
    candp = X._simhash_cand(sigp, wplus)
    t0 = time.time()
    n_candp = candp.count()
    out["wplus_cand_count_sec"] = round(time.time() - t0, 3)
    out["wplus_n_cand"] = n_candp
    hamp = F.expr("bit_count(xsig ^ ysig)")
    gatep = candp.select(
        "a_id", "b_id", hamp.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= 3)
    out["wplus_full_sec"] = wall(gatep)
    out["wplus_n_out"] = gatep.count()
    spark.stop()
    return out


ARMS = {
    "cc_scale": cc_scale,
    "regress_ab": regress_ab,
    "simhash_phase": simhash_phase,
}


def main() -> int:
    arm = sys.argv[1] if len(sys.argv) > 1 else "cc_scale"
    print(json.dumps(ARMS[arm]()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
