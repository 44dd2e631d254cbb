#!/usr/bin/env python
"""Round-15 scale-probe supplements (VERDICT r14 items 6, 7, 8).

Each arm prints one JSON object; assembled into SCALING_PROBE_r15.json.

    python scripts/probe_supplements_r15.py overlap_phases
    python scripts/probe_supplements_r15.py ivfpq_inline_vs_join
    python scripts/probe_supplements_r15.py ngram_shingle_ab

Arms:

- ``overlap_phases`` — item 6: the §1 measure-first phase receipt
  ``dedup_overlap_report`` never had. Times each underlying method's
  pair production solo (minhash-lsh filtered, ngram, simhash filtered)
  and the composed report, in one session with bracketing
  calibrations — naming how much of the report's wall is the three
  methods (executed 3x before the r15 cut, 1x after) vs the agreement
  join itself.
- ``ivfpq_inline_vs_join`` — item 7: A/B of the coarse-assignment
  strategies at gate scale. Arm "inline" is the shipped dispatch
  (K ≈ 152 ≤ _INLINE_K_MAX → the K·dims-literal greatest() projection,
  zero shuffle); arm "join" forces ``_nearest_cent_join`` (broadcast
  centroid table + per-vec_id window argmin — one extra shuffle of
  N·K fan-out rows) by setting ``_INLINE_K_MAX = 0`` in a FRESH
  process. Same values by the pinned shared ordering
  (tests/test_kmeans); the question is wall only. Ship the flip only
  if ≥10% on a quiet receipt (VERDICT bar).
- ``ngram_shingle_ab`` — item 8: re-measure the r13 "materializing the
  exploded shingle relation is SLOWER" receipt at ×5 organic scale
  (ext_scale_shot.grow corpus). Variant "cut" monkeypatches
  ``_shingles`` to return a lazy lineage cut (one materialization, 3
  consumers); variant "rederive" is the shipped code (3 derivations
  from the parquet scan). Both gates (dedup_ngram_jaccard,
  dedup_containment) at ×1 and ×5, each variant in a fresh process.
  Ship the cut only if faster at BOTH scales (VERDICT bar).

Run arms alone (no concurrent Spark) or the numbers are void.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _calib() -> float:
    import hashlib

    block = b"\x00" * (1 << 20)
    h = hashlib.sha256()
    t0 = time.perf_counter()
    for _ in range(1024):
        h.update(block)
    return round(time.perf_counter() - t0, 4)


def _spark(name: str = "probe_r15"):
    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    spark = get_spark(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop_median(spark, build, runs: int = 3, warm: bool = True) -> dict:
    if warm:
        build().write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    return {"median": sorted(samples)[len(samples) // 2], "samples": samples}


def overlap_phases() -> dict:
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    spark = _spark("overlap_phases")
    qs = queries()
    c0 = _calib()
    out = {"calib_before": c0}
    out["minhash_pairs"] = _noop_median(
        spark,
        lambda: X.dedup_minhash_lsh(spark, BASE_SF)
        .filter(F.col("is_dup"))
        .select("a_id", "b_id"),
    )
    out["ngram_pairs"] = _noop_median(
        spark,
        lambda: X.dedup_ngram_jaccard(spark, BASE_SF).select("a_id", "b_id"),
    )
    out["simhash_pairs"] = _noop_median(
        spark,
        lambda: X.dedup_simhash(spark, BASE_SF)
        .filter(F.col("hamming") <= 1)
        .select("a_id", "b_id"),
    )
    out["report"] = _noop_median(
        spark, lambda: qs["dedup_overlap_report"](spark, BASE_SF)
    )
    out["calib_after"] = _calib()
    spark.stop()
    return out


_IVFPQ_ARM = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from olr_cdc_oracle_no_dbz_spark.session import get_spark
from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X
if {force_join!r} == "join":
    X._INLINE_K_MAX = 0  # force _nearest_cent_join in every dispatch
spark = get_spark("ivfpq_arm")
spark.sparkContext.setLogLevel("ERROR")
qs_build = lambda: X.ann_topk_ivfpq(spark, {sf!r})
qs_build().write.format("noop").mode("overwrite").save()  # warm (trains memo)
samples = []
for _ in range(3):
    t0 = time.perf_counter()
    qs_build().write.format("noop").mode("overwrite").save()
    samples.append(round(time.perf_counter() - t0, 3))
n = qs_build().count()
print(json.dumps({{"arm": {force_join!r}, "samples": samples,
                   "median": sorted(samples)[1], "n_rows": n}}))
spark.stop()
"""


def ivfpq_inline_vs_join() -> dict:
    out = {"calib_before": _calib(), "rounds": []}
    # interleave the two arms twice so ambient drift hits both
    for _ in range(2):
        rnd = {}
        for arm in ("inline", "join"):
            code = _IVFPQ_ARM.format(repo=REPO, force_join=arm, sf=BASE_SF)
            res = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                check=True,
            )
            rnd[arm] = json.loads(res.stdout.strip().splitlines()[-1])
        out["rounds"].append(rnd)
    out["calib_after"] = _calib()
    inl = min(r["inline"]["median"] for r in out["rounds"])
    jn = min(r["join"]["median"] for r in out["rounds"])
    out["min_medians"] = {"inline": inl, "join": jn}
    out["join_over_inline"] = round(jn / inl, 3)
    return out


_NGRAM_ARM = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from olr_cdc_oracle_no_dbz_spark.session import get_spark
from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X
if {variant!r} == "cut":
    from olr_cdc_oracle_no_dbz_spark.checkpointing import truncate_lineage
    _orig = X._shingles
    X._shingles = lambda spark, sf_dir, k: truncate_lineage(
        _orig(spark, sf_dir, k), eager=False)
spark = get_spark("ngram_arm")
spark.sparkContext.setLogLevel("ERROR")
out = {{"variant": {variant!r}, "sf": {sf!r}}}
for gate in ("dedup_ngram_jaccard", "dedup_containment"):
    fn = getattr(X, gate)
    fn(spark, {sf!r}).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, {sf!r}).write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    out[gate] = {{"median": sorted(samples)[1], "samples": samples}}
print(json.dumps(out))
spark.stop()
"""


def ngram_shingle_ab() -> dict:
    from scripts.ext_scale_shot import grow

    spark = _spark("ngram_grow")
    x5 = grow(spark, 5)
    spark.stop()
    out = {"calib_before": _calib(), "points": []}
    for sf in (BASE_SF, x5):
        for variant in ("rederive", "cut"):
            code = _NGRAM_ARM.format(repo=REPO, variant=variant, sf=sf)
            res = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                check=True,
            )
            out["points"].append(json.loads(res.stdout.strip().splitlines()[-1]))
    out["calib_after"] = _calib()
    return out


def main() -> int:
    arms = {
        "overlap_phases": overlap_phases,
        "ivfpq_inline_vs_join": ivfpq_inline_vs_join,
        "ngram_shingle_ab": ngram_shingle_ab,
    }
    name = sys.argv[1]
    print(json.dumps({name: arms[name]()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
