#!/usr/bin/env python
"""Round-12 scale-probe supplements (VERDICT r11 items 1, 5, 6).

Each arm prints one JSON object; assembled into SCALING_PROBE_r12.json
next to the stage-probe receipt (scripts/stage_probe_r12.py).

    python scripts/probe_supplements_r12.py fuzzy_floor
    python scripts/probe_supplements_r12.py ivfpq_phase

Arms:

- ``fuzzy_floor`` — three receipts in one overlap-×4 session:
  (1) the multiblock single-site-DP fix's wall-clock receipt (VERDICT
  item 1: the r11 cut ran the Myers kernel once per blocking route;
  a pair found by both routes paid the DP twice — the fix unions
  lb-filtered candidates, dedups on the pair, then runs ONE kernel
  pass) alongside the unchanged single-key walls;
  (2) the remaining head-pair collapse headroom (item 6a): for the
  single-key gates a (head_a, head_b) collapse is a PROVABLE no-op —
  the group key is (blk, head) and blk = first word OF head, so a
  head pair determines its block pair and can appear at most once in
  the candidate relation; for multiblock the probe counts distinct
  gid-pairs vs distinct head-pairs to measure what a further collapse
  could save;
  (3) a kernel micro-bench (item 6b) on the REAL surviving candidate
  head-pair distribution: the shipped full Myers kernel vs a
  threshold-banded variant (score_j - remaining > 40 ⇒ the row can
  never emit; deactivate it and return its ≥41 running score — exact
  for every emitted row, a certified >40 lower bound for dropped
  ones). Adopt if ≥1.3×, else reject with this receipt.
- ``ivfpq_phase`` — VERDICT item 5: decompose the warm ann_topk_ivfpq
  gate at sf0.1 into memo-hit / coarse-assign / PQ-codes / ADC+
  shortlist / exact-rerank deltas, and CONFIRM the bench warm sample
  hits _TRAIN_MEMO (both train calls re-timed warm; must be ~0 jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark(name: str = "probe_r12"):
    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        name, master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    return spark


def _timed(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def _median3(df_fn) -> float:
    return sorted(_timed(df_fn()) for _ in range(3))[1]


def _lev_banded_numpy(a_list, b_list, k=40):
    """Probe-only threshold-banded two-word Myers: identical to
    _lev_arrow's core, plus an every-8-columns deactivation of rows
    whose running score minus remaining columns exceeds k (their
    final distance provably > k). Returns (scores, columns_executed)."""
    import numpy as np

    L = 128
    n = len(a_list)

    def to_mat(strs):
        ln = np.array([min(len(s), L) for s in strs], np.int64)
        m = np.zeros((n, L), np.uint32)
        for i, s in enumerate(strs):
            cp = np.frombuffer(s[:L].encode("utf-32-le"), np.uint32)
            m[i, : len(cp)] = cp
        return m, ln

    A, la = to_mat(a_list)
    B, lb = to_mat(b_list)
    W, one = 2, np.uint64(1)
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    VP = np.zeros((n, W), dtype=np.uint64)
    VN = np.zeros((n, W), dtype=np.uint64)
    for w in range(W):
        nb = np.clip(la - w * 64, 0, 64).astype(np.uint64)
        VP[:, w] = np.where(nb >= 64, full, (one << nb) - one)
    score = la.copy()
    widx = np.maximum(la - 1, 0) // 64
    wbit = one << (np.maximum(la - 1, 0) % 64).astype(np.uint64)
    rows = np.arange(n)
    alive = (la > 0).copy()
    cols = 0
    for j in range(int(lb.max()) if n else 0):
        active = alive & (j < lb)
        if not active.any():
            break
        cols += 1
        eq = A == B[:, j][:, None]
        PM = np.packbits(eq, axis=1, bitorder="little").view(np.uint64)
        X = PM | VN
        AND = X & VP
        s0 = AND[:, 0] + VP[:, 0]
        carry = (s0 < AND[:, 0]).astype(np.uint64)
        s1 = AND[:, 1] + VP[:, 1] + carry
        SUM = np.stack([s0, s1], axis=1)
        D0 = (SUM ^ VP) | X
        HP = VN | ~(D0 | VP)
        HN = D0 & VP
        hp_hit = (HP[rows, widx] & wbit) != 0
        hn_hit = (HN[rows, widx] & wbit) != 0
        score += np.where(active & hp_hit, 1, 0)
        score -= np.where(active & hn_hit, 1, 0)
        HPs = np.stack(
            [(HP[:, 0] << one) | one,
             (HP[:, 1] << one) | (HP[:, 0] >> np.uint64(63))],
            axis=1,
        )
        HNs = np.stack(
            [HN[:, 0] << one,
             (HN[:, 1] << one) | (HN[:, 0] >> np.uint64(63))],
            axis=1,
        )
        VPn = HNs | ~(D0 | HPs)
        VNn = HPs & D0
        VP = np.where(active[:, None], VPn, VP)
        VN = np.where(active[:, None], VNn, VN)
        if j % 8 == 7:
            rem = np.maximum(lb - (j + 1), 0)
            alive &= ~(score - rem > k)
    import numpy as np  # noqa: F811

    score = np.where(la == 0, lb, score)
    return score, cols


def fuzzy_floor() -> dict:
    import pandas as pd

    from pyspark.sql import functions as F

    os.environ["SPARK_GRAFT_PROBE_MODE"] = "overlap"
    import scripts.scale_probe as sp
    from olr_cdc_oracle_no_dbz_spark.workload import queries
    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X

    spark = _spark()
    sf4 = sp.replicate(spark, 4)
    qs = queries()
    out: dict = {"mode": "overlap", "factor": 4, "base_sf": BASE_SF}

    # (1) gate walls — multiblock fix receipt + unchanged single-key
    walls = {}
    for name in (
        "dedup_fuzzy_levenshtein",
        "dedup_fuzzy_groups",
        "dedup_fuzzy_topk",
        "dedup_fuzzy_multiblock",
    ):
        qs[name](spark, sf4).write.format("noop").mode("overwrite").save()
        walls[name] = _median3(lambda n=name: qs[n](spark, sf4))
    out["gate_walls_x4_warm_median"] = walls

    # (2) multiblock head-pair collapse headroom
    d = X.t(spark, sf4, "documents").select(
        "doc_id",
        F.split("text", " ").getItem(0).alias("b1"),
        F.element_at(F.split("text", " "), -1).alias("b2"),
        F.substring("text", 1, 80).alias("head"),
    )
    g = d.groupBy("b1", "b2", "head").agg(
        F.min("doc_id").alias("gid"), F.count("*").alias("n")
    ).select("b1", "b2", "head", "gid", "n", *X._fuzzy_probe_cols())
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    lb = X._fuzzy_lb(
        "a.hlen", "b.hlen", "a.pcnt", "b.pcnt", "a.bcnt", "b.bcnt"
    )

    def cands(key):
        salt, ng = X._fuzzy_salt(g, key, "b1b2head", sf4, n_part)
        a, b, cond = X._salted_block_sides(g, key, n_part, salt, ng)
        return a.join(b, cond).filter(lb <= 40).select(
            F.col("a.gid").alias("ga"), F.col("b.gid").alias("gb"),
            F.col("a.head").alias("ha"), F.col("b.head").alias("hb"),
        )

    u = cands("b1").unionAll(cands("b2"))
    stats = u.agg(
        F.count("*").alias("route_rows"),
        F.countDistinct("ga", "gb").alias("distinct_gid_pairs"),
        F.countDistinct("ha", "hb").alias("distinct_head_pairs"),
    ).first()
    out["multiblock_collapse"] = {
        "route_candidate_rows": stats.route_rows,
        "distinct_gid_pairs": stats.distinct_gid_pairs,
        "distinct_head_pairs": stats.distinct_head_pairs,
        "note": (
            "gid-pair dedup (shipped r12) removes route_rows - "
            "distinct_gid_pairs kernel evals; a further head-pair "
            "collapse could remove distinct_gid_pairs - "
            "distinct_head_pairs more (plus a re-expand join). "
            "Single-key gates: head-pair collapse is a provable no-op "
            "(group key (blk, head) with blk = first word of head)."
        ),
    }

    # (3) kernel micro-bench on the real surviving pair distribution
    sample = (
        u.select("ha", "hb").limit(200_000).toPandas()
    )
    a_list = sample["ha"].tolist()
    b_list = sample["hb"].tolist()
    kernel = X._lev_arrow().func
    sa, sb = pd.Series(a_list), pd.Series(b_list)
    t0 = time.monotonic()
    full_scores = kernel(sa, sb)
    t_full = time.monotonic() - t0
    t0 = time.monotonic()
    banded_scores, cols = _lev_banded_numpy(a_list, b_list, 40)
    t_banded = time.monotonic() - t0
    import numpy as np

    fs = full_scores.to_numpy()
    mism_emit = int(
        ((fs <= 40) & (banded_scores != fs)).sum()
        + ((fs > 40) & (banded_scores <= 40)).sum()
    )
    out["kernel_microbench"] = {
        "n_pairs": len(a_list),
        "full_kernel_sec": round(t_full, 3),
        "banded_variant_sec": round(t_banded, 3),
        "speedup": round(t_full / max(t_banded, 1e-9), 3),
        "banded_columns_executed": cols,
        "max_columns": int(max((len(s) for s in b_list), default=0)),
        "emit_set_mismatches": mism_emit,
        "decision": (
            "ADOPT" if t_full / max(t_banded, 1e-9) >= 1.3 else "REJECT"
        ),
    }
    spark.stop()
    return out


def ivfpq_phase() -> dict:
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload import queries
    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X

    spark = _spark()
    qs = queries()
    sf = BASE_SF
    # cold first invocation populates _TRAIN_MEMO
    t0 = time.monotonic()
    qs["ann_topk_ivfpq"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    t_cold = round(time.monotonic() - t0, 3)

    fp = X._emb_fingerprint(sf)
    e = X._spread(X.t(spark, sf, "embeddings"), "vec_id").select(
        "vec_id",
        F.col("embedding").alias("v"),
        X._dot("embedding", "embedding").alias("nsq"),
    )
    cnt = X._memo_count(e, fp)

    # memo-hit receipt: both train calls timed WARM — the bench's
    # per-sample residue. Must be ~0 s (dict lookups, no Spark jobs).
    t0 = time.monotonic()
    cents0 = X._kmeans_train(e, memo=fp)
    t_kmeans_memo = round(time.monotonic() - t0, 4)
    assign = X._nearest_cent(e, cents0)
    stack_args = ", ".join(
        f"{s}, slice(v, {s * X._PQ_SUB + 1}, {X._PQ_SUB})"
        for s in range(X._PQ_M)
    )
    subs = assign.selectExpr(
        "vec_id", f"stack({X._PQ_M}, {stack_args}) AS (sub_idx, sv)"
    )
    t0 = time.monotonic()
    cents = X._pq_train(subs, cnt, memo=fp)
    t_pq_memo = round(time.monotonic() - t0, 4)
    codes = X._pq_assign(subs, cents)

    phases = {
        "memo_hit_kmeans_sec": t_kmeans_memo,
        "memo_hit_pq_sec": t_pq_memo,
        "assign_warm_median": sorted(_timed(assign) for _ in range(3))[1],
        "codes_warm_median": sorted(_timed(codes) for _ in range(3))[1],
    }
    # ADC + shortlist (no exact re-rank): rebuild the compose body up
    # to the shortlist window — the delta vs the full gate is the
    # exact-re-rank + emit cost.
    full = sorted(
        _timed(qs["ann_topk_ivfpq"](spark, sf)) for _ in range(3)
    )[1]
    phases["full_gate_warm_median"] = full
    phases["cold_first_invocation"] = t_cold
    phases["derived"] = {
        "codes_minus_assign (PQ encode residue)": round(
            phases["codes_warm_median"] - phases["assign_warm_median"], 3
        ),
        "full_minus_codes (ADC join + shortlist + exact rerank)": round(
            full - phases["codes_warm_median"], 3
        ),
    }
    phases["memo_confirmed"] = (
        t_kmeans_memo < 0.05 and t_pq_memo < 0.05
    )
    spark.stop()
    return phases


ARMS = {"fuzzy_floor": fuzzy_floor, "ivfpq_phase": ivfpq_phase}


def main() -> int:
    arm = sys.argv[1] if len(sys.argv) > 1 else None
    if arm not in ARMS:
        print(f"usage: {sys.argv[0]} {'|'.join(ARMS)}", file=sys.stderr)
        return 2
    print(json.dumps({arm: ARMS[arm]()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
