#!/usr/bin/env python
"""Round-10 scale-probe supplements (VERDICT r9 items 2 and 5).

Each arm prints one JSON object; scripts assemble them into
SCALING_PROBE_r10.json next to the main dual-mode roster run.

    python scripts/probe_supplements_r10.py dp_share   # fuzzy DP cost share
    python scripts/probe_supplements_r10.py dp_count   # bound/prune DP counts
    python scripts/probe_supplements_r10.py twin       # exact-twin alphas (r10 refresh)
    python scripts/probe_supplements_r10.py semantic   # training-window receipt

Arms:

- ``dp_share`` — VERDICT r9 item 2's escape clause ("weak until the
  bound exists or a probe shows the DP is <20% of the family's ×4
  cost"): on the overlap ×4 corpus, time the fuzzy family's candidate
  ENUMERATION with and without the O(80²) Levenshtein DP forced, and
  divide the difference by the full gate's wall time. If the DP share
  is small, enumeration volume — already bounded by the r9
  distinct-content collapse — is the family's true scale term, and a
  heavier seeded-cutoff pruning pass (built and measured in r10,
  2.2–3.2× slower on the gate corpus — see the dedup_fuzzy_topk
  inline note) would optimize the wrong term.
- ``dp_count`` — the theorem-bound receipt on a MIXED corpus (twins +
  far texts sharing a block key): how many group pairs the
  ``_fuzzy_lb`` bound discharges before the DP for the ≤40-threshold
  gates, and how many candidate pairs the top-k mates-fill prune
  (gn ≥ 4 groups never need cross-group candidates) removes. The pure
  near-twin arm is expected UNMOVED — distances 5–9 sit far below the
  threshold, the irreducible case VERDICT r9 predicted.
- ``twin`` — r10 refresh of r9's ``exact_twin_docs``: K-fold
  IDENTICAL-text replication (the overlap mode makes near-twins for
  documents, so twin-collapse receipts need this supplement), timing
  the collapsed document-family gates at ×1/×2/×4.
- ``semantic`` — VERDICT r9 item 5: memo-controlled COLD arms for
  ``dedup_semantic`` and ``ann_topk_ivf`` at disjoint ×4 vs ×8 (fresh
  process per point, the ivfpq_training_window_receipt method), with
  a kmeans-train-only phase arm so training cost separates from the
  within-cell pairwise stage.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_probe_r10"


def _spark():
    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "probe_r10", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    return spark


def _twin_dir(spark, factor: int, mode: str = "twin") -> str:
    """K-fold documents replication. mode 'twin': byte-identical text
    (doc_id offset only). mode 'mixed': replicas 0..K/2-1 identical,
    replicas K/2.. FAR texts that keep the first word (same block key,
    distant 80-char head: the rest of the head is reversed)."""
    from pyspark.sql import functions as F

    out = os.path.join(WORK, f"{mode}_x{factor}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for k in range(factor):
        if mode == "mixed" and k == factor - 1:
            # length-divergent far text: same block key, head shorter
            # than 40 chars, so |len| alone puts every pair against an
            # 80-char head provably past the threshold — the case the
            # _fuzzy_lb bound CAN discharge without the DP
            txt = F.concat(
                F.split("text", " ").getItem(0), F.lit(" x")
            )
        elif mode == "mixed" and k >= max(factor // 2, 1):
            # anagram-far text: same block key, same length, same
            # character counts (reversal), edit distance large — the
            # case NO count/length bound can discharge (the honest
            # irreducible refine VERDICT r9 predicted)
            txt = F.concat(
                F.split("text", " ").getItem(0),
                F.lit(" "),
                F.reverse(
                    F.expr("substring(text, length(split(text, ' ')[0]) + 2)")
                ),
            )
        else:
            txt = F.col("text")
        parts.append(
            docs.select(
                (F.col("doc_id") + k * n_doc).alias("doc_id"),
                txt.alias("text"),
                "lang",
                F.concat(F.col("source"), F.lit(f"_t{k}")).alias("source"),
                "n_chars",
            )
        )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def dp_share() -> dict:
    os.environ["SPARK_GRAFT_PROBE_MODE"] = "overlap"
    import scripts.scale_probe as sp
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload import queries
    from olr_cdc_oracle_no_dbz_spark.workload.util import t as load_t

    spark = _spark()
    qs = queries()
    x4 = sp.replicate(spark, 4)

    d = load_t(spark, x4, "documents").select(
        "doc_id",
        F.split("text", " ").getItem(0).alias("blk"),
        F.substring("text", 1, 80).alias("head"),
    )
    g = d.groupBy("blk", "head").agg(F.min("doc_id").alias("gid"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = g.repartition(n_part, "blk").alias("a")
    b = g.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.gid") < F.col("b.gid")),
    )
    # warm-up: one untimed pass so scan/codegen cold-start hits neither arm
    n_pairs = pairs.count()

    def timed(df) -> float:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    # enumeration only: same join, a length checksum instead of the DP
    enum_only = pairs.select(
        (F.length(F.col("a.head")) + F.length(F.col("b.head"))).alias("c")
    )
    # enumeration + forced DP on every pair
    with_dp = pairs.select(
        F.levenshtein(F.col("a.head"), F.col("b.head")).alias("c")
    )
    t_enum = sorted(timed(enum_only) for _ in range(3))[1]
    t_dp = sorted(timed(with_dp) for _ in range(3))[1]

    def med_gate(name: str) -> float:
        return sorted(
            timed(qs[name](spark, x4)) for _ in range(3)
        )[1]

    gates = {
        n: med_gate(n)
        for n in (
            "dedup_fuzzy_levenshtein",
            "dedup_fuzzy_topk",
            "dedup_fuzzy_groups",
        )
    }
    dp_cost = max(t_dp - t_enum, 0.0)
    spark.stop()
    return {
        "mode": "overlap",
        "factor": 4,
        "n_group_pairs": n_pairs,
        "t_enumeration_only_sec": t_enum,
        "t_enumeration_plus_dp_sec": t_dp,
        "dp_arithmetic_sec": round(dp_cost, 3),
        "gate_sec": gates,
        "dp_share_of_gate": {
            n: round(dp_cost / v, 3) for n, v in gates.items()
        },
        "note": (
            "DP share = (forced-DP pass - enumeration-only pass) over the "
            "identical candidate join, divided by each gate's full wall "
            "time; shares well under 0.2 mean enumeration volume, not DP "
            "arithmetic, is the family's scale term (VERDICT r9 item 2's "
            "receipt clause)"
        ),
    }


def dp_count() -> dict:
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _fuzzy_lb,
        _fuzzy_probe_cols,
    )
    from olr_cdc_oracle_no_dbz_spark.workload.util import t as load_t

    spark = _spark()
    out: dict = {}
    for mode in ("mixed", "twin"):
        sf = _twin_dir(spark, 4, mode=mode)
        d = load_t(spark, sf, "documents").select(
            "doc_id",
            F.split("text", " ").getItem(0).alias("blk"),
            F.substring("text", 1, 80).alias("head"),
        )
        g = d.groupBy("blk", "head").agg(
            F.min("doc_id").alias("gid"), F.count("*").alias("n")
        ).select("blk", "head", "gid", "n", *_fuzzy_probe_cols())
        a, b = g.alias("a"), g.alias("b")
        pairs = a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.gid") < F.col("b.gid")),
        )
        lb = _fuzzy_lb("a.hlen", "b.hlen", "a.pcnt", "b.pcnt")
        n_all = pairs.count()
        n_bound = pairs.filter(lb <= 40).count()
        n_topk = pairs.filter(
            (F.col("a.n") <= 3) | (F.col("b.n") <= 3)
        ).count()
        out[mode] = {
            "n_block_group_pairs": n_all,
            "n_dp_after_lb_bound": n_bound,
            "lb_discharged_pct": round(
                100.0 * (n_all - n_bound) / max(n_all, 1), 1
            ),
            "n_topk_pairs_after_matesfill": n_topk,
            "matesfill_discharged_pct": round(
                100.0 * (n_all - n_topk) / max(n_all, 1), 1
            ),
        }
    spark.stop()
    out["note"] = (
        "mixed = half identical twins / half far texts sharing the block "
        "key; twin = pure identical replication. The lb bound can only "
        "discharge pairs provably beyond edit distance 40 — on 80-char "
        "heads that needs extreme length/character-count divergence, so "
        "a small pct here is the honest number, while mates-fill removes "
        "ALL cross-group work once twin groups reach 4 members."
    )
    return out


def twin() -> dict:
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    spark = _spark()
    qs = queries()
    gates = [
        "dedup_fuzzy_topk",
        "dedup_minhash_topk",
        "dedup_fuzzy_groups",
        "dedup_fuzzy_levenshtein",
    ]
    # untimed warm-up (scale_probe's r7 lesson)
    warm = _twin_dir(spark, 1)
    qs[gates[0]](spark, warm).write.format("noop").mode("overwrite").save()
    times: dict[str, dict[int, float]] = {q: {} for q in gates}
    for f in (1, 2, 4):
        sf = _twin_dir(spark, f)
        for q in gates:
            t0 = time.monotonic()
            qs[q](spark, sf).write.format("noop").mode("overwrite").save()
            times[q][f] = round(time.monotonic() - t0, 3)
    spark.stop()
    out = {}
    for q, ts in times.items():
        xs = [math.log(f) for f in sorted(ts)]
        ys = [math.log(max(ts[f], 1e-3)) for f in sorted(ts)]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs) or 1.0
        alpha = sum(
            (x - mx) * (y - my) for x, y in zip(xs, ys)
        ) / denom
        out[q] = {
            "alpha": round(alpha, 2),
            **{f"t_x{f}": ts[f] for f in sorted(ts)},
        }
    return out


_SEMANTIC_ARM = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_PROBE_MODE"] = "disjoint"
import scripts.scale_probe as sp
from olr_cdc_oracle_no_dbz_spark.session import get_spark
spark = get_spark("sem_arm", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
sf = sp.replicate(spark, {factor})
kind = {kind!r}
t0 = time.monotonic()
if kind == "kmeans_only":
    from pyspark.sql import functions as F
    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _kmeans_train, _emb_fingerprint, _dot)
    from olr_cdc_oracle_no_dbz_spark.workload.util import t
    e = t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").alias("v"),
        _dot("embedding", "embedding").alias("nsq"))
    cents = _kmeans_train(e, memo=_emb_fingerprint(sf))
    n_out = len(cents)
else:
    from olr_cdc_oracle_no_dbz_spark.workload import queries
    df = queries()[kind](spark, sf)
    df.write.format("noop").mode("overwrite").save()
    n_out = -1
print(json.dumps({{"sec": round(time.monotonic() - t0, 3), "n": n_out}}))
spark.stop()
"""


def semantic() -> dict:
    # build the replica dirs once in THIS process so the fresh-process
    # cold arms don't pay replication inside their timed region
    os.environ["SPARK_GRAFT_PROBE_MODE"] = "disjoint"
    import scripts.scale_probe as sp

    spark = _spark()
    for f in (4, 8):
        sp.replicate(spark, f)
    spark.stop()

    def arm(kind: str, factor: int) -> dict:
        code = _SEMANTIC_ARM.format(repo=REPO, factor=factor, kind=kind)
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        line = r.stdout.strip().splitlines()[-1]
        return json.loads(line)

    out: dict = {
        "note": (
            "fresh process per point (memo-controlled COLD, the "
            "ivfpq_training_window_receipt method — VERDICT r9 item 5): "
            "total = one cold end-to-end run; kmeans = the _kmeans_train "
            "phase alone under identical derivation (K = ceil(n/128), "
            "sampled-training cap). K grows with N below the 4096 cap, "
            "so flat-in-absolute kmeans seconds mean the Lloyd rounds "
            "are overhead-bound at these corpus sizes, and the "
            "within-cell pairwise stage (cost ~ N x cell, cell constant "
            "by K proportional to N) carries the scaling."
        )
    }
    for f in (4, 8):
        out[f"x{f}"] = {
            "dedup_semantic_cold_sec": arm("dedup_semantic", f)["sec"],
            "ann_topk_ivf_cold_sec": arm("ann_topk_ivf", f)["sec"],
            "kmeans_train_sec": arm("kmeans_only", f)["sec"],
            "K": arm("kmeans_only", f)["n"],
        }
    return out


def main() -> int:
    arms = sys.argv[1:] or ["dp_share", "dp_count", "twin", "semantic"]
    os.makedirs(WORK, exist_ok=True)
    for name in arms:
        fn = {
            "dp_share": dp_share,
            "dp_count": dp_count,
            "twin": twin,
            "semantic": semantic,
        }[name]
        print(json.dumps({name: fn()}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
