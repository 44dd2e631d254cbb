#!/usr/bin/env python
"""Round-11 scale-probe supplements (VERDICT r10 items 1, 4, 6, 7).

Each arm prints one JSON object; assembled into SCALING_PROBE_r11.json
next to the main dual-mode roster run.

    python scripts/probe_supplements_r11.py dp_variants
    python scripts/probe_supplements_r11.py dp_count
    python scripts/probe_supplements_r11.py ivfpq_phase
    python scripts/probe_supplements_r11.py semantic_cap
    python scripts/probe_supplements_r11.py cosine_occupancy

Arms:

- ``dp_variants`` — VERDICT r10 item 1's receipt, and the measurement
  that re-aimed it: on the overlap ×4 corpus, time the fuzzy family's
  candidate enumeration with (a) no DP, (b) the full Levenshtein,
  (c) the banded 3-arg form, and (d) the r10 select-then-filter shape
  that evaluated the DP TWICE (Catalyst inlines projected expressions
  into pushed-down predicates). The r11 gates run shape (c) exactly
  once per pair inside a Generate node; the receipt shows (d) ≈ 2×(c),
  i.e. the round's real win was single-site evaluation, with banding a
  ~9% bonus.
- ``dp_count`` — the theorem-bound receipt re-run with the r11 BIGRAM
  term: the mixed corpus's anagram-far arm (reversed text — same
  length, same character counts) is constructed so the char-bag bound
  CANNOT fire; reversal destroys asymmetric bigrams, so the bigram
  bound discharges exactly those pairs. Twin arm expected unmoved.
- ``ivfpq_phase`` — VERDICT r10 item 6: split the warm ivfpq gate cost
  into assign / codes / ADC / shortlist / full deltas at sf0.1 (the
  memoized-training residue is whatever assign+codes re-pay per
  invocation; training itself is fingerprint-memoized per session).
- ``semantic_cap`` — VERDICT r10 item 7: one arm where the centroid
  cap BINDS. At disjoint ×8 (16 000 vectors) the derived K is 125
  under the production cap 4096 (non-binding); forcing the cap to 64
  makes cells grow ~2× instead. Fresh process per point; the pair of
  cold timings shows what the cap trades when it binds: bounded
  training/collect/broadcast against a within-cell pairwise stage that
  grows with cell size — the 100 TB deployment dial the _IVF_K_MAX
  comment documents.
- ``cosine_occupancy`` — VERDICT r10 item 4: explain
  dedup_embedding_cosine_groups' overlap α 0.74 with the bucket
  machinery's own numbers at ×1/×2/×4: distinct vectors, derived bit
  count, bucket count, max/mean occupancy, candidate pairs, emitted
  rows. If candidate growth tracks the emitted group-pair relation,
  the exponent is output-bound (the fuzzy argument); if candidates
  outgrow output, it's banding skew.
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


def _spark(name: str = "probe_r11"):
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


def dp_variants() -> dict:
    os.environ["SPARK_GRAFT_PROBE_MODE"] = "overlap"
    import scripts.scale_probe as sp
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload import queries
    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _fuzzy_lb,
        _fuzzy_probe_cols,
    )
    from olr_cdc_oracle_no_dbz_spark.workload.util import t as load_t

    spark = _spark()
    qs = queries()
    x4 = sp.replicate(spark, 4)
    d = load_t(spark, x4, "documents").select(
        "doc_id",
        F.split("text", " ").getItem(0).alias("blk"),
        F.substring("text", 1, 80).alias("head"),
    )
    g = d.groupBy("blk", "head").agg(F.min("doc_id").alias("gid")).select(
        "blk", "head", "gid", *_fuzzy_probe_cols()
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = g.repartition(n_part, "blk").alias("a")
    b = g.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.gid") < F.col("b.gid")),
    )
    n_pairs = pairs.count()  # warm-up doubles as the count
    lb = _fuzzy_lb(
        "a.hlen", "b.hlen", "a.pcnt", "b.pcnt", "a.bcnt", "b.bcnt"
    )
    lev = F.levenshtein(F.col("a.head"), F.col("b.head"))
    lev_b = F.levenshtein(F.col("a.head"), F.col("b.head"), 40)
    arms = {
        "enum_only": pairs.select(
            (F.length("a.head") + F.length("b.head")).alias("c")
        ),
        "full_dp": pairs.select(lev.alias("c")),
        "banded_dp": pairs.select(lev_b.alias("c")),
        # the r10 gate shape: projected DP + pushed-down filter — the
        # optimizer inlines the DP into the predicate, evaluating it
        # twice per surviving row
        "r10_double_eval": pairs.select(
            lb.alias("lb"), lev_b.cast("bigint").alias("ed")
        ).filter((F.col("lb") <= 40) & (F.col("ed") >= 0)),
        # the r11 gate shape: single Generate-node evaluation
        "r11_single_site": pairs.filter(lb <= 40).select(
            F.explode(
                F.filter(
                    F.array(lev_b.cast("bigint")), lambda x: x >= 0
                )
            ).alias("ed")
        ),
    }
    out: dict = {"mode": "overlap", "factor": 4, "n_group_pairs": n_pairs}
    for name, df in arms.items():
        out[name + "_sec"] = sorted(_timed(df) for _ in range(3))[1]
    gates = {}
    for name in (
        "dedup_fuzzy_levenshtein",
        "dedup_fuzzy_topk",
        "dedup_fuzzy_groups",
    ):
        gates[name] = sorted(
            _timed(qs[name](spark, x4)) for _ in range(3)
        )[1]
    out["gate_sec"] = gates
    spark.stop()
    out["note"] = (
        "r10_double_eval is the select-then-filter shape the r10 gates "
        "ran (DP inlined into the pushed-down predicate — ~2× the "
        "banded single pass); r11_single_site is the Generate-node "
        "shape the r11 gates run. banded vs full is the 3-arg "
        "threshold form's own margin."
    )
    return out


def dp_count() -> dict:
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _fuzzy_lb,
        _fuzzy_probe_cols,
    )
    from olr_cdc_oracle_no_dbz_spark.workload.util import t as load_t
    from scripts.probe_supplements_r10 import _twin_dir

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
        lb_char = _fuzzy_lb("a.hlen", "b.hlen", "a.pcnt", "b.pcnt")
        lb_full = _fuzzy_lb(
            "a.hlen", "b.hlen", "a.pcnt", "b.pcnt", "a.bcnt", "b.bcnt"
        )
        n_all = pairs.count()
        n_char = pairs.filter(lb_char <= 40).count()
        n_full = pairs.filter(lb_full <= 40).count()
        out[mode] = {
            "n_block_group_pairs": n_all,
            "n_dp_after_char_bound": n_char,
            "n_dp_after_char_plus_bigram": n_full,
            "char_discharged_pct": round(
                100.0 * (n_all - n_char) / max(n_all, 1), 1
            ),
            "full_discharged_pct": round(
                100.0 * (n_all - n_full) / max(n_all, 1), 1
            ),
        }
        if mode == "mixed":
            # hypothetical tighter contracts: the bound's firing power
            # where the threshold/length geometry PERMITS firing
            for t_hyp in (10, 20):
                nc = pairs.filter(lb_char <= t_hyp).count()
                nf = pairs.filter(lb_full <= t_hyp).count()
                out[mode][f"hypothetical_t{t_hyp}"] = {
                    "char_discharged_pct": round(
                        100.0 * (n_all - nc) / max(n_all, 1), 1
                    ),
                    "char_plus_bigram_discharged_pct": round(
                        100.0 * (n_all - nf) / max(n_all, 1), 1
                    ),
                }
    spark.stop()
    out["note"] = (
        "mixed = identical twins + anagram-far (reversed) texts + "
        "length-divergent texts sharing block keys. HONEST RESULT, "
        "two layers: (1) at the family's actual contract (threshold "
        "40, 80-char heads) the bigram bound is PROVABLY vacuous — a "
        "head has ≤79 bigrams, so L1(bigram counts) ≤ 158 < 4·41 and "
        "no per-edit-impact-4 count bound can certify lev > 40; "
        "VERDICT r10 item 1b is refuted by arithmetic, not by a weak "
        "corpus. (2) Even at hypothetical t=10/20 the bigram term "
        "added 0 over the char bound HERE: the word-salad heads carry "
        "only ~15–25 probe-bigram occurrences, capping the bigram "
        "bound near ⌈40/4⌉=10 — its win condition is real-text bigram "
        "density AND a tight threshold. The term is kept (sound, "
        "~0.4 s of a 26 s gate, fires on prose-like corpora) with "
        "this no-win receipt; the t=10/20 char rows (16.9%/4.0%) are "
        "the length-divergence arm firing, not character counts."
    )
    return out


def ivfpq_phase() -> dict:
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload import queries
    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X

    spark = _spark()
    qs = queries()
    sf = BASE_SF
    # warm: training memos populate, codegen warms
    qs["ann_topk_ivfpq"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    e = X.t(spark, sf, "embeddings").select(
        "vec_id",
        F.col("embedding").alias("v"),
        X._dot("embedding", "embedding").alias("nsq"),
    )
    fp = X._emb_fingerprint(sf)
    cnt = X._memo_count(e, fp)
    cents0 = X._kmeans_train(e, memo=fp)
    assign = X._nearest_cent(e, cents0)
    stack_args = ", ".join(
        f"{s}, slice(v, {s * X._PQ_SUB + 1}, {X._PQ_SUB})"
        for s in range(X._PQ_M)
    )
    subs = assign.selectExpr(
        "vec_id", f"stack({X._PQ_M}, {stack_args}) AS (sub_idx, sv)"
    )
    cents = X._pq_train(subs, cnt, memo=fp)
    codes = X._pq_assign(subs, cents)
    out = {
        "sf_dir": sf,
        "t_assign": sorted(_timed(assign) for _ in range(3))[1],
        "t_codes": sorted(_timed(codes) for _ in range(3))[1],
        "t_full_gate": sorted(
            _timed(qs["ann_topk_ivfpq"](spark, sf)) for _ in range(3)
        )[1],
    }
    spark.stop()
    out["note"] = (
        "warm medians; training is memoized so t_assign (coarse "
        "assignment, corpus-sized) and t_codes (grid-prefiltered PQ "
        "code assignment, includes t_assign's work as its input) are "
        "the per-invocation residue; full gate minus t_codes ≈ ADC "
        "join + shortlist window + exact re-rank."
    )
    return out


_CAP_ARM = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_PROBE_MODE"] = "disjoint"
import scripts.scale_probe as sp
from olr_cdc_oracle_no_dbz_spark.session import get_spark
import olr_cdc_oracle_no_dbz_spark.workload.ext_queries as X
X._IVF_K_MAX = {cap}
X._IVF_TRAIN_CAP = {cap} * X._IVF_CELL
spark = get_spark("cap_arm", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
sf = sp.replicate(spark, {factor})
from pyspark.sql import functions as F
e = X.t(spark, sf, "embeddings").select(
    "vec_id", F.col("embedding").alias("v"),
    X._dot("embedding", "embedding").alias("nsq"))
t0 = time.monotonic()
cents = X._kmeans_train(e, memo=X._emb_fingerprint(sf))
t_train = round(time.monotonic() - t0, 3)
t0 = time.monotonic()
from olr_cdc_oracle_no_dbz_spark.workload import queries
queries()["dedup_semantic"](spark, sf).write.format("noop").mode("overwrite").save()
t_sem = round(time.monotonic() - t0, 3)
print(json.dumps({{"K": len(cents), "kmeans_train_sec": t_train,
                   "dedup_semantic_after_train_sec": t_sem}}))
spark.stop()
"""


def semantic_cap() -> dict:
    os.environ["SPARK_GRAFT_PROBE_MODE"] = "disjoint"
    import scripts.scale_probe as sp

    spark = _spark()
    sp.replicate(spark, 8)
    spark.stop()

    def arm(cap: int) -> dict:
        code = _CAP_ARM.format(repo=REPO, cap=cap, factor=8)
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [
            ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
        ][-1]
        return json.loads(line)

    out = {
        "factor": 8,
        "cap_4096_nonbinding": arm(4096),
        "cap_64_binding": arm(64),
        "note": (
            "disjoint ×8 = 16 000 vectors; derived K = 125 under the "
            "production cap (non-binding) vs 64 forced (binding → "
            "cells ~2× larger). Fresh process per arm (cold, "
            "memo-controlled). The binding arm trades a smaller "
            "training/collect/broadcast footprint for a within-cell "
            "pairwise stage that grows with cell size — measured, not "
            "asserted (VERDICT r10 item 7)."
        ),
    }
    return out


def cosine_occupancy() -> dict:
    os.environ["SPARK_GRAFT_PROBE_MODE"] = "overlap"
    import scripts.scale_probe as sp
    from pyspark.sql import functions as F

    from olr_cdc_oracle_no_dbz_spark.workload import queries
    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X

    spark = _spark()
    qs = queries()
    out: dict = {"mode": "overlap"}
    for f in (1, 2, 4):
        sf = sp.replicate(spark, f)
        emb = X.t(spark, sf, "embeddings")
        g = emb.groupBy("embedding").agg(
            F.min("vec_id").alias("gid"), F.count("*").alias("n")
        )
        n_groups = g.count()
        bits = X._sign_bits(n_groups)
        e = g.select(
            "gid",
            F.col("embedding").alias("v"),
        ).select(
            "gid", F.expr(X._sign_bucket(bits).format(v="v")).alias("bucket")
        )
        occ = e.groupBy("bucket").count()
        stats = occ.agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_occ"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias(
                "cand_pairs"
            ),
        ).first()
        n_out = qs["dedup_embedding_cosine_groups"](spark, sf).count()
        out[f"x{f}"] = {
            "n_distinct_vectors": n_groups,
            "bits": bits,
            "n_buckets": int(stats.n_buckets),
            "max_bucket_occ": int(stats.max_occ),
            "in_bucket_candidate_pairs": int(stats.cand_pairs),
            "emitted_rows": n_out,
        }
    spark.stop()
    x1, x4 = out["x1"], out["x4"]
    out["candidate_growth_x4"] = round(
        x4["in_bucket_candidate_pairs"]
        / max(x1["in_bucket_candidate_pairs"], 1),
        2,
    )
    out["output_growth_x4"] = round(
        x4["emitted_rows"] / max(x1["emitted_rows"], 1), 2
    )
    out["note"] = (
        "VERDICT r10 item 4: if candidate growth ≈ output growth the "
        "overlap α 0.74 is output-bound (the emitted group-pair "
        "relation itself grows — the fuzzy families' argument); "
        "candidates outgrowing output would instead indicate sign-"
        "bucket density skew worth a derived-salt fix."
    )
    return out


def main() -> int:
    arms = sys.argv[1:] or [
        "dp_variants",
        "dp_count",
        "ivfpq_phase",
        "semantic_cap",
        "cosine_occupancy",
    ]
    for name in arms:
        fn = {
            "dp_variants": dp_variants,
            "dp_count": dp_count,
            "ivfpq_phase": ivfpq_phase,
            "semantic_cap": semantic_cap,
            "cosine_occupancy": cosine_occupancy,
        }[name]
        print(json.dumps({name: fn()}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
