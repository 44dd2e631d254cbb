#!/usr/bin/env python
"""Organic-growth scale shot for the dedup/ANN/series families
(VERDICT r10 item 3).

Every prior ext-family scale receipt replicated sf0.1 K-fold with
perturbations (scale_probe's disjoint/overlap modes). This shot
instead grows the corpus with DISTINCT NEW content in the SHARED key
space — the way a real corpus grows — and times one cold pass of one
representative per family at ×1 and ×5:

- documents: per-replica cyclic word substitution over the corpus's
  OWN vocabulary (rank r → rank (r + 7k) mod V, a bijection on words).
  Within-replica near-dup structure is preserved exactly (twins map to
  twins); cross-replica texts share no positional words (far pairs);
  and every block/shingle/band key stays inside the shared vocabulary,
  so cross-replica bucket collisions happen exactly as they would
  between unrelated real documents — distinct-content volume genuinely
  grows 5×, unlike the twin/overlap modes whose collapse absorbs it.
- embeddings: per-replica cyclic coordinate rotation
  (i → (i + 13k) mod 64): norm-preserving, identical per-coordinate
  distribution (sign-bucket and IVF-cell space shared), cross-replica
  cosine decorrelated — 5× distinct vectors in the same space.
- events: user/event id offset + per-replica day rotation inside the
  corpus's own 30-day window ((d + 6k) mod 30): per-user series stay
  internally structured but distinct, and the PAA band space is shared.

Each (query, factor) point runs in a FRESH process (memo-controlled
cold — the ivfpq_training_window_receipt method), so the ratio
measures end-to-end organic growth, not warm-path residue.

Usage:  python scripts/ext_scale_shot.py [out.json]
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
WORK = "/tmp/spark_graft_ext_shot"

#: one representative per ext family (VERDICT r10 item 3's list)
QUERIES = [
    "dedup_minhash_groups",
    "dedup_simhash_groups",
    "dedup_fuzzy_topk",
    "timeseries_paa_groups",
    "ann_topk_ivfpq",
    "dedup_embedding_cosine_topk",
    # r13: the apply representative — pairs → size-gated CC on the
    # twin-collapsed group relation → corpus join; the shot certifies
    # the whole apply path's organic growth, not just pair emission
    "dedup_fuzzy_apply",
]

#: events span (days) in the generated corpus — the day-rotation modulus
_EV_DAYS = 30


def grow(spark, factor: int) -> str:
    """Materialize the ×factor organic corpus under WORK (cached)."""
    from pyspark.sql import functions as F

    out = os.path.join(WORK, f"x{factor}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    ev = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    n_usr = ev.agg(F.max("user_id")).first()[0] + 1
    n_evt = ev.agg(F.max("event_id")).first()[0] + 1

    # the corpus's own vocabulary, rank-ordered (driver-side: ~31 words)
    vocab = [
        r.w
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .distinct()
        .orderBy("w")
        .collect()
    ]
    nv = len(vocab)

    def word_map(k: int):
        # bijection: rank r → rank (r + 7k) mod V; k=0 is identity
        pairs = []
        for r, w in enumerate(vocab):
            pairs += [F.lit(w), F.lit(vocab[(r + 7 * k) % nv])]
        return F.create_map(*pairs)

    d_parts = []
    for k in range(factor):
        if k == 0:
            txt = F.col("text")
        else:
            m = word_map(k)
            txt = F.array_join(
                F.transform(
                    F.split("text", " "), lambda w: F.coalesce(m[w], w)
                ),
                " ",
            )
        d_parts.append(
            docs.select(
                (F.col("doc_id") + k * n_doc).alias("doc_id"),
                txt.alias("text"),
                "lang",
                F.concat(F.col("source"), F.lit(f"_g{k}")).alias("source"),
                "n_chars",
            )
        )
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    e_parts = [
        emb.select(
            (F.col("vec_id") + k * n_vec).alias("vec_id"),
            F.expr(
                f"transform(sequence(0, 63),"
                f" i -> embedding[(i + 13 * {k}) % 64])"
            ).alias("embedding")
            if k
            else F.col("embedding"),
            "label",
        )
        for k in range(factor)
    ]
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    e.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    v_parts = []
    for k in range(factor):
        shift = (6 * k) % _EV_DAYS
        d0 = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        # wrap inside the window so the dense-series length is invariant
        wrapped = F.when(
            d0 + shift >= _EV_DAYS, F.lit(shift - _EV_DAYS)
        ).otherwise(F.lit(shift))
        v_parts.append(
            ev.select(
                (F.col("event_id") + k * n_evt).alias("event_id"),
                F.timestamp_add("DAY", wrapped, F.col("ts")).alias("ts"),
                (F.col("user_id") + k * n_usr).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    v = v_parts[0]
    for p in v_parts[1:]:
        v = v.unionByName(p)
    v.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    open(os.path.join(out, "_DONE"), "w").close()
    return out


_ARM = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from olr_cdc_oracle_no_dbz_spark.session import get_spark
spark = get_spark("ext_shot_arm", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
from olr_cdc_oracle_no_dbz_spark.workload import queries
# r13: the timer brackets CONSTRUCTION + execution — the CC-bearing
# apply gates run their pair pipeline and clustering eagerly at
# construction, so a write-only timer misses their real cost (the r12
# arm under-read dedup_fuzzy_apply ~10x)
t0 = time.monotonic()
df = queries()[{query!r}](spark, {sf!r})
df.write.format("noop").mode("overwrite").save()
sec = round(time.monotonic() - t0, 3)
n = queries()[{query!r}](spark, {sf!r}).count()
print(json.dumps({{"sec": sec, "n_rows": n}}))
spark.stop()
"""


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "EXT_SCALE_SHOT_r11.json"
    )
    os.makedirs(WORK, exist_ok=True)

    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    spark = get_spark(
        "ext_shot_build", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {f: grow(spark, f) for f in (1, 5)}
    spark.stop()

    result: dict = {
        "note": (
            "organic-growth shot (VERDICT r10 item 3): ×5 DISTINCT new "
            "content in the shared key space (vocabulary-bijection docs, "
            "coordinate-rotated vectors, day-rotated series) — unlike the "
            "replication probes, distinct-content volume genuinely grows "
            "5×. Fresh process per point (cold); ratio ≈ 5 is linear "
            "end-to-end; n_rows shows how much of any extra growth is "
            "output volume rather than compute."
        ),
        "queries": {},
    }
    for q in QUERIES:
        row: dict = {}
        for f in (1, 5):
            code = _ARM.format(repo=REPO, query=q, sf=dirs[f])
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = [
                ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
            ][-1]
            got = json.loads(line)
            row[f"x{f}"] = got
        row["time_ratio_x5"] = round(
            row["x5"]["sec"] / max(row["x1"]["sec"], 1e-3), 2
        )
        row["rows_ratio_x5"] = round(
            row["x5"]["n_rows"] / max(row["x1"]["n_rows"], 1), 2
        )
        result["queries"][q] = row
        print(json.dumps({q: row}), flush=True)

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
