"""Empirical scaling probe: do the heavy operators scale linearly?

Replicates the sf0.1 tables K-fold with structure-preserving
perturbations and times the shuffle-heavy / candidate-generating
operators at each factor, then fits the per-query scaling exponent
alpha from t(K) ~ K^alpha (least squares over log-log). A
candidates-then-verify design should sit near alpha ~ 1 (linear in
data); alpha ~ 2 means an operator degenerated to all-pairs and would
NOT survive 100 TB. This is the measured check behind every
"scale-safe" claim in the operator docstrings.

Two replication MODES (VERDICT r7 item 5 — each answers a different
question, and SCALING.md reports both exponents per operator):

- ``disjoint`` (default): structure-preserving perturbations keep TRUE
  duplicate structure linear (replicas must not be near-dups of each
  other, or the probe measures the data, not the algorithm):
  - documents: per-replica vowel rotation (translate) gives each
    replica a disjoint vocabulary — within-replica near-dup pairs are
    preserved exactly, cross-replica pairs impossible.
  - embeddings: per-replica deterministic directional perturbation
    (index- and replica-dependent additive term) pushes replicas apart
    in cosine space while keeping within-replica neighborhoods.
  - events: user_id/event_id offset per replica — key cardinality
    grows K-fold, per-key history stays constant (the LWW/window
    shape); a per-replica value shift keeps value-similarity operators
    from seeing quadratic true-duplicate structure.
- ``overlap``: replicas SHARE the vocabulary / embedding space /
  value range, so cross-replica hash and band collisions are allowed —
  the adversarial case the disjoint mode structurally cannot see
  (r7 measured simhash alpha=-0.02 disjoint while its candidate output
  grew ~N^2 between the gate SFs). Content still differs per replica
  (position-dependent word drop, tiny embedding jitter), so growth
  beyond linear here is banding/bucketing skew, not literal duplicate
  rows.

Usage:
    python scripts/scale_probe.py              # factors 1 2 4, disjoint
    python scripts/scale_probe.py 1 2 4 8
    SPARK_GRAFT_PROBE_MODE=overlap python scripts/scale_probe.py

Prints one JSON line per run plus a final summary with exponents
(keyed ``scaling`` for disjoint, ``scaling_overlap`` for overlap).
Writes replicated data under /tmp/spark_graft_scale_probe/<mode>/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_scale_probe"
MODE = os.environ.get("SPARK_GRAFT_PROBE_MODE", "disjoint")
if MODE not in ("disjoint", "overlap"):
    raise SystemExit(f"SPARK_GRAFT_PROBE_MODE must be disjoint|overlap, got {MODE!r}")

#: probed operators — the candidate-generating / shuffle-heavy set
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "ann_topk_ivf",
    "dedup_semantic",
    "cdc_current_state",
    "text_pii_redact",
    "window_moving_avg_range",
    # round-5 additions — every new candidate-generating operator
    "embedding_knn_graph",
    "join_band_bucketed",
    "text_perplexity_filter",
    "corpus_dedup_apply",
    "dedup_containment",
    # round-6 additions (VERDICT r5 item 3): the r5 newcomers
    "multimodal_phash_neardup",
    "timeseries_paa_similarity",
    # late round-6 additions: the new per-key-window / self-join shapes
    "events_cooccurrence_affinity",
    "events_attribution_last_touch",
    "cdc_column_change_report",
    "timeseries_resample_interpolate",
    "dedup_fuzzy_levenshtein",
    "events_association_rules",
    # round-7: the sign-LSH consumers after the derived-bit-count fix
    # (VERDICT r6 items 1+8) — bits grow 8→9→10 across x1/x2/x4 here
    "ann_topk_lsh",
    # late round-7 additions
    "ann_topk_lsh_bands",
    "ann_topk_ivf_nprobe",
    # late round-8: the production PQ path after the cell-fraction
    # shortlist widening (re-rank 102 rows/query instead of 10 — the
    # probe checks the exponent stayed flat, constant work per query)
    "ann_topk_ivfpq",
    "dedup_minhash_estimate",
    # round-8: the derived-band simhash family (VERDICT r7 items 1+7)
    "dedup_simhash_topk",
    # late round-8: bounded-output contracts for the two operators the
    # overlap mode exposed as output-quadratic under near-twin mass
    "dedup_fuzzy_topk",
    "timeseries_paa_topk",
    # round-9: twin-collapse rewrites + the group-pair contracts + the
    # MinHash bounded-output variant (VERDICT r8 items 1/2/6)
    "dedup_fuzzy_groups",
    "timeseries_paa_groups",
    "dedup_minhash_topk",
    "dedup_minhash_groups",
    # round-10: the matrix-completion cells (simhash group-pair,
    # embedding-cosine top-k + group-pair)
    "dedup_simhash_groups",
    "dedup_embedding_cosine_topk",
    "dedup_embedding_cosine_groups",
    # round-11: multi-key blocking composition (two single-key joins +
    # distinct — its exponent should track dedup_fuzzy_groups')
    "dedup_fuzzy_multiblock",
]

_VOWELS = "aeiou"


def _rotate(k: int) -> str:
    return _VOWELS[k % 5 :] + _VOWELS[: k % 5]


def _doc_text(k: int):
    """Per-replica document text. disjoint: vowel rotation (disjoint
    vocabulary, cross-replica pairs impossible). overlap: SAME
    vocabulary, content perturbed by dropping every (k+2)-th word —
    replica token multisets differ (different signature sums) while
    every hash/band key stays in the shared space, so cross-replica
    collisions are possible — exactly what banding skew feeds on."""
    if MODE == "disjoint":
        return F.translate("text", _VOWELS, _rotate(k))
    if k == 0:
        return F.col("text")
    return F.array_join(
        F.filter(
            F.split("text", " "), lambda w, i: (i % F.lit(k + 2)) != 0
        ),
        " ",
    )


def _emb_vec(k: int):
    """Per-replica embedding. disjoint: directional push (replicas
    separate in cosine space). overlap: tiny index-dependent jitter —
    replicas stay in the SAME region, so sign buckets / IVF cells /
    band keys collide across replicas."""
    if MODE == "disjoint":
        return F.transform(
            "embedding",
            lambda x, i: (
                x + F.lit(0.05 * k) * F.sin(i.cast("double") + F.lit(float(k)))
            ).cast("float"),
        )
    return F.transform(
        "embedding",
        lambda x, i: (
            x + F.lit(0.001 * k) * F.sin(i.cast("double") * F.lit(float(k + 1)))
        ).cast("float"),
    )


def replicate(spark: SparkSession, factor: int) -> str:
    out = os.path.join(WORK, MODE, f"x{factor}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    ev = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    n_usr = ev.agg(F.max("user_id")).first()[0] + 1
    n_evt = ev.agg(F.max("event_id")).first()[0] + 1

    d_parts = [
        docs.select(
            (F.col("doc_id") + k * n_doc).alias("doc_id"),
            _doc_text(k).alias("text"),
            "lang",
            F.concat(F.col("source"), F.lit(f"_r{k}")).alias("source"),
            "n_chars",
        )
        for k in range(factor)
    ]
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    e_parts = [
        emb.select(
            (F.col("vec_id") + k * n_vec).alias("vec_id"),
            _emb_vec(k).alias("embedding"),
            "label",
        )
        for k in range(factor)
    ]
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    e.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    # value gets a per-replica additive shift (r6): id offsets alone
    # left every user with k exact value-twins, so VALUE-similarity
    # operators (PAA series search, band joins) saw quadratic TRUE
    # duplicate structure — the probe then measures the data, not the
    # algorithm (same reason documents get vowel rotation). The shift
    # moves each replica's per-day sums ~600k units apart (band widths
    # here are O(100)), so cross-replica candidate pairs vanish while
    # within-replica structure keeps its shape. k=0 stays bit-identical
    # to the source table.
    v_parts = [
        ev.select(
            (F.col("event_id") + k * n_evt).alias("event_id"),
            "ts",
            (F.col("user_id") + k * n_usr).alias("user_id"),
            "event_type",
            # overlap: shared value range (band collisions allowed)
            (
                F.col("value")
                + F.lit((600.0 if MODE == "disjoint" else 0.0) * k)
            ).alias("value"),
            "props",
        )
        for k in range(factor)
    ]
    v = v_parts[0]
    for p in v_parts[1:]:
        v = v.unionByName(p)
    v.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    open(os.path.join(out, "_DONE"), "w").close()
    return out


def append_probe(spark, hi_factor: int) -> dict:
    """Quantizer-staleness arm (VERDICT r8 item 9): build the ANN index
    at ×1, ``append_to_index`` the ×2..×``hi_factor`` replica id ranges
    against the FROZEN ×1 quantizers, and compare serve recall@10 on
    the full ×``hi_factor`` corpus against a FRESH ×``hi_factor`` build
    — the drift number that decides rebuild cadence (the append path's
    correctness is pytest-pinned; this measures what ingest-without-
    retrain COSTS as the corpus outgrows its quantizers; K ∝ N means a
    stale index also has too few cells). Truth = DuckDB brute-force
    cosine top-10 over the replicated table."""
    import duckdb

    from olr_cdc_oracle_no_dbz_spark.workload.ann_index import (
        append_to_index,
        build_ann_index,
        serve_topk,
    )

    x1 = replicate(spark, 1)
    xh = replicate(spark, hi_factor)
    n_vec = (
        spark.read.parquet(os.path.join(x1, "embeddings.parquet"))
        .agg(F.max("vec_id"))
        .first()[0]
        + 1
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW e AS SELECT * FROM read_parquet("
        f"'{os.path.join(xh, 'embeddings.parquet')}/*.parquet')"
    )
    truth = {
        (q, n)
        for q, n in con.execute(
            """
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       list_reduce(list_transform(
                           generate_series(1, len(q.embedding)),
                           i -> CAST(q.embedding[i] AS DOUBLE)
                                * CAST(c.embedding[i] AS DOUBLE)),
                           (x, y) -> x + y)
                       / (sqrt(list_reduce(list_transform(
                           generate_series(1, len(q.embedding)),
                           i -> CAST(q.embedding[i] AS DOUBLE)
                                * CAST(q.embedding[i] AS DOUBLE)),
                           (x, y) -> x + y))
                          * sqrt(list_reduce(list_transform(
                           generate_series(1, len(c.embedding)),
                           i -> CAST(c.embedding[i] AS DOUBLE)
                                * CAST(c.embedding[i] AS DOUBLE)),
                           (x, y) -> x + y))) DESC, c.vec_id) AS rk
            FROM e q JOIN e c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 10
        ) WHERE rk <= 10
        """
        ).fetchall()
    }

    def recall(index_dir: str) -> float:
        rows = serve_topk(
            spark, xh, index_dir, 0, 10, final_k=10
        ).collect()
        hits = sum((r.query_id, r.neighbor_id) in truth for r in rows)
        return round(hits / len(truth), 3)

    stale_dir = os.path.join(WORK, MODE, "ann_stale")
    fresh_dir = os.path.join(WORK, MODE, "ann_fresh")
    shutil.rmtree(stale_dir, ignore_errors=True)
    shutil.rmtree(fresh_dir, ignore_errors=True)
    t0 = time.monotonic()
    build_ann_index(spark, x1, stale_dir)
    t_build1 = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    for k in range(1, hi_factor):
        append_to_index(
            spark, xh, stale_dir, k * n_vec, (k + 1) * n_vec
        )
    t_appends = round(time.monotonic() - t0, 3)
    r_stale = recall(stale_dir)
    t0 = time.monotonic()
    build_ann_index(spark, xh, fresh_dir)
    t_rebuild = round(time.monotonic() - t0, 3)
    r_fresh = recall(fresh_dir)
    return {
        "mode": MODE,
        "hi_factor": hi_factor,
        "recall_stale_append": r_stale,
        "recall_fresh_rebuild": r_fresh,
        "drift": round(r_fresh - r_stale, 3),
        "t_build_x1_sec": t_build1,
        "t_appends_sec": t_appends,
        "t_rebuild_sec": t_rebuild,
    }


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "scale_probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Small-file scan parallelism (r7): at x1 the replicated tables are a
    # few MB each, so with the default 128m maxPartitionBytes the whole
    # scan lands in ONE task while x2/x4 get more — inflating t(x1) of
    # scan-bound queries (dedup_minhash_lsh read 9.6s at x1 vs 3.2s at
    # x4) and spuriously DEFLATING alpha. 4m splits every factor's scan
    # across the cores, so the exponent measures the algorithm, not the
    # file layout; at 100 TB files are plentiful and this knob is moot.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    qs = queries()
    # optional roster filter: probe only a comma-separated subset
    # (supplementary runs for late additions without re-timing the world)
    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    if only:
        # fail loudly on typos: a misspelled name silently timing nothing
        # would report success for a probe that never ran (ADVICE r6)
        unknown = [q for q in only.split(",") if q not in qs]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_PROBE_ONLY names not in the query registry: "
                f"{unknown} — check spelling against workload.queries()"
            )
    roster = [q for q in QUERIES if not only or q in only.split(",")]
    if only:
        roster += [q for q in only.split(",") if q not in roster]
    times: dict[str, dict[int, float]] = {q: {} for q in roster}
    # JVM/codegen warm-up (r7): the roster's FIRST query at the FIRST
    # factor otherwise absorbs session cold-start — dedup_minhash_lsh
    # read t(x1)=10s vs t(x2)=3.4s purely from this, flipping its
    # exponent to a meaningless -0.9 (same artifact r6c had to re-time).
    # One untimed throwaway run of the first roster query fixes it.
    warm_dir = replicate(spark, factors[0])
    qs[roster[0]](spark, warm_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for factor in factors:
        sf_dir = replicate(spark, factor)
        for q in roster:
            t0 = time.monotonic()
            qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            times[q][factor] = dt
            print(
                json.dumps(
                    {"mode": MODE, "factor": factor, "query": q, "sec": dt}
                ),
                flush=True,
            )

    import math

    summary = {}
    for q, ts in times.items():
        if len(ts) < 2:
            continue
        xs = [math.log(f) for f in sorted(ts)]
        ys = [math.log(max(ts[f], 1e-3)) for f in sorted(ts)]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs) or 1.0
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        summary[q] = {
            "alpha": round(alpha, 2),
            **{f"t_x{f}": ts[f] for f in sorted(ts)},
        }
    key = "scaling" if MODE == "disjoint" else "scaling_overlap"
    print(json.dumps({key: summary}, indent=2))

    # quantizer-staleness arm (VERDICT r8 item 9) — skipped on roster
    # subsets (SPARK_GRAFT_PROBE_ONLY) unless explicitly requested via
    # SPARK_GRAFT_PROBE_APPEND=1
    if (not only or os.environ.get("SPARK_GRAFT_PROBE_APPEND")) and max(
        factors
    ) > 1:
        print(
            json.dumps({"append_probe": append_probe(spark, max(factors))}),
            flush=True,
        )


if __name__ == "__main__":
    main()
