#!/usr/bin/env python
"""Regenerate PLANS.md: curated physical-plan evidence for the headline
queries — the operator lines that decide 100 TB behavior (scan pushdown,
join strategies, aggregate modes, top-N operators), with the column
noise trimmed. Run after any plan-affecting change:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PLANS_SF_DIR", "/root/testdata/sf0.01")

#: queries and what their plan must show
SHOWCASE = {
    "tpch_q1_pricing_summary": "filter pushed to scan; conditional scan-spread (kept in r12: the one map-heavy tpch gate) ahead of partial+final HashAggregate",
    "tpch_q6_forecast_revenue": "every predicate in PushedFilters; 2-column ReadSchema",
    "tpch_q3_shipping_priority": "broadcast dims; TakeOrderedAndProject top-10",
    "tpch_q5_local_supplier": "all dims broadcast; plain fact scan (r12 spread revert), never a hash shuffle pre-agg",
    "tpch_q4_order_priority": "left-semi join with non-equi residual",
    "tpch_q13_customer_distribution": "outer join with in-condition filter",
    "tpch_q19_disjunctive": "OR-of-ANDs factored into per-side pushed filters",
    "cdc_current_state": "LWW as partial-aggregatable max_by (one shuffle)",
    "window_global_topn": "TakeOrderedAndProject (no global window sort)",
    "dedup_minhash_lsh": "band-hash equi self-join (no cartesian)",
    "ann_topk_lsh": "sign-bucket equi join + per-bucket window",
    "dedup_exact": "single hash shuffle on md5 key",
    "corpus_pipeline": "quality filter + dedup + split in one codegen flow, two shuffles",
    "agg_pivot": "pivot as single conditional aggregate (no distinct discovery job)",
    "tpch_q21_waiting_suppliers": "EXISTS/NOT-EXISTS decorrelated to stacked windows on ONE orderkey shuffle",
    "tpch_q11_important_parts": "global-scalar threshold as 1-row broadcast BNLJ over a checkpointed aggregate",
    "text_rolling_fingerprint": "rolling-hash sketch: zero exchanges, pure codegen",
    "agg_distinct_hll": "HLL registers as partial-agg max: shuffle carries ≤m rows/group",
    "join_bloom_prune": "bloom bucket semi-join + key join both broadcast; fact never shuffles",
    "cdc_table_checksum": "zero-shuffle digest projection, one partial-agg reduce per table",
    "graph_triangle_count": "degree-oriented triangle joins over a checkpointed edge list",
    "agg_percentiles_exact": "one rank shuffle per group + broadcast bracket grid (no percentile buffers)",
    "ann_topk_ivf": "k-means coarse quantizer: broadcast K-centroid assignment per Lloyd round, K×dims recompute agg",
    "embedding_knn_graph": "all-vector kNN via sign-bucket equi self-join (sum of squared bucket sizes, never N²)",
    "text_perplexity_filter": "vocabulary-sized LM stats joined back map-side; one partial-agg per doc",
    "corpus_dedup_apply": "r13: group-collapsed CC labels (computed eagerly at construction, so the final plan is corpus scan + size-gated-broadcast label join); keep rule row-local",
    "dedup_fuzzy_apply": "r13: fuzzy GROUP pair graph -> CC -> member expansion at construction; final plan = corpus scan + size-gated-broadcast label join, keep rule row-local",
    "graph_connected_components": "r13: CC engine surface — labels + component sizes; label relation joined back through a size-gated broadcast",
    "dedup_simhash_apply": "r12: simhash pair graph -> CC labels broadcast onto the corpus; bounded goff BNLJs only; keep rule row-local",
    "window_skyline_2d": "2-D Pareto front as one partitioned running-max window (no dominance anti-join)",
    "timeseries_paa_similarity": "series collapse; PAA band blocking (occupancy-DERIVED salt vs hot-band explosion) + rep-only refine + member expansion",
    "dedup_simhash": (
        "corpus-derived w-bit banding; popcount-xor hamming per candidate;"
        " the two Cross BNLJs are ONE-ROW broadcasts (the COUNT-derived"
        " band width + global bit-offset aggregates, r8 mean-centering)"
        " — the scalar-subquery shape, not a data cartesian"
    ),
    "join_band_bucketed": "band theta join rewritten to (key, bucket) equi-join + residual",
    "ann_topk_ivfpq": "IVF cell restriction + broadcast IP-LUT join over m-byte codes + exact refine on the cell-fraction (_PQ_SHORTLIST=51-row) shortlist",
    "cdc_multi_table_routing": "per-table decode/filter/unwrap over ONE raw scan; per-table LWW max_by shuffle",
    "cdc_schema_evolution_merge": "widen-and-union then one partial-agg LWW shuffle (schema evolution adds no exchange)",
    "dedup_semantic": "corpus-derived K: zero-shuffle inline-centroid assignment; within-cell pairs bounded by cell size",
    "embedding_jl_projection": "literal Rademacher matrix in codegen: zero-join projection, one ~20-row histogram shuffle",
    "corpus_dedup_keep_longest": "pair-graph clustering + per-cluster max_by argmax + one broadcast corpus join",
    # late round-6 additions
    "timeseries_resample_interpolate": "span-bounded grid via sequence/explode; IGNORE NULLS fill windows over the resampled series only",
    "events_attribution_last_touch": "one per-key window pass (IGNORE NULLS last); channel-bounded final agg",
    "events_cooccurrence_affinity": "self-join on the distinct bounded-degree relation; totals join back broadcast",
    "cdc_column_change_report": "per-key lag window + single partial agg to a column-bounded unpivot",
    "text_readability": "pure zero-shuffle int64 codegen projection",
    "text_ngram_novelty": "inverted-index first-seen pass + shingle-keyed join back",
    "embedding_label_separation": "label-bounded centroid agg, broadcast back; |labels|^2 pair matrix only",
    "events_top_paths": "per-key lag trigrams; TakeOrderedAndProject then post-limit rank",
    "events_user_stickiness": "one distinct pass; month-keyed aggs joined broadcast",
    "cdc_key_lifecycle_report": "per-key lag window + cohort-bounded rollup",
    "events_activity_concentration": "bin-bounded agg; cumulative window after explicit limit",
    "join_geo_neighbors": "3x3 grid-cell equi-join candidates + row-local haversine refine (no cartesian)",
    "dedup_fuzzy_levenshtein": "group collapse; block-key repartition; DP once per distinct pair; member-expansion joins",
    "multimodal_exact_dedup": "map-side blob->md5 reduction; one 16-byte-key shuffle",
    "events_association_rules": "distinct baskets; per-user pair fan-out; broadcast supports; post-limit rank",
    # round-7 additions
    "ann_topk_ivfpq_serve": "persisted-index serve: parquet postings/codes scans + broadcast LUT, NO training stages",
    "ann_topk_ivfpq_serve_nprobe": "multi-probe serve: 2-cell fan-out over the SAME persisted artifact (zero rebuild), proportional shortlist, NO training stages",
    "cdc_interval_decode": "interval decode + ISO render: zero-shuffle codegen projection",
    "ann_topk_ivf_nprobe": "multi-probe fan-out as zero-shuffle inlined-centroid projection; one cell equi-join",
    "dedup_minhash_estimate": "band equi-join candidates; signature agreement row-local; exact Jaccard on candidates only",
    "ann_topk_lsh_bands": "4 sign-band equi-joins unioned + distinct; exact top-k only on the candidate set",
    # round-9 additions
    "dedup_fuzzy_topk": "twin-collapse windows on (blk, head); rep-only block join; bounded expansion joins + WindowGroupLimit top-3",
    "dedup_minhash_topk": "content-group collapse; rep-only shingle/band/verify; bounded expansion joins + per-doc top-3",
    "dedup_minhash_groups": "md5 content-group collapse; rep-only band join + Jaccard verify; self-rows from the group agg",
    "dedup_fuzzy_groups": "one (blk, head) groupBy; rep-only block join; DP once per distinct pair; self-rows from the group agg",
    "timeseries_paa_groups": "series groupBy collapse; occupancy-derived salted band join over reps; row-local folds",
    "cdc_state_compaction": "plan-only logical form: one LWW max_by shuffle + dead-tombstone filter (the physical path is the bucketed store)",
    # round-14 additions
    "corpus_shuffle_shards": "seeded-md5 shard digit: ONE hash exchange + per-shard window rank (no global sort)",
    "corpus_decontaminate_ngram": "map-side 5-gram explodes; one gram-keyed join (eval side un-hinted by design); footer-size-gated anti join",
}

_KEEP = re.compile(
    r"Scan parquet|PushedFilters|ReadSchema|HashAggregate|SortAggregate|"
    r"ObjectHashAggregate|BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct|TakeOrderedAndProject|"
    r"Exchange|Window|Sort \[|GlobalLimit|ArrowEvalPython|MapInPandas|Generate"
)


def _trim(line: str, width: int = 110) -> str:
    line = line.strip()
    return line if len(line) <= width else line[: width - 1] + "…"


def main() -> int:
    from olr_cdc_oracle_no_dbz_spark.session import get_spark
    from olr_cdc_oracle_no_dbz_spark.workload import queries

    # plan-only sweep: query construction must not run jobs (ADVICE r7
    # — a cold ANN-index cache would otherwise train at construction)
    os.environ["SPARK_GRAFT_PLAN_ONLY"] = "1"
    spark = get_spark("dump-plans", shuffle_partitions=8)
    qs = queries()
    out = [
        "# PLANS — physical-plan evidence for the headline queries",
        "",
        f"Generated by `python scripts/dump_plans.py` at sf dir `{SF_DIR}`.",
        "Each block keeps only the operator lines that decide scale",
        "behavior (scans+pushdown, joins, aggregates, exchanges, top-N);",
        "projection/column noise is trimmed. Invariants are enforced in",
        "`tests/test_plans.py`; this file is the human-readable receipt.",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        kept = [_trim(ln) for ln in plan.splitlines() if _KEEP.search(ln)]
        out.append(f"## {name}")
        out.append("")
        out.append(f"*Expected:* {why}")
        out.append("")
        out.append("```")
        out.extend(kept)
        out.append("```")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(SHOWCASE)} queries)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
