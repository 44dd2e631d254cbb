"""Apply-gate scale discipline (VERDICT r12 items 1-2).

The apply-family gates join a label/drop-list relation — O(corpus)
under real web duplication rates — onto the corpus. r12 shipped them
with an UNCONDITIONAL ``F.broadcast`` (an OOM at 100× scale, since the
hint overrides autoBroadcastJoinThreshold); r13 routes all six sites
through ``graph.size_gated_broadcast``. These tests pin:

- the gate itself (hint below the threshold, plain join above);
- RESULT EQUALITY of the shuffle-join fallback vs the broadcast path;
- the group-collapsed CC in dedup_fuzzy_apply: labels from the
  twin-collapsed group relation must equal doc-level CC on the
  expanded member pairs;
- connected_components' r13 input contract (null endpoints dropped,
  edge_count hint honored, label-count stamp present).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from olr_cdc_oracle_no_dbz_spark.graph import (
    _BCAST_CONF,
    connected_components,
    size_gated_broadcast,
)

SF = "/root/testdata/sf0.001"

#: every registered gate that joins a corpus-proportional relation
#: through a size-gated broadcast: the six r12 F.broadcast label sites
#: plus the r13 sweep (vocabulary df, dup-hash list, contamination
#: list, erasure list — same OOM class, different producers)
APPLY_GATES = (
    "corpus_dedup_apply",
    "corpus_dedup_keep_longest",
    "dedup_simhash_apply",
    "dedup_fuzzy_apply",
    "dedup_semantic_apply",
    "text_tfidf_top_terms",
    "corpus_source_report",
    "corpus_decontaminate_apply",
    "cdc_purge_keys",
    # r14 (VERDICT r13 item 5): the PageRank rank/contrib hints are the
    # last iteration-carried broadcasts routed through the gate; forcing
    # the gate to 0 runs all three power iterations as shuffle joins
    # and must reproduce the exact decimal-summed ranks.
    "graph_pagerank_transitions",
)


@pytest.fixture(scope="module")
def q():
    return entry_mod.queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", APPLY_GATES)
def test_apply_fallback_join_equals_broadcast_path(spark, name, q):
    """Forcing the gate to 0 rows (every label relation 'too big to
    broadcast') must flip the plan to a plain key join with IDENTICAL
    results — the degradation the 100×-scale path relies on."""
    base = _rows(q[name](spark, SF))
    spark.conf.set(_BCAST_CONF, "0")
    try:
        fallback = _rows(q[name](spark, SF))
    finally:
        spark.conf.unset(_BCAST_CONF)
    assert fallback == base and base


def test_size_gated_broadcast_plans_hint_below_gate_only(spark):
    corpus = spark.range(0, 1000).select(F.col("id").alias("k"))
    labels = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    hinted = corpus.join(
        size_gated_broadcast(labels, n_rows=50), "k", "left"
    )
    assert "BroadcastHashJoin" in hinted._jdf.queryExecution().executedPlan().toString()
    plain = corpus.join(
        size_gated_broadcast(labels, n_rows=50, max_rows=10), "k", "left"
    )
    plan = plain._jdf.queryExecution().toString()
    assert "ResolvedHint" not in plan and "UnresolvedHint" not in plan


def test_size_gated_broadcast_counts_unknown_relations_once(spark):
    """A relation with no known count is materialized and counted; the
    returned df is the lineage-cut one so the join reuses the blocks."""
    labels = spark.range(0, 10).select(F.col("id").alias("k"))
    out = size_gated_broadcast(labels, max_rows=5)
    # 10 rows > 5: no hint, but the materialize-and-count stamp exists
    assert getattr(out, "_graft_n_rows", None) == 10


def test_cc_drops_null_endpoints_like_the_distributed_joins(spark):
    """ADVICE r12: the driver union-find raised TypeError on NULL
    endpoints while the distributed equi-joins silently dropped them.
    r13 contract: null-endpoint edges are dropped up front on EVERY
    path."""
    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (None, None), (2, 5)],
        "s long, d long",
    )
    for algo, cutover in (
        ("labelprop", 100),  # driver path
        ("labelprop", 0),
        ("starcontraction", 0),
    ):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                edges, algorithm=algo, driver_cutover=cutover
            ).collect()
        }
        assert got == {1: 1, 2: 1, 5: 1}, (algo, cutover)


def test_cc_edge_count_hint_skips_probe_and_routes_paths(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "s long, d long")
    expected = {1: 1, 2: 1, 3: 1}
    # hint says small -> driver path (exercised via identical labels)
    small = connected_components(edges, edge_count=2)
    assert {r[0]: r[1] for r in small.collect()} == expected
    assert getattr(small, "_graft_n_rows", None) == 3
    # hint says large -> distributed path, same labels, stamp present
    big = connected_components(edges, edge_count=10**9, driver_cutover=100)
    assert {r[0]: r[1] for r in big.collect()} == expected
    assert getattr(big, "_graft_n_rows", None) == 3


def test_cc_stamps_label_count_on_every_path(spark):
    edges = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5)], "s long, d long"
    )
    for kw in (
        {"driver_cutover": 100},
        {"driver_cutover": 0, "algorithm": "labelprop"},
        {"driver_cutover": 0, "algorithm": "starcontraction"},
    ):
        out = connected_components(edges, **kw)
        assert getattr(out, "_graft_n_rows", None) == 5, kw


def test_minhash_group_cc_equals_doc_level_cc(spark, q):
    """r13 extension of the fuzzy group-CC discipline to the MinHash
    family: labels from CC on the twin-collapsed group pair relation
    (+ shingle-bearing multi-member groups as self-edges) must equal
    doc-level CC on dedup_minhash_lsh's verified member pairs — valid
    because the MinHash signature is a pure per-doc function of text
    (the SimHash family is excluded: corpus-derived centering makes
    its group/doc signatures diverge on twin corpora)."""
    pairs = (
        q["dedup_minhash_lsh"](spark, SF)
        .filter(F.col("is_dup"))
        .select("a_id", "b_id")
    )
    doc_labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs.selectExpr("a_id AS s", "b_id AS d")
        ).collect()
    }
    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _minhash_group_labels,
    )

    group_labels = {
        r["doc_id"]: r["cluster_id"]
        for r in _minhash_group_labels(spark, SF).collect()
    }
    assert group_labels == doc_labels and doc_labels


def test_simhash_group_cc_equals_doc_level_cc(spark, q):
    """Late-r13 completion: the SimHash family's group-CC is exact
    ONLY with member-weighted centering (Σ_docs s_j = Σ_g n_g·s_j(rep)
    and N/w from the member count — _simhash_member_labels); labels
    must equal doc-level CC on dedup_simhash's emitted pairs."""
    pairs = q["dedup_simhash"](spark, SF).select("a_id", "b_id")
    doc_labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs.selectExpr("a_id AS s", "b_id AS d")
        ).collect()
    }
    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _simhash_member_labels,
    )

    group_labels = {
        r["doc_id"]: r["cluster_id"]
        for r in _simhash_member_labels(spark, SF).collect()
    }
    assert group_labels == doc_labels and doc_labels


def test_fuzzy_apply_group_cc_equals_doc_level_cc(spark, q):
    """VERDICT r12 item 2 equivalence pin: connected components on the
    twin-collapsed GROUP relation + member expansion must reproduce the
    doc-level labeling on the expanded near-pair graph verbatim. The
    keep rule then makes the gate's survivor set identical."""
    pairs = (
        q["dedup_fuzzy_levenshtein"](spark, SF)
        .filter(F.col("is_near"))
        .select("a_id", "b_id")
    )
    doc_labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs.selectExpr("a_id AS s", "b_id AS d")
        ).collect()
    }
    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _fuzzy_blocked_groups,
    )

    g, members, gpairs = _fuzzy_blocked_groups(spark, SF)
    gedges = (
        gpairs.filter(F.col("edit_dist") <= 20)
        .selectExpr("ga AS s", "gb AS d")
        .unionAll(g.filter(F.col("n") >= 2).selectExpr("gid AS s", "gid AS d"))
    )
    glabels = connected_components(gedges).withColumnRenamed("doc_id", "gid")
    group_labels = {
        r["member_id"]: r["cluster_id"]
        for r in members.join(glabels, "gid").collect()
    }
    assert group_labels == doc_labels and doc_labels
