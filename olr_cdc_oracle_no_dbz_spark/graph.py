"""Distributed connected components (the dedup-clustering core).

Two algorithms over an edge DataFrame, selectable because their scale
envelopes differ:

- ``labelprop`` (default): min-label propagation. One shuffle per
  round, converges in O(component diameter) rounds — the right choice
  for near-dup graphs, whose components are shallow (docs similar to a
  common doc are similar-ish to each other).
- ``starcontraction``: alternating large-star/small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC 2014): each round rewires every vertex toward its neighborhood
  minimum, halving component height — O(log n) rounds even for
  adversarial long chains where propagation would need O(n).

Both return the same canonical labeling (vertex -> component minimum;
property-tested against a union-find reference on random graphs) and
cut lineage per round through ``truncate_lineage`` (durable-checkpoint
aware).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.checkpointing import truncate_lineage


#: below this many (undirected) edges the component labeling runs as a
#: DRIVER-side union-find over one bounded collect instead of the
#: iterative distributed rounds: each labelprop round is ~3 Spark jobs
#: (join+agg, checkpoint, convergence count), so a 6-round labeling of
#: a 4.7k-edge graph measured ~5.6 s of pure per-round overhead while
#: the union-find itself is microseconds (SCALING_PROBE_r12
#: apply_phase). 100k edges ≈ 1.6 MB collected — a bounded driver
#: pull; past the cutover (real 100 TB near-dup graphs) the
#: distributed rounds take over with the identical labeling. The
#: dispatcher mirrors _nearest_cent's inline/join discipline.
_DRIVER_CC_MAX_EDGES = 100_000


def connected_components(
    edges: DataFrame,
    algorithm: str = "labelprop",
    max_rounds: int = 30,
    driver_cutover: int = _DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """``edges(s, d)`` (any orientation, self-loops fine) →
    ``(doc_id, cluster_id)`` where cluster_id is the component's
    minimum vertex id. Isolated vertices don't appear (no edges — the
    callers only feed vertices with at least one duplicate pair)."""
    if algorithm not in ("labelprop", "starcontraction"):
        raise ValueError(
            f"algorithm must be labelprop|starcontraction, got {algorithm!r}"
        )
    if driver_cutover:
        small = _driver_union_find(edges, driver_cutover)
        if small is not None:
            return small
    if algorithm == "labelprop":
        return _label_propagation(edges, max_rounds)
    return _star_contraction(edges, max_rounds)


def _driver_union_find(edges: DataFrame, cutover: int):
    """Bounded-collect union-find labeling for small pair graphs; None
    when the graph exceeds the cutover (the distributed path then owns
    it). Value-identical to both distributed algorithms by the shared
    contract (vertex → component min; property-tested three ways in
    tests/test_graph.py)."""
    sample = edges.selectExpr("s", "d").limit(cutover + 1).collect()
    if len(sample) > cutover:
        return None
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
        else:
            parent.setdefault(s, rs)
            parent.setdefault(d, rd)
    verts = set()
    for r in sample:
        verts.add(r[0])
        verts.add(r[1])
    comp_min: dict = {}
    for v in verts:
        root = find(v)
        m = comp_min.get(root)
        if m is None or v < m:
            comp_min[root] = v
    rows = [(v, comp_min[find(v)]) for v in sorted(verts)]
    from pyspark.sql.types import StructField, StructType

    vtype = edges.schema["s"].dataType
    schema = StructType(
        [
            StructField("doc_id", vtype, False),
            StructField("cluster_id", vtype, False),
        ]
    )
    return edges.sparkSession.createDataFrame(rows, schema)


def _label_propagation(edges: DataFrame, max_rounds: int) -> DataFrame:
    sym = edges.selectExpr("s", "d").unionAll(edges.selectExpr("d AS s", "s AS d"))
    sym = truncate_lineage(sym)
    labels = (
        sym.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    labels = truncate_lineage(labels)
    for _ in range(max_rounds):
        neigh = (
            sym.join(labels, sym["s"] == labels["doc_id"])
            .groupBy(F.col("d").alias("nd"))
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        new_labels = (
            labels.join(neigh, labels["doc_id"] == neigh["nd"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("neigh_min", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        new_labels = truncate_lineage(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def _star_contraction(edges: DataFrame, max_rounds: int) -> DataFrame:
    """Alternating large-star / small-star rounds until the edge set is
    a fixed star forest (every vertex points at its component min).

    large-star: for every vertex u, connect each STRICTLY GREATER
    neighbor v > u to m = min(N(u) ∪ {u}). small-star: connect each
    neighbor v <= u (and u itself) to m. Each operation preserves
    connectivity and monotonically lowers heights; alternating them
    converges in O(log n) rounds (SoCC 2014, Theorem 3).
    """
    # vertex set BEFORE dropping self-loops: a vertex whose only edge
    # is (v, v) is still a (singleton) component and must be labeled
    sym = edges.selectExpr("s", "d").unionAll(edges.selectExpr("d AS s", "s AS d"))
    vertices = sym.select(F.col("s").alias("doc_id")).distinct()
    vertices = truncate_lineage(vertices)
    # canonical working set: symmetric closure, no self-loops
    e = truncate_lineage(sym.filter(F.col("s") != F.col("d")).distinct())

    def one_side(cur: DataFrame, large: bool) -> DataFrame:
        # m(u) = min over N(u) ∪ {u}
        m = cur.groupBy("s").agg(
            F.least(F.min("d"), F.first("s")).alias("m")
        )
        joined = cur.join(m, "s")
        if large:
            rewired = joined.filter(F.col("d") > F.col("s")).select(
                F.col("d").alias("s"), F.col("m").alias("d")
            )
        else:
            rewired = joined.filter(F.col("d") <= F.col("s")).select(
                F.col("d").alias("s"), F.col("m").alias("d")
            ).unionAll(joined.select("s", F.col("m").alias("d")))
        out = (
            rewired.filter(F.col("s") != F.col("d"))
            .unionAll(rewired.filter(F.col("s") != F.col("d")).selectExpr("d AS s", "s AS d"))
            .distinct()
        )
        return truncate_lineage(out)

    for _ in range(max_rounds):
        after_large = one_side(e, large=True)
        after_small = one_side(after_large, large=False)
        # converged when the (symmetric) edge set stopped changing
        delta = after_small.exceptAll(e).limit(1).count() + e.exceptAll(
            after_small
        ).limit(1).count()
        e = after_small
        if delta == 0:
            break
    # final star forest: every vertex's min neighbor IS the component
    # min; vertices that became isolated along the way are their own min
    comp = e.groupBy(F.col("s").alias("doc_id")).agg(
        F.min("d").alias("nbr_min")
    )
    return vertices.join(comp, "doc_id", "left").select(
        "doc_id",
        F.least(F.col("doc_id"), F.coalesce("nbr_min", F.col("doc_id"))).alias(
            "cluster_id"
        ),
    )
