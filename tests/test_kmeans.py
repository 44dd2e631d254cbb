"""Determinism laws for the k-means coarse quantizer
(workload/ext_queries._kmeans_assign).

The quantizer collects centroids to the driver each Lloyd round and
inlines them as literals; these tests pin that the collected state —
and therefore every downstream assignment — is independent of
partitioning and row order, which is what lets the DuckDB oracle
replay the rounds and what makes the operator safe under AQE re-plans
and retries at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
    _dot,
    _kmeans_assign,
)

SF_DIR = "/root/testdata/sf0.001"


def _base(spark, reshape=None):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if reshape is not None:
        e = reshape(e)
    return e.select(
        "vec_id",
        F.col("embedding").alias("v"),
        _dot("embedding", "embedding").alias("nsq"),
    )


def test_assignment_invariant_under_repartition_and_order(spark):
    """Same (vec_id -> cent_id) mapping whether the input arrives in
    one partition, seven hash partitions, or reverse-sorted — the
    centroid recompute is an exact aggregate and the seed is selected
    by value (vec_id < K), so no step can observe physical layout."""
    ref = dict(
        _kmeans_assign(_base(spark)).select("vec_id", "cent_id").collect()
    )
    for reshape in (
        lambda df: df.repartition(7, "vec_id"),
        lambda df: df.coalesce(1),
        lambda df: df.orderBy(F.desc("vec_id")),
    ):
        got = dict(
            _kmeans_assign(_base(spark, reshape))
            .select("vec_id", "cent_id")
            .collect()
        )
        assert got == ref


def test_every_vector_assigned_exactly_once(spark):
    e = _base(spark)
    n = e.count()
    assign = _kmeans_assign(e)
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n


def test_join_assignment_equals_inline(spark):
    """The large-K broadcast-join assignment path (r8: `_nearest_cent`
    flips to it beyond _INLINE_K_MAX centroids, where K ∝ N makes the
    inlined-literal tree uncompilable) produces row-for-row the SAME
    (vec_id -> cent_id) mapping as the inline path — both rank by
    (decimal(16,8) cosine DESC, cent_id), so the Lloyd trajectory and
    every downstream code are path-independent."""
    from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
        _kmeans_train,
        _nearest_cent_inline,
        _nearest_cent_join,
    )

    e = _base(spark)
    cents = _kmeans_train(e)
    inline = dict(
        _nearest_cent_inline(e, cents).select("vec_id", "cent_id").collect()
    )
    joined = dict(
        _nearest_cent_join(e, cents).select("vec_id", "cent_id").collect()
    )
    assert joined == inline


def test_dispatcher_flips_past_cap(spark, monkeypatch):
    """With the cap forced to 1 the dispatcher must take the join path
    and still agree with the inline mapping — pins that the flip is
    transparent, not merely available."""
    import olr_cdc_oracle_no_dbz_spark.workload.ext_queries as x

    e = _base(spark)
    cents = x._kmeans_train(e)
    ref = dict(
        x._nearest_cent_inline(e, cents).select("vec_id", "cent_id").collect()
    )
    called = {}

    real_join = x._nearest_cent_join

    def spy(e_, cents_):
        called["join"] = True
        return real_join(e_, cents_)

    monkeypatch.setattr(x, "_INLINE_K_MAX", 1)
    monkeypatch.setattr(x, "_nearest_cent_join", spy)
    got = dict(
        x._nearest_cent(e, cents).select("vec_id", "cent_id").collect()
    )
    assert called.get("join") and got == ref


def test_pq_dispatcher_flips_past_cap(spark, monkeypatch):
    """The same law for the PQ ENCODE dispatcher (late r8): with the
    inline cap forced to 1, `_pq_assign` must take the broadcast-join
    path and emit code-for-code the inline mapping — raising _PQ_K_MAX
    to the classic 256 codewords is safe exactly because the flip is
    value-invisible (shared (decimal d, c_idx) ordering)."""
    import olr_cdc_oracle_no_dbz_spark.workload.ext_queries as x

    e = _base(spark)
    n = e.count()
    stack_args = ", ".join(
        f"{s}, slice(v, {s * x._PQ_SUB + 1}, {x._PQ_SUB})"
        for s in range(x._PQ_M)
    )
    subs = e.selectExpr(
        "vec_id", f"stack({x._PQ_M}, {stack_args}) AS (sub_idx, sv)"
    )
    cents = x._pq_train(subs, n)
    ref = {
        (r["vec_id"], r["sub_idx"]): r["c_idx"]
        for r in x._pq_assign_inline(subs, cents).collect()
    }
    called = {}
    real_join = x._pq_assign_join

    def spy(subs_, cents_):
        called["join"] = True
        return real_join(subs_, cents_)

    monkeypatch.setattr(x, "_PQ_INLINE_MAX", 1)
    monkeypatch.setattr(x, "_pq_assign_join", spy)
    got = {
        (r["vec_id"], r["sub_idx"]): r["c_idx"]
        for r in x._pq_assign(subs, cents).collect()
    }
    assert called.get("join") and got == ref


def test_coarse_caps_bind_and_replay_in_duckdb(spark, monkeypatch):
    """r9 coarse-quantizer caps, differentially pinned AT BINDING
    VALUES (the gate corpora never reach the real 4096/524288, so this
    is the only place the capped math is exercised): with tiny
    monkeypatched caps, (a) K derives through the LEAST clamp, (b) the
    Lloyd rounds train ONLY on the first _IVF_TRAIN_CAP vectors, and
    (c) DuckDB's _sql_kmeans_ctes — rendered AFTER the monkeypatch, as
    the oracle reads the module constants at call time — reproduces
    the trained centroid list exactly."""
    import duckdb

    import olr_cdc_oracle_no_dbz_spark.workload.ext_queries as x

    monkeypatch.setattr(x, "_IVF_CELL", 8)
    monkeypatch.setattr(x, "_IVF_K_MAX", 16)
    monkeypatch.setattr(x, "_IVF_TRAIN_CAP", 128)

    e = _base(spark)
    n = e.count()
    assert x._derive_k(n) == 16  # ceil(500/8)=63 clamps to the cap

    cents = x._kmeans_train(e)
    assert len(cents) == 16

    # (b) only the first 128 vectors can influence training: retraining
    # on exactly that subset must give identical centroids
    sub = e.filter(F.col("vec_id") < 128)
    assert x._kmeans_train(sub) == cents

    # (c) DuckDB replay with the capped CTEs
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    sql = f"""
    WITH e AS (
        SELECT vec_id, embedding AS v,
               list_reduce(list_transform(generate_series(1, len(embedding)),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)),
                   (a, b) -> a + b) AS nsq
        FROM embeddings
    ),
    {x._sql_kmeans_ctes()}
    SELECT cent_id, cv FROM cent{x._KMEANS_T} ORDER BY cent_id
    """
    got = {cid: list(cv) for cid, cv in con.execute(sql).fetchall()}
    want = {cid: cv for cid, cv in cents}
    # compare at 12 dp: the raw centroid doubles may differ in the
    # last ulp across engines (the DECIMAL(30,15) mean path rounds the
    # sum->double conversion independently); every USE of a centroid
    # goes through a DECIMAL(16,8) cosine rank, which absorbs it —
    # this test pins the capped TRAINING TRAJECTORY (same assignments,
    # same member sets, same means to 1e-12), not raw bit equality
    assert sorted(got) == sorted(want)
    for cid in want:
        assert all(
            abs(a - b) < 1e-12 for a, b in zip(got[cid], want[cid])
        ) and len(got[cid]) == len(want[cid]), (
            f"centroid {cid} diverges beyond ulp"
        )
