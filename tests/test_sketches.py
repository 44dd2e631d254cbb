"""Mergeability laws for the sketch operators (workload/sketches.py)
and the locality law for the z-order key (workload/layout.py).

These are the properties that make the operators SCALE-correct, beyond
the value-correctness the differential gate already proves: a sketch is
only distributable if building it on partitions and merging states
equals building it on the union (the same law test_history.py pins for
SCD2 folds and agg_incremental_merge pins for partial aggregates).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _hll_registers(df):
    """(event_type, bucket) -> max rho, exactly as agg_distinct_hll."""
    h = df.select(
        "event_type",
        F.md5(F.col("user_id").cast("string").cast("binary")).alias("hh"),
    ).select(
        "event_type",
        F.substring("hh", 1, 2).alias("bucket"),
        F.conv(F.substring("hh", 3, 13), 16, 10).cast("long").alias("v"),
    )
    rho = F.when(F.col("v") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin("v"))
    )
    return h.groupBy("event_type", "bucket").agg(F.max(rho).alias("m_j"))


def test_hll_registers_merge_law(spark):
    """HLL is distributable because registers merge by MAX: building
    registers on two disjoint halves and max-merging them must equal
    building them on the whole input. (Violated would mean shuffles /
    repartitioning change the estimate.)"""
    ev = _events(spark)
    full = _hll_registers(ev)
    a = _hll_registers(ev.filter(F.col("event_id") % 2 == 0))
    b = _hll_registers(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        a.unionAll(b)
        .groupBy("event_type", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_kmv_sketch_merge_law(spark):
    """KMV merges by union-then-keep-k-smallest: the k smallest hashes
    of A ∪ B equal the k smallest of (k-smallest of A) ∪ (k-smallest
    of B). Distinct-safe: hashes are of the key, so duplicates across
    halves collapse."""
    from pyspark.sql import Window

    k = 16
    ev = _events(spark)

    def sk(df):
        h = df.select(
            "event_type",
            F.md5(F.col("user_id").cast("string").cast("binary")).alias("h"),
        ).distinct()
        w = Window.partitionBy("event_type").orderBy("h")
        return (
            h.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("event_type", "h")
        )

    full = sk(ev)
    halves = sk(ev.filter(F.col("event_id") % 2 == 0)).unionAll(
        sk(ev.filter(F.col("event_id") % 2 == 1))
    )
    # merge = distinct union of the two k-sets, re-ranked, keep k
    w = Window.partitionBy("event_type").orderBy("h")
    remerged = (
        halves.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "h")
    )
    assert remerged.exceptAll(full).count() == 0
    assert full.exceptAll(remerged).count() == 0


def test_zorder_bucket_prefix_locality(spark):
    """The z-bucket (top 10 z bits) determines the top 5 bits of BOTH
    dimensions — the prefix property that makes every z-bucket a
    2048×2048 rectangle and file skipping two-dimensional."""
    from olr_cdc_oracle_no_dbz_spark.workload.layout import zvalue

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pts = ev.select(
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("x"),
        F.col("event_id").bitwiseAND(F.lit(65535)).alias("y"),
    )
    z = pts.withColumn("zv", zvalue(F.col("x"), F.col("y")))
    combos = (
        z.select(
            F.shiftright("zv", 22).alias("zb"),
            F.shiftright("x", 11).alias("xp"),
            F.shiftright("y", 11).alias("yp"),
        )
        .distinct()
        .groupBy("zb")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert combos == 1


def test_quantile_sketch_merge_law_and_error_bound(spark):
    """agg_quantile_sketch is distributable because bucket counts merge
    by ADDITION: building (bucket, count) states on two disjoint halves
    and summing them must equal the whole-input state. And the quantile
    read off the merged sketch must sit within one bucket width of the
    exact quantile — the sketch's advertised absolute error bound."""
    from olr_cdc_oracle_no_dbz_spark.workload.sketches import _QS_W

    ev = _events(spark)
    bkt = F.floor(F.col("value") / F.lit(_QS_W)).cast("bigint").alias("bkt")

    def state(df):
        return df.groupBy("event_type", bkt).agg(F.count("*").alias("cnt"))

    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        state(half_a)
        .unionAll(state(half_b))
        .groupBy("event_type", "bkt")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = state(ev)
    sa = sorted(map(tuple, merged.collect()))
    sb = sorted(map(tuple, whole.collect()))
    assert sa == sb

    # error bound: sketch p50 within W of the exact p50, per group
    from olr_cdc_oracle_no_dbz_spark.workload.sketches import (
        agg_quantile_sketch,
    )

    est = {
        r["event_type"]: r["p50_est"]
        for r in agg_quantile_sketch(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(est[k] - e) <= _QS_W, (k, est[k], e)
