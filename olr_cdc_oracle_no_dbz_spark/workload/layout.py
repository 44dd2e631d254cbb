"""Multi-dimensional data layout: z-order (Morton) clustering keys.

`scale.write_range_sorted` already proves single-column range layout
(disjoint per-file min/max => footer pruning). Range-sorting can serve
only ONE predicate column; a 100 TB table queried by BOTH user and time
(or both key and SCN) needs a space-filling curve so that every file is
a small rectangle in BOTH dimensions. The z-value below is the standard
Morton interleave computed with pure integer bit-arithmetic — identical
in Spark and DuckDB, so the layout key itself is differentially
verified, not just eyeballed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import t

# (shift, mask) rounds spreading 16 bits to even positions of 32:
# abcd... -> a0b0c0d0... Classic magic-number bit spreading, 4 rounds.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread(c: Column) -> Column:
    for shift, mask in _SPREAD:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def zvalue(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit non-negative ints (x even bits,
    y odd bits). Monotone locality: nearby (x, y) share z prefixes."""
    return _spread(x).bitwiseOR(F.shiftleft(_spread(y), 1))


def _sql_spread(expr: str) -> str:
    for shift, mask in _SPREAD:
        expr = f"(({expr}) | (({expr}) << {shift})) & {mask}"
    return expr


def _sql_zvalue(x: str, y: str) -> str:
    return f"({_sql_spread(x)}) | (({_sql_spread(y)}) << 1)"


@register(
    "layout_zorder",
    oracle=f"""
    WITH pts AS (
        SELECT user_id & 65535 AS x, event_id & 65535 AS y FROM events
    ),
    z AS (SELECT x, y, {_sql_zvalue("x", "y")} AS zv FROM pts)
    SELECT zv >> 22 AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y,
           CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS DOUBLE)
               / (65536.0 * 65536.0) AS bbox_frac
    FROM z GROUP BY zv >> 22
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering report: Morton-interleave (user_id, event_id)
    into a 32-bit z-value, group into 1024 z-buckets (the file
    boundaries a z-sorted write would produce), and report each
    bucket's bounding box in BOTH dimensions. `bbox_frac` — the
    fraction of the full 2-D domain a bucket's min/max rectangle covers
    — is exactly the statistic a scan planner prunes on: with 1024
    buckets a z-sort yields ~1/1024 per bucket in each dimension's
    product, versus 1.0 for an unsorted write and (1/1024, 1.0) for a
    single-column sort. The whole computation is a zero-shuffle
    projection plus one partial-agg groupBy on the bucket key.

    To materialize the layout, `repartitionByRange(F.col('zv'))` +
    sortWithinPartitions before write — same mechanics as
    scale.write_range_sorted but on the interleaved key; parquet
    footers then carry tight min/max for user_id AND event_id
    simultaneously."""
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("x"),
        F.col("event_id").bitwiseAND(F.lit(65535)).alias("y"),
    )
    z = pts.withColumn("zv", zvalue(F.col("x"), F.col("y")))
    return z.groupBy(
        F.shiftright("zv", 22).alias("z_bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        (
            ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)).cast(
                "double"
            )
            / F.lit(65536.0 * 65536.0)
        ).alias("bbox_frac"),
    )


@register(
    "layout_partition_advisor",
    oracle="""
    WITH cand AS (
        SELECT 'event_type' AS candidate, event_type::VARCHAR AS pval
        FROM events
        UNION ALL
        SELECT 'event_date', strftime(CAST(ts AS DATE), '%Y-%m-%d')
        FROM events
        UNION ALL
        SELECT 'user_id', user_id::VARCHAR FROM events
        UNION ALL
        SELECT 'user_bucket_32', (user_id % 32)::VARCHAR FROM events
    ),
    per_part AS (
        SELECT candidate, pval, CAST(COUNT(*) AS BIGINT) AS n
        FROM cand GROUP BY 1, 2
    ),
    stats AS (
        SELECT candidate,
               CAST(COUNT(*) AS BIGINT) AS n_partitions,
               CAST(SUM(n) AS BIGINT) AS total_rows,
               CAST(MAX(n) AS BIGINT) AS max_partition_rows
        FROM per_part GROUP BY 1
    )
    SELECT candidate, n_partitions, total_rows, max_partition_rows,
           total_rows // n_partitions AS avg_partition_rows,
           CAST(CAST(max_partition_rows AS DECIMAL(18,6)) / total_rows
                AS DECIMAL(9,6))::VARCHAR AS top_share,
           CASE
             WHEN n_partitions < 4 THEN 'too_coarse'
             WHEN n_partitions > 1000 THEN 'too_many_partitions'
             WHEN CAST(CAST(max_partition_rows AS DECIMAL(18,6))
                       / total_rows AS DECIMAL(9,6))
                  > CAST(0.4 AS DECIMAL(9,6)) THEN 'skewed'
             ELSE 'good'
           END AS verdict
    FROM stats
    """,
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key advisor: for each candidate partition column of the
    events table, measure the three facts that decide a 100 TB hive
    layout — partition COUNT (too many ⇒ small-file explosion + listing
    cost; too few ⇒ no pruning), MAX PARTITION SHARE (skew ⇒ straggler
    tasks), and average partition size — and emit a verdict. This is
    the design step behind `scale.write_partitioned`; making it a
    registered QUERY turns layout guidance into a checked, repeatable
    report instead of tribal knowledge.

    Thresholds are deliberate: <4 partitions can't parallelize pruning,
    >1000 (per this events table) explodes file counts, a >40 % top
    share means one partition dominates runtime. Scale: each candidate
    is one partial-agg pass over a single projected column (the union
    is 4 independent agg pipelines, no self-join); per-partition counts
    reduce to a candidate-bounded report before anything reaches the
    driver. The exact-decimal share render keeps the verdict
    engine-identical."""
    ev = t(spark, sf_dir, "events")
    candidates = [
        ("event_type", F.col("event_type").cast("string")),
        ("event_date", F.date_format(F.to_date("ts"), "yyyy-MM-dd")),
        ("user_id", F.col("user_id").cast("string")),
        ("user_bucket_32", (F.col("user_id") % 32).cast("string")),
    ]
    stats = None
    for name, expr in candidates:
        per_part = ev.groupBy(expr.alias("pval")).agg(
            F.count("*").alias("n")
        )
        s = per_part.agg(
            F.lit(name).alias("candidate"),
            F.count("*").alias("n_partitions"),
            F.sum("n").alias("total_rows"),
            F.max("n").alias("max_partition_rows"),
        )
        stats = s if stats is None else stats.unionAll(s)
    share = (
        F.col("max_partition_rows").cast("decimal(18,6)")
        / F.col("total_rows")
    ).cast("decimal(9,6)")
    verdict = (
        F.when(F.col("n_partitions") < 4, "too_coarse")
        .when(F.col("n_partitions") > 1000, "too_many_partitions")
        .when(share > F.lit("0.4").cast("decimal(9,6)"), "skewed")
        .otherwise("good")
    )
    return stats.select(
        "candidate",
        "n_partitions",
        "total_rows",
        "max_partition_rows",
        F.expr("total_rows div n_partitions").alias("avg_partition_rows"),
        share.cast("string").alias("top_share"),
        verdict.alias("verdict"),
    )
