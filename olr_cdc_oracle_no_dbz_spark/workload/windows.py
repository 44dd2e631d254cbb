"""Windowed aggregation + analytic-window surface (SURVEY.md §2 A5-A8,
W2) — the ksqlDB `WINDOW TUMBLING/HOPPING/SESSION` differentiator
(docker-compose-main.yml:112-131) expressed batch-first so DuckDB can
verify the exact same semantics the streaming layer reuses
(streaming/ wires the identical expressions behind readStream +
withWatermark).

Scale notes: every windowed agg here is a single hash-shuffle on
(window, key) with map-side partial aggregation; the session window is
Spark's native `session_window` (state-store backed under streaming);
the global top-N compiles to TakeOrderedAndProject (no global sort, no
single-partition window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import dsum, sql_dsum, t

_FMT = "yyyy-MM-dd HH:mm:ss"
_DFMT = "%Y-%m-%d %H:%M:%S"


@register(
    "window_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_DFMT}') AS window_start,
           event_type,
           COUNT(*) AS cnt,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window agg (A5): ``window(ts, '1 hour')``. Spark's
    windows are epoch-aligned, identical to date_trunc('hour')."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@register(
    "window_hopping",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                    - TO_MINUTES(o * 30), '{_DFMT}') AS window_start,
           COUNT(*) AS cnt,
           {sql_dsum('value')} AS sum_value
    FROM events CROSS JOIN (VALUES (0), (1)) AS offsets(o)
    GROUP BY 1
    """,
)
def window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window agg (A6): size 1h, advance 30m — every event lands
    in exactly two windows. The oracle replays the same assignment with
    an explicit 2-row offset join."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("cnt"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            "cnt",
            "sum_value",
        )
    )


@register(
    "window_session",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id,
           strftime(MIN(ts), '{_DFMT}') AS session_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window agg (A7): native ``session_window(ts, '30 minutes')``
    — events merge while the gap is < 30 min. The oracle rebuilds the
    same sessions with the lag-based islands technique (new session at
    gap >= 30 min, matching Spark's strict-overlap merge rule)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.date_format("session_window.start", _FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "window_rank_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER w2 AS rn,
           rank()       OVER w1 AS rk,
           dense_rank() OVER w1 AS drk,
           lag(o_totalprice)  OVER w2 AS prev_price,
           lead(o_totalprice) OVER w2 AS next_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (W2): row_number/rank/dense_rank/lag/
    lead + an explicit ROWS frame running sum, per-customer. Bounded
    per-key partitions → single shuffle, no scale hazard."""
    o = t(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w2).alias("rn"),
        F.rank().over(w1).alias("rk"),
        F.dense_rank().over(w1).alias("drk"),
        F.lag("o_totalprice").over(w2).alias("prev_price"),
        F.lead("o_totalprice").over(w2).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(frame)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "window_set_ops",
    oracle="""
    WITH b95 AS (SELECT DISTINCT o_custkey AS ck FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
         b96 AS (SELECT DISTINCT o_custkey AS ck FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
    SELECT 'only_95' AS tag, ck FROM (SELECT ck FROM b95 EXCEPT SELECT ck FROM b96)
    UNION ALL
    SELECT 'both' AS tag, ck FROM (SELECT ck FROM b95 INTERSECT SELECT ck FROM b96)
    UNION ALL
    SELECT 'any' AS tag, ck FROM (SELECT ck FROM b95 UNION SELECT ck FROM b96)
    """,
)
def window_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (W2): EXCEPT / INTERSECT / UNION (distinct
    semantics) over yearly buyer sets, each branch tagged."""
    o = t(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("ck"))
            .distinct()
        )

    b95, b96 = buyers(1995), buyers(1996)
    return (
        b95.subtract(b96).select(F.lit("only_95").alias("tag"), "ck")
        .unionAll(b95.intersect(b96).select(F.lit("both").alias("tag"), "ck"))
        .unionAll(b95.union(b96).distinct().select(F.lit("any").alias("tag"), "ck"))
    )


@register(
    "window_global_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def window_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT top-N (W2) via TakeOrderedAndProject:
    per-partition heaps + a 20-row driver merge — the scale-safe global
    top-N (contrast: an unpartitioned row_number window is a
    single-task funnel). Unique o_orderkey tie-break keeps the cut
    deterministic under price ties."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "window_distribution",
    oracle="""
    SELECT event_id, event_type,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           row_number()   OVER w AS rn
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (W2: NTILE/PERCENT_RANK/CUME_DIST)
    partitioned by event_type with a unique (value, event_id) total
    order — the ranks are integer-ratio doubles, deterministic
    cross-engine. Parallelism is bounded by the partition-key
    cardinality; that is inherent to exact per-type ranks (the whole
    type must sort together). At 100 TB the right tool for this
    question is ``window_distribution_binned`` below — the histogram
    variant whose window covers bucket counts, not events."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "window_distribution_binned",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               MIN(value) AS lo,
               MAX(value) AS hi,
               COUNT(*) AS n_total
        FROM events GROUP BY event_type
    ),
    binned AS (
        SELECT e.event_type,
               CAST(least(floor((e.value - b.lo) / ((b.hi - b.lo) / 100.0)),
                          99) AS BIGINT) AS bucket,
               MIN(b.n_total) AS n_total,
               COUNT(*) AS n
        FROM events e JOIN bounds b ON b.event_type = e.event_type
        GROUP BY 1, 2
    )
    SELECT event_type, bucket, n,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bucket)
                AS BIGINT) AS cum_n,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bucket)
                AS DOUBLE) / n_total AS cume_est
    FROM binned
    """,
)
def window_distribution_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for per-type distribution analysis (the exact
    ``window_distribution`` ranks every event inside one partition per
    type — parallelism bounded by type cardinality, the one documented
    weak spot): two aggregation passes instead. Pass 1 computes per-type
    [min, max] (a tiny broadcast dimension); pass 2 buckets every event
    into 100 equal-width bins and counts per (type, bucket). The
    cumulative window then runs over AT MOST 100 rows per type — the
    single-partition window the exact form drags all events through now
    holds bucket counts only, so the fact-sized work is all hash
    aggregation (partial map-side combine, fully parallel at any
    type cardinality). cume_est approximates cume_dist to 1/100
    resolution — the histogram-sketch tradeoff, stated in the name.

    Determinism: bucket boundaries divide identical IEEE doubles on
    both engines (same lo/hi from the same values), and a value exactly
    on a boundary lands identically because the expression is the same
    arithmetic both sides."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").alias("n_total"),
    )
    binned = (
        ev.join(F.broadcast(bounds), F.col("et") == F.col("event_type"))
        .select(
            "event_type",
            "n_total",
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 100.0)
                ),
                F.lit(99),
            )
            .cast("bigint")
            .alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.min("n_total").alias("n_total"), F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    return binned.select(
        "event_type",
        "bucket",
        "n",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
        (F.sum("n").over(w).cast("double") / F.col("n_total")).alias(
            "cume_est"
        ),
    )


@register(
    "window_moving_avg_range",
    oracle="""
    SELECT event_id,
           user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(value) OVER w AS n_in_hour,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
               / COUNT(value) OVER w AS mov_avg_1h
    FROM events
    -- order by FLOORED integer seconds, exactly Spark's
    -- cast(timestamp AS long): with microsecond ordering a sub-second
    -- fraction can push a boundary row in/out of the 1h frame relative
    -- to the second-granularity key (caught by the sf0.1 sweep), and
    -- same-second rows must be frame PEERS on both engines
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval frame (the time-based sibling of the ROWS frame in
    window_rank_frames): per-user moving average over the trailing hour
    of EVENT TIME, not the trailing N rows — frames stretch and shrink
    with event density, and rows sharing a timestamp are peers (both
    engines include all peers in a RANGE frame, so ties are
    deterministic without a tiebreaker column). Spark expresses the
    interval bound as rangeBetween(-3600, 0) over FLOORED epoch
    seconds (cast timestamp→long), and the oracle orders by the same
    floored integer — ranging over native microsecond timestamps
    instead diverges on boundary rows with sub-second fractions and on
    same-second peer groups (a real sf0.1 sweep catch).
    The average is exact-decimal sum / count (util.py determinism
    contract: frame sums must not depend on intra-frame visit order).

    Scale design: single shuffle on user_id, sort within partition —
    the same exchange as every per-key window here; the frame is
    evaluated by a sliding two-pointer over the sorted run, O(n) per
    key, no per-row rescan."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count("value").over(w).alias("n_in_hour"),
        (
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("mov_avg_1h"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT event_id, event_type,
           first_value(value) OVER w AS first_v,
           last_value(value)  OVER w AS last_v,
           nth_value(value, 3) OVER w AS third_v
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full
    frame — the remaining analytic-function surface after
    window_rank_frames (rank/lag/lead) and window_distribution
    (ntile/percent_rank/cume_dist). The UNBOUNDED..UNBOUNDED frame is
    spelled out because last_value's DEFAULT frame ends at CURRENT ROW
    (returning the row itself — the classic silent bug); the unique
    (ts, event_id) ordering makes all three picks deterministic.

    Scale: one shuffle on the partition key; full-frame aggregates
    evaluate once per partition, not per row."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 3).over(w).alias("third_v"),
    )


@register(
    "window_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN event_id % 3 = 0 THEN value END AS sparse_v,
           last_value(CASE WHEN event_id % 3 = 0 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_v
    FROM events
    """,
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD FILL (last-observation-carried-forward) — the sparse
    time-series imputation every sensor/metrics pipeline runs: carry
    the last non-null observation forward within each key's ordered
    history. A deterministic thinning (event_id % 3) creates the gaps
    so the fill provably fires on every row, and ``last(...,
    ignorenulls=True)`` over a growing frame is the one-pass Spark
    idiom (DuckDB: ``last_value(... IGNORE NULLS)``) — no self-join,
    no correlated subquery.

    Scale: the same single key shuffle + sorted run as every per-key
    window here; the frame state is ONE value (the running last),
    independent of gap length."""
    ev = t(spark, sf_dir, "events")
    sparse = F.when(F.col("event_id") % 3 == 0, F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        sparse.alias("sparse_v"),
        F.last(sparse, ignorenulls=True).over(w).alias("filled_v"),
    )


@register(
    "window_skyline_2d",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_orderdate, o_totalprice,
               MAX(o_totalprice) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_orderdate, o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_before
        FROM orders
    )
    SELECT o_orderpriority, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice
    FROM ranked
    WHERE best_before IS NULL OR o_totalprice > best_before
    """,
)
def window_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto front) per group — the classic OLAP research
    operator: per priority class, the orders not dominated on
    (earlier-or-equal date, higher-or-equal price). The naive skyline
    is an O(n²) dominance anti-join; in 2-D it collapses to ONE
    partitioned window: sort by (date asc, price desc), and a row is
    on the front iff its price strictly exceeds the running max of
    everything before it (equal-(date,price) duplicates keep only the
    first — the deduplicated skyline; the 1-PRECEDING frame plus the
    price-desc tie-order makes that rule explicit and identical on
    both engines).

    Scale: one shuffle on the group key, one sorted pass per group,
    running-max state of ONE value — versus the quadratic dominance
    join the operator's textbook definition implies. Higher dimensions
    need the BNL/divide-and-conquer algorithms; 2-D is the common
    dashboard case (cost vs freshness, price vs rating)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(
            F.col("o_orderdate").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    best = F.max("o_totalprice").over(w)
    return (
        o.withColumn("best_before", best)
        .filter(
            F.col("best_before").isNull()
            | (F.col("o_totalprice") > F.col("best_before"))
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
        )
    )
