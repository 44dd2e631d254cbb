"""Join surface (SURVEY.md §2.5 J2/J3 + free Spark variants J4) — the
ksqlDB join catalog (stream-stream WITHIN, table-table outer;
docker-compose-main.yml:112-131) in batch form, plus the semi/anti and
as-of joins a Spark engine gets for free.

Every join here keeps an equi component so Catalyst picks hash/sort-merge
strategies (range predicates become post-join filters on the matched
key-pairs) — no nested-loop cartesian anywhere. Dimension-sized sides are
left to AQE to broadcast at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import dsum, sql_dsum, t


@register(
    "join_interval",
    oracle="""
    SELECT a.event_id AS signup_id,
           b.event_id AS next_id,
           a.user_id,
           b.event_type AS next_type,
           b.value AS next_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '30 minutes'
    WHERE a.event_type = 'signup'
      AND b.event_type IN ('purchase', 'click')
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (J2, ksqlDB ``WITHIN 30 MINUTES``)
    batch analog: signup followed by purchase/click of the same user
    within 30 minutes. Equi key (user_id) drives the shuffle; the time
    bound is a post-join range filter — under streaming the identical
    predicate plus watermarks bounds both state stores
    (streaming/jobs.py wires that form)."""
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").alias("a")
    b = ev.filter(F.col("event_type").isin("purchase", "click")).alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("a.event_id").alias("signup_id"),
        F.col("b.event_id").alias("next_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("b.event_type").alias("next_type"),
        F.col("b.value").alias("next_value"),
    )


@register(
    "join_full_outer",
    oracle="""
    WITH big_buyers AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5
    )
    SELECT COALESCE(c.c_custkey, b.o_custkey) AS custkey,
           c.c_mktsegment AS segment,
           COALESCE(b.n_orders, 0) AS n_orders,
           (c.c_custkey IS NOT NULL) AS has_customer,
           (b.o_custkey IS NOT NULL) AS is_big_buyer
    FROM customer c
    FULL OUTER JOIN big_buyers b ON c.c_custkey = b.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-table FULL OUTER equi-join (J3): all customers vs the
    heavy-buyer aggregate, null-extended on both sides."""
    c = t(spark, sf_dir, "customer")
    b = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 5)
    )
    j = c.join(b, c["c_custkey"] == b["o_custkey"], "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.col("c_custkey").isNotNull().alias("has_customer"),
        F.col("o_custkey").isNotNull().alias("is_big_buyer"),
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (J4, free in Spark): customers with ≥1 order in
    1995 — semi form never duplicates or widens the left side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (J4): customers with no order in 1995 (the
    complement of join_left_semi, so both sides are non-empty)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_asof",
    oracle="""
    SELECT o.o_orderkey,
           o.o_custkey,
           last(e.value ORDER BY e.ts, e.event_id)  AS last_event_value,
           strftime(max(e.ts), '%Y-%m-%d %H:%M:%S') AS last_event_ts,
           (count(e.event_id) > 0)                  AS matched
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J4 / SURVEY.md §2.5): each order picks the most recent
    event of its customer at-or-before the order date. Composed from
    existing operators — equi+range join then max_by — so it stays a
    shuffled hash join plus one aggregation. Ties on ts break by
    event_id (unique) for determinism."""
    o = t(spark, sf_dir, "orders")
    ev = t(spark, sf_dir, "events")
    j = o.join(
        ev,
        (ev["user_id"] == o["o_custkey"]) & (ev["ts"] <= o["o_orderdate"]),
        "left",
    )
    return j.groupBy("o_orderkey", "o_custkey").agg(
        F.expr("max_by(value, struct(ts, event_id))").alias("last_event_value"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_event_ts"),
        (F.count("event_id") > 0).alias("matched"),
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT o.o_orderkey,
           o.o_custkey,
           first(e.value ORDER BY e.ts, e.event_id)  AS next_event_value,
           strftime(min(e.ts), '%Y-%m-%d %H:%M:%S')  AS next_event_ts,
           (count(e.event_id) > 0)                   AS matched
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each order picks its customer's FIRST event
    at-or-after the order date — the reaction-matching direction (order
    placed → next observed activity), mirror of join_asof's backward
    lookup. Same plan shape: equi+range join, then min_by with the
    unique (ts, event_id) tie-break. The two directions together cover
    the trade-matching / sensor-alignment as-of family.

    Scale note shared with join_asof: the equi component keys the
    shuffle; the range predicate filters matched pairs. When one key's
    event history is huge, pre-bucket events by (user, coarse time) so
    the range scan per order touches one bucket — the batch analog of
    a state-store range scan."""
    o = t(spark, sf_dir, "orders")
    ev = t(spark, sf_dir, "events")
    j = o.join(
        ev,
        (ev["user_id"] == o["o_custkey"]) & (ev["ts"] >= o["o_orderdate"]),
        "left",
    )
    return j.groupBy("o_orderkey", "o_custkey").agg(
        F.expr("min_by(value, struct(ts, event_id))").alias("next_event_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("next_event_ts"),
        (F.count("event_id") > 0).alias("matched"),
    )


@register(
    "join_bloom_prune",
    oracle="""
    WITH build AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= DATE '1994-01-01'
          AND o_orderdate < DATE '1994-04-01'
    ),
    bloom AS (
        SELECT DISTINCT substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 3) AS bkt
        FROM build
    ),
    probe AS (
        SELECT l.l_orderkey, l.l_extendedprice, l.l_discount
        FROM lineitem l
        WHERE EXISTS (
            SELECT 1 FROM bloom b
            WHERE b.bkt = substr(md5(CAST(l.l_orderkey AS VARCHAR)), 1, 3)
        )
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_prefiltered,
           CAST(SUM(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_joined,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positive,
           CAST(SUM(CASE WHEN o.o_orderkey IS NOT NULL THEN
                    CAST(p.l_extendedprice * (1 - p.l_discount)
                         AS DECIMAL(28,6)) END) AS DOUBLE) AS revenue
    FROM probe p LEFT JOIN build o ON o.o_orderkey = p.l_orderkey
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (bloom-style) semi-join reduction, made explicit
    and checkable: a selective orders slice builds a 4096-bucket
    membership set (first 3 md5 hex chars of the key — a 1-hash bloom
    filter whose buckets are exact, so both engines agree bit-for-bit);
    the lineitem probe is PRE-FILTERED by bucket membership before the
    real key join. The output row quantifies exactly what the technique
    buys: probe rows surviving the bloom, true matches, false positives
    (bucket collisions), and the revenue aggregate over true matches.

    Scale: this is what Spark's AQE runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.enabled) does implicitly —
    at 100 TB the explicit form matters when the probe scan is remote
    (prune BEFORE the network) or the engine's runtime filter declines
    (join below its size thresholds). Both joins here are broadcast
    hash joins of the tiny build side: the bucket semi-join ships ~4 KB
    to every executor, and lineitem never shuffles. False-positive rate
    = |build|/4096 per distinct probe key, measured by the row itself."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    build = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1994-04-01").cast("date"))
    ).select("o_orderkey")
    bucket = lambda c: F.substring(  # noqa: E731
        F.md5(F.col(c).cast("string").cast("binary")), 1, 3
    )
    bloom = build.select(bucket("o_orderkey").alias("bkt")).distinct()
    probe = (
        li.withColumn("bkt", bucket("l_orderkey"))
        .join(F.broadcast(bloom), "bkt", "left_semi")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    j = probe.join(
        F.broadcast(build), F.col("o_orderkey") == F.col("l_orderkey"), "left"
    )
    matched = F.col("o_orderkey").isNotNull()
    return j.agg(
        F.count("*").alias("n_prefiltered"),
        F.sum(F.when(matched, 1).otherwise(0)).alias("n_joined"),
        F.sum(F.when(~matched, 1).otherwise(0)).alias("n_false_positive"),
        F.sum(
            F.when(
                matched,
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                ),
            )
        )
        .cast("double")
        .alias("revenue"),
    )


@register(
    "join_salted_skew",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o.o_totalprice")} AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scale.salted_join on the differential gate: the orders→customer
    enrich runs through the salt-16 path (fact rows salted by a
    deterministic whole-row hash, dimension exploded 16×, join key
    (key, salt)) and must hash-match the PLAIN-join oracle — proving
    that salting changes only the execution shape, never the result,
    under the same order-insensitive value-hash the driver applies to
    every operator. The pytest hypothesis property (test_scale.py)
    proves the law on arbitrary multisets; this row proves it on the
    real tables through the real gate.

    Scale: the pattern for the hot-customer join AQE skew-split can't
    fix (e.g. when the skew is in the aggregate after the join): a key
    owning 20% of the fact spreads over 16 reducers; the dimension
    pays 16× replication — the standard price, on the small side."""
    from olr_cdc_oracle_no_dbz_spark.scale import salted_join

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    j = salted_join(o, c, on="o_custkey", n_salts=16)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


_BAND_EPS = 0.05  # value-band half-width


@register(
    "join_band_bucketed",
    oracle=f"""
    SELECT a.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MIN(a.event_id) AS example_a,
           MIN(b.event_id) AS example_b
    FROM events a JOIN events b
      ON b.event_type = a.event_type
     AND b.event_id > a.event_id
     AND abs(a.value - b.value) <= {_BAND_EPS}
    GROUP BY a.event_type
    """,
)
def join_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAND JOIN (|a.value − b.value| ≤ ε) executed as a BUCKETED
    equi-join — the standard rewrite that turns a non-equi range
    predicate Catalyst would otherwise plan as a nested-loop into
    shuffle-hash work: quantize one side to ε-width buckets, explode
    the OTHER side to its bucket and both neighbors (a band of width ε
    can only span adjacent buckets), equi-join on (key, bucket), then
    apply the exact band predicate as a residual filter. Every
    qualifying pair matches exactly once because the non-exploded side
    keeps its single home bucket. The oracle runs the naive theta join
    — affordable at gate scale — so the gate proves the rewrite is
    EXACTLY the theta join.

    Scale design: the shuffle key is (event_type, bucket); cost is the
    sum over buckets of |A_b|×|B_b±1| — the band's true selectivity —
    instead of |A|×|B| per type. The ×3 explode is on one side only.
    This is the same binning idea range-join optimizers (and the
    interval join in workload/streaming) apply to time bands, here on
    an arbitrary numeric column."""
    ev = t(spark, sf_dir, "events")
    bkt = F.floor(F.col("value") / F.lit(_BAND_EPS)).cast("bigint")
    # r12 (stage receipt, SCALING_PROBE_r12): the single-row-group
    # events scan is one partition and b broadcasts, so the ×3 explode
    # + join probe + residual filter — the gate's whole work — ran as
    # ONE 0.9 s task. Conditional spread on the probe side only (the
    # map-heavy side); no-op on a wide cluster scan.
    from olr_cdc_oracle_no_dbz_spark.workload.util import spread_scan

    a = (
        spread_scan(ev.select("event_type", "event_id", "value"))
        .withColumn(
            "bkt", F.explode(F.array(bkt - 1, bkt, bkt + 1))
        )
        .alias("a")
    )
    b = (
        ev.select("event_type", "event_id", "value")
        .withColumn("bkt", bkt)
        .alias("b")
    )
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.bkt") == F.col("a.bkt"))
        & (F.col("b.event_id") > F.col("a.event_id"))
        & (
            F.abs(F.col("a.value") - F.col("b.value")) <= F.lit(_BAND_EPS)
        ),
    )
    return pairs.groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.count("*").alias("n_pairs"),
        F.min("a.event_id").alias("example_a"),
        F.min("b.event_id").alias("example_b"),
    )


@register(
    "join_geo_neighbors",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                         AS BIGINT) % 100000 AS DOUBLE) / 5000 AS lat,
               CAST(CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))
                         AS BIGINT) % 100000 AS DOUBLE) / 5000 AS lon,
               (CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100000) // 5000 AS celly,
               (CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))
                     AS BIGINT) % 100000) // 5000 AS cellx
        FROM customer
    ),
    expanded AS (
        SELECT p.*, p.cellx + dx.v AS ncellx, p.celly + dy.v AS ncelly
        FROM pts p
        CROSS JOIN (VALUES (-1), (0), (1)) dx(v)
        CROSS JOIN (VALUES (-1), (0), (1)) dy(v)
    ),
    cand AS (
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               a.lat AS lat1, a.lon AS lon1,
               b.lat AS lat2, b.lon AS lon2
        FROM expanded a JOIN pts b
          ON a.ncellx = b.cellx AND a.ncelly = b.celly
             AND a.c_custkey < b.c_custkey
    ),
    scored AS (
        SELECT key_a, key_b,
               CAST(2 * 6371.0088 * asin(sqrt(
                   sin(radians(lat2 - lat1) / 2)
                     * sin(radians(lat2 - lat1) / 2)
                   + cos(radians(lat1)) * cos(radians(lat2))
                     * sin(radians(lon2 - lon1) / 2)
                     * sin(radians(lon2 - lon1) / 2)
               )) AS DECIMAL(12,3)) AS dist_km
        FROM cand
    )
    SELECT key_a, key_b, CAST(dist_km AS VARCHAR) AS dist_km
    FROM scored
    WHERE dist_km <= CAST(25 AS DECIMAL(12,3))
    """,
)
def join_geo_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor join via GRID-CELL BLOCKING: each point lands
    in an integer 1°×1° cell (derived with pure integer arithmetic —
    no float floor at the blocking boundary), one side expands to its
    3×3 cell neighborhood, and the candidate join is a plain equi-join
    on cell ids — the standard distributed spatial-join shape (the
    geo analog of the LSH band join: candidates from blocking, exact
    haversine refine after). Any pair within 25 km must share or
    neighbor a cell (1° ≥ 111 km ≫ 25 km), so blocking loses nothing.

    Scale: candidates are sum-of-cell-size products over 9 neighbor
    cells — density-bounded, never N²; the refine is row-local trig
    compared on DECIMAL(12,3) (millimeter-insensitive, the
    scalar_geo_distance libm contract). Coordinates are deterministic
    synthetic points per customer (independent md5-derived lat/lon over a 100k-unit box — the repo's
    md5-bucket determinism idiom — so pair counts track point DENSITY ×
    radius area at every scale, with no lattice artifacts), the scalars.py convention."""
    c = t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (F.expr(
            "conv(substring(md5(cast(c_custkey AS string)), 1, 8), 16, 10)"
            " % 100000"
        ).cast("double") / 5000).alias("lat"),
        (F.expr(
            "conv(substring(md5(cast(c_custkey AS string)), 9, 8), 16, 10)"
            " % 100000"
        ).cast("double") / 5000).alias("lon"),
        F.expr(
            "cast(conv(substring(md5(cast(c_custkey AS string)), 1, 8),"
            " 16, 10) AS bigint) % 100000 div 5000"
        ).alias("celly"),
        F.expr(
            "cast(conv(substring(md5(cast(c_custkey AS string)), 9, 8),"
            " 16, 10) AS bigint) % 100000 div 5000"
        ).alias("cellx"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    expanded = pts.select("*", offsets.alias("o")).select(
        "c_custkey",
        "lat",
        "lon",
        (F.col("cellx") + F.col("o.dx")).alias("ncellx"),
        (F.col("celly") + F.col("o.dy")).alias("ncelly"),
    )
    a = expanded.alias("a")
    b = pts.alias("b")
    cand = a.join(
        b,
        (F.col("a.ncellx") == F.col("b.cellx"))
        & (F.col("a.ncelly") == F.col("b.celly"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("key_a"),
        F.col("b.c_custkey").alias("key_b"),
        F.col("a.lat").alias("lat1"),
        F.col("a.lon").alias("lon1"),
        F.col("b.lat").alias("lat2"),
        F.col("b.lon").alias("lon2"),
    )
    dlat = F.radians(F.col("lat2") - F.col("lat1")) / 2
    dlon = F.radians(F.col("lon2") - F.col("lon1")) / 2
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(F.col("lat1")))
        * F.cos(F.radians(F.col("lat2")))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    dist = (2 * 6371.0088 * F.asin(F.sqrt(h))).cast("decimal(12,3)")
    return (
        cand.select("key_a", "key_b", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= F.lit("25").cast("decimal(12,3)"))
        .select(
            "key_a", "key_b", F.col("dist_km").cast("string").alias("dist_km")
        )
    )
