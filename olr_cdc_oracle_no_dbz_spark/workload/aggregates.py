"""Group-aggregate surface — the ksqlDB 0.29 aggregate catalog re-expressed
in Spark (SURVEY.md §2.4 A3/A4: COUNT/SUM/MIN/MAX/AVG, COUNT_DISTINCT,
COLLECT_LIST/SET, TOPK, HISTOGRAM, LATEST/EARLIEST_BY_OFFSET).

All are single-shuffle hash aggregates with map-side partial aggregation;
collect/topk queries emit deterministic representations (sorted joined
strings / tie-broken ranks) so the differential harness can hash them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import davg, dsum, sql_davg, sql_dsum, t


@register(
    "agg_basic",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS cnt,
           {sql_dsum('value')} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           {sql_davg('value')} AS avg_value
    FROM events GROUP BY event_type
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM/MIN/MAX/AVG (ksqlDB core aggregates, A4)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            dsum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            davg("value").alias("avg_value"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS orders_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT_DISTINCT (A4). The approximate variant
    (approx_count_distinct, HLL) is benched separately — it cannot be
    differentially checked against an exact oracle."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count("*").alias("orders_cnt"),
        )
    )


@register(
    "agg_collect_set",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT_SET (A4), emitted as a sorted joined string so the value
    is order-insensitive-hash stable across engines."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias(
                "event_types"
            ),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(event_type, '<all>') AS etype,
           COALESCE(CAST(user_id AS VARCHAR), '<all>') AS uid,
           COUNT(*) AS cnt
    FROM events
    GROUP BY CUBE(event_type, user_id)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (A9): all 4 grouping sets in one pass —
    Spark expands to a single shuffle with grouping-id, same as rollup."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.cube("event_type", "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("<all>")).alias("etype"),
            F.coalesce(F.col("user_id").cast("string"), F.lit("<all>")).alias(
                "uid"
            ),
            "cnt",
        )
    )


@register(
    "agg_collect_list",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_id) AS type_sequence,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT_LIST (A4): multiplicities kept, ordered by the unique
    event_id offset (ksqlDB collects in offset order) so the joined
    string is deterministic across engines and partitionings."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("event_id", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
            ).alias("type_sequence"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 50) AS INTEGER) AS bucket, COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTOGRAM (A4): fixed-width bucketing + count. value ∈ [0.01, ~500]."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.floor(F.col("value") / 50).cast("int").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "agg_latest_earliest_by_offset",
    oracle="""
    SELECT user_id,
           arg_max(event_type, event_id) AS latest_type,
           arg_min(event_type, event_id) AS earliest_type,
           arg_max(value, event_id) AS latest_value
    FROM events GROUP BY user_id
    """,
)
def agg_latest_earliest_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATEST_BY_OFFSET / EARLIEST_BY_OFFSET (A4) via max_by/min_by with
    event_id as the offset (unique → deterministic)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", "event_id").alias("latest_type"),
            F.min_by("event_type", "event_id").alias("earliest_type"),
            F.max_by("value", "event_id").alias("latest_value"),
        )
    )


@register(
    "agg_topk_per_group",
    oracle="""
    SELECT event_type, rk, event_id, value FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id) AS rk
        FROM events
    ) WHERE rk <= 3
    """,
)
def agg_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOPK(value, 3) per group (A4), emitted as ranked rows with a unique
    tie-break instead of an array — deterministic under value ties.
    Scale note: row_number over a window is a single shuffle; at 100 TB
    this stays bounded because the rank filter cuts each partition to k
    rows before any further operator."""
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "rk", "event_id", "value")
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           COUNT(*) AS cnt,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — beyond the reference surface (ksqlDB has no
    CUBE/ROLLUP, SURVEY.md §2.4 A9) but free via Catalyst; exposed as
    engine capability."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS mean_value,
           sqrt((CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                 - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_value,
           (CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1) AS var_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (VARIANCE/STDDEV family of the A4 catalog)
    computed from exact decimal power sums: built-in stddev_samp streams
    doubles in partition order (order-dependent result, would fail the
    differential hash), so variance is assembled as
    (S2 - S1^2/n)/(n-1) from two exact decimal sums — bit-deterministic
    on both engines, still one shuffle with map-side partials."""
    ev = t(spark, sf_dir, "events")
    s1 = F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)")).cast("double")
    n = F.count("*")
    var = (s2 - s1 * s1 / n) / (n - 1)
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        (s1 / F.count("value")).alias("mean_value"),
        F.sqrt(var).alias("stddev_value"),
        var.alias("var_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "agg_pivot",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {", ".join(
               "CAST(SUM(CASE WHEN event_type = '" + et + "' "
               "THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE) AS " + et
               for et in ("click", "error", "purchase", "signup", "view")
           )}
    FROM events GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-day value sums spread across event-type columns.
    The pivot values are declared explicitly — Spark otherwise runs a
    blocking distinct scan over the fact to discover them, which at
    100 TB is a full extra pass; with the list supplied the pivot is a
    single conditional aggregation, identical to the CASE form."""
    ev = t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .agg(F.sum(F.col("value").cast("decimal(28,6)")).cast("double"))
    )
    # coalesce to 0.0: Spark's pivot yields NULL for a (day, type) cell
    # with no rows, while the oracle's SUM(CASE ... ELSE 0) yields 0 —
    # current testdata happens to fill every cell, but a data refresh
    # must not flip the differential gate
    return pivoted.select(
        "day", *[F.coalesce(et, F.lit(0.0)).alias(et) for et in types]
    )


@register(
    "agg_median",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5)  AS median_value,
           quantile_cont(value, 0.95) AS p95_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE_CONT (median + p95) per group: both engines sort
    the group and linearly interpolate at pos = q*(n-1) with the same
    IEEE arithmetic, so exact percentiles hash-match (unlike streaming
    float sums). Exact percentiles need the group's values together —
    per-key parallelism, the inherent cost of exactness; the approximate
    path at 100 TB is percentile_approx/t-digest, a different
    operator."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("median_value"),
        F.percentile("value", 0.95).alias("p95_value"),
        F.count("*").alias("n"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT event_type, day, COUNT(*) AS cnt, {sql_dsum('value')} AS sum_value,
           GROUPING(event_type, day) AS gid
    FROM (
        SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               value
        FROM events
    )
    GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (A9 beyond rollup/cube) with
    ``grouping_id`` disambiguating aggregation levels — one Expand +
    one shuffle for all three levels, not three scans. gid bit order
    matches DuckDB's GROUPING(event_type, day)."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    return base.groupingSets(
        [["event_type", "day"], ["event_type"], []], "event_type", "day"
    ).agg(
        F.count("*").alias("cnt"),
        dsum("value").alias("sum_value"),
        F.grouping_id().alias("gid"),
    )


@register(
    "agg_latest_n_by_offset",
    oracle="""
    SELECT user_id,
           array_to_string(list_transform(list_slice(list_sort(
               list({'k': event_id, 'v': event_type}), 'DESC'), 1, 3),
               x -> x.v), '|') AS latest_3_types,
           array_to_string(list_transform(list_slice(list_sort(
               list({'k': event_id, 'v': value}), 'DESC'), 1, 3),
               x -> CAST(CAST(x.v AS DECIMAL(28,6)) AS VARCHAR)), '|')
               AS latest_3_values
    FROM events GROUP BY user_id
    """,
)
def agg_latest_n_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATEST_BY_OFFSET(col, N) — the ksqlDB N-variant (A4): the last 3
    values per key in offset order. Spark has no N-ary max_by, so the
    (offset, value) pairs are collected, sorted descending by the
    struct (offset leads, unique → total order), sliced to 3, and
    projected — one shuffle, bounded per-group state. DuckDB mirrors it
    with list()/list_sort('DESC')/list_slice over the same (offset,
    value) structs (this build's arg_max has no N-ary form).

    Gate note: the result lists are projected through array_join into
    '|'-separated strings (doubles first pinned via the decimal cast of
    util.dsum's strategy) because the driver's canonicalizer sorts the
    result frame with pandas, which cannot hash list cells — the same
    array→string flattening that fixed the r2 multimodal gates."""
    ev = t(spark, sf_dir, "events")

    def latest3(col: str, proj: str):
        return F.expr(
            "array_join(transform(slice(sort_array(collect_list("
            f"struct(event_id, {col})), false), 1, 3), s -> {proj}), '|')"
        )

    return ev.groupBy("user_id").agg(
        latest3("event_type", "s.event_type").alias("latest_3_types"),
        latest3(
            "value", "cast(cast(s.value as decimal(28,6)) as string)"
        ).alias("latest_3_values"),
    )


@register(
    "agg_earliest_n_by_offset",
    oracle="""
    SELECT user_id,
           array_to_string(list_transform(list_slice(list_sort(
               list({'k': event_id, 'v': event_type}), 'ASC'), 1, 3),
               x -> x.v), '|') AS earliest_3_types,
           array_to_string(list_transform(list_slice(list_sort(
               list({'k': event_id, 'v': value}), 'ASC'), 1, 3),
               x -> CAST(CAST(x.v AS DECIMAL(28,6)) AS VARCHAR)), '|')
               AS earliest_3_values
    FROM events GROUP BY user_id
    """,
)
def agg_earliest_n_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EARLIEST_BY_OFFSET(col, N) — the symmetric twin of
    agg_latest_n_by_offset: first 3 values per key in offset order
    (ascending struct sort, slice, project; same array_join gate
    flattening)."""
    ev = t(spark, sf_dir, "events")

    def earliest3(col: str, proj: str):
        return F.expr(
            "array_join(transform(slice(sort_array(collect_list("
            f"struct(event_id, {col})), true), 1, 3), s -> {proj}), '|')"
        )

    return ev.groupBy("user_id").agg(
        earliest3("event_type", "s.event_type").alias("earliest_3_types"),
        earliest3(
            "value", "cast(cast(s.value as decimal(28,6)) as string)"
        ).alias("earliest_3_values"),
    )


@register(
    "agg_incremental_merge",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS cnt,
           {sql_dsum('value')} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a maintained aggregate table
    is refreshed by MERGING the partial-aggregation state of the new
    delta into the stored state — never by rescanning the base. This
    query proves the merge law the whole scheme rests on,
    ``merge(partial(base), partial(delta)) == agg(base ∪ delta)``:
    the input is split on an arbitrary predicate, each side reduced to
    per-group (count, exact-decimal sum, min, max) state, and the two
    states merged by a second aggregate (counts add, decimal sums add,
    min/max fold). The oracle computes the direct full aggregate, so
    the differential gate certifies merge == recompute bit-for-bit —
    the sum state stays DECIMAL until the final cast, because merging
    already-rounded doubles would break associativity.

    Scale design: this is exactly Spark's own map-side partial-agg
    contract lifted to table granularity. At 100 TB the stored state is
    |groups| rows, the delta pass reads only new data, and the merge
    shuffles |groups| — refresh cost is O(delta), independent of base
    size. Same states power the streaming aggregation upgrade path
    (state-store rows ARE these partials)."""
    ev = t(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_state"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    is_delta = F.col("event_id") % 4 == 0  # arbitrary, deterministic split
    merged = partial(ev.filter(~is_delta)).unionByName(
        partial(ev.filter(is_delta))
    )
    return merged.groupBy("event_type").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_state").cast("double").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


@register(
    "agg_unpivot",
    oracle=f"""
    WITH wide AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS cnt,
               {sql_dsum('value')} AS sum_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events GROUP BY event_type
    )
    SELECT event_type, 'cnt' AS metric, cnt AS metric_value FROM wide
    UNION ALL
    SELECT event_type, 'sum_value', sum_value FROM wide
    UNION ALL
    SELECT event_type, 'min_value', min_value FROM wide
    UNION ALL
    SELECT event_type, 'max_value', max_value FROM wide
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the inverse of agg_pivot: a wide per-type metrics table
    melted to (event_type, metric, metric_value) long form through the
    native DataFrame.unpivot API (Catalyst Expand node, the same
    operator that powers rollup/cube). All measures cast to double
    first — unpivot requires one value type, and counts stay exact in
    a double well past 2^50.

    Scale design: Expand multiplies rows by the measure count WITHOUT a
    shuffle (it's a flatMap-shaped projection over the already-reduced
    aggregate), so the long form costs |groups| x |metrics| rows of
    projection, nothing more."""
    wide = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("double").alias("cnt"),
            dsum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    return wide.unpivot(
        ids=["event_type"],
        values=["cnt", "sum_value", "min_value", "max_value"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


_PROFILE_COLS = (
    # (name, canonical-repr SQL fragment for min/max emission)
    ("o_orderkey", "CAST({m} AS VARCHAR)"),
    ("o_custkey", "CAST({m} AS VARCHAR)"),
    ("o_orderstatus", "{m}"),
    ("o_totalprice", "CAST(CAST({m} AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderpriority", "{m}"),
)


@register(
    "profile_table",
    oracle=f"""
    WITH a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               {", ".join(
                   f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS nn_{c}, "
                   f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}, "
                   + r.format(m=f"MIN({c})") + f" AS mn_{c}, "
                   + r.format(m=f"MAX({c})") + f" AS mx_{c}"
                   for c, r in _PROFILE_COLS
               )}
        FROM orders
    )
    {" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_null, "
        f"nd_{c} AS n_distinct, mn_{c} AS min_repr, mx_{c} AS max_repr FROM a"
        for c, _ in _PROFILE_COLS
    )}
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of a table (the ingest-time
    data-quality report: null counts, cardinalities, value ranges per
    column). ONE scan computes every per-column aggregate into a single
    wide row — count/null-count/min/max are all partial-aggregatable,
    so the reduce moves one row per partition — and a stack() pivots it
    to the long form a quality dashboard stores. Numeric min/max are
    computed in their native type and only FORMATTED as strings (string
    MIN would order '9' > '10'); doubles go through the fixed-scale
    decimal emission contract.

    Scale: the COUNT(DISTINCT) columns expand the scan |profiled
    columns| ways before the partial agg (Spark's Expand); at 100 TB
    swap each for the HLL register sketch (agg_distinct_hll) and the
    pass stays single-scan with constant-size state. Everything else is
    strictly one reduce."""
    o = t(spark, sf_dir, "orders")

    def reprs(c: str) -> tuple[F.Column, F.Column]:
        if c == "o_totalprice":
            mn = F.min(c).cast("decimal(18,2)").cast("string")
            mx = F.max(c).cast("decimal(18,2)").cast("string")
        else:
            mn, mx = F.min(c).cast("string"), F.max(c).cast("string")
        return mn, mx

    aggs = [F.count("*").alias("n_rows")]
    for c, _ in _PROFILE_COLS:
        mn, mx = reprs(c)
        aggs += [
            (F.count("*") - F.count(c)).alias(f"nn_{c}"),
            F.count_distinct(c).alias(f"nd_{c}"),
            mn.alias(f"mn_{c}"),
            mx.alias(f"mx_{c}"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_null, n_distinct, min_repr, max_repr)",
    ).select(
        "column_name", "n_rows", "n_null", "n_distinct", "min_repr", "max_repr"
    )


_PCTS = (0.25, 0.5, 0.75, 0.95)


@register(
    "agg_percentiles_exact",
    oracle=f"""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn
        FROM events
    ),
    counts AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    ),
    grid AS (
        SELECT event_type, n, p,
               CAST(FLOOR(p * (n - 1)) AS BIGINT) + 1 AS lo,
               LEAST(CAST(FLOOR(p * (n - 1)) AS BIGINT) + 2, n) AS hi,
               p * (n - 1) - FLOOR(p * (n - 1)) AS frac
        FROM counts, LATERAL unnest(
            [{", ".join(f"CAST({p!r} AS DOUBLE)" for p in _PCTS)}]) AS u(p)
    )
    SELECT g.event_type, g.p, g.n,
           a.value + g.frac * (b.value - a.value) AS pct_value
    FROM grid g
    JOIN ranked a ON a.event_type = g.event_type AND a.rn = g.lo
    JOIN ranked b ON b.event_type = g.event_type AND b.rn = g.hi
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed percentiles (p25/p50/p75/p95 per event_type)
    with HAND-ROLLED linear interpolation: rank each group once, then
    join the two bracketing ranks per requested quantile and
    interpolate with the textbook pos = p*(n-1) formula. Spark's
    percentile() and DuckDB's quantile_cont() implement the same
    definition but evaluate the interpolation in engine-private
    operator code; writing the arithmetic as an explicit expression
    makes the result bit-identical (same IEEE ops in the same order on
    both engines) — the same trick the HLL/KMV estimators use.

    Scale: ONE shuffle ranks each group (vs percentile()'s
    collect-to-buffer per group, which holds the whole group in one
    task's memory — this form spills via ExternalSort instead and is
    the scalable exact path); the 4-row-per-group bracket grid
    broadcasts back onto the ranked relation as two equi-joins. Exact
    interpolated quantiles at any scale; for fixed-error estimates at
    less cost, t-digest/KLL sketches are the approximate alternative
    (not differentially checkable — engine-private buffers)."""
    ev = t(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type", "value", F.row_number().over(wr).alias("rn")
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    pos = F.col("p") * (F.col("n") - 1)
    grid = (
        counts.select(
            "event_type",
            "n",
            F.explode(F.array(*[F.lit(p) for p in _PCTS])).alias("p"),
        )
        .withColumn("lo", F.floor(pos).cast("long") + 1)
        .withColumn("hi", F.least(F.floor(pos).cast("long") + 2, F.col("n")))
        .withColumn("frac", pos - F.floor(pos))
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    g = F.broadcast(grid).alias("g")
    return (
        g.join(
            a,
            (F.col("a.event_type") == F.col("g.event_type"))
            & (F.col("a.rn") == F.col("g.lo")),
        )
        .join(
            b,
            (F.col("b.event_type") == F.col("g.event_type"))
            & (F.col("b.rn") == F.col("g.hi")),
        )
        .select(
            F.col("g.event_type").alias("event_type"),
            "p",
            "n",
            (
                F.col("a.value")
                + F.col("g.frac") * (F.col("b.value") - F.col("a.value"))
            ).alias("pct_value"),
        )
    )


@register(
    "agg_two_phase_skew",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum("value")} AS sum_value,
           {sql_davg("value")} AS avg_value
    FROM events GROUP BY event_type
    """,
)
def agg_two_phase_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation for skewed keys, verified to be
    EXACTLY the plain aggregate: phase 1 groups by (key, salt16) so a
    hot key's rows spread over 16 reducers; phase 2 merges the 16
    partial states per key. The mergeable state is (count, exact
    decimal sum) — the same algebra agg_incremental_merge pins — so
    salting changes the execution shape, never the result, and the
    oracle is simply the UNSALTED GROUP BY.

    Scale: THE standard fix when one key owns 20% of a 100 TB fact and
    AQE skew handling can't help (skew-join splitting applies to
    joins, not aggregates; map-side partial agg already helps but
    still funnels each key's partials to ONE reducer — salting gives
    that key 16). Salt = md5(event_id) bucket: deterministic,
    uniform, and independent of the data distribution."""
    ev = t(spark, sf_dir, "events")
    salt = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 2),
        16,
        10,
    ).cast("int") % 16
    partial = (
        ev.withColumn("salt", salt)
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("psum"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("psum").cast("double").alias("sum_value"),
        (F.sum("psum").cast("double") / F.sum("pn")).alias("avg_value"),
    )


@register(
    "agg_histogram_equi_depth",
    oracle="""
    WITH buckets AS (
        SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS bucket
        FROM events
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM buckets GROUP BY event_type, bucket
    """,
)
def agg_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 quantile buckets per event_type):
    ntile assigns equal-population buckets, then min/max per bucket are
    the adaptive boundaries — the histogram an optimizer or drift
    monitor wants when the distribution is skewed and fixed-width
    buckets (agg_histogram) put 90% of rows in one bar. Tie-break on
    the unique event_id makes every ntile assignment — and so every
    boundary — deterministic on both engines.

    Scale: one rank shuffle per group (the agg_percentiles_exact
    cost model) + a partial-agg rollup of 10 rows per group. ntile is
    partition-local after the shuffle, so parallelism scales with
    groups; for a single giant group, derive boundaries from
    percentiles (agg_percentiles_exact) against a sampled rank pass
    instead."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "agg_correlation",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x,
               value AS y
        FROM events
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           (sxy - sx * sy / n) / (n - 1) AS cov_xy,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))
             AS corr_xy
    FROM sums
    """,
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance + Pearson correlation per group (does
    activity hour correlate with event value?) from exact decimal
    power sums — the agg_stats pattern extended to the cross moment.
    Spark's covar_samp/corr accumulate doubles in visit order
    (partition-dependent results); the power-sum form is one
    partial-agg shuffle AND bit-deterministic: both engines apply
    sqrt/divide to identical inputs, and IEEE sqrt is correctly
    rounded everywhere.

    Scale: identical cost to agg_basic — 5 decimal sums + count per
    group, map-side combined; no second pass, no per-group buffers
    (contrast percentile-style operators). The numerically-stable
    centered form matters for |r| near 1 with huge means; here means
    are small and the decimal sums are EXACT, so cancellation is the
    oracle's problem too — identically."""
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    d = lambda c: F.sum(c.cast("decimal(28,6)")).cast("double")  # noqa: E731
    sums = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        d(F.col("x")).alias("sx"),
        d(F.col("y")).alias("sy"),
        d(F.col("x") * F.col("x")).alias("sxx"),
        d(F.col("y") * F.col("y")).alias("syy"),
        d(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    return sums.select(
        "event_type",
        "n",
        (num / (F.col("n") - 1)).alias("cov_xy"),
        (
            num
            / (
                F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                * F.sqrt(F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            )
        ).alias("corr_xy"),
    )


@register(
    "agg_linear_trend",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS DOUBLE) AS x,
               value AS y
        FROM events
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope_per_day,
           sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n)
               AS intercept
    FROM sums
    """,
)
def agg_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line (is event value drifting over time?):
    slope and intercept from the SAME exact decimal power sums as
    agg_correlation — the single-pass closed form (slope = cov/var_x),
    deterministic where an iterative or double-accumulating regression
    is not. X is INTEGER days since a fixed epoch: readable slope units
    AND every decimal cast stays in the exact regime (x, x*x integral;
    x*y ≤ ~1e5 — the scale-6 emission contract needs ≲10 significant
    digits, see embedding_dim_stats for the boundary).

    Scale: one partial-agg shuffle, constant state per group — the
    drift monitor runs on the full 100 TB fact at agg_basic cost. For
    multi-feature regression the same pattern yields the normal
    equations (X'X, X'y as decimal sums) with a tiny driver-side
    solve."""
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("x"),
        F.col("value").alias("y"),
    )
    d = lambda c: F.sum(c.cast("decimal(28,6)")).cast("double")  # noqa: E731
    sums = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        d(F.col("x")).alias("sx"),
        d(F.col("y")).alias("sy"),
        d(F.col("x") * F.col("x")).alias("sxx"),
        d(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return sums.select(
        "event_type",
        "n",
        slope.alias("slope_per_day"),
        (F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n"))).alias(
            "intercept"
        ),
    )


@register(
    "agg_mom_growth",
    oracle=f"""
    WITH monthly AS (
        SELECT o_orderpriority AS priority,
               strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               {sql_dsum("o_totalprice")} AS revenue
        FROM orders GROUP BY 1, 2
    )
    SELECT priority, month, revenue,
           lag(revenue) OVER (PARTITION BY priority ORDER BY month)
               AS prev_revenue,
           CASE WHEN lag(revenue) OVER (PARTITION BY priority ORDER BY month)
                     IS NULL THEN NULL
                ELSE revenue
                     / lag(revenue) OVER (PARTITION BY priority ORDER BY month)
                     - 1.0
           END AS mom_growth
    FROM monthly
    """,
)
def agg_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth per priority — the period-comparison
    analytic (lag on an AGGREGATED series, not on the fact): monthly
    exact-decimal revenue, then a lag window over the tiny series.
    The growth ratio divides two exact-sum-derived doubles, so even
    the percentage hash-matches.

    Scale: the fact contributes one partial-agg shuffle (months ×
    priorities groups); the lag window runs over the aggregated series
    — |months|·|priorities| rows — whose per-partition size is months,
    never fact rows. The lag-on-aggregate shape is what makes period
    comparisons free at 100 TB: comparing periods on the fact (self-
    join on month-12) would shuffle the fact twice."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.partitionBy("priority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "priority",
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.col("revenue") / prev - 1.0)
        .alias("mom_growth"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_type, n AS mode_count FROM (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rk
        FROM c
    ) WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE (most frequent value) per key — the categorical summary
    ksqlDB's agg catalog lacks and SQL's MODE() leaves tie-broken
    implementation-defined; here the tie-break is explicit (highest
    count, then lexicographically first value) so both engines agree.
    Two-level shape: count per (key, value) — a partial-agg shuffle —
    then a per-key top-1, which Spark 4 executes as WindowGroupLimit
    (rank pushdown: only the running best row per key is buffered,
    never the whole group)."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "agg_gini_diversity",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS m FROM c GROUP BY 1)
    SELECT c.user_id,
           MAX(t.m) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           1.0 - CAST(SUM(n * n) AS DOUBLE) / (MAX(t.m) * MAX(t.m))
               AS gini_diversity
    FROM c JOIN tot t ON t.user_id = c.user_id
    GROUP BY c.user_id
    """,
)
def agg_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical DIVERSITY per key as Gini impurity, 1 − Σ pᵢ² — the
    behavioral-diversity measure entropy usually serves, chosen over
    Shannon entropy deliberately: ln() is outside this engine's checked
    surface (libm builds round differently; the text_bigram_lm
    contract), while Gini is pure integer counts and one double
    division — bit-deterministic everywhere, same ranking behavior.

    Scale: two stacked partial-agg shuffles on (key, category) then
    (key); per-key state is the category histogram, bounded by the
    category domain."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = c.groupBy("user_id").agg(F.sum("n").alias("m"))
    return (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("m").cast("bigint").alias("n_events"),
            F.count("*").alias("n_types"),
            (
                F.lit(1.0)
                - F.sum(F.col("n") * F.col("n")).cast("double")
                / (F.max("m") * F.max("m"))
            ).alias("gini_diversity"),
        )
    )
