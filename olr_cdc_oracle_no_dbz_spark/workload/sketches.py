"""Sketch-based approximate aggregates with exact cross-engine oracles.

At 100 TB, exact COUNT(DISTINCT) and exact top-k frequency both shuffle
every distinct key; production pipelines answer them with fixed-size
sketches instead (KMV/HLL for cardinality, count-min for frequency).
Spark's built-ins (`approx_count_distinct`, `count_min_sketch`) use
engine-private hash seeds, so their outputs can't be differentially
checked against DuckDB. These queries therefore build the SAME sketches
from md5 — deterministic and identical in both engines — which makes the
estimator itself hash-checkable, not just "close". The md5-derived
fractions are uniform, so the estimators carry the textbook error
bounds: KMV ±1/sqrt(k-2) relative, CMS overestimate ≤ 2N/w with prob
1-(1/2)^d.

Reference parity: the reference's sink-side dedupe/metrics path (README
counters) exposes only exact counts; these sketches are the scale path a
Spark deployment swaps in when exact is unaffordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import t

_KMV_K = 64
# 13 hex chars = 52 bits < 2^53: the parsed integer is exactly
# representable as a double in BOTH engines, so frac = h / 2^52 is
# bit-identical (no rounding step to disagree on).
_KMV_HEX = 13
_KMV_DENOM = float(1 << (4 * _KMV_HEX))


@register(
    "agg_distinct_kmv",
    oracle=f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
        SELECT event_type,
               md5(CAST(user_id AS VARCHAR)) AS h_full,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, {_KMV_HEX}))::BIGINT
                   AS h_int
        FROM du
    ),
    ranked AS (
        SELECT event_type, h_int,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h_full) AS rn
        FROM h
    ),
    sk AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               MAX(CASE WHEN rn = {_KMV_K} THEN h_int END) AS kth
        FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY event_type
    )
    SELECT s.event_type, e.n_exact,
           CASE WHEN s.n_kept < {_KMV_K} THEN CAST(s.n_kept AS DOUBLE)
                ELSE CAST({_KMV_K - 1} AS DOUBLE)
                     / (CAST(s.kth AS DOUBLE) / {_KMV_DENOM!r})
           END AS kmv_est
    FROM sk s JOIN exact e ON e.event_type = s.event_type
    """,
)
def agg_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event_type:
    keep the k=64 smallest md5 hashes of the key; if the sketch is full,
    estimate D ≈ (k-1)/frac(k-th smallest hash), else the sketch IS the
    exact distinct set. Exact COUNT(DISTINCT) is computed alongside so
    the row itself documents the estimator's error.

    Scale: the k-smallest selection here runs as distinct + per-group
    rank — one shuffle of DISTINCT keys (already far smaller than the
    event stream). The true 100 TB form keeps the selection
    partial-aggregatable (a fixed k-slot buffer merged map-side, as a
    UDAF or `sort_array(collect_list)[0:k]` per partition); the
    estimator math — the part being differentially verified — is
    identical either way. Ordering by the FULL 32-char hash makes
    row_number deterministic; only the first 13 chars feed the fraction
    (exact-double guarantee, see _KMV_HEX)."""
    du = t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        F.md5(F.col("user_id").cast("string").cast("binary")).alias("h_full"),
    ).withColumn(
        "h_int",
        F.conv(F.substring("h_full", 1, _KMV_HEX), 16, 10).cast("long"),
    )
    w = Window.partitionBy("event_type").orderBy("h_full")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("h_int"))).alias("kth"),
        )
    )
    exact = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    est = F.when(
        F.col("n_kept") < _KMV_K, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) / (F.col("kth").cast("double") / F.lit(_KMV_DENOM))
    )
    return (
        sk.join(exact, "event_type")
        .select("event_type", "n_exact", est.alias("kmv_est"))
    )


_CMS_D = 4  # hash rows
# substr(md5, 1, 2) -> 256 buckets per row; width w=256 bounds the
# overestimate at 2N/w with probability 1 - 2^-4.
_CMS_TOPK = 20


def _cms_bucket_sql(seed: int, word: str) -> str:
    return f"substr(md5('{seed}:' || {word}), 1, 2)"


@register(
    "agg_heavy_hitters_cms",
    oracle=f"""
    WITH words AS (
        SELECT u.w AS word
        FROM (SELECT string_split(text, ' ') AS ws FROM documents),
             LATERAL unnest(ws) AS u(w)
    ),
    sketch AS (
        {" UNION ALL ".join(
            f"SELECT {d} AS seed, {_cms_bucket_sql(d, 'word')} AS bucket, "
            f"CAST(COUNT(*) AS BIGINT) AS cnt FROM words GROUP BY 2"
            for d in range(_CMS_D)
        )}
    ),
    vocab AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM words GROUP BY word
    ),
    probe AS (
        {" UNION ALL ".join(
            f"SELECT word, n_exact, {d} AS seed, "
            f"{_cms_bucket_sql(d, 'word')} AS bucket FROM vocab"
            for d in range(_CMS_D)
        )}
    ),
    est AS (
        SELECT p.word, p.n_exact, MIN(s.cnt) AS cms_est
        FROM probe p
        JOIN sketch s ON s.seed = p.seed AND s.bucket = p.bucket
        GROUP BY p.word, p.n_exact
    )
    SELECT word, n_exact, cms_est, cms_est - n_exact AS overcount
    FROM est
    ORDER BY cms_est DESC, word
    LIMIT {_CMS_TOPK}
    """,
)
def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the corpus vocabulary: d=4
    md5-seeded hash rows × 256 buckets hold exact bucket counts; a
    word's frequency estimate is the MIN of its d bucket counts (always
    ≥ truth). Top-20 by estimate, exact count alongside so each row
    shows its own overcount.

    Scale: the sketch is 1024 rows REGARDLESS of corpus size — built
    with one map-side-combined shuffle over words, then broadcast to
    score candidates (the join below hash-broadcasts the sketch; the
    candidate side streams). At 100 TB the vocab side would itself be
    sketched (count-min answers point queries without materializing the
    vocabulary); here the exact vocab is kept to make the estimator
    differentially checkable. orderBy+limit compiles to
    TakeOrderedAndProject — no global sort, no unpartitioned window."""
    docs = t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    seeded = words.selectExpr(
        f"stack({_CMS_D}, "
        + ", ".join(
            f"{d}, substring(md5(cast(concat('{d}:', word) as binary)), 1, 2)"
            for d in range(_CMS_D)
        )
        + ") AS (seed, bucket)"
    )
    sketch = seeded.groupBy("seed", "bucket").agg(F.count("*").alias("cnt"))
    vocab = words.groupBy("word").agg(F.count("*").alias("n_exact"))
    probe = vocab.selectExpr(
        "word",
        "n_exact",
        f"stack({_CMS_D}, "
        + ", ".join(
            f"{d}, substring(md5(cast(concat('{d}:', word) as binary)), 1, 2)"
            for d in range(_CMS_D)
        )
        + ") AS (seed, bucket)",
    )
    est = (
        probe.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("word", "n_exact")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select(
            "word",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.desc("cms_est"), "word")
        .limit(_CMS_TOPK)
    )


_HLL_M = 256  # 2^8 registers; bucket key = first 2 md5 hex chars
# alpha_256 * m^2 (Flajolet et al. 2007 bias constant), computed once in
# Python and inlined as the SAME double literal in both engines.
_HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M
_HLL_W = 52  # register-value bits: 13 hex chars after the bucket byte
_HLL_SCALE = float(1 << (_HLL_W + 1))  # 2^53: exact-integer term scaling


@register(
    "agg_distinct_hll",
    oracle=f"""
    WITH h AS (
        SELECT event_type,
               substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 13))::BIGINT AS v
        FROM events
    ),
    reg AS (
        SELECT event_type, bucket,
               MAX(CASE WHEN v = 0 THEN {_HLL_W + 1}
                        ELSE {_HLL_W + 1} - len(bin(v)) END) AS m_j
        FROM h GROUP BY event_type, bucket
    ),
    sk AS (
        SELECT event_type,
               CAST(SUM(1::BIGINT << ({_HLL_W + 1} - m_j)) AS BIGINT) AS s_present,
               CAST(COUNT(*) AS BIGINT) AS n_present
        FROM reg GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY event_type
    )
    SELECT s.event_type, e.n_exact,
           CAST({_HLL_ALPHA_M2!r} AS DOUBLE)
             * ({_HLL_SCALE!r} / CAST(s.s_present
                  + ({_HLL_M} - s.n_present) * CAST({_HLL_SCALE!r} AS BIGINT)
                  AS DOUBLE)) AS hll_est,
           {_HLL_M} - s.n_present AS n_zero_registers
    FROM sk s JOIN exact e ON e.event_type = s.event_type
    """,
)
def agg_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct count per event_type, built from md5 so the
    sketch — registers, harmonic sum, AND estimate — is bit-identical in
    both engines (Spark's approx_count_distinct uses engine-private
    seeds and can only ever be range-checked). Register index = first
    hash byte (m=256); register value = leading-zero rank of the next
    52 bits via bin()-length (no floating point anywhere in the
    sketch). The harmonic-mean denominator sums EXACT integers — each
    2^-M_j term scaled by 2^53 — so no order-dependent double
    accumulation exists; absent registers contribute the scaled 2^0
    term. Raw estimator only (|error| ~ 1.04/sqrt(256) ≈ 6.5%); the
    small-range linear-counting correction needs ln(), whose last-ulp
    behavior differs across libm builds, so it is deliberately not part
    of the checked surface — n_zero_registers is emitted for it.

    Scale: THE production cardinality path — max-per-register is fully
    partial-aggregatable (map-side combine to ≤256 rows per group per
    partition), the shuffle carries m rows per group regardless of
    input size, and no distinct pass is needed (duplicates can't move a
    max). Contrast agg_distinct_kmv, which must rank distinct hashes."""
    ev = t(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.md5(F.col("user_id").cast("string").cast("binary")).alias("hh"),
    ).select(
        "event_type",
        F.substring("hh", 1, 2).alias("bucket"),
        F.conv(F.substring("hh", 3, 13), 16, 10).cast("long").alias("v"),
    )
    rho = F.when(F.col("v") == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin("v"))
    )
    reg = h.groupBy("event_type", "bucket").agg(F.max(rho).alias("m_j"))
    sk = reg.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - m_j)"))
        .cast("long")
        .alias("s_present"),
        F.count("*").alias("n_present"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    s_total = F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(
        int(_HLL_SCALE)
    )
    return sk.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.lit(_HLL_ALPHA_M2).cast("double")
            * (F.lit(_HLL_SCALE) / s_total.cast("double"))
        ).alias("hll_est"),
        (F.lit(_HLL_M) - F.col("n_present")).alias("n_zero_registers"),
    )


@register(
    "agg_rolling_distinct_hll",
    oracle=f"""
    WITH h AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num,
               substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 13))::BIGINT AS v
        FROM events
    ),
    daily AS (
        SELECT day_num, bucket,
               MAX(CASE WHEN v = 0 THEN {_HLL_W + 1}
                        ELSE {_HLL_W + 1} - len(bin(v)) END) AS m_j
        FROM h GROUP BY day_num, bucket
    ),
    contrib AS (
        SELECT u.d AS day_num, bucket, m_j
        FROM daily,
             LATERAL unnest(generate_series(day_num, day_num + 6)) AS u(d)
    ),
    merged AS (
        SELECT day_num, bucket, MAX(m_j) AS m_j
        FROM contrib GROUP BY day_num, bucket
    ),
    sk AS (
        SELECT day_num,
               CAST(SUM(1::BIGINT << ({_HLL_W + 1} - m_j)) AS BIGINT)
                   AS s_present,
               CAST(COUNT(*) AS BIGINT) AS n_present
        FROM merged GROUP BY day_num
    )
    SELECT day_num,
           CAST({_HLL_ALPHA_M2!r} AS DOUBLE)
             * ({_HLL_SCALE!r} / CAST(s_present
                  + ({_HLL_M} - n_present) * CAST({_HLL_SCALE!r} AS BIGINT)
                  AS DOUBLE)) AS rolling_7d_users_est,
           n_present
    FROM sk
    """,
)
def agg_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day — the sliding-window
    cardinality that is EXACTLY the query sketches exist for: exact
    windowed COUNT(DISTINCT) must either re-scan 7 days per day or
    keep per-day user sets; HLL registers merge by MAX (the law pinned
    in test_sketches.py), so each day's registers are built once and
    CONTRIBUTED FORWARD to the 7 windows they fall in (explode of a
    7-element sequence — pure equi shuffles on (day, bucket), no
    densified grid, no range self-join). Trailing 6 phantom days past
    the last event day carry partial windows — rolling-edge semantics,
    identical on both engines and therefore still hash-checked.

    Scale: register rows are |days|·m regardless of user count; the
    fan-out is ×7 on those register rows, NOT on events. The same
    shape computes any sliding horizon by changing the sequence
    length; for month-over-hour grids it is the only affordable exact-
    sketch path."""
    ev = t(spark, sf_dir, "events")
    h = ev.select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "day_num"
        ),
        F.md5(F.col("user_id").cast("string").cast("binary")).alias("hh"),
    ).select(
        "day_num",
        F.substring("hh", 1, 2).alias("bucket"),
        F.conv(F.substring("hh", 3, 13), 16, 10).cast("long").alias("v"),
    )
    rho = F.when(F.col("v") == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin("v"))
    )
    daily = h.groupBy("day_num", "bucket").agg(F.max(rho).alias("m_j"))
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day_num"), F.col("day_num") + 6)
        ).alias("day_num"),
        "bucket",
        "m_j",
    )
    merged = contrib.groupBy("day_num", "bucket").agg(F.max("m_j").alias("m_j"))
    sk = merged.groupBy("day_num").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - m_j)"))
        .cast("long")
        .alias("s_present"),
        F.count("*").alias("n_present"),
    )
    s_total = F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(
        int(_HLL_SCALE)
    )
    return sk.select(
        "day_num",
        (
            F.lit(_HLL_ALPHA_M2).cast("double")
            * (F.lit(_HLL_SCALE) / s_total.cast("double"))
        ).alias("rolling_7d_users_est"),
        "n_present",
    )


_QS_W = 8.0  # bucket width: the sketch's absolute error bound on values


@register(
    "agg_quantile_sketch",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               CAST(FLOOR(value / {_QS_W}) AS BIGINT) AS bkt,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, bkt, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bkt
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM b
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN bkt END) * {_QS_W}
               AS p50_est,
           MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN bkt END) * {_QS_W}
               AS p90_est,
           MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN bkt END) * {_QS_W}
               AS p99_est
    FROM c GROUP BY event_type
    """,
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch — the fourth classic sketch family
    next to HLL/KMV (cardinality), CMS (frequency), and the bloom
    semi-join (membership): per-group equi-width bucket counts with
    quantiles read off the cumulative distribution. The sketch state is
    just (bucket, count) pairs, so it merges by ADDITION — partial-agg
    friendly, shard/window composable, and its absolute error is the
    bucket width W={_QS_W} by construction (the t-digest/KLL trade more
    code for adaptive error; the fixed grid keeps both engines
    bit-identical, which engine-private sketch seeds never are).

    Scale design: one partial-agg shuffle on (group, bucket) — state
    per group is range/W buckets regardless of row count; the
    cumulative pass is a window over those few bucket rows, never over
    raw data. Exactly the shape a 100 TB percentile dashboard
    pre-aggregates into minute/shard sketches and merges at read time.
    agg_percentiles_exact is the exact-rank counterpart when a full
    shuffle of the column is affordable."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(_QS_W)).cast("bigint").alias("bkt"),
    ).agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    c = counts.select(
        "event_type",
        "bkt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )

    def q_est(q: float):
        return (
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bkt"))
            )
            * _QS_W
        )

    return c.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        q_est(0.5).alias("p50_est"),
        q_est(0.9).alias("p90_est"),
        q_est(0.99).alias("p99_est"),
    )


@register(
    "agg_rolling_quantile_sketch",
    oracle=f"""
    WITH b AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num,
               CAST(FLOOR(value / {_QS_W}) AS BIGINT) AS bkt,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    contrib AS (
        SELECT u.d AS day_num, bkt, cnt
        FROM b, LATERAL unnest(generate_series(day_num, day_num + 6)) AS u(d)
    ),
    merged AS (
        SELECT day_num, bkt, CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM contrib GROUP BY day_num, bkt
    ),
    c AS (
        SELECT day_num, bkt, cnt,
               SUM(cnt) OVER (PARTITION BY day_num ORDER BY bkt
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY day_num) AS n
        FROM merged
    )
    SELECT day_num,
           CAST(MAX(n) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN bkt END) * {_QS_W}
               AS p50_est,
           MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN bkt END) * {_QS_W}
               AS p90_est
    FROM c GROUP BY day_num
    """,
)
def agg_rolling_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day p50/p90 of event value per day — the sliding-
    window quantile that pairs with agg_rolling_distinct_hll: exact
    windowed percentiles would re-shuffle 7 days of raw values per
    day, while the additive bucket sketch (agg_quantile_sketch's
    state) is built once per day and CONTRIBUTED FORWARD to the 7
    windows it falls in, then merged by SUM — the addition-merge law
    pinned in test_sketches.py, which is precisely what makes this
    affordable. Trailing 6 phantom days carry partial windows
    (rolling-edge semantics, identical on both engines).

    Scale: daily sketch rows are |days|×(range/W) regardless of event
    count; the ×7 fan-out and all later passes run on those sketch
    rows, never on events."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "day_num"
        ),
        F.floor(F.col("value") / F.lit(_QS_W)).cast("bigint").alias("bkt"),
    ).agg(F.count("*").alias("cnt"))
    contrib = daily.select(
        F.explode(F.sequence(F.col("day_num"), F.col("day_num") + 6)).alias(
            "day_num"
        ),
        "bkt",
        "cnt",
    )
    merged = contrib.groupBy("day_num", "bkt").agg(F.sum("cnt").alias("cnt"))
    w_cum = (
        Window.partitionBy("day_num")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("day_num")
    c = merged.select(
        "day_num",
        "bkt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )

    def q_est(q: float):
        return (
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bkt"))
            )
            * _QS_W
        )

    return c.groupBy("day_num").agg(
        F.max("n").cast("bigint").alias("n"),
        q_est(0.5).alias("p50_est"),
        q_est(0.9).alias("p90_est"),
    )


_PROFILE_HLL_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
)


@register(
    "profile_table_hll",
    oracle=f"""
    WITH melted AS (
        {" UNION ALL ".join(
            f"SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS val "
            f"FROM orders WHERE {c} IS NOT NULL"
            for c in _PROFILE_HLL_COLS
        )}
    ),
    h AS (
        SELECT column_name,
               substr(md5(val), 1, 2) AS bucket,
               ('0x' || substr(md5(val), 3, 13))::BIGINT AS v,
               val
        FROM melted
    ),
    reg AS (
        SELECT column_name, bucket,
               MAX(CASE WHEN v = 0 THEN {_HLL_W + 1}
                        ELSE {_HLL_W + 1} - len(bin(v)) END) AS m_j
        FROM h GROUP BY column_name, bucket
    ),
    sk AS (
        SELECT column_name,
               CAST(SUM(1::BIGINT << ({_HLL_W + 1} - m_j)) AS BIGINT)
                   AS s_present,
               CAST(COUNT(*) AS BIGINT) AS n_present
        FROM reg GROUP BY column_name
    ),
    nn AS (
        SELECT column_name, CAST(COUNT(*) AS BIGINT) AS n_nonnull
        FROM melted GROUP BY column_name
    )
    SELECT sk.column_name,
           nn.n_nonnull,
           CAST({_HLL_ALPHA_M2!r} AS DOUBLE)
             * ({_HLL_SCALE!r} / CAST(s_present
                  + ({_HLL_M} - n_present) * CAST({_HLL_SCALE!r} AS BIGINT)
                  AS DOUBLE)) AS ndv_est
    FROM sk JOIN nn ON nn.column_name = sk.column_name
    """,
)
def profile_table_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style statistics collection, the 100 TB path
    profile_table's docstring promises: per-column NDV estimated from
    the deterministic HLL registers (agg_distinct_hll's sketch) in ONE
    scan with CONSTANT per-column state — exact COUNT(DISTINCT) per
    column expands the scan and shuffles every distinct value, which is
    exactly what a CBO stats pass over a 100 TB table cannot afford.
    The melt (stack) expands the scan |columns| ways, but the state
    after the partial agg is |columns|×m registers, independent of row
    count; the estimates feed join-ordering and broadcast decisions.

    The sketch is md5-derived and integer-scaled, so even the
    ESTIMATES hash-match DuckDB — the engine's differential-checkable-
    approximation contract."""
    o = t(spark, sf_dir, "orders")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_HLL_COLS
    )
    melted = o.selectExpr(
        f"stack({len(_PROFILE_HLL_COLS)}, {stack_args})"
        " AS (column_name, val)"
    ).filter(F.col("val").isNotNull())
    h = melted.select(
        "column_name",
        F.md5(F.col("val").cast("binary")).alias("hh"),
    ).select(
        "column_name",
        F.substring("hh", 1, 2).alias("bucket"),
        F.conv(F.substring("hh", 3, 13), 16, 10).cast("long").alias("v"),
    )
    rho = F.when(F.col("v") == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin("v"))
    )
    reg = h.groupBy("column_name", "bucket").agg(F.max(rho).alias("m_j"))
    sk = reg.groupBy("column_name").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - m_j)"))
        .cast("long")
        .alias("s_present"),
        F.count("*").alias("n_present"),
    )
    nn = melted.groupBy("column_name").agg(
        F.count("*").cast("long").alias("n_nonnull")
    )
    s_total = F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(
        int(_HLL_SCALE)
    )
    return sk.join(nn, "column_name").select(
        "column_name",
        "n_nonnull",
        (
            F.lit(_HLL_ALPHA_M2).cast("double")
            * (F.lit(_HLL_SCALE) / s_total.cast("double"))
        ).alias("ndv_est"),
    )


@register(
    "join_size_estimate_kmv",
    oracle=f"""
    WITH ka AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    kb AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    ku AS (SELECT k FROM ka UNION SELECT k FROM kb),
    hu AS (
        SELECT k, md5(CAST(k AS VARCHAR)) AS h_full,
               ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, {_KMV_HEX}))::BIGINT
                   AS h_int
        FROM ku
    ),
    ranked AS (
        SELECT k, h_int, ROW_NUMBER() OVER (ORDER BY h_full) AS rn FROM hu
    ),
    sketch AS (SELECT k, h_int, rn FROM ranked WHERE rn <= {_KMV_K}),
    member AS (
        SELECT s.rn, s.h_int,
               CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                    THEN 1 ELSE 0 END AS in_both
        FROM sketch s
        LEFT JOIN ka a ON a.k = s.k
        LEFT JOIN kb b ON b.k = s.k
    ),
    est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
               MAX(CASE WHEN rn = {_KMV_K} THEN h_int END) AS kth,
               CAST(SUM(in_both) AS BIGINT) AS n_both
        FROM member
    ),
    exact AS (
        SELECT CAST((SELECT COUNT(*) FROM ka) AS BIGINT) AS ndv_a,
               CAST((SELECT COUNT(*) FROM kb) AS BIGINT) AS ndv_b,
               CAST((SELECT COUNT(*) FROM ka JOIN kb ON kb.k = ka.k)
                    AS BIGINT) AS exact_intersect,
               CAST((SELECT COUNT(*)
                     FROM orders o JOIN lineitem l
                       ON l.l_orderkey = o.o_orderkey) AS BIGINT)
                   AS exact_join_rows
    )
    SELECT {_KMV_K} AS k,
           e.n_both,
           CASE WHEN e.n_kept < {_KMV_K} THEN CAST(e.n_kept AS DOUBLE)
                ELSE CAST({_KMV_K - 1} AS DOUBLE)
                     / (CAST(e.kth AS DOUBLE) / {_KMV_DENOM!r})
           END * (CAST(e.n_both AS DOUBLE) / {_KMV_K})
               AS intersect_est,
           x.exact_intersect,
           x.exact_join_rows
    FROM est e CROSS JOIN exact x
    """,
)
def join_size_estimate_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE ESTIMATION from KMV sketches — the optimizer-statistics
    use case: before running orders ⋈ lineitem, estimate how many
    distinct keys the sides share from two fixed-size sketches instead
    of scanning either table. Method: the k smallest hashes of the key
    UNION form an unbiased sample of A∪B; the fraction of that sample
    present in BOTH sides estimates the Jaccard, and (k−1)/frac(k-th)
    estimates |A∪B| — their product is |A∩B|. The exact intersection
    and exact join cardinality are computed alongside (affordable at
    gate scale) so the row documents the estimator's own error, the
    same self-receipt contract as agg_distinct_kmv.

    Scale: each side's sketch is k hashes built from one pass over
    DISTINCT keys (mergeable map-side); the estimate itself touches 2k
    rows. This is how a planner decides broadcast-vs-shuffle or
    prunes a join order without reading 100 TB twice."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    ).distinct()
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    ).distinct()
    ku = o.unionAll(li).distinct()
    hu = ku.select(
        "k",
        F.md5(F.col("k").cast("string").cast("binary")).alias("h_full"),
    ).select(
        "k",
        "h_full",
        F.conv(F.substring("h_full", 1, _KMV_HEX), 16, 10)
        .cast("long")
        .alias("h_int"),
    )
    # k-smallest via orderBy+limit (TakeOrderedAndProject — distributed
    # top-k, NOT a global-sort window); the rank needed by the estimator
    # is then computed over the ≤k surviving rows, the post-tight-limit
    # pattern test_plans.py allows
    topk = hu.orderBy("h_full").limit(_KMV_K)
    w = Window.orderBy("h_full")
    sketch = topk.withColumn("rn", F.row_number().over(w))
    member = (
        sketch.join(o.withColumnRenamed("k", "ka"), F.col("ka") == F.col("k"), "left")
        .join(li.withColumnRenamed("k", "kb"), F.col("kb") == F.col("k"), "left")
        .select(
            "rn",
            "h_int",
            (
                F.col("ka").isNotNull() & F.col("kb").isNotNull()
            ).cast("int").alias("in_both"),
        )
    )
    est = member.agg(
        F.count("*").alias("n_kept"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h_int"))).alias("kth"),
        F.sum("in_both").cast("long").alias("n_both"),
    )
    exact_intersect = o.join(li, "k").count()
    exact_join = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    union_est = F.when(
        F.col("n_kept") < _KMV_K, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) / (F.col("kth").cast("double") / F.lit(_KMV_DENOM))
    )
    return est.select(
        F.lit(_KMV_K).alias("k"),
        "n_both",
        (union_est * (F.col("n_both").cast("double") / F.lit(_KMV_K))).alias(
            "intersect_est"
        ),
        F.lit(exact_intersect).cast("bigint").alias("exact_intersect"),
        F.lit(exact_join).cast("bigint").alias("exact_join_rows"),
    )
