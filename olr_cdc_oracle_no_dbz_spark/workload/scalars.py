"""Scalar-function surface (SURVEY.md §2.7) — the ksqlDB 0.29 scalar
catalog re-expressed as built-in ``pyspark.sql.functions``.

The reference ships no queries, but the ksqlDB engine it deploys
(docker-compose-main.yml:112-141) defines the standard families: string,
date/time, math, JSON, array/map, casts. One registered query per family,
each differentially checked against DuckDB.

Determinism rules (cross-engine hash equality):
- math is restricted to exactly-defined ops: IEEE +-*/, sqrt (correctly
  rounded), abs/ceil/floor/sign, decimal round (HALF_UP both engines —
  verified: round(185.25::dec,1)=185.3 in both). exp/ln/pow are libm
  calls with engine-specific last-ulp behavior, so they stay out of
  oracle-checked queries (covered in unit tests with tolerance instead).
- Spark ``dayofweek`` is 1=Sunday; DuckDB is 0=Sunday — the query emits
  the 0-based convention.

Everything here is JVM-side whole-stage-codegen (zero Python UDFs), so
at 100 TB these are pure map operators: no shuffle, filter/projection
pushed to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import spread_scan, t


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                          AS name_upper,
           lower(p_brand)                         AS brand_lower,
           substring(p_name, 1, 8)                AS name_prefix,
           length(p_name)                         AS name_len,
           instr(p_name, 'a')                     AS first_a,
           lpad(p_brand, 12, '*')                 AS brand_lpad,
           rpad(p_brand, 12, '.')                 AS brand_rpad,
           replace(p_type, ' ', '_')              AS type_snake,
           regexp_extract(p_type, '^(\\w+)', 1)   AS type_first_word,
           trim(concat('  ', p_name, '  '))       AS name_trimmed,
           (p_name LIKE '%al%')                   AS has_al
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: UCASE/LCASE/SUBSTRING/LEN/INSTR/LPAD/RPAD/REPLACE/
    REGEXP_EXTRACT/TRIM/LIKE (ksqlDB surface, SURVEY.md §2.7)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.expr("replace(p_type, ' ', '_')").alias("type_snake"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.col("p_name").like("%al%").alias("has_al"),
    )


@register(
    "scalar_datetime",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S')          AS ts_str,
           year(ts)                                   AS y,
           month(ts)                                  AS mo,
           day(ts)                                    AS d,
           hour(ts)                                   AS h,
           dayofweek(ts)                              AS dow,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ts_hour,
           strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S')    AS ts_plus_7d,
           epoch_us(ts)                               AS epoch_micros,
           CAST(CAST(ts AS DATE) AS VARCHAR)          AS ts_date
    FROM events
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: TIMESTAMPTOSTRING/FORMAT_DATE/extract fields/
    DATEADD/date_trunc/epoch (SURVEY.md §2.7). Emits the 0=Sunday dow
    convention (Spark's dayofweek is 1-based)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "ts_hour"
        ),
        F.date_format(
            F.col("ts") + F.expr("INTERVAL 7 DAYS"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_plus_7d"),
        F.unix_micros("ts").alias("epoch_micros"),
        F.to_date("ts").cast("string").alias("ts_date"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT event_id,
           abs(value - 100)                             AS abs_dev,
           CAST(ceil(value) AS BIGINT)                  AS v_ceil,
           CAST(floor(value) AS BIGINT)                 AS v_floor,
           CAST(sign(value - 100) AS INTEGER)           AS v_sign,
           round(CAST(value AS DECIMAL(12,2)), 1)       AS v_round1,
           sqrt(value)                                  AS v_sqrt,
           value * value                                AS v_squared,
           event_id % 7                                 AS id_mod7,
           greatest(value, 100.0)                       AS v_hi,
           least(value, 100.0)                          AS v_lo
    FROM events
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: ABS/CEIL/FLOOR/SIGN/ROUND/SQRT/modulo/GREATEST/LEAST
    (SURVEY.md §2.7). Restricted to exactly-defined IEEE ops so results
    are bit-identical across engines; exp/ln/pow live in unit tests."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.abs(v - 100).alias("abs_dev"),
        F.ceil(v).cast("long").alias("v_ceil"),
        F.floor(v).cast("long").alias("v_floor"),
        F.signum(v - 100).cast("int").alias("v_sign"),
        F.round(v.cast("decimal(12,2)"), 1).alias("v_round1"),
        F.sqrt(v).alias("v_sqrt"),
        (v * v).alias("v_squared"),
        (F.col("event_id") % 7).alias("id_mod7"),
        F.greatest(v, F.lit(100.0)).alias("v_hi"),
        F.least(v, F.lit(100.0)).alias("v_lo"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER)          AS k_int,
           json_extract_string(props, '$.k')       AS k_str,
           (props->>'$.k') IS NOT NULL             AS has_k,
           array_to_string(json_keys(props), ',')  AS prop_keys,
           CAST(props->>'$.k' AS INTEGER) * 2      AS k_doubled
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: EXTRACTJSONFIELD/IS_JSON/keys via ``get_json_object``
    + ``from_json`` to a map (SURVEY.md §2.7; reference serde P6 uses the
    same from_json path, docker-compose-main.yml:161-163)."""
    # spread_scan (r11): two JSON parses per row over a one-partition
    # scan otherwise serialize in a single task
    ev = spread_scan(t(spark, sf_dir, "events"))
    k = F.get_json_object("props", "$.k")
    props_map = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        k.cast("int").alias("k_int"),
        k.alias("k_str"),
        k.isNotNull().alias("has_k"),
        F.concat_ws(",", F.map_keys(props_map)).alias("prop_keys"),
        (k.cast("int") * 2).alias("k_doubled"),
    )


@register(
    "scalar_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                         AS n_words,
           string_split(text, ' ')[1]                           AS first_word,
           string_split(text, ' ')[len(string_split(text, ' '))] AS last_word,
           list_contains(string_split(text, ' '), 'spark')      AS has_spark,
           len(list_distinct(string_split(text, ' ')))          AS n_distinct,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
                                                                AS head5_sorted
    FROM documents
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: SPLIT/ARRAY_LENGTH/ELT/ARRAY_CONTAINS/distinct/sort/
    slice (SURVEY.md §2.7) over the documents table."""
    d = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.concat_ws(",", F.slice(F.sort_array(F.array_distinct(words)), 1, 5)).alias(
            "head5_sorted"
        ),
    )


@register(
    "scalar_casts",
    oracle="""
    SELECT c_custkey,
           -- VARCHAR render: the driver hashes through fetchdf(), which
           -- coerces DECIMAL to float64 ('-107.3' vs Spark's '-107.30');
           -- the fixed-2-digit string is identical on both engines
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_dec,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_str,
           CAST(c_custkey AS VARCHAR)                       AS key_str,
           CAST(CAST(c_custkey AS VARCHAR) AS BIGINT)       AS key_roundtrip,
           CAST(trunc(c_acctbal) AS BIGINT)                 AS bal_long,
           (c_acctbal > 0)                                  AS in_credit
    FROM customer
    """,
)
def scalar_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family — the Oracle NUMBER/VARCHAR2/DATE mapping of SURVEY.md
    §1.2 exercised as explicit casts (decode layer P5 analog).

    Semantics note: Spark's double→long cast truncates toward zero while
    DuckDB's rounds, so the oracle truncates explicitly (``trunc``) to
    pin one behavior on both sides.
    """
    c = t(spark, sf_dir, "customer")
    bal_dec = F.col("c_acctbal").cast("decimal(12,2)")
    return c.select(
        "c_custkey",
        bal_dec.cast("string").alias("bal_dec"),
        bal_dec.cast("string").alias("bal_str"),
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_custkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("c_acctbal").cast("long").alias("bal_long"),
        (F.col("c_acctbal") > 0).alias("in_credit"),
    )


@register(
    "scalar_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS name_masked,
           concat(substr(c_name, 1, 4),
                  regexp_replace(regexp_replace(regexp_replace(
                      substr(c_name, 5), '[A-Z]', 'X', 'g'),
                      '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'))
               AS name_keep_left4,
           concat(regexp_replace(regexp_replace(regexp_replace(
                      substr(c_name, 1, greatest(len(c_name) - 4, 0)),
                      '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'),
                  substr(c_name, greatest(len(c_name) - 3, 1)))
               AS name_keep_right4
    FROM customer
    """,
)
def scalar_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking family (ksqlDB MASK / MASK_KEEP_LEFT /
    MASK_KEEP_RIGHT, SURVEY.md §2.7 string surface): uppercase → X,
    lowercase → x, digits → n, punctuation kept — ksqlDB's documented
    masking alphabet. Pure regexp_replace chains, codegen'd,
    zero-shuffle."""
    c = t(spark, sf_dir, "customer")

    def mask(col):
        return F.regexp_replace(
            F.regexp_replace(F.regexp_replace(col, "[A-Z]", "X"), "[a-z]", "x"),
            "[0-9]",
            "n",
        )

    name_len = F.length("c_name")
    return c.select(
        "c_custkey",
        mask(F.col("c_name")).alias("name_masked"),
        F.concat(
            F.substring("c_name", 1, 4), mask(F.expr("substr(c_name, 5)"))
        ).alias("name_keep_left4"),
        F.concat(
            mask(F.expr("substr(c_name, 1, greatest(length(c_name) - 4, 0))")),
            F.expr("substr(c_name, greatest(length(c_name) - 3, 1))"),
        ).alias("name_keep_right4"),
    )


@register(
    "scalar_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255                                   AS low_byte,
           event_id >> 8                                    AS high_bits,
           (event_id << 3) & 1048575                        AS shifted,
           xor(event_id, user_id)                           AS id_xor,
           event_id | 4096                                  AS with_flag,
           CAST(bit_count(event_id) AS INTEGER)             AS popcount,
           CAST((event_id >> 5) & 1 AS INTEGER)             AS bit5,
           ~event_id                                        AS id_not
    FROM events
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (§2.7 completion): AND/OR/XOR/NOT, shifts,
    popcount, single-bit probe — the primitives behind flag words,
    bitmap indexes, bloom membership (join_bloom_prune), simhash
    signatures and the z-order key (layout.zvalue), here pinned as an
    oracle-checked surface of their own. Pure codegen projection, zero
    shuffles, and 64-bit two's-complement semantics agree between the
    JVM and DuckDB for every operator including ~ and sign-propagating
    >>."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftright("event_id", 8).alias("high_bits"),
        F.shiftleft("event_id", 3).bitwiseAND(F.lit(1048575)).alias("shifted"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("id_xor"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.bit_count("event_id").alias("popcount"),
        F.shiftright("event_id", 5)
        .bitwiseAND(F.lit(1))
        .cast("int")
        .alias("bit5"),
        F.bitwise_not(F.col("event_id")).alias("id_not"),
    )


@register(
    "scalar_hash",
    oracle="""
    SELECT doc_id,
           md5(text)                                  AS h_md5,
           sha256(text)                               AS h_sha256,
           substr(md5(text), 1, 8)                    AS h_md5_8,
           md5(concat(lang, ':', CAST(doc_id AS VARCHAR))) AS h_keyed
    FROM documents
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash scalar family — the primitives every
    content-addressing operator in this repo builds on (dedup keys,
    split assignment, sketch seeds, checksums), pinned as a checked
    surface of their own: md5 and sha256 over UTF-8 bytes, prefix
    truncation, and keyed (salted-concat) hashing. Engines agree
    because both hash the raw bytes — the ONLY cross-engine contract
    is the input byte encoding, which cast-to-binary makes explicit.
    xxhash64/crc32 exist Spark-side but have no DuckDB counterpart, so
    they stay outside the checked registry (same policy as ln())."""
    d = t(spark, sf_dir, "documents")
    as_bin = lambda c: F.col(c).cast("binary")  # noqa: E731
    return d.select(
        "doc_id",
        F.md5(as_bin("text")).alias("h_md5"),
        F.sha2(as_bin("text"), 256).alias("h_sha256"),
        F.substring(F.md5(as_bin("text")), 1, 8).alias("h_md5_8"),
        F.md5(
            F.concat(
                F.col("lang"), F.lit(":"), F.col("doc_id").cast("string")
            ).cast("binary")
        ).alias("h_keyed"),
    )


@register(
    "scalar_url",
    oracle="""
    WITH u AS (
        SELECT c_custkey,
               'https://' || lower(replace(c_mktsegment, ' ', '-'))
               || '.example.com/cust/' || CAST(c_custkey AS VARCHAR)
               || '?nation=' || CAST(c_nationkey AS VARCHAR)
               || '&page=' || CAST(c_custkey % 7 AS VARCHAR) AS url
        FROM customer
    )
    SELECT c_custkey, url,
           regexp_extract(url, '^https://([^/]+)/', 1)      AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1)               AS query,
           regexp_extract(url, '[?&]nation=([^&]*)', 1)     AS nation_param,
           regexp_extract(url, '^([a-z]+)://', 1)           AS protocol
    FROM u
    """,
)
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family (ksqlDB URL_EXTRACT_HOST/PATH/QUERY/PARAMETER/
    PROTOCOL — part of the declared 0.29 surface, SURVEY.md §2.7):
    synthesize a well-formed URL per customer, then extract its parts.
    Extraction uses one shared regex vocabulary in BOTH engines (Spark
    ``parse_url`` exists but its edge handling of missing components
    differs from a portable oracle — identical regexps make the
    contract explicit and the hash stable). Pure codegen projection:
    zero shuffles."""
    c = t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit("-"))),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?nation="),
        F.col("c_nationkey").cast("string"),
        F.lit("&page="),
        (F.col("c_custkey") % 7).cast("string"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        "url",
        F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", r"^https://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"\?(.*)$", 1).alias("query"),
        F.regexp_extract("url", r"[?&]nation=([^&]*)", 1).alias("nation_param"),
        F.regexp_extract("url", r"^([a-z]+)://", 1).alias("protocol"),
    )


@register(
    "scalar_geo_distance",
    oracle="""
    WITH pts AS (
        SELECT s_suppkey,
               CAST(s_suppkey % 160 - 80 AS DOUBLE) + 0.25        AS lat1,
               CAST((s_suppkey * 7) % 360 - 180 AS DOUBLE) + 0.5  AS lon1,
               CAST(s_nationkey * 6 - 72 AS DOUBLE)               AS lat2,
               CAST(s_nationkey * 13 - 160 AS DOUBLE)             AS lon2
        FROM supplier
    )
    SELECT s_suppkey,
           CAST(CAST(2 * 6371.0088 * asin(sqrt(
               sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
               + cos(radians(lat1)) * cos(radians(lat2))
                 * sin(radians(lon2 - lon1) / 2)
                 * sin(radians(lon2 - lon1) / 2)
           )) AS DECIMAL(12,3)) AS VARCHAR) AS dist_km
    FROM pts
    """,
)
def scalar_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO_DISTANCE (ksqlDB's haversine, declared 0.29 surface):
    great-circle distance between two deterministic synthetic points
    per supplier, emitted at DECIMAL(12,3) km. sin/cos/asin are libm
    calls whose last-ulp behavior can differ across engines, so the
    result is rounded to millimeter-insensitive precision — a 3-decimal
    boundary flip needs a ~1e-4 km disagreement, ~9 orders of magnitude
    above double trig error (verified at sf0.1's 400 suppliers)."""
    s = t(spark, sf_dir, "supplier")
    lat1 = (F.col("s_suppkey") % 160 - 80).cast("double") + 0.25
    lon1 = ((F.col("s_suppkey") * 7) % 360 - 180).cast("double") + 0.5
    lat2 = (F.col("s_nationkey") * 6 - 72).cast("double")
    lon2 = (F.col("s_nationkey") * 13 - 160).cast("double")
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon) * F.sin(dlon)
    )
    dist = (
        (2 * 6371.0088 * F.asin(F.sqrt(h)))
        .cast("decimal(12,3)")
        .cast("string")
    )
    return s.select("s_suppkey", dist.alias("dist_km"))
