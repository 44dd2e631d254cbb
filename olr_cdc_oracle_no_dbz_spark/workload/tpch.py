"""Star-schema analytics queries (TPC-H-shaped) over the driver testdata.

These exercise the batch query surface the reference delegates to ksqlDB /
the JDBC source (SURVEY.md §2.1 S2/S5, §2.4, §2.5): scan → filter →
project → multi-way join → group-aggregate. All plans are declarative so
Catalyst provides pushdown/pruning; dimension joins are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import davg, dsum, sql_davg, sql_dsum, t


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy group-aggregate (TPC-H Q1 shape). One shuffle, partial
    aggregation map-side; the shipdate filter reaches the parquet scan."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter+aggregate (TPC-H Q6 shape): every predicate reaches
    the parquet scan (PushedFilters), so at 100 TB the scan reads only
    row groups whose min/max statistics overlap — the pushdown-benefit
    showcase query."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT * FROM (
        SELECT o.o_orderkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               row_number() OVER (
                   ORDER BY {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} DESC,
                            o.o_orderkey) AS rk
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate
    ) WHERE rk <= 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective join + top-N (TPC-H Q3 shape). Deterministic top-N via
    row_number with an orderkey tie-break (plain LIMIT is ambiguous under
    revenue ties, which would break differential checks)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        F.broadcast(c)
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
    )
    from pyspark.sql import Window

    # Distributed top-N: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge of 10-row tops), so no partition
    # ever holds more than its own rows — survives 100× scale, unlike a
    # global unpartitioned row_number window. The rank is then recomputed
    # over the surviving 10 rows only (trivially single-partition).
    top = agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "rk",
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT * FROM (
        SELECT c.c_custkey, c.c_name, n.n_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               row_number() OVER (
                   ORDER BY {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}
                            DESC, c.c_custkey) AS rk
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
    ) WHERE rk <= 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue report (TPC-H Q10 shape): selective fact
    filter → star join (both dims broadcast) → group-agg → distributed
    top-20 (orderBy+limit compiles to TakeOrderedAndProject; the
    custkey tie-break keeps the cut deterministic)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.alias("revenue"))
    )
    top = agg.orderBy(F.col("revenue").desc(), "c_custkey").limit(20)
    w = Window.orderBy(F.col("revenue").desc(), "c_custkey")
    return top.withColumn("rk", F.row_number().over(w)).select(
        "c_custkey", "c_name", "n_name", "revenue", "rk"
    )


@register(
    "tpch_q5_local_supplier",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS lineitems
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join (TPC-H Q5 shape). All dimensions broadcast —
    the fact table is never shuffled for the joins, only for the final
    tiny aggregation."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    # orders is fact-sized: leave its join strategy to AQE (it broadcasts
    # at test scale, shuffles on l_orderkey at 100 TB); true dims are
    # explicit broadcasts.
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            F.broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("lineitems"),
    )
