"""Determinism + loading helpers shared by all workload queries.

Float determinism strategy (used by every oracle-checked aggregate):
summing doubles is order-dependent, and Spark's partitioned sums visit
rows in a different order than DuckDB's sequential scan. So aggregates
never sum doubles directly — each addend is cast to an exact DECIMAL
first (a deterministic per-value rounding), summed exactly, and the
result cast back to DOUBLE. Both engines then produce bit-identical
values regardless of row order or partitioning. Averages are computed as
exact-decimal-sum / count in double division (also bit-deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def spread_scan(df: DataFrame) -> DataFrame:
    """CONDITIONALLY restore scan parallelism (r11): the gate-scale
    parquet tables are single row groups, so Spark plans ONE scan
    partition and every map-side stage above it — per-row projections,
    partial aggregates, broadcast-join probes — runs in a single task
    (tpch_q1's eight decimal sums over 600 k rows measured 2.2–2.6 s
    serial vs ~0.8 s spread). The repartition fires ONLY when the
    scan's planned partition count is below the session's default
    parallelism: a cluster-scale scan with ample input splits passes
    through untouched, so this is never a shuffle tax at scale, and
    intentionally zero-shuffle gates (cdc_table_checksum,
    join_bloom_prune) simply don't call it. Distribution-only —
    results and oracles are unchanged; filters and column pruning
    still push through the exchange to the scan."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def dsum(col: Column | str, prec: str = "decimal(28,6)") -> Column:
    """Order-independent (exact) sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(prec)).cast("double")


def davg(col: Column | str, prec: str = "decimal(28,6)") -> Column:
    """Order-independent average: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(prec)).cast("double") / F.count(c)


# DuckDB-side templates mirroring dsum/davg exactly.
def sql_dsum(expr: str, prec: str = "DECIMAL(28,6)") -> str:
    return f"CAST(SUM(CAST(({expr}) AS {prec})) AS DOUBLE)"


def sql_davg(expr: str, prec: str = "DECIMAL(28,6)") -> str:
    return f"(CAST(SUM(CAST(({expr}) AS {prec})) AS DOUBLE) / COUNT({expr}))"
