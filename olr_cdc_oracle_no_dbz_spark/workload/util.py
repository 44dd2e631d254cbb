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
