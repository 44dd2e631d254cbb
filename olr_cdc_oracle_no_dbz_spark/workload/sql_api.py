"""SQL-entry-point queries (SURVEY.md §3.3: ``spark.sql`` IS the
engine's main API, playing ksqlDB's SQL-over-REST role).

These run through ``register_views`` + ``spark.sql`` with the SAME SQL
text DuckDB executes — proving the engine's SQL dialect surface, and
exercising Catalyst rewrites the DataFrame queries don't reach:
correlated-subquery decorrelation and CTE handling (SURVEY.md §4 lists
decorrelation as built-in; this is its coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from olr_cdc_oracle_no_dbz_spark.catalog import register_views
from olr_cdc_oracle_no_dbz_spark.workload import register

#: shared SQL text — identical on both engines (ANSI subset)
_CORRELATED_SQL = """
WITH per_customer AS (
    SELECT c.c_custkey, c.c_nationkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_nationkey
)
SELECT p.c_custkey, p.n_orders
FROM per_customer p
WHERE p.n_orders > 2 * (
    SELECT AVG(q.n_orders)
    FROM per_customer q
    WHERE q.c_nationkey = p.c_nationkey
)
"""

_EXISTS_SQL = """
SELECT n.n_name, COUNT(*) AS n_suppliers
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE EXISTS (
    SELECT 1 FROM customer c
    WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9000
)
GROUP BY n.n_name
"""


@register("sql_correlated_subquery", oracle=_CORRELATED_SQL)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL API: customers with
    more than 2x their nation's average order count. Catalyst
    decorrelates the inner AVG into a join-aggregate (no per-row
    re-execution); the comparison divides identical integers on both
    engines, so the predicate is deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(_CORRELATED_SQL)


@register("sql_exists_subquery", oracle=_EXISTS_SQL)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL API — decorrelated to a
    left-semi join (the same physical shape as workload/joins.py's
    explicit left_semi, reached from SQL instead)."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)
