"""Table catalog over the driver's parquet testdata.

Plays the role the Schema Registry + ksqlDB catalog play in the reference
(docker-compose-main.yml:179-202, 112-141): a single place that resolves a
logical table name to a typed DataFrame. Reads are plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown, column pruning
and partition pruning (verified in tests/test_plans.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_parquet_retrying(
    reader, path: str, attempts: int = 5, delay_s: float = 0.1
):
    """``reader(path)`` with retry-on-missing-path (VERDICT r5 item 8).

    ``scale.compact_small_files`` swaps a table directory via two
    ``os.replace`` calls; between them the live path is absent for
    microseconds. A reader that lands exactly in that window gets
    PATH_NOT_FOUND for a table that exists before and after — so
    missing-path errors here back off briefly and retry instead of
    failing the query. Genuinely absent tables still raise (the final
    attempt re-raises), and non-path errors propagate immediately.
    ``reader`` is any ``path -> DataFrame`` callable, so the wrapper is
    testable without racing a real rename."""
    from pyspark.errors import AnalysisException

    for i in range(attempts):
        try:
            return reader(path)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            if i == attempts - 1:
                raise
            time.sleep(delay_s)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Scale-note: at 100 TB these become
    partitioned/bucketed external tables; the call site stays identical.

    Timestamp normalization — the driver's parquet writer has shipped two
    shapes across rounds, and the catalog absorbs both so every query
    downstream sees plain ``timestamp``:

    * INT64 TIMESTAMP(NANOS) (rounds 1-3, ``events.ts``): Spark's
      vectorized reader rejects NANOS outright (PARQUET_TYPE_ILLEGAL), so
      we read nanos as raw longs (runtime conf, safe for every other
      table — it only affects NANOS columns) and truncate to microsecond
      timestamps with exact integer division, matching DuckDB's own
      ns→µs truncation bit-for-bit.
    * TIMESTAMP(MICROS) with ``isAdjustedToUTC=false`` (round 4+:
      ``events.ts``, ``lineitem.l_shipdate``, ``orders.o_orderdate``):
      Spark 4 infers TIMESTAMP_NTZ, which strict chrono functions
      (``unix_micros`` et al.) refuse. The session timezone is pinned
      UTC (session.py), so casting NTZ→TIMESTAMP is value-identical to
      DuckDB's naive-UTC reading of the same column.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_parquet_retrying(
        spark.read.parquet, os.path.join(sf_dir, f"{name}.parquet")
    )
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


_NUM_ROWS_CACHE: dict[tuple, int] = {}


def _path_stat_key(path: str) -> tuple:
    """Cache key that invalidates when the parquet bytes change
    (ADVICE r14: a path-only key would silently serve a stale count if
    an sf_dir were regenerated in-process at a different cardinality).
    A few os.stat calls — still jobless and microsecond-scale."""
    if os.path.isdir(path):
        sts = [
            os.stat(os.path.join(path, f))
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        return (path, len(sts), sum(s.st_size for s in sts),
                max((s.st_mtime_ns for s in sts), default=0))
    st = os.stat(path)
    return (path, st.st_size, st.st_mtime_ns)


def parquet_num_rows(sf_dir: str, name: str) -> int:
    """EXACT table row count from parquet footer metadata — no Spark
    job, no data read, ~0.7 ms per table (memoized per path on top).

    r14 (ADVICE r13): registry query builders must stay job-free at
    construction, yet several need a row-count-shaped scalar in the
    PLAN — the tf-idf N literal, and the ``size_gated_broadcast``
    upper bounds for every relation structurally bounded by a table's
    cardinality (erasure lists ≤ events rows, drop lists ≤ embeddings
    rows, distinct-doc contamination sets ≤ documents rows). The
    footer count is the engine-equivalent of Spark's own
    metadata-only count optimization, available at plan-build time.
    At 100 TB the same call reads N footers of a partitioned table
    (or one catalog stat) — still no executor involvement."""
    if name not in TESTDATA_TABLES:
        raise KeyError(
            f"unknown table {name!r}; expected one of {TESTDATA_TABLES}"
        )
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = _path_stat_key(path)
    hit = _NUM_ROWS_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        n = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        n = pq.read_metadata(path).num_rows
    _NUM_ROWS_CACHE[key] = n
    return n
