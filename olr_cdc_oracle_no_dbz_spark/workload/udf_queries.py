"""§2.9 UDF/UDAF surface demos — Arrow-batched Pandas UDFs with exact
DuckDB oracles (ksqlDB's Java UDF/UDAF registration analog; the
reference deploys the capability but ships no instances,
docker-compose-main.yml:112-141).

Both queries are deliberately SQL-expressible so the differential
harness can hash-check the Python path itself: if the Arrow transfer,
batch iteration, or pandas math diverged from the declarative plan, the
check would catch it. Determinism rules: group statistics use exact
min/max (order-independent), per-row division is IEEE on identical
inputs, and float norms are rounded to DECIMAL(16,8) before compare.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import register
from olr_cdc_oracle_no_dbz_spark.workload.util import t


@register(
    "udaf_minmax_normalize",
    oracle="""
    SELECT event_id, event_type, value,
           CASE WHEN max_v = min_v THEN 0.0
                ELSE (value - min_v) / (max_v - min_v) END AS value_norm
    FROM (
        SELECT event_id, event_type, value,
               MIN(value) OVER (PARTITION BY event_type) AS min_v,
               MAX(value) OVER (PARTITION BY event_type) AS max_v
        FROM events
    )
    """,
)
def udaf_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pandas UDAF via ``applyInPandas``: per-event-type min-max
    normalization. 100 TB shape: one shuffle on the group key, then
    Arrow-batched per-group compute on executors — same cost model as a
    built-in window agg, but with arbitrary Python inside.

    The worker function is a closure (pickled BY VALUE): a module-level
    def would pickle by reference and require every Python worker to
    import this repo — which fails under a driver whose workers don't
    share our sys.path."""

    def minmax_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        # min/max are order-independent → deterministic under any partitioning
        lo, hi = pdf["value"].min(), pdf["value"].max()
        span = hi - lo
        out = pdf[["event_id", "event_type", "value"]].copy()
        out["value_norm"] = 0.0 if span == 0 else (pdf["value"] - lo) / span
        return out

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        minmax_normalize,
        schema="event_id long, event_type string, value double, value_norm double",
    )


@register(
    "udf_vector_norm",
    oracle="""
    -- VARCHAR render: the driver hashes through fetchdf(), which
    -- coerces DECIMAL to float64; the 8-decimal string is identical
    -- on both engines and immune to pandas.
    SELECT vec_id,
           CAST(CAST(sqrt(CAST(list_aggregate(list_transform(
                generate_series(1, len(embedding)),
                i -> CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                     AS DECIMAL(30,15))), 'sum') AS DOUBLE))
                AS DECIMAL(16,8)) AS VARCHAR) AS l2_norm
    FROM embeddings
    """,
)
def udf_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF: L2 norm of the embedding column via
    numpy over Arrow batches (the 10-100x-over-row-UDF path). Emitted as
    DECIMAL(16,8): numpy's pairwise summation and DuckDB's sequential
    exact-decimal sum agree to ~1e-15, so 8 decimal places compare
    bit-identically."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def l2(col: pd.Series) -> pd.Series:
        return col.apply(lambda v: float(np.sqrt(np.dot(v, v))))

    return (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            l2(F.col("embedding").cast("array<double>"))
            .cast("decimal(16,8)")
            .cast("string")
            .alias("l2_norm"),
        )
    )
