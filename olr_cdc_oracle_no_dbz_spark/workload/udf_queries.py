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


@register(
    "udtf_chunk_rows",
    oracle="""
    SELECT doc_id,
           array_to_string(ws[(i - 1) * 40 + 1 : i * 40], ' ') AS chunk,
           i - 1 AS chunk_idx,
           LEAST(40, len(ws) - (i - 1) * 40) AS n_words
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE lang = 'en'),
         LATERAL unnest(generate_series(1, (len(ws) + 39) // 40)) AS u(i)
    """,
)
def udtf_chunk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF on the gate (§2.9 upgraded from pytest-only to a
    differentially-checked row): one doc in, N 40-word chunks out, via
    a LATERAL table-function join — the ksqlDB UDTF registration
    analog, and the imperative twin of text_chunking's declarative
    explode (same contract, different execution surface: rows cross the
    Arrow boundary into Python and back). The oracle is pure SQL, so
    the check proves the Python generator and DuckDB's unnest agree
    byte-for-byte on chunk text, indices, and word counts.

    Scale: the UDTF runs per input partition (no shuffle introduced);
    the fan-out stays Arrow-batched. Still the slow path vs explode —
    use it when chunking logic needs real Python (tokenizers,
    sentence segmenters), which is exactly what this row pins as
    possible without losing checkability."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk: string, chunk_idx: long, n_words: long")
    class ChunkRows:
        def eval(self, text: str):
            words = text.split(" ")
            k = 40
            for i in range((len(words) + k - 1) // k):
                part = words[i * k : (i + 1) * k]
                yield " ".join(part), i, len(part)

    spark.udtf.register("chunk_rows", ChunkRows)
    d = t(spark, sf_dir, "documents")
    d.filter(F.col("lang") == "en").select("doc_id", "text").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk, c.chunk_idx, c.n_words "
        "FROM _udtf_docs d, LATERAL chunk_rows(d.text) c"
    )
