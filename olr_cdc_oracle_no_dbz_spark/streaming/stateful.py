"""Custom stateful per-key processing (SURVEY.md §2.8 ST6).

The ksqlDB stream/table duality keeps per-key state in a state store
(docker-compose-main.yml:112-131). For state shapes Spark's built-in
aggregations can't express, the engine uses
``applyInPandasWithState`` — Arrow-batched per-key state with the
RocksDB state-store provider configured in session.py for beyond-heap
state at scale.

The shipped operator is a per-key running profile (count, sum, last
value, last-seen timestamp) — the canonical "table over a stream"
materialization that survives across micro-batches and restarts via the
checkpoint.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_PROFILE_SCHEMA = (
    "key string, n_events long, total_value double, last_value double, "
    "last_ts timestamp"
)
_STATE_SCHEMA = "n_events long, total_value double, last_value double, last_ts timestamp"


def _update_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, total, last_v, last_ts) = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        # "last" is by EVENT TIME, not arrival order: a late event (or an
        # earlier Arrow chunk holding the max ts) must not regress state
        idx = pdf["ts"].idxmax()
        ts = pdf["ts"].loc[idx]
        ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
        if last_ts is None or ts >= last_ts:
            last_ts = ts
            last_v = float(pdf["value"].loc[idx])
    state.update((n, total, last_v, last_ts))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_value": [last_v],
            "last_ts": [last_ts],
        }
    )


def running_profile(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running profile over a stream of (key, ts, value).

    Emits one updated row per key per micro-batch (output mode
    ``update``); state lives in the checkpointed state store, so counts
    continue across restarts (tested in tests/test_streaming.py).
    """
    from pyspark.sql import functions as F

    normalized = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _update_profile,
        outputStructType=RUNNING_PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__: list[Any] = ["running_profile", "RUNNING_PROFILE_SCHEMA"]
