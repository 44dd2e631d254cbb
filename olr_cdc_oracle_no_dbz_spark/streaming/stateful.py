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


try:  # Spark 4 transformWithState API (requires the RocksDB state store)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _SCNDedupe(StatefulProcessor):
        """Per-key at-least-once → exactly-once filter (ST3 as a stream
        operator): keeps the max applied (scn, seq) per key in a
        ValueState and passes through only events strictly above that
        composite high-water mark, so redelivered or out-of-order
        duplicates never reach the sink. The mark must be the PAIR, not
        the SCN alone: a multi-op transaction shares one commit SCN
        across its ops (decode_olr_events orders them by seq — the
        engine-wide DEFAULT_ORDER in cdc/materialize.py), so an
        SCN-only filter would drop all but one arbitrary intra-txn op.
        The same guard the batch merge applies, lifted into the state
        store for pipelines whose sink is not a keyed table (e.g. a
        Kafka changelog relay, K1)."""

        def __init__(self, columns: list[str]) -> None:
            self._columns = columns

        def init(self, handle: StatefulProcessorHandle) -> None:
            # State-schema note: r3 renamed this state from ``max_scn``
            # ('max_scn long') to ``hwm`` ('max_scn long, max_seq long').
            # A pre-r3 transformWithState checkpoint therefore resumes
            # with empty hwm state and re-emits already-applied events —
            # upgrading across that boundary requires a fresh checkpoint
            # (safe when the downstream sink is an idempotent keyed
            # upsert, which re-converges; a non-keyed relay sink must
            # re-bootstrap instead).
            self._hwm = handle.getValueState(
                "hwm", "max_scn long, max_seq long"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            prev_scn, prev_seq = (
                self._hwm.get() if self._hwm.exists() else (-1, -1)
            )
            chunks = [pdf for pdf in rows if not pdf.empty]
            if not chunks:
                return
            batch = pd.concat(chunks, ignore_index=True)
            above = (batch["__scn"] > prev_scn) | (
                (batch["__scn"] == prev_scn) & (batch["__seq"] > prev_seq)
            )
            fresh = (
                batch[above]
                .sort_values(["__scn", "__seq"])
                .drop_duplicates(subset=["__scn", "__seq"], keep="first")
            )
            if fresh.empty:
                return
            top = fresh.iloc[-1]
            self._hwm.update((int(top["__scn"]), int(top["__seq"])))
            yield fresh[self._columns]

        def close(self) -> None:
            pass

    def dedupe_redelivery(
        stream: DataFrame,
        key_col: str = "key",
        scn_col: str = "scn",
        seq_col: str = "seq",
    ) -> DataFrame:
        """Exactly-once idempotent apply over an at-least-once feed.

        Built on ``transformWithStateInPandas`` (Spark 4): per-key
        ValueState holds the high-water (scn, seq) pair — the engine's
        ordering contract; equal-SCN intra-transaction ops advance by
        seq — so duplicates and stale redeliveries are dropped inside
        the state store, surviving restarts via the checkpoint. Streams
        without a seq column are ordered by SCN alone (internal seq=0).

        Output schema == input schema EXACTLY: the grouping key and the
        (scn, seq) ordering columns are carried as reserved ``__key``/
        ``__scn``/``__seq`` internals and stripped before emit, so
        fixed-schema sinks and schema-equality assertions survive an
        upgrade (ADVICE r3).
        """
        from pyspark.sql import functions as F

        # the seq=0 fallback applies ONLY when the caller left seq_col at
        # its default and the stream truly has no seq column; an
        # explicitly-named missing column must fail fast, not silently
        # collapse multi-op transactions onto (scn, 0)
        if seq_col == "seq" and "seq" not in stream.columns:
            seq_expr = F.lit(0).cast("long")
        else:
            seq_expr = F.col(seq_col).cast("long")
        normalized = (
            stream.withColumn("__key", F.col(key_col).cast("string"))
            .withColumn("__scn", F.col(scn_col).cast("long"))
            .withColumn("__seq", seq_expr)
        )
        return normalized.groupBy("__key").transformWithStateInPandas(
            statefulProcessor=_SCNDedupe(list(stream.columns)),
            outputStructType=stream.schema,
            outputMode="append",
            timeMode="none",
        )

    _TWS = ["dedupe_redelivery"]
except ImportError:  # pragma: no cover - older Spark without the API
    _TWS = []

__all__: list[Any] = ["running_profile", "RUNNING_PROFILE_SCHEMA", *_TWS]
