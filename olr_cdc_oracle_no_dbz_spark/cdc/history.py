"""Changelog → SCD Type-2 history materialization (incremental).

The state materializer (materialize.py) keeps ONE row per key — the
sink-connector semantics of the reference (README.md:775-798). This
module keeps EVERY version: each change event becomes a row whose
validity interval is [its own (scn, seq), the next version's (scn, seq))
— the warehouse-standard history table, maintained incrementally per
micro-batch rather than recomputed from the full log.

Internal representation: the input columns unchanged (the row's own
order columns ARE valid_from) plus one struct column ``__valid_to``
holding the closing version's order key, NULL while the version is
open. Tombstones stay in the table as versions with ``__deleted=true``
(an open tombstone means the key is dead — ``publish_history`` derives
``is_current = open AND NOT deleted``).

Design for 100 TB:
- ``merge_into_history`` touches only the OPEN rows of keys present in
  the delta (one semi/anti join against the distinct delta keys —
  broadcastable, micro-batches are small) and passes every closed row
  through untouched. On Delta/Iceberg the passthrough is literal: the
  merge rewrites only files containing open rows of touched keys.
- Re-chaining runs per key inside one hash partition (a lead() window
  over delta-sized input), so merge cost is O(|delta| + |open rows of
  touched keys|), independent of history size.
- Redelivery idempotence: delta rows at or below a key's open-version
  order key are already in the table and are dropped before chaining —
  re-applying a batch is a no-op (same guard contract as
  merge_into_state; reference idempotence note README.md:788-790).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.cdc.materialize import (
    DEFAULT_ORDER,
    _align_schemas,
)

VALID_TO = "__valid_to"


def scd2_chain(
    changelog: DataFrame,
    key_cols: tuple[str, ...] = ("id",),
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Batch SCD2 derivation: close each version with the next version's
    order key (lead over the per-key order), leaving the last open."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return changelog.withColumn(
        VALID_TO, F.lead(F.struct(*order_cols)).over(w)
    )


def merge_into_history(
    history: DataFrame | None,
    delta: DataFrame,
    key_cols: tuple[str, ...] = ("id",),
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Merge one changelog micro-batch into the SCD2 history table.

    Invariant (pinned by tests/test_history.py): folding any
    arrival-ordered batch split of a changelog through this function
    equals ``scd2_chain`` over the whole log, and re-applying a batch
    changes nothing. ``history=None`` is auto-creation (auto.create
    analog, README.md:786).
    """
    keys = list(key_cols)
    delta = delta.dropDuplicates([*keys, *order_cols])
    if history is None:
        return scd2_chain(delta, key_cols, order_cols)

    history, delta = _align_schemas(history, delta)
    delta = delta.drop(VALID_TO)  # null-filled onto the delta by align

    closed = history.filter(F.col(VALID_TO).isNotNull())
    opened = history.filter(F.col(VALID_TO).isNull())
    dkeys = delta.select(*keys).distinct()
    open_touched = opened.join(F.broadcast(dkeys), keys, "left_semi")
    open_untouched = opened.join(F.broadcast(dkeys), keys, "left_anti")

    base = open_touched.drop(VALID_TO)
    hwm = base.select(*keys, F.struct(*order_cols).alias("__hwm"))
    fresh = (
        delta.join(F.broadcast(hwm), keys, "left")
        .filter(
            F.col("__hwm").isNull()
            | (F.struct(*order_cols) > F.col("__hwm"))
        )
        .drop("__hwm")
    )
    rechained = scd2_chain(base.unionByName(fresh), key_cols, order_cols)
    return closed.unionByName(open_untouched).unionByName(rechained)


def publish_history(
    history: DataFrame,
    delete_col: str = "__deleted",
) -> DataFrame:
    """User-visible projection: ``is_current`` = open version of a live
    key. The interval endpoints stay as the order columns themselves
    (valid_from) and the ``__valid_to`` struct (NULL = open)."""
    is_open = F.col(VALID_TO).isNull()
    alive = (
        ~F.col(delete_col)
        if delete_col in history.columns
        else F.lit(True)
    )
    return history.withColumn("is_current", is_open & alive)
