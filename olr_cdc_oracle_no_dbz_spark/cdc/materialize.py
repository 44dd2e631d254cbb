"""Changelog → current-state materialization (the JDBC-sink role).

Re-expresses the reference sink connector semantics (README.md:775-798):
``insert.mode: upsert`` + ``pk.mode: record_key`` + ``delete.enabled: true``
+ ``auto.evolve: true`` — i.e. last-writer-wins per primary key in commit
(SCN) order, deletes remove rows (or mark them in rewrite mode), and new
source columns widen the sink schema.

Design for 100 TB:
- LWW dedup is ONE hash-partition shuffle on the key (window row_number);
  with AQE skew-join/partition-coalescing on, a hot key splits at runtime.
- merge_into_state unions state+delta and re-runs LWW — at scale this maps
  1:1 onto a storage-side MERGE (Delta/Iceberg); the per-batch delta is
  dedup'd first so the merge input is at most one row per key.
- The max-applied-SCN guard makes redelivery idempotent (reference relies
  on upsert idempotence the same way, README.md:788-790).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: sentinel ordering columns: commit SCN, then intra-txn seq
DEFAULT_ORDER = ("scn", "seq")


def latest_state(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("id",),
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Last-writer-wins: keep the newest row per key (SURVEY.md §2 A1).

    Single shuffle on ``key_cols``; ordering is total because the
    reference guarantees SCN monotonicity per key (scn-type:1,
    scripts/OpenLogReplicator.json:24) and ``seq`` breaks intra-txn ties.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def materialize_state(
    unwrapped: DataFrame,
    key_cols: tuple[str, ...] = ("id",),
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
    delete_mode: str = "drop",
) -> DataFrame:
    """Batch materialization: a changelog DataFrame → current-state table.

    ``delete_mode='drop'`` removes deleted keys (reference default sink
    behavior, README.md:793-794); ``'rewrite'`` keeps the final row with
    ``__deleted=true`` (README.md:795).
    """
    state = latest_state(unwrapped, key_cols, order_cols)
    if delete_mode == "drop":
        return state.filter(~F.col("__deleted")).drop("__deleted")
    if delete_mode == "rewrite":
        return state
    raise ValueError(f"delete_mode must be drop|rewrite, got {delete_mode!r}")


def _align_schemas(state: DataFrame, delta: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Schema evolution (``auto.evolve: true``, README.md:787): widen both
    sides to the column superset, new columns null-filled on the old side."""
    all_cols = list(dict.fromkeys([*state.columns, *delta.columns]))
    delta_types = dict(delta.dtypes)
    state_types = dict(state.dtypes)

    def widen(df: DataFrame, have: dict[str, str], other: dict[str, str]) -> DataFrame:
        cols = []
        for c in all_cols:
            if c in have:
                cols.append(F.col(c))
            else:
                cols.append(F.lit(None).cast(other[c]).alias(c))
        return df.select(*cols)

    return widen(state, state_types, delta_types), widen(delta, delta_types, state_types)


def merge_into_state(
    state: DataFrame | None,
    delta: DataFrame,
    key_cols: tuple[str, ...] = ("id",),
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Incremental upsert+delete merge of a new changelog batch into state.

    Equivalent of the sink's per-batch ``INSERT ... ON CONFLICT DO UPDATE``
    + ``DELETE`` (README.md:780-797). Steps:
      1. LWW-compact the delta (≤1 row per key enters the merge).
      2. Outer-combine with state; the delta row wins only if its
         (scn, seq) exceeds the state row's — the redelivery/idempotence
         guard (SURVEY.md §4 'SCN-monotonic apply order').

    The returned *internal* state keeps tombstones (``__deleted=true``
    rows) and the (scn, seq) watermark columns: dropping a tombstone
    early would let a redelivered older event resurrect a deleted key.
    ``publish`` applies the user-visible delete mode. On Delta/Iceberg
    this whole function becomes one ``MERGE INTO``; auto table creation
    (``auto.create: true``, README.md:786) is the ``state=None`` case.
    """
    compacted = latest_state(delta, key_cols, order_cols)
    if state is None:
        return compacted
    state, compacted = _align_schemas(state, compacted)
    return latest_state(state.unionByName(compacted), key_cols, order_cols)


def publish(
    state: DataFrame,
    delete_mode: str = "drop",
    meta_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Project the internal state to the user-visible sink table.

    ``'drop'`` removes deleted keys (reference default, README.md:793-794);
    ``'rewrite'`` keeps them with ``__deleted=true`` (README.md:795).
    """
    if delete_mode == "drop":
        out = state.filter(~F.col("__deleted")).drop("__deleted")
    elif delete_mode == "rewrite":
        out = state
    else:
        raise ValueError(f"delete_mode must be drop|rewrite, got {delete_mode!r}")
    return out.drop(*[c for c in meta_cols if c in out.columns])
