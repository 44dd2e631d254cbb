"""Watermarked windowed aggregation (SURVEY.md §2 A5-A8, ST5).

The ksqlDB windowing surface — ``WINDOW TUMBLING/HOPPING/SESSION`` with
``GRACE PERIOD`` (docker-compose-main.yml:112-131) — as thin helpers
over Spark's native ``window``/``session_window``/``withWatermark``.
They accept batch OR streaming DataFrames: the same plan is the batch
analog the DuckDB harness checks (workload/windows.py) and the streaming
query the golden-fixture tests run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(
    df: DataFrame,
    window_col: Column,
    ts_col: str,
    watermark: str | None,
    keys: tuple[str, ...],
    aggs: tuple[Column, ...],
) -> DataFrame:
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    out_aggs = aggs or (F.count("*").alias("n_events"),)
    grouped = df.groupBy(window_col.alias("win"), *keys).agg(*out_aggs)
    agg_names = [c for c in grouped.columns if c != "win" and c not in keys]
    return grouped.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *keys,
        *agg_names,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    watermark: str | None = None,
    keys: tuple[str, ...] = (),
    aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """``WINDOW TUMBLING (SIZE size)`` (A5): non-overlapping fixed windows.
    ``watermark`` is the GRACE PERIOD analog (A8) — events later than it
    are dropped in streaming mode."""
    return _windowed(df, F.window(ts_col, size), ts_col, watermark, keys, aggs)


def hopping_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    watermark: str | None = None,
    keys: tuple[str, ...] = (),
    aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """``WINDOW HOPPING (SIZE size, ADVANCE BY slide)`` (A6): overlapping
    windows — each event lands in size/slide windows."""
    return _windowed(
        df, F.window(ts_col, size, slide), ts_col, watermark, keys, aggs
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream–stream interval join (SURVEY.md §2 J2): ksqlDB's
    ``JOIN ... WITHIN n`` — equi-key plus a ± ``within`` time bound.

    Both sides are watermarked (required for Spark to bound the join
    state: a buffered left row can be dropped once the right watermark
    passes its ``within`` horizon). Column names from the right side are
    suffixed ``_r`` so the result is unambiguous. Works on batch frames
    too (watermark is a no-op there) — that batch plan is what
    workload/joins.py registers for the DuckDB differential check.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = (
        right.select(
            [F.col(c).alias(f"{c}_r" if c != on else c) for c in right.columns]
        )
        .withWatermark(f"{right_ts}_r", watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_ts}_r")
            >= F.expr(f"l.{left_ts} - interval {within}")
        )
        & (
            F.col(f"r.{right_ts}_r")
            <= F.expr(f"l.{left_ts} + interval {within}")
        )
    )
    return lw.join(rw, cond, how).drop(F.col(f"r.{on}"))


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    watermark: str | None = None,
    keys: tuple[str, ...] = (),
    aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """``WINDOW SESSION (gap)`` (A7): dynamic windows that extend while
    events arrive within ``gap`` of each other."""
    return _windowed(
        df, F.session_window(ts_col, gap), ts_col, watermark, keys, aggs
    )
