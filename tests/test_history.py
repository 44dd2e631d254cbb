"""Incremental SCD2 history: the fold-equals-batch law and redelivery
idempotence (cdc/history.py), driven over the real events changelog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.catalog import load_table
from olr_cdc_oracle_no_dbz_spark.cdc.history import (
    VALID_TO,
    merge_into_history,
    publish_history,
    scd2_chain,
)

SF_DIR = "/root/testdata/sf0.001"
KEY = ("user_id",)
ORDER = ("ts", "event_id")


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").cache()


def _canon(df):
    return sorted(
        (
            r.user_id,
            r.event_id,
            None if r[VALID_TO] is None else tuple(r[VALID_TO]),
        )
        for r in df.collect()
    )


def _cutoffs(events):
    lo, hi = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    span = hi - lo
    return lo + span / 3, lo + 2 * span / 3


def test_fold_over_batches_equals_batch_chain(events):
    """Three arrival-ordered batches folded through merge_into_history
    must equal scd2_chain over the whole log (auto-create on batch 1)."""
    c1, c2 = _cutoffs(events)
    batches = [
        events.filter(F.col("ts") <= c1),
        events.filter((F.col("ts") > c1) & (F.col("ts") <= c2)),
        events.filter(F.col("ts") > c2),
    ]
    assert all(b.count() > 0 for b in batches)
    hist = None
    for b in batches:
        hist = merge_into_history(hist, b, KEY, ORDER)
        hist = hist.localCheckpoint(eager=True)  # per-batch, as a sink would
    expected = scd2_chain(events, KEY, ORDER)
    assert _canon(hist) == _canon(expected)


def test_redelivered_batch_is_noop(events):
    c1, _ = _cutoffs(events)
    b1 = events.filter(F.col("ts") <= c1)
    b1_dup = b1  # the whole batch redelivered verbatim
    once = merge_into_history(None, b1, KEY, ORDER).localCheckpoint(True)
    twice = merge_into_history(once, b1_dup, KEY, ORDER)
    assert _canon(twice) == _canon(once)


def test_publish_marks_exactly_open_rows_current(events):
    hist = scd2_chain(events, KEY, ORDER)
    pub = publish_history(hist)  # no __deleted col: open == current
    n_keys = events.select("user_id").distinct().count()
    assert pub.filter("is_current").count() == n_keys
    assert (
        pub.filter("is_current AND __valid_to IS NOT NULL").count() == 0
    )
