"""Invariant tests for the late round-6 operators, run against the real
sf0.001 tables. The differential gate already proves value equality vs
DuckDB; these pin the SEMANTIC laws the hash check can't express —
interpolation boundedness, attribution conservation, blocking
completeness — so a future refactor that keeps both engines wrong in the
same way still fails loudly.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return entry_mod.queries()


def test_resample_interpolation_bounded_and_grid_complete(spark, q):
    """Interpolated values lie between their two bracketing observed
    values; observed rows are never flagged interpolated; the hourly
    grid is contiguous per type."""
    rows = (
        q["timeseries_resample_interpolate"](spark, SF)
        .orderBy("event_type", "hour_ts")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) >= 2
    for series in by_type.values():
        # contiguity: one row per hour between first and last
        hours = [r.hour_ts for r in series]
        assert len(hours) == len(set(hours))
        observed = [
            (i, float(r.value_interp))
            for i, r in enumerate(series)
            if r.n_obs > 0
        ]
        obs_pos = {i for i, _ in observed}
        for r in series:
            if r.n_obs > 0:
                assert not r.is_interpolated
        for i, r in enumerate(series):
            if not r.is_interpolated:
                continue
            assert i not in obs_pos
            prev = max((p for p in observed if p[0] < i), default=None,
                       key=lambda p: p[0])
            nxt = min((p for p in observed if p[0] > i), default=None,
                      key=lambda p: p[0])
            assert prev is not None and nxt is not None
            lo, hi = sorted((prev[1], nxt[1]))
            v = float(r.value_interp)
            assert lo - 1e-6 <= v <= hi + 1e-6


def test_attribution_conserves_purchases(spark, q):
    """Every purchase is attributed exactly once, and attributed value
    sums to the total purchase value (decimal-exact)."""
    from olr_cdc_oracle_no_dbz_spark.catalog import load_table
    from pyspark.sql import functions as F

    rep = q["events_attribution_last_touch"](spark, SF).collect()
    ev = load_table(spark, SF, "events").filter(
        F.col("event_type") == "purchase"
    )
    n_purch = ev.count()
    total = ev.agg(
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
    ).collect()[0][0]
    assert sum(r.n_conversions for r in rep) == n_purch
    assert math.isclose(
        sum(r.attributed_value for r in rep), total, rel_tol=1e-9
    )
    # purchases can never self-attribute
    assert all(r.channel != "purchase" for r in rep)


def test_stickiness_is_a_valid_ratio(spark, q):
    rows = q["events_user_stickiness"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < float(r.stickiness) <= 1.0
        assert r.user_days <= r.active_days * r.mau


def test_geo_blocking_is_complete_vs_bruteforce(spark, q):
    """The 3x3-cell blocked join finds EXACTLY the brute-force pair set
    within the radius — blocking loses nothing (1 deg >= 111 km >> 25
    km) and adds nothing (the refine filter)."""
    from olr_cdc_oracle_no_dbz_spark.catalog import load_table

    got = {
        (r.key_a, r.key_b)
        for r in q["join_geo_neighbors"](spark, SF).collect()
    }
    import hashlib

    keys = [
        r.c_custkey
        for r in load_table(spark, SF, "customer")
        .select("c_custkey")
        .collect()
    ]

    def coord(k: int) -> tuple[float, float]:
        h = hashlib.md5(str(k).encode()).hexdigest()
        lat = (int(h[0:8], 16) % 100000) / 5000
        lon = (int(h[8:16], 16) % 100000) / 5000
        return lat, lon

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        dla = math.radians(la2 - la1) / 2
        dlo = math.radians(lo2 - lo1) / 2
        h = (
            math.sin(dla) ** 2
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(dlo) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    pts = {k: coord(k) for k in keys}
    expected = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if round(hav(pts[min(a, b)], pts[max(a, b)]), 3) <= 25.0
    }
    expected = {(min(a, b), max(a, b)) for a, b in expected}
    assert got == expected


def test_lifecycle_counts_conserve_events(spark, q):
    from olr_cdc_oracle_no_dbz_spark.catalog import load_table

    rows = q["cdc_key_lifecycle_report"](spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    assert sum(r.inserts + r.updates + r.deletes for r in rows) == n_events


def test_concentration_shares_sum_to_one(spark, q):
    rows = sorted(
        q["events_activity_concentration"](spark, SF).collect(),
        key=lambda r: -r.activity_bin,
    )
    assert math.isclose(
        sum(float(r.share) for r in rows), 1.0, abs_tol=1e-5
    )
    assert math.isclose(
        float(rows[-1].cum_share_from_top), 1.0, abs_tol=1e-5
    )


def test_column_change_transitions_conserve_events(spark, q):
    """Each user's first event has no predecessor, so the transition
    count must be exactly n_events - n_users; all three column rows
    must agree on it."""
    from olr_cdc_oracle_no_dbz_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = q["cdc_column_change_report"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert {r.n_transitions for r in rows} == {n_events - n_users}
    assert {r.col_name for r in rows} == {"event_type", "value", "props"}
    for r in rows:
        assert 0 <= r.n_changed <= r.n_transitions


def test_novelty_first_doc_is_fully_novel(spark, q):
    """The lowest doc_id has no earlier corpus, so every one of its
    shingles is first-seen there: novelty_ratio must be exactly 1."""
    rows = q["text_ngram_novelty"](spark, SF).collect()
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_shingles
    assert float(first.novelty_ratio) == 1.0
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles


def test_paa_vec_memo_single_entry_and_corpus_switch(spark):
    """ADVICE r10: the PAA upstream memo keeps ONE live entry per
    application — switching corpora within a session replaces the
    entry (old reference dropped for ContextCleaner) and returns the
    new corpus's derivation, not a stale hit."""
    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries as X

    app = spark.sparkContext.applicationId
    X._PAA_VEC_MEMO.pop(app, None)
    d1, v1 = X._paa_vec(spark, "/root/testdata/sf0.001")
    assert list(X._PAA_VEC_MEMO) == [app]
    # warm hit: identical objects back
    d1b, v1b = X._paa_vec(spark, "/root/testdata/sf0.001")
    assert d1b == d1 and v1b is v1
    # corpus switch: single entry replaced, derivation recomputed
    d2, v2 = X._paa_vec(spark, "/root/testdata/sf0.01")
    assert list(X._PAA_VEC_MEMO) == [app]
    assert v2 is not v1
    assert v2.count() > v1.count()  # 10x corpus has more users
    X._PAA_VEC_MEMO.pop(app, None)
