"""Semantic invariants for the governance/history operators that the
differential gate can only hash-check: SCD2 interval chaining, PII
redaction completeness, and purge exhaustiveness (reference semantics:
the sink-connector state table of README.md:775-798, extended with the
warehouse-standard history/erasure surfaces)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.workload import queries
from olr_cdc_oracle_no_dbz_spark.workload.ext_queries import (
    _PII_EMAIL,
    _PII_IP,
    _PII_PHONE,
    _PII_SEED_SQL,
)

SF_DIR = "/root/testdata/sf0.001"


def test_scd2_intervals_chain_contiguously(spark):
    """Per key, version intervals must tile the key's history: sorted by
    valid_from, each valid_to equals the next version's valid_from, the
    final valid_to is open (NULL), and exactly one version is current
    unless the key ended in a delete."""
    hist = queries()["cdc_scd2_history"](spark, SF_DIR).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.user_id, []).append(r)
    assert len(by_key) > 10
    saw_deleted_key = False
    for rows in by_key.values():
        rows.sort(key=lambda r: (r.valid_from, r.valid_to or "~"))
        for cur, nxt in zip(rows, rows[1:]):
            assert cur.valid_to == nxt.valid_from
            assert not cur.is_current
        last = rows[-1]
        assert last.valid_to is None
        n_current = sum(r.is_current for r in rows)
        if last.event_type == "error":
            assert n_current == 0
            saw_deleted_key = True
        else:
            assert n_current == 1
    assert saw_deleted_key  # fixture must exercise the tombstone path


def test_pii_redaction_leaves_no_matches(spark):
    """Recompute the redacted text (the registered query emits only its
    md5) and assert zero residual matches for every pattern, on every
    row — and that the seeding actually planted at least one of each."""
    q = queries()["text_pii_redact"](spark, SF_DIR)
    stats = q.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
        F.count("*").alias("n"),
    ).first()
    assert stats.e >= stats.n and stats.p >= stats.n and stats.i >= stats.n

    from olr_cdc_oracle_no_dbz_spark.workload.util import t

    d = t(spark, SF_DIR, "documents")
    raw = F.expr(_PII_SEED_SQL.replace("VARCHAR", "STRING"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    sample = [r.red for r in d.select(red.alias("red")).limit(200).collect()]
    assert sample
    for pat in (_PII_EMAIL, _PII_PHONE, _PII_IP):
        compiled = re.compile(pat)
        assert not any(compiled.search(s) for s in sample)


def test_purge_removes_exactly_the_requested_keys(spark):
    """Purged output = live state minus the erasure list, nothing else."""
    qs = queries()
    purged = {r.user_id for r in qs["cdc_purge_keys"](spark, SF_DIR).collect()}
    live = {
        r.user_id for r in qs["cdc_current_state"](spark, SF_DIR).collect()
    }
    requested = {u for u in live if u % 97 == 0}
    assert requested  # fixture must exercise the purge
    assert purged == live - requested
