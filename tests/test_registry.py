"""Registry-ordering invariants (ADVICE r3, workload/__init__.py).

The driver's correctness gate samples the first ~50 entries of
``queries()`` per round, so the emitted order must rotate: queries the
driver has not checked recently must come first. The order is derived
from the CORRECTNESS_r*.json history; these tests pin that behavior so
a regression cannot silently re-freeze the sample.
"""

from __future__ import annotations

from olr_cdc_oracle_no_dbz_spark.workload import (
    _last_green_round,
    oracles,
    queries,
)


def test_rotation_emits_stalest_first():
    last = _last_green_round()
    ranks = [last.get(name, 0) for name in queries()]
    assert ranks == sorted(ranks), (
        "queries() must be ordered by last-green round ascending "
        "(never-checked first) so the driver's capped gate rotates"
    )


def test_every_oracle_has_a_query_and_order_matches():
    q_names = list(queries())
    o_names = list(oracles())
    assert set(o_names) <= set(q_names)
    shared = [n for n in q_names if n in set(o_names)]
    assert shared == o_names, "oracles() must follow queries() order"


def test_history_parse_produces_known_rounds():
    # The repo ships r1-r3 driver output; every recorded green round must
    # be a positive round number and at least one query must be stale
    # relative to the max (otherwise rotation is vacuous).
    last = _last_green_round()
    assert last, "CORRECTNESS history should parse to a non-empty map"
    assert all(r >= 1 for r in last.values())


def test_no_complex_typed_output_columns(spark):
    """VERDICT r4 gate-harness invariant: the driver canonicalizes
    results by sorting the pandas frame, which raises ``unhashable
    type: 'list'`` on any ArrayType/MapType (and ambiguity on
    StructType) output column — agg_latest_n_by_offset and
    agg_earliest_n_by_offset were red in r4 for exactly this. Every
    registered query must therefore flatten complex columns (array_join
    / to_json) before returning. This sweep builds each query's plan
    (schema only, nothing executed) and fails on any complex-typed
    field so the trap cannot recur as new queries register."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert offenders == [], (
        "complex-typed output columns break the driver's canonicalizer; "
        f"flatten with array_join/to_json: {offenders}"
    )


def test_hash_fail_rows_do_not_count_as_green():
    """Review r4 finding: the r2 history contains rows with
    rows_match=true but hash_match=false (real hash FAILs). Those must
    NOT register round 2 as their last green round — a hash-failing
    query has to rotate to the FRONT of the capped sample."""
    import json

    r2 = json.load(open("CORRECTNESS_r02.json"))
    hash_fails = [
        n
        for n, r in r2.items()
        if r.get("rows_match") and r.get("hash_match") is False
    ]
    assert hash_fails, "fixture expectation: r2 shipped hash-fail rows"
    last = _last_green_round()
    assert all(last.get(n, 0) != 2 for n in hash_fails)
