"""Unit tests for the batch CDC core: decode (flat + OLR wire format),
unwrap, LWW, incremental merge, schema evolution, transaction grouping,
and the Kafka serde round-trip (SURVEY.md §5 test strategy)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.cdc.decode import (
    decode_events,
    decode_olr_events,
    filter_source,
    unwrap,
)
from olr_cdc_oracle_no_dbz_spark.cdc.materialize import (
    _align_schemas,
    _wider_type,
    latest_state,
    merge_into_state,
    publish,
)
from olr_cdc_oracle_no_dbz_spark.cdc.transactions import (
    committed_only,
    transaction_summary,
)
from olr_cdc_oracle_no_dbz_spark.streaming.source import encode_events
from tests.conftest import event, product_row


def _raw(spark, events):
    return spark.createDataFrame(
        [(e if isinstance(e, str) else json.dumps(e),) for e in events],
        "value string",
    )


# -- decode -----------------------------------------------------------------


def test_decode_corrupt_line_survives(spark):
    dec = decode_events(
        _raw(spark, [event(1, "c", after=product_row(1, "A")), "not json"])
    )
    rows = dec.collect()
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["_corrupt"] == "not json"
    ok = [r for r in rows if r["_corrupt"] is None]
    assert ok[0]["op"] == "c" and ok[0]["after"]["id"] == 1


def test_decode_olr_wire_format_transposes_payload(spark):
    """Real OLR 1.8.7 nesting: txn header + payload[] of ops with a
    per-op schema object → flat envelope, seq from num/position."""
    msg = {
        "scn": 500,
        "tm": 1,
        "xid": "7.14.1000",
        "db": "ORCLPDB1",
        "payload": [
            {"op": "begin"},
            {
                "op": "c",
                "schema": {"owner": "OLR_DB", "table": "PRODUCT"},
                "rid": "AAA1",
                "num": 1,
                "after": product_row(1, "A"),
            },
            {
                "op": "u",
                "schema": {"owner": "OLR_DB", "table": "PRODUCT"},
                "rid": "AAA1",
                "num": 2,
                "before": product_row(1, "A"),
                "after": product_row(1, "A", "5.00"),
            },
            {"op": "commit"},
        ],
    }
    flat = decode_olr_events(_raw(spark, [json.dumps(msg)]))
    rows = {(r["op"], r["seq"]): r for r in flat.collect()}
    assert set(rows) == {("begin", 1), ("c", 1), ("u", 2), ("commit", 4)}
    c = rows[("c", 1)]
    assert c["scn"] == 500 and c["xid"] == "7.14.1000"
    assert c["schema_owner"] == "OLR_DB" and c["schema_table"] == "PRODUCT"
    assert c["after"]["name"] == "A"
    u = rows[("u", 2)]
    assert str(u["after"]["price"]) == "5.00" and u["before"]["id"] == 1
    # downstream operators run unchanged on the transposed envelope
    final = publish(
        merge_into_state(None, unwrap(filter_source(flat, "OLR_DB", "PRODUCT")))
    )
    assert [str(r["price"]) for r in final.collect()] == ["5.00"]


def test_filter_source_allowlist(spark):
    dec = decode_events(
        _raw(
            spark,
            [
                event(1, "c", after=product_row(1, "A")),
                event(2, "c", after=product_row(2, "B"), owner="HR"),
                event(3, "c", after=product_row(3, "C"), table="JOBS"),
            ],
        )
    )
    kept = filter_source(dec, "OLR_DB", "PRODUCT").collect()
    assert [r["scn"] for r in kept] == [1]


def test_unwrap_delete_uses_before_image_and_modes(spark):
    dec = decode_events(
        _raw(
            spark,
            [
                event(1, "c", after=product_row(1, "A")),
                event(2, "d", before=product_row(1, "A", "7.00")),
                event(3, "begin"),
            ],
        )
    )
    rw = unwrap(dec, mode="rewrite").collect()
    assert len(rw) == 2  # begin marker dropped
    d = next(r for r in rw if r["__deleted"])
    assert str(d["price"]) == "7.00"  # before image
    assert unwrap(dec, mode="drop").count() == 1
    with pytest.raises(ValueError):
        unwrap(dec, mode="bogus")


def test_project_envelope_flags_and_changed_images(spark):
    """P4: format flags drop envelope fields; column:0 mode keeps only
    changed columns in update after-images."""
    from olr_cdc_oracle_no_dbz_spark.cdc.decode import project_envelope

    r1 = product_row(1, "A", "9.99", 5)
    r1b = dict(r1, price=19.99)  # only price changes
    dec = decode_events(
        _raw(
            spark,
            [
                event(1, "c", after=r1),
                event(2, "u", before=r1, after=r1b),
            ],
        )
    )
    slim = project_envelope(
        dec, db=False, rid=False, xid=False, timestamps=False,
        schema_block=False,
    )
    assert {"db", "rid", "xid", "tm", "schema_owner", "schema_table"}.isdisjoint(
        slim.columns
    )

    changed = project_envelope(dec, images="changed")
    rows = {r["op"]: r for r in changed.collect()}
    # insert keeps full image
    assert rows["c"]["after"]["name"] == "A"
    # update keeps only the changed column
    upd = rows["u"]["after"]
    assert str(upd["price"]) == "19.99"
    assert upd["name"] is None and upd["stock"] is None

    with pytest.raises(ValueError):
        project_envelope(dec, images="sparse")


# -- LWW / merge ------------------------------------------------------------


def _unwrapped(spark, rows):
    """rows: list of (id, scn, seq, deleted, stock)."""
    return spark.createDataFrame(
        [(i, s, q, d, st) for i, s, q, d, st in rows],
        "id int, scn long, seq int, __deleted boolean, stock int",
    )


def test_latest_state_orders_by_scn_then_seq(spark):
    df = _unwrapped(
        spark, [(1, 10, 1, False, 0), (1, 10, 2, False, 5), (1, 9, 9, False, 9)]
    )
    out = latest_state(df).collect()
    assert len(out) == 1 and out[0]["stock"] == 5  # scn 10 seq 2 wins


def test_merge_auto_create_and_upsert(spark):
    s1 = merge_into_state(None, _unwrapped(spark, [(1, 10, 1, False, 0)]))
    s2 = merge_into_state(s1, _unwrapped(spark, [(1, 20, 1, False, 3)]))
    assert [r["stock"] for r in s2.collect()] == [3]


def test_merge_stale_delta_is_noop_and_tombstone_blocks_resurrect(spark):
    s1 = merge_into_state(None, _unwrapped(spark, [(1, 10, 1, False, 0)]))
    s2 = merge_into_state(s1, _unwrapped(spark, [(1, 30, 1, True, 0)]))  # delete
    # redeliver an OLDER update: must not resurrect id=1
    s3 = merge_into_state(s2, _unwrapped(spark, [(1, 20, 1, False, 9)]))
    pub = publish(s3).collect()
    assert pub == []
    rw = publish(s3, "rewrite").collect()
    assert len(rw) == 1 and rw[0]["__deleted"] is True


def test_publish_drops_meta_and_validates_mode(spark):
    s = merge_into_state(None, _unwrapped(spark, [(1, 10, 1, False, 0)]))
    out = publish(s)
    assert set(out.columns) == {"id", "stock"}
    with pytest.raises(ValueError):
        publish(s, "bogus")


# -- schema evolution -------------------------------------------------------


def test_align_adds_missing_columns_as_null(spark):
    state = spark.createDataFrame([(1, 5)], "id int, stock int")
    delta = spark.createDataFrame([(2, "x")], "id int, category string")
    s, d = _align_schemas(state, delta)
    assert s.columns == d.columns == ["id", "stock", "category"]
    assert s.collect()[0]["category"] is None
    assert d.collect()[0]["stock"] is None


def test_align_widens_conflicting_numeric_types(spark):
    state = spark.createDataFrame([(1, 5)], "id int, stock int")
    delta = spark.createDataFrame([(2, 6 * 10**12)], "id int, stock long")
    s, d = _align_schemas(state, delta)
    assert dict(s.dtypes)["stock"] == dict(d.dtypes)["stock"] == "bigint"
    merged = latest_state(
        s.withColumn("scn", F.lit(1)).unionByName(d.withColumn("scn", F.lit(2))),
        order_cols=("scn",),
    )
    assert merged.count() == 2


def test_wider_type_lattice():
    assert _wider_type("int", "bigint", "c") == "bigint"
    assert _wider_type("float", "double", "c") == "double"
    assert _wider_type("decimal(10,2)", "decimal(12,4)", "c") == "decimal(12,4)"
    assert _wider_type("decimal(10,2)", "int", "c") == "decimal(22,2)"
    assert _wider_type("decimal(10,2)", "double", "c") == "double"
    # float's 24-bit mantissa cannot hold int/bigint: must widen to double
    assert _wider_type("bigint", "float", "c") == "double"
    assert _wider_type("int", "float", "c") == "double"
    with pytest.raises(TypeError):
        _wider_type("int", "array<int>", "c")


# -- transactions -----------------------------------------------------------


def test_committed_only_holds_back_uncommitted(spark):
    dec = decode_events(
        _raw(
            spark,
            [
                event(100, "begin", xid="t1"),
                event(100, "c", after=product_row(1, "A"), xid="t1", seq=2),
                event(105, "commit", xid="t1", seq=3),
                event(110, "begin", xid="t2"),
                event(110, "c", after=product_row(2, "B"), xid="t2", seq=2),
                # t2 never commits
            ],
        )
    )
    out = committed_only(dec).collect()
    assert len(out) == 1
    assert out[0]["after"]["id"] == 1 and out[0]["commit_scn"] == 105


def test_transaction_summary(spark):
    dec = decode_events(
        _raw(
            spark,
            [
                event(100, "c", after=product_row(1, "A"), xid="t1"),
                event(101, "u", before=product_row(1, "A"),
                      after=product_row(1, "B"), xid="t1", seq=2),
                event(102, "commit", xid="t1", seq=3),
                event(200, "d", before=product_row(9, "Z"), xid="t2"),
            ],
        )
    )
    s = {r["xid"]: r.asDict() for r in transaction_summary(dec).collect()}
    assert s["t1"]["n_inserts"] == 1 and s["t1"]["n_updates"] == 1
    assert s["t1"]["committed"] is True
    assert s["t2"]["n_deletes"] == 1 and s["t2"]["committed"] is False
    assert s["t1"]["first_scn"] == 100 and s["t1"]["last_scn"] == 102


# -- serde round-trip (P6 / K1) ---------------------------------------------


def test_kafka_framing_round_trip(spark):
    """encode_events → decode_events is lossless, and the record key is
    the PK (pk.mode: record_key, reference README.md:789-790)."""
    events = [
        event(10, "c", after=product_row(7, "RT")),
        event(11, "d", before=product_row(7, "RT")),
    ]
    dec = decode_events(_raw(spark, events))
    framed = encode_events(dec, key_col="id")
    assert set(framed.columns) == {"key", "value"}
    assert sorted(r["key"] for r in framed.collect()) == ["7", "7"]
    rt = decode_events(framed.select("value"))
    orig = {(r["scn"], r["op"]): r for r in dec.collect()}
    back = {(r["scn"], r["op"]): r for r in rt.collect()}
    assert set(orig) == set(back)
    for k in orig:
        assert orig[k]["after"] == back[k]["after"]
        assert orig[k]["before"] == back[k]["before"]
        assert orig[k]["xid"] == back[k]["xid"]
