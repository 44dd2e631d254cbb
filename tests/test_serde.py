"""Serde tests (P6): Avro schema derivation always; Avro round-trip only
when spark-avro is loaded (optional module, like the reference's
optional Avro converter)."""

from __future__ import annotations

import json

import pytest

from olr_cdc_oracle_no_dbz_spark.schemas import CHANGE_EVENT_SCHEMA
from olr_cdc_oracle_no_dbz_spark.serde import (
    avro_available,
    avro_schema_for,
    decode_avro,
    encode_avro,
)


def test_avro_schema_derivation_covers_envelope():
    avsc = json.loads(avro_schema_for(CHANGE_EVENT_SCHEMA))
    assert avsc["type"] == "record"
    names = {f["name"] for f in avsc["fields"]}
    assert {"scn", "op", "before", "after", "xid"} <= names
    before = next(f for f in avsc["fields"] if f["name"] == "before")
    nested = before["type"][1]  # ["null", record]
    assert nested["type"] == "record"
    nested_names = {f["name"] for f in nested["fields"]}
    assert {"id", "price", "created_date"} <= nested_names
    price = next(f for f in nested["fields"] if f["name"] == "price")
    assert price["type"][1]["logicalType"] == "decimal"


def test_avro_round_trip_when_loaded(spark):
    if not avro_available(spark):
        pytest.skip("spark-avro module not loaded in this container")
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    avsc = avro_schema_for(df.schema, "T")
    back = decode_avro(encode_avro(df, ["id", "name"], avsc), avsc).select(
        "event.*"
    )
    assert [tuple(r) for r in back.collect()] == [(1, "x")]
