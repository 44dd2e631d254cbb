"""Serde tests (P6): Avro schema derivation always; spark-avro round
trip only when that module is loaded (optional, like the reference's
optional Avro converter); the pure-Python binary codec always, with
bidirectional conformance against the bundled JVM avro-1.12.1 jar."""

from __future__ import annotations

import json
from datetime import datetime
from decimal import Decimal

import pytest

from olr_cdc_oracle_no_dbz_spark.schemas import CHANGE_EVENT_SCHEMA
from olr_cdc_oracle_no_dbz_spark.serde import (
    _codec,
    avro_available,
    avro_schema_for,
    decode_avro,
    decode_avro_python,
    encode_avro,
    encode_avro_python,
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


def test_python_codec_round_trip_all_types():
    """Every type avro_schema_for can emit survives encode→decode."""
    import pyspark.sql.types as T

    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.DecimalType(10, 2)),
            T.StructField("ok", T.BooleanType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("raw", T.BinaryType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "nested",
                T.StructType([T.StructField("k", T.IntegerType())]),
            ),
        ]
    )
    avsc = avro_schema_for(struct, "RT")
    enc, dec = _codec(avsc)
    row = {
        "id": -(2**40),  # negative zigzag path
        "name": "héllo",
        "price": Decimal("-12345.67"),
        "ok": True,
        "score": 2.5,
        "raw": b"\x00\xff",
        "ts": datetime(2026, 8, 13, 12, 34, 56, 789012),
        "tags": ["a", "b", ""],
        "nested": {"k": 7},
    }
    assert dec(enc(row)) == row
    nulls = {k: None for k in row}
    assert dec(enc(nulls)) == nulls


def test_python_codec_conforms_to_jvm_avro(spark):
    """Cross-implementation conformance: bytes written by the Python
    codec decode identically in the bundled JVM avro-1.12.1
    GenericDatumReader, and JVM-written bytes decode identically in the
    Python codec. This is the spec check that makes the offline codec
    trustworthy without the spark-avro module."""
    import pyspark.sql.types as T

    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.LongType())),
        ]
    )
    avsc = avro_schema_for(struct, "Conf")
    enc, dec = _codec(avsc)
    row = {
        "id": 123456789012,
        "name": "olr",
        "score": -0.5,
        "ok": False,
        "tags": [1, -2, 3],
    }

    jvm = spark.sparkContext._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(avsc)

    # Python-encoded -> JVM-decoded
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    decoder = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        bytearray(enc(row)), None
    )
    rec = reader.read(None, decoder)
    # py4j auto-unboxes Java primitives; Avro strings come back as Utf8
    assert rec.get("id") == row["id"]
    assert str(rec.get("name")) == row["name"]
    assert rec.get("score") == row["score"]
    assert rec.get("ok") is False
    assert [rec.get("tags").get(i) for i in range(3)] == row["tags"]

    # JVM-encoded -> Python-decoded
    out_rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    out_rec.put("id", jvm.java.lang.Long.valueOf(row["id"]))
    out_rec.put("name", row["name"])
    out_rec.put("score", jvm.java.lang.Double.valueOf(row["score"]))
    out_rec.put("ok", jvm.java.lang.Boolean.valueOf(False))
    tags = jvm.java.util.ArrayList()
    for v in row["tags"]:
        tags.add(jvm.java.lang.Long.valueOf(v))
    out_rec.put("tags", tags)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    baos = jvm.java.io.ByteArrayOutputStream()
    encoder = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(
        baos, None
    )
    writer.write(out_rec, encoder)
    encoder.flush()
    assert dec(bytes(baos.toByteArray())) == row


def test_python_codec_dataframe_round_trip(spark):
    """End-to-end through Spark: encode_avro_python → binary value column
    → decode_avro_python → original rows (worker closures pickle by
    value; no spark-avro module involved)."""
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, -1.0)], "id long, name string, score double"
    )
    avsc = avro_schema_for(df.schema, "DF")
    encoded = encode_avro_python(df, ["id", "name", "score"], avsc)
    assert encoded.schema.simpleString() == "struct<value:binary>"
    back = decode_avro_python(encoded, avsc, df.schema).select("event.*")
    assert sorted(
        [tuple(r) for r in back.collect()]
    ) == [(1, "x", 2.5), (2, None, -1.0)]


def test_python_codec_round_trip_property():
    """Hypothesis: ANY value assignment round-trips through the binary
    codec — unicode strings, full-range longs, NaN-free doubles,
    arbitrary bytes, nulls anywhere, ragged arrays."""
    import pyspark.sql.types as T
    from hypothesis import given, settings
    from hypothesis import strategies as st

    struct = T.StructType(
        [
            T.StructField("a_long", T.LongType()),
            T.StructField("a_str", T.StringType()),
            T.StructField("a_double", T.DoubleType()),
            T.StructField("a_bool", T.BooleanType()),
            T.StructField("a_bytes", T.BinaryType()),
            T.StructField("a_arr", T.ArrayType(T.LongType())),
        ]
    )
    enc, dec = _codec(avro_schema_for(struct, "Prop"))
    opt = lambda s: st.one_of(st.none(), s)  # noqa: E731
    rows = st.fixed_dictionaries(
        {
            "a_long": opt(st.integers(min_value=-(2**63), max_value=2**63 - 1)),
            "a_str": opt(st.text(max_size=80)),
            "a_double": opt(
                st.floats(allow_nan=False, allow_infinity=True, width=64)
            ),
            "a_bool": opt(st.booleans()),
            "a_bytes": opt(st.binary(max_size=64)),
            "a_arr": opt(
                st.lists(
                    st.integers(min_value=-(2**63), max_value=2**63 - 1),
                    max_size=8,
                )
            ),
        }
    )

    @settings(max_examples=200, deadline=None)
    @given(rows)
    def check(row):
        assert dec(enc(row)) == row

    check()


def test_kafka_framing_avro_round_trip(spark):
    """K1 with Avro values (the reference's optional Avro converter):
    encode_events(value_format='avro') frames key + binary Avro value;
    decode_avro_python recovers the envelope exactly."""
    from olr_cdc_oracle_no_dbz_spark.streaming.source import encode_events

    df = spark.createDataFrame(
        [(1, "a", 100), (2, None, 101)], "id int, name string, scn long"
    )
    framed = encode_events(df, value_format="avro")
    assert framed.schema.simpleString() == "struct<key:string,value:binary>"
    keys = sorted(r["key"] for r in framed.collect())
    assert keys == ["1", "2"]
    avsc = avro_schema_for(df.schema, "ChangeEventValue")
    back = decode_avro_python(framed, avsc, df.schema).select("event.*")
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "a", 100),
        (2, None, 101),
    ]
    with pytest.raises(ValueError, match="value_format"):
        encode_events(df, value_format="protobuf")


def test_avro_round_trip_when_loaded(spark):
    if not avro_available(spark):
        pytest.skip("spark-avro module not loaded in this container")
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    avsc = avro_schema_for(df.schema, "T")
    back = decode_avro(encode_avro(df, ["id", "name"], avsc), avsc).select(
        "event.*"
    )
    assert [tuple(r) for r in back.collect()] == [(1, "x")]


def test_codec_nat_string_and_key_column_collision(spark):
    """Review r4 findings: (a) a string field holding the literal text
    'NaT' must encode as a string, not Avro null; (b) a business column
    literally named 'key' must survive Avro framing."""
    enc, dec = _codec(avro_schema_for(
        __import__("pyspark").sql.types.StructType([
            __import__("pyspark").sql.types.StructField(
                "s", __import__("pyspark").sql.types.StringType())]), "T"))
    assert dec(enc({"s": "NaT"})) == {"s": "NaT"}

    from olr_cdc_oracle_no_dbz_spark.streaming.source import encode_events

    df = spark.createDataFrame(
        [(1, "k1", 100)], "id int, key string, scn long"
    )
    framed = encode_events(df, value_format="avro")
    avsc = avro_schema_for(df.schema, "ChangeEventValue")
    back = decode_avro_python(framed, avsc, df.schema).select("event.*")
    assert [tuple(r) for r in back.collect()] == [(1, "k1", 100)]


def test_decode_avro_python_permissive_corruption(spark):
    """Permissive decode (the from_json PERMISSIVE analog): malformed
    payloads land in _corrupt with event=NULL; good rows decode; strict
    mode fails fast; trailing bytes are treated as corruption (full-
    consumption contract)."""
    import pyspark.sql.types as T

    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    avsc = avro_schema_for(struct, "P")
    enc, dec = _codec(avsc)
    good = enc({"id": 7, "name": "ok"})
    truncated = good[:-2]
    trailing = good + b"\xff\xff"
    with pytest.raises(ValueError, match="trailing"):
        dec(trailing)

    df = spark.createDataFrame(
        [(good,), (truncated,), (trailing,)], "value binary"
    )
    out = decode_avro_python(df, avsc, struct, permissive=True).collect()
    events = [r["event"] for r in out]
    corrupt = [r["_corrupt"] for r in out]
    assert sum(e is not None for e in events) == 1
    assert sum(c is not None for c in corrupt) == 2
    ok = next(e for e in events if e is not None)
    assert (ok["id"], ok["name"]) == (7, "ok")

    # strict mode: the stream fails loudly instead
    with pytest.raises(Exception):
        decode_avro_python(df, avsc, struct).collect()
