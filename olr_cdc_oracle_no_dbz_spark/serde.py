"""Serde surface (SURVEY.md §2.3 P6): JSON always, Avro when loaded.

The reference ships JSON on the wire (``format.type: json``,
scripts/OpenLogReplicator.json:15) with an Avro converter + Schema
Registry available but optional (Dockerfile:15-60,
docker-compose-main.yml:179-202). The engine mirrors that: JSON serde
is core (cdc/decode.py + streaming/source.py); Avro has two paths:

1. ``encode_avro``/``decode_avro`` — the spark-avro module
   (``--packages org.apache.spark:spark-avro_2.13:<version>``), used
   when loaded, clear error when not.
2. ``encode_avro_python``/``decode_avro_python`` — a pure-Python Avro
   *binary-encoding* codec (Arrow-batched mapInPandas), always
   available. Jar probe result for this container (r4): a filesystem
   search finds only Avro core (avro/avro-ipc/avro-mapred 1.12.1) in
   the Spark jars dir — no spark-avro_2.13 module jar, no ivy/maven
   cache, and no Python avro/fastavro package, so path 1 cannot load
   offline. Path 2's conformance is cross-checked both directions
   against the bundled JVM avro-1.12.1 GenericDatum(Reader|Writer) in
   tests/test_serde.py.

Versioned ``.avsc`` files on disk play the Registry's role
(SURVEY.md §1.1 item 4).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source is loaded in this session."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct("id"), '{"type":"record","name":"probe","fields":'
                                    '[{"name":"id","type":"long"}]')
        ).collect()
        return True
    except Exception:  # noqa: BLE001 — any failure means "not usable"
        return False


def avro_schema_for(struct: T.StructType, name: str = "ChangeEvent") -> str:
    """Derive the Avro record schema (as JSON) for a Spark StructType —
    the engine's stand-in for a Schema Registry subject version."""

    import hashlib

    def field_type(dt: T.DataType) -> object:
        if isinstance(dt, T.StructType):
            # deterministic nested-record name: Python's hash() is salted
            # per process, which would change the schema on every run and
            # break Avro name-based resolution against stored .avsc files
            digest = hashlib.md5(dt.simpleString().encode()).hexdigest()[:8]
            return {
                "type": "record",
                "name": f"{name}_{digest}",
                "fields": [
                    {"name": f.name, "type": ["null", field_type(f.dataType)]}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": field_type(dt.elementType)}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        mapping = {
            T.IntegerType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.StringType: "string",
            T.BooleanType: "boolean",
            T.BinaryType: "bytes",
            T.TimestampType: {"type": "long", "logicalType": "timestamp-micros"},
        }
        for cls, avro in mapping.items():
            if isinstance(dt, cls):
                return avro
        raise TypeError(f"no Avro mapping for Spark type {dt.simpleString()}")

    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": f.name, "type": ["null", field_type(f.dataType)]}
                for f in struct.fields
            ],
        }
    )


def encode_avro(df: DataFrame, cols: list[str], avsc: str) -> DataFrame:
    """Frame selected columns as a single Avro ``value`` column (the
    Avro-converter sink role). Raises with guidance if spark-avro is
    absent."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(_AVRO_HINT) from e
    return df.select(to_avro(F.struct(*cols), avsc).alias("value"))


def decode_avro(df: DataFrame, avsc: str, value_col: str = "value") -> Column:
    """Inverse of encode_avro: binary Avro value → typed struct column."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(_AVRO_HINT) from e
    return df.select(from_avro(F.col(value_col), avsc).alias("event"))


_AVRO_HINT = (
    "spark-avro is not on the classpath; restart with "
    "--packages org.apache.spark:spark-avro_2.13:<spark-version>, "
    "or use encode_avro_python/decode_avro_python (pure-Python Avro "
    "binary codec, no extra jars needed)"
)


# ---------------------------------------------------------------------------
# Pure-Python Avro binary codec (offline path).
#
# This container bundles Avro core (avro-1.12.1.jar) but NOT the
# spark-avro Spark SQL module, and no Python avro/fastavro package, so
# from_avro/to_avro cannot load offline. The Avro *binary encoding* is a
# small public spec (Avro 1.12 specification, "Binary encoding": zigzag
# varint longs, length-prefixed bytes/strings, union-index prefixes,
# block-encoded arrays), so the engine implements it directly for the
# schema subset avro_schema_for() emits. Conformance is cross-checked in
# tests against the bundled JVM avro-1.12.1 GenericDatum(Reader|Writer)
# through the Spark gateway — both directions.
# ---------------------------------------------------------------------------


def _codec(avsc: str):
    """Build (encode_record, decode_record) closures for an Avro schema.

    Everything the returned closures touch is defined inside this
    function, so cloudpickle serializes them BY VALUE — Python workers
    never need this repo on their sys.path (same contract as the
    workload Pandas UDFs).

    Supported schema subset (everything avro_schema_for can emit):
    null/boolean/int/long/float/double/string/bytes primitives,
    timestamp-micros longs, decimal bytes, ``["null", T]`` unions,
    arrays, and nested records.
    """
    import struct as _struct
    from datetime import datetime, timedelta
    from decimal import Decimal

    schema = json.loads(avsc)
    _EPOCH = datetime(1970, 1, 1)

    def _is_null(v) -> bool:
        # NaN/NaT are the only scalar values unequal to themselves; the
        # check is type-based so a string field holding the literal text
        # "NaT" is NOT nulled. KNOWN LIMITATION: a genuine NaN double is
        # encoded as Avro null — through pandas/Arrow a null double IS
        # NaN, so the two are indistinguishable on the DataFrame path.
        if v is None:
            return True
        try:
            return bool(v != v)
        except (TypeError, ValueError):  # arrays: elementwise compare
            return False

    def _write_long(out: bytearray, n: int) -> None:
        z = (n << 1) ^ (n >> 63)  # zigzag (Python ints: n>>63 is -1 for n<0)
        while z > 0x7F:
            out.append((z & 0x7F) | 0x80)
            z >>= 7
        out.append(z)

    def _encode(sch, v, out: bytearray) -> None:
        if isinstance(sch, list):  # ["null", T] union
            if _is_null(v):
                _write_long(out, 0)
            else:
                _write_long(out, 1)
                _encode(sch[1], v, out)
            return
        if isinstance(sch, dict):
            t, logical = sch.get("type"), sch.get("logicalType")
            if logical == "timestamp-micros":
                if hasattr(v, "to_pydatetime"):
                    v = v.to_pydatetime()
                td = v - _EPOCH
                micros = (
                    td.days * 86_400_000_000
                    + td.seconds * 1_000_000
                    + td.microseconds
                )
                _write_long(out, micros)
                return
            if logical == "decimal":
                unscaled = int(Decimal(v).scaleb(sch["scale"]))
                nbytes = max(1, (unscaled.bit_length() + 8) // 8)
                raw = unscaled.to_bytes(nbytes, "big", signed=True)
                _write_long(out, len(raw))
                out.extend(raw)
                return
            if t == "record":
                for f in sch["fields"]:
                    _encode(f["type"], v[f["name"]], out)
                return
            if t == "array":
                items = list(v)
                if items:
                    _write_long(out, len(items))
                    for item in items:
                        _encode(sch["items"], item, out)
                _write_long(out, 0)
                return
            sch = t  # e.g. {"type": "long"} plain wrapper
        if sch == "null":
            return
        if sch == "boolean":
            out.append(1 if v else 0)
        elif sch in ("int", "long"):
            _write_long(out, int(v))
        elif sch == "float":
            out.extend(_struct.pack("<f", float(v)))
        elif sch == "double":
            out.extend(_struct.pack("<d", float(v)))
        elif sch == "string":
            raw = str(v).encode("utf-8")
            _write_long(out, len(raw))
            out.extend(raw)
        elif sch == "bytes":
            raw = bytes(v)
            _write_long(out, len(raw))
            out.extend(raw)
        else:
            raise TypeError(f"unsupported Avro schema node {sch!r}")

    def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
        z, shift = 0, 0
        while True:
            b = buf[pos]
            pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1), pos

    def _decode(sch, buf: bytes, pos: int):
        if isinstance(sch, list):
            idx, pos = _read_long(buf, pos)
            return _decode(sch[idx], buf, pos)
        if isinstance(sch, dict):
            t, logical = sch.get("type"), sch.get("logicalType")
            if logical == "timestamp-micros":
                micros, pos = _read_long(buf, pos)
                return _EPOCH + timedelta(microseconds=micros), pos
            if logical == "decimal":
                n, pos = _read_long(buf, pos)
                unscaled = int.from_bytes(buf[pos : pos + n], "big", signed=True)
                return Decimal(unscaled).scaleb(-sch["scale"]), pos + n
            if t == "record":
                rec = {}
                for f in sch["fields"]:
                    rec[f["name"]], pos = _decode(f["type"], buf, pos)
                return rec, pos
            if t == "array":
                items = []
                while True:
                    count, pos = _read_long(buf, pos)
                    if count == 0:
                        return items, pos
                    if count < 0:  # block with byte-size prefix
                        _, pos = _read_long(buf, pos)
                        count = -count
                    for _ in range(count):
                        item, pos = _decode(sch["items"], buf, pos)
                        items.append(item)
            sch = t
        if sch == "null":
            return None, pos
        if sch == "boolean":
            return buf[pos] == 1, pos + 1
        if sch in ("int", "long"):
            return _read_long(buf, pos)
        if sch == "float":
            return _struct.unpack_from("<f", buf, pos)[0], pos + 4
        if sch == "double":
            return _struct.unpack_from("<d", buf, pos)[0], pos + 8
        if sch == "string":
            n, pos = _read_long(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n
        if sch == "bytes":
            n, pos = _read_long(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n
        raise TypeError(f"unsupported Avro schema node {sch!r}")

    def encode_record(value: dict) -> bytes:
        out = bytearray()
        _encode(schema, value, out)
        return bytes(out)

    def decode_record(payload: bytes) -> dict:
        raw = bytes(payload)
        value, pos = _decode(schema, raw, 0)
        if pos != len(raw):
            # Avro binary has no framing: trailing bytes mean the
            # payload was written with a DIFFERENT schema or corrupted —
            # surfacing it here beats silently returning junk
            raise ValueError(
                f"Avro payload has {len(raw) - pos} undecoded trailing "
                "bytes (schema mismatch or corruption)"
            )
        return value

    return encode_record, decode_record


def encode_avro_python(df: DataFrame, cols: list[str], avsc: str) -> DataFrame:
    """``encode_avro`` without spark-avro: Arrow-batched mapInPandas over
    the pure-Python binary codec. Same output contract (single binary
    ``value`` column). Linear in executors, no shuffle."""
    encode_record, _ = _codec(avsc)

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            vals = [
                encode_record(dict(zip(cols, row)))
                for row in zip(*(pdf[c] for c in cols))
            ]
            yield pd.DataFrame({"value": vals})

    return df.select(*cols).mapInPandas(encode_batches, "value binary")


def decode_avro_python(
    df: DataFrame,
    avsc: str,
    spark_schema: T.StructType,
    value_col: str = "value",
    permissive: bool = False,
) -> DataFrame:
    """``decode_avro`` without spark-avro: binary value → typed ``event``
    struct column. ``spark_schema`` is the record's Spark StructType
    (the inverse of avro_schema_for).

    ``permissive=True`` mirrors ``from_json``'s PERMISSIVE mode (the
    engine's JSON decode contract, cdc/decode.py): a malformed record
    yields ``event=NULL`` plus its raw bytes in ``_corrupt`` instead of
    failing the stream — mandatory for a sink reading a topic other
    producers can write garbage to. Default stays strict (fail fast on
    corruption, the spark-avro behavior).

    What counts as malformed: buffer overruns (truncation), trailing
    bytes (schema mismatch — the codec demands full consumption),
    invalid UTF-8, out-of-range union indexes. Unframed binary can't
    catch byte strings that happen to BE a valid encoding of the
    schema — that detection needs a Registry schema-id prefix or a
    checksum, neither of which plain Avro values carry."""
    _, decode_record = _codec(avsc)

    def decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {"event": [decode_record(bytes(b)) for b in pdf[value_col]]}
            )

    def decode_batches_permissive(batches):
        import pandas as pd

        for pdf in batches:
            events, corrupt = [], []
            for b in pdf[value_col]:
                try:
                    events.append(decode_record(bytes(b)))
                    corrupt.append(None)
                except Exception:  # noqa: BLE001 — any decode failure
                    events.append(None)
                    corrupt.append(bytes(b))
            yield pd.DataFrame({"event": events, "_corrupt": corrupt})

    if permissive:
        out_schema = T.StructType(
            [
                T.StructField("event", spark_schema),
                T.StructField("_corrupt", T.BinaryType()),
            ]
        )
        return df.select(value_col).mapInPandas(
            decode_batches_permissive, out_schema
        )
    out_schema = T.StructType([T.StructField("event", spark_schema)])
    return df.select(value_col).mapInPandas(decode_batches, out_schema)
