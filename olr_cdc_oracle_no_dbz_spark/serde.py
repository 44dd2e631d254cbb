"""Serde surface (SURVEY.md §2.3 P6): JSON always, Avro when loaded.

The reference ships JSON on the wire (``format.type: json``,
scripts/OpenLogReplicator.json:15) with an Avro converter + Schema
Registry available but optional (Dockerfile:15-60,
docker-compose-main.yml:179-202). The engine mirrors that: JSON serde
is core (cdc/decode.py + streaming/source.py); Avro works when the
spark-avro module is on the classpath (``--packages
org.apache.spark:spark-avro_2.13:<version>``) and fails with a clear
error when it is not. Versioned ``.avsc`` files on disk play the
Registry's role (SURVEY.md §1.1 item 4).
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
    "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
)
