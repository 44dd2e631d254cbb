"""Engine schemas: the captured table, the change-event envelope, testdata.

Type mapping follows SURVEY.md §1.2, derived from the reference's Oracle DDL
(scripts-db/set-up-orl.sql:194-202) and the OpenLogReplicator output-format
flags actually shipped (scripts/OpenLogReplicator.json:15-26: column:2 db:3
rid:1 schema:7 timestamp-all:1 scn-type:1 xid:1 message:2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# OLR_DB.PRODUCT (scripts-db/set-up-orl.sql:194-202): NUMBER(10) identity PK,
# VARCHAR2(100) NOT NULL, VARCHAR2(500), NUMBER(10,2) NOT NULL, NUMBER(8)
# DEFAULT 0, DATE DEFAULT SYSDATE x2. Oracle DATE carries time → timestamp.
PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("description", T.StringType(), nullable=True),
        T.StructField("price", T.DecimalType(10, 2), nullable=False),
        T.StructField("stock", T.IntegerType(), nullable=True),
        T.StructField("created_date", T.TimestampType(), nullable=True),
        T.StructField("updated_date", T.TimestampType(), nullable=True),
    ]
)

# All-nullable variant used for before/after images inside the envelope
# (a before image exists only for u/d, an after image only for c/u —
# column:2 full images, scripts/OpenLogReplicator.json:16; supplemental
# log ALL columns, scripts-db/set-up-orl.sql:216).
_IMAGE_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, nullable=True) for f in PRODUCT_SCHEMA]
)


def change_event_schema(row_schema: T.StructType = _IMAGE_SCHEMA) -> T.StructType:
    """Envelope for one change operation, parameterized by row schema.

    Field-by-field provenance (scripts/OpenLogReplicator.json:15-26):
      scn (scn-type:1), tm (timestamp-all:1), xid (xid:1), db (db:3),
      op c/u/d + begin/commit markers (message:2), rid (rid:1),
      schema_owner/schema_table (schema:7 + the source filter at
      scripts/OpenLogReplicator.json:32-39), before/after (column:2).
    ``seq`` is the intra-transaction apply order.
    """
    img = T.StructType([T.StructField(f.name, f.dataType, True) for f in row_schema])
    return T.StructType(
        [
            T.StructField("scn", T.LongType(), False),
            T.StructField("seq", T.IntegerType(), True),
            T.StructField("tm", T.LongType(), True),
            T.StructField("xid", T.StringType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("op", T.StringType(), False),
            T.StructField("rid", T.StringType(), True),
            T.StructField("schema_owner", T.StringType(), True),
            T.StructField("schema_table", T.StringType(), True),
            T.StructField("before", img, True),
            T.StructField("after", img, True),
        ]
    )


CHANGE_EVENT_SCHEMA = change_event_schema()


def olr_wire_schema(row_schema: T.StructType = _IMAGE_SCHEMA) -> T.StructType:
    """OLR 1.8.7 on-wire JSON envelope: one message per transaction chunk
    with operations nested in a ``payload`` array.

    Shape per the shipped format flags (scripts/OpenLogReplicator.json:
    15-26): transaction header (scn scn-type:1, tm timestamp-all:1, xid
    xid:1, db db:3) + ``payload: [{op, schema: {owner, table}, rid, num,
    before, after}]`` where ``schema`` carries table identity (schema:7)
    and ``num`` is the operation's position in the transaction.
    ``decode_olr_events`` transposes this to the flat per-operation
    envelope (CHANGE_EVENT_SCHEMA) the rest of the engine consumes.
    """
    img = T.StructType([T.StructField(f.name, f.dataType, True) for f in row_schema])
    op_schema = T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField(
                "schema",
                T.StructType(
                    [
                        T.StructField("owner", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("rid", T.StringType(), True),
            T.StructField("num", T.IntegerType(), True),
            T.StructField("before", img, True),
            T.StructField("after", img, True),
        ]
    )
    return T.StructType(
        [
            T.StructField("scn", T.LongType(), False),
            T.StructField("tm", T.LongType(), True),
            T.StructField("xid", T.StringType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("payload", T.ArrayType(op_schema), True),
        ]
    )


OLR_WIRE_SCHEMA = olr_wire_schema()

# Driver-provided star schema + extension tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
