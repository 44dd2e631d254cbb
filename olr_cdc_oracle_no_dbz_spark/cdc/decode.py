"""Change-event decode / filter / unwrap.

Spark-first re-expression of two reference stages:

1. OpenLogReplicator's JSON emission + source filter
   (scripts/OpenLogReplicator.json:14-39): raw JSON lines → typed envelope
   rows, keep only the allow-listed owner/table.
2. Kafka Connect's ExtractNewRecordState SMT chain (reference
   README.md:792-795): project the flat row image out of the envelope,
   keep tombstones, optionally rewrite deletes with a ``__deleted`` marker.

All of it is declarative DataFrame code — ``from_json`` + nested-column
selects — so Catalyst prunes unread envelope fields at the scan
(nestedSchemaPruning) and pushes the owner/table filter down. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olr_cdc_oracle_no_dbz_spark.schemas import CHANGE_EVENT_SCHEMA, OLR_WIRE_SCHEMA

#: ops that carry a row image. ``message:2`` also emits begin/commit
#: markers (scripts/OpenLogReplicator.json:20) which unwrap() drops.
DML_OPS = ("c", "u", "d")


def decode_events(
    raw: DataFrame,
    schema: T.StructType = CHANGE_EVENT_SCHEMA,
    value_col: str = "value",
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Parse raw JSON change messages into the typed envelope.

    ``raw`` is any DataFrame/stream with a string column ``value_col``
    (a Kafka value or a line from a spooled JSON file — sources S1/S3/S4
    in SURVEY.md §2.1). Corrupt records land in ``_corrupt`` instead of
    failing the stream (the reference's OLR skips unparseable redo the
    same way). ``passthrough_cols`` survive alongside the envelope
    (e.g. the Kafka record key).
    """
    parsed = raw.withColumn("_event", F.from_json(F.col(value_col), schema))
    # PERMISSIVE from_json yields an all-null struct (not NULL) for
    # malformed input — detect corruption via the required `op` field.
    return parsed.select(
        F.col("_event.*"),
        F.when(F.col("_event.op").isNull(), F.col(value_col)).alias("_corrupt"),
        *[F.col(c) for c in passthrough_cols],
    )


def decode_olr_events(
    raw: DataFrame,
    schema: T.StructType = OLR_WIRE_SCHEMA,
    value_col: str = "value",
) -> DataFrame:
    """Parse REAL OLR 1.8.7 wire messages (nested ``payload[]`` array,
    per-op ``schema: {owner, table}`` object) and transpose to the flat
    per-operation envelope — so everything downstream (filter_source,
    unwrap, materialize) is wire-format-agnostic.

    ``seq`` is the operation's position within its transaction message
    (OLR ``num``, falling back to the array index), preserving intra-
    transaction apply order under equal SCN.
    """
    parsed = raw.withColumn("_msg", F.from_json(F.col(value_col), schema))
    exploded = parsed.select(
        "_msg",
        F.when(F.col("_msg.scn").isNull(), F.col(value_col)).alias("_corrupt"),
        F.posexplode_outer("_msg.payload").alias("_pos", "_op"),
    )
    return exploded.select(
        F.col("_msg.scn").alias("scn"),
        F.coalesce(F.col("_op.num"), F.col("_pos") + 1).alias("seq"),
        F.col("_msg.tm").alias("tm"),
        F.col("_msg.xid").alias("xid"),
        F.col("_msg.db").alias("db"),
        F.col("_op.op").alias("op"),
        F.col("_op.rid").alias("rid"),
        F.col("_op.schema.owner").alias("schema_owner"),
        F.col("_op.schema.table").alias("schema_table"),
        F.col("_op.before").alias("before"),
        F.col("_op.after").alias("after"),
        F.col("_corrupt"),
    )


def filter_source(df: DataFrame, owner: str, table: str) -> Column | DataFrame:
    """Source allow-list: keep only one owner/table, drop everything else.

    Mirrors the capture filter (scripts/OpenLogReplicator.json:32-39:
    ``filter.table: [{owner: OLR_DB, table: PRODUCT}]``). Expressed as a
    plain filter so it is pushed into the source scan by Catalyst.
    """
    return df.filter(
        (F.col("schema_owner") == owner) & (F.col("schema_table") == table)
    )


def project_envelope(
    df: DataFrame,
    db: bool = True,
    rid: bool = True,
    xid: bool = True,
    timestamps: bool = True,
    schema_block: bool = True,
    images: str = "full",
) -> DataFrame:
    """Format/verbosity projection (SURVEY.md §2.3 P4): the engine-side
    equivalent of OLR's output-format flags
    (scripts/OpenLogReplicator.json:15-26) — ``db:3`` ↔ ``db=True``,
    ``rid:1`` ↔ ``rid``, ``xid:1`` ↔ ``xid``, ``timestamp-all:1`` ↔
    ``timestamps``, ``schema:7`` ↔ ``schema_block``, ``column:2/0`` ↔
    ``images='full'|'changed'``.

    ``images='changed'`` mirrors ``column:0``: for updates, the after
    image keeps ONLY columns whose value differs from the before image
    (null-safe compare); other ops keep their full image. Everything is
    a plain select, so Catalyst prunes the dropped envelope fields from
    the scan.
    """
    if images not in ("full", "changed"):
        raise ValueError(f"images must be full|changed, got {images!r}")
    drop = []
    if not db:
        drop.append("db")
    if not rid:
        drop.append("rid")
    if not xid:
        drop.append("xid")
    if not timestamps:
        drop.append("tm")
    if not schema_block:
        drop += ["schema_owner", "schema_table"]
    out = df.drop(*drop)
    if images == "changed":
        fields = [f.name for f in df.schema["after"].dataType.fields]
        changed_after = F.struct(
            *[
                F.when(
                    ~F.col(f"after.{c}").eqNullSafe(F.col(f"before.{c}")),
                    F.col(f"after.{c}"),
                ).alias(c)
                for c in fields
            ]
        )
        out = out.withColumn(
            "after",
            F.when(F.col("op") == "u", changed_after).otherwise(F.col("after")),
        )
    return out


def unwrap(
    df: DataFrame,
    mode: str = "rewrite",
    meta_cols: tuple[str, ...] = ("scn", "seq", "op"),
) -> DataFrame:
    """ExtractNewRecordState: flatten the envelope to row columns.

    - inserts/updates project ``after.*``; deletes project ``before.*``
      (full before-images guaranteed by supplemental logging ALL columns,
      scripts-db/set-up-orl.sql:216).
    - ``mode='rewrite'`` adds ``__deleted`` (reference
      ``delete.handling.mode: rewrite`` README.md:795);
      ``mode='drop'`` removes delete rows entirely.
    - begin/commit marker messages (message:2) carry no image and are
      dropped here.
    """
    if mode not in ("rewrite", "drop"):
        raise ValueError(f"unwrap mode must be rewrite|drop, got {mode!r}")
    dml = df.filter(F.col("op").isin(*DML_OPS))
    image = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    row_fields = [f.name for f in df.schema["after"].dataType.fields]
    out = dml.select(
        *[image.getField(c).alias(c) for c in row_fields],
        *[F.col(m) for m in meta_cols],
        (F.col("op") == "d").alias("__deleted"),
    )
    if mode == "drop":
        out = out.filter(~F.col("__deleted")).drop("__deleted")
    return out
