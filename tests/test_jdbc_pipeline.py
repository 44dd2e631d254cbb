"""End-to-end §3.2 into a live RDBMS: change stream → LWW compaction →
JDBC upsert/delete sink with mid-stream schema evolution.

This is the reference's materialization path (README.md:775-798:
Connect JDBC sink with insert.mode=upsert, delete.enabled=true,
auto.evolve=true) run for real: a file change-feed drives foreachBatch,
each micro-batch is compacted per key, the sink table is ALTERed when
the batch carries new columns, and tombstones delete. SQLite plays
Postgres (same ON CONFLICT dialect family)."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.cdc.materialize import latest_state
from olr_cdc_oracle_no_dbz_spark.streaming.jdbc_sink import (
    evolve_statements,
    write_batch,
)
from tests.conftest import write_tx_file


def test_change_stream_to_jdbc_sink_with_evolution(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    db_path = str(tmp_path / "sink.db")
    with sqlite3.connect(db_path) as db:
        db.execute(
            "CREATE TABLE products (id INT PRIMARY KEY, stock INT, scn INT, "
            "seq INT)"
        )


    def factory():
        return sqlite3.connect(db_path, timeout=60)

    def apply_batch(batch_df, _bid):
        if batch_df.isEmpty():
            return
        compacted = latest_state(batch_df).withColumn(
            "__deleted", F.col("op") == "d"
        ).drop("op")
        # auto.evolve: ALTER before writing if the batch grew columns
        with sqlite3.connect(db_path, timeout=60) as db:
            current = [r[1] for r in db.execute("PRAGMA table_info(products)")]
            for stmt in evolve_statements(
                "products", current, compacted.schema
            ):
                db.execute(stmt)
        write_batch(compacted, factory, "products", ["id"])

    def drain(schema):
        # the envelope schema is re-derived per run (the schema:7 /
        # infer_evolved_schema contract) — run 2 sees the widened one
        stream = spark.readStream.schema(schema).json(src)
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two inserts + an update winning by (scn, seq)
    write_tx_file(
        src,
        "b1.json",
        [
            '{"id": 1, "stock": 5, "scn": 100, "seq": 1, "op": "c"}',
            '{"id": 2, "stock": 7, "scn": 100, "seq": 2, "op": "c"}',
            '{"id": 1, "stock": 6, "scn": 101, "seq": 1, "op": "u"}',
        ],
    )
    drain("id int, stock int, scn long, seq long, op string")
    with sqlite3.connect(db_path) as db:
        cols = [r[1] for r in db.execute("PRAGMA table_info(products)")]
        got = db.execute(
            "SELECT id, stock FROM products ORDER BY id"
        ).fetchall()
    assert got == [(1, 6), (2, 7)]
    assert "color" not in cols  # nothing evolved yet

    # batch 2: a NEW column appears (color), one delete tombstone
    write_tx_file(
        src,
        "b2.json",
        [
            '{"id": 3, "stock": 9, "color": "blue", "scn": 102, "seq": 1, "op": "c"}',
            '{"id": 2, "scn": 103, "seq": 1, "op": "d"}',
        ],
    )
    drain("id int, stock int, color string, scn long, seq long, op string")
    with sqlite3.connect(db_path) as db:
        got = db.execute(
            "SELECT id, stock, color FROM products ORDER BY id"
        ).fetchall()
    # id=1 predates the color column -> NULL; id=2 deleted; id=3 evolved
    assert got == [(1, 6, None), (3, 9, "blue")]
