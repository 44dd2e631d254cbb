"""Atomic parallel JDBC apply (VERDICT r6 item 3): parallel mode stages
rows from executors, then ONE driver transaction applies stage→target —
a crash between partition writes leaves the target untouched."""

from __future__ import annotations

import os
import sqlite3

import duckdb
import pytest

from olr_cdc_oracle_no_dbz_spark.streaming.jdbc_sink import (
    apply_stage_statements,
    stage_table_name,
    upsert_statement,
    write_batch,
)


def _target_rows(db_path):
    with sqlite3.connect(db_path) as db:
        return db.execute("SELECT id, stock FROM products ORDER BY id").fetchall()


def test_parallel_crash_between_partitions_is_all_or_nothing(spark, tmp_path):
    """Kill the Nth executor connection: earlier partitions have already
    staged their rows, but the target table must be byte-identical to
    its pre-batch state — the driver apply transaction never ran."""
    db_path = str(tmp_path / "atomic.db")
    fail_flag = str(tmp_path / "failures")
    driver_pid = os.getpid()
    with sqlite3.connect(db_path) as db:
        db.execute("CREATE TABLE products (id INT PRIMARY KEY, stock INT)")
        db.execute("INSERT INTO products VALUES (999, 1)")

    def flaky_factory():
        # executor-side only: the injection is keyed on PROCESS IDENTITY
        # (ADVICE r7 — a connection-count key silently stops covering the
        # executor-crash scenario if the driver path ever gains an extra
        # connection before staging). Python workers are separate
        # processes from the driver, so pid != driver_pid isolates stage
        # writers; a lock-protected counter then kills the 3rd executor
        # connection so earlier partitions have already staged.
        import os as _os

        with sqlite3.connect(db_path, timeout=60):
            pass  # ensure db reachable
        if _os.getpid() == driver_pid:
            return sqlite3.connect(db_path, timeout=60)
        import fcntl

        with open(fail_flag + ".cnt", "a+") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            fh.seek(0)
            n = len(fh.read())
            fh.write("x")
        if n == 2:
            raise RuntimeError("injected connection failure")
        return sqlite3.connect(db_path, timeout=60)

    rows = [(i, 100 + i, False) for i in range(1, 41)]
    batch = spark.createDataFrame(rows, "id int, stock int, __deleted boolean")
    with pytest.raises(Exception):
        write_batch(batch, flaky_factory, "products", ["id"], parallelism=4)
    # target untouched
    assert _target_rows(db_path) == [(999, 1)]

    # retry with a healthy factory: stage is re-created (DROP IF EXISTS)
    def factory():
        return sqlite3.connect(db_path, timeout=60)

    n_up, n_del = write_batch(batch, factory, "products", ["id"], parallelism=4)
    assert (n_up, n_del) == (40, 0)
    assert _target_rows(db_path) == [(i, 100 + i) for i in range(1, 41)] + [(999, 1)]
    # stage cleaned up after the apply
    with sqlite3.connect(db_path) as db:
        names = {
            r[0]
            for r in db.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        }
    assert stage_table_name("products") not in names


def test_apply_collapses_duplicate_staged_keys_on_strict_engine():
    """A task retry that dies after its stage-INSERT commit re-stages
    the same rows (ADVICE r7): the apply must collapse the full-row
    duplicates, not error. DuckDB enforces the same 'cannot affect row
    a second time' rule as postgres for multi-hit ON CONFLICT, so it is
    a strict-engine witness for the postgresql dialect."""
    db = duckdb.connect(":memory:")
    db.execute("CREATE TABLE products (id INT PRIMARY KEY, stock INT)")
    db.execute("INSERT INTO products VALUES (1, 0), (999, 1)")
    stage = stage_table_name("products")
    db.execute(
        f"CREATE TABLE {stage} (id INT, stock INT, __deleted BOOLEAN)"
    )
    # partition {1,2 live; 3 tombstone} staged TWICE (retry-after-commit)
    for _ in range(2):
        db.execute(
            f"INSERT INTO {stage} VALUES "
            "(1, 11, false), (2, 22, false), (3, 33, true)"
        )
    for stmt in apply_stage_statements(
        "products", ["id", "stock"], ["id"], "postgresql"
    ):
        db.execute(stmt)
    rows = db.execute("SELECT id, stock FROM products ORDER BY id").fetchall()
    assert rows == [(1, 11), (2, 22), (999, 1)]


def test_all_key_columns_degrade_to_insert_if_absent():
    """Every column a key column ⇒ no updatable payload (ADVICE r7):
    the statements must degrade to insert-if-absent, never render an
    empty assignment list."""
    pg = upsert_statement("t", ["a", "b"], ["a", "b"])
    assert pg.endswith("ON CONFLICT (a, b) DO NOTHING")
    my = upsert_statement("t", ["a", "b"], ["a", "b"], "mysql")
    assert my.startswith("INSERT IGNORE INTO t")
    assert "ON DUPLICATE" not in my
    ansi = upsert_statement("t", ["a", "b"], ["a", "b"], "ansi")
    assert "WHEN MATCHED" not in ansi
    assert "WHEN NOT MATCHED THEN INSERT (a, b)" in ansi

    # staged form executes cleanly on a strict engine
    db = duckdb.connect(":memory:")
    db.execute("CREATE TABLE pairs (a INT, b INT, PRIMARY KEY (a, b))")
    db.execute("INSERT INTO pairs VALUES (1, 1)")
    stage = stage_table_name("pairs")
    db.execute(f"CREATE TABLE {stage} (a INT, b INT, __deleted BOOLEAN)")
    db.execute(
        f"INSERT INTO {stage} VALUES (1, 1, false), (2, 2, false), "
        "(1, 1, false)"
    )
    for stmt in apply_stage_statements("pairs", ["a", "b"], ["a", "b"], "postgresql"):
        db.execute(stmt)
    assert db.execute("SELECT a, b FROM pairs ORDER BY a").fetchall() == [
        (1, 1),
        (2, 2),
    ]
