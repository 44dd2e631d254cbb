# Draft tests to append to tests/test_property_merge.py (or a new
# tests/test_jdbc_atomic.py): staged atomic parallel apply.

"""Atomic parallel JDBC apply (VERDICT r6 item 3): parallel mode stages
rows from executors, then ONE driver transaction applies stage→target —
a crash between partition writes leaves the target untouched."""

from __future__ import annotations

import sqlite3

import pytest

from olr_cdc_oracle_no_dbz_spark.streaming.jdbc_sink import (
    stage_table_name,
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
    with sqlite3.connect(db_path) as db:
        db.execute("CREATE TABLE products (id INT PRIMARY KEY, stock INT)")
        db.execute("INSERT INTO products VALUES (999, 1)")

    def flaky_factory():
        # executor-side: count connections via a lock-protected file; the
        # 3rd executor connection dies (driver connections use the plain
        # factory path below, so only stage writers are affected)
        import os

        with sqlite3.connect(db_path, timeout=60) as c:
            pass  # ensure db reachable
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
