"""Shared fixtures: one local SparkSession + OLR-style event builders.

The event builders produce the golden scenario from the reference's own
verification protocol (README.md:806-822 / set-up-orl.sql:249-261):
INSERT → UPDATE → DELETE, each a separately committed transaction with
ascending SCN, serialized as JSON-lines files (FIXTURES.md §2/§5).
"""

from __future__ import annotations

import json
import os

import pytest

from olr_cdc_oracle_no_dbz_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def product_row(
    id: int,
    name: str,
    price: str = "99.99",
    stock: int = 0,
    description: str | None = None,
    ts: str = "2026-01-01 00:00:00",
) -> dict:
    """One OLR_DB.PRODUCT image (FIXTURES.md §1)."""
    return {
        "id": id,
        "name": name,
        "description": description,
        "price": float(price),
        "stock": stock,
        "created_date": ts,
        "updated_date": ts,
    }


def event(
    scn: int,
    op: str,
    after: dict | None = None,
    before: dict | None = None,
    seq: int = 1,
    xid: str | None = None,
    owner: str = "OLR_DB",
    table: str = "PRODUCT",
) -> dict:
    """One change-event envelope row (FIXTURES.md §2)."""
    return {
        "scn": scn,
        "seq": seq,
        "tm": scn * 1_000_000,
        "xid": xid or f"xid-{scn}",
        "db": "ORCLPDB1",
        "op": op,
        "rid": f"AAAR{scn:06d}",
        "schema_owner": owner,
        "schema_table": table,
        "before": before,
        "after": after,
    }


def write_tx_file(directory: str, name: str, events: list[dict | str]) -> str:
    """Write one transaction as a JSON-lines file into the watched dir
    (OLR emits one message batch per committed transaction)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for e in events:
            f.write(e if isinstance(e, str) else json.dumps(e))
            f.write("\n")
    os.rename(tmp, path)  # atomic: the stream never sees half a file
    return path
