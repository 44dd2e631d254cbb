#!/usr/bin/env python
"""Local replica of the driver's differential correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, sorted-by-name schema, and an order-insensitive value hash.

CRITICAL (round-2 diagnosis): the driver materializes BOTH sides
through pandas — DuckDB via ``fetchdf()`` and Spark via ``toPandas()``
— before hashing. That coerces dtypes (DuckDB SUM(int)→HUGEIT→float64,
DECIMAL→float64) so a gate that compares ``fetchall()``/``collect()``
values can be green while the driver's is red. This replica therefore
canonicalizes strictly post-pandas values; never switch it back to
``fetchall()``.

Usage: python scripts/check_correctness.py [name_filter ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v) -> str:
    import datetime
    import decimal
    import math

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    try:
        if v is pd.NA:
            return "NULL"
    except Exception:  # noqa: BLE001
        pass
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{_canon(k)}:{_canon(val)}" for k, val in sorted(v.items(), key=lambda kv: str(kv[0]))
        ) + "}"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def _pandas_rows(pdf) -> list[tuple]:
    """Post-pandas row tuples — the dtype-coerced values the driver hashes."""
    return list(pdf.itertuples(index=False, name=None))


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    name_filter = args
    results: dict[str, dict] = {}
    import __spark_entry__ as entry_mod
    from olr_cdc_oracle_no_dbz_spark.session import get_spark

    spark = get_spark("check-correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = _pandas_rows(sdf.toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "err": f"spark: {type(e).__name__}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            results[name] = {"status": "rows_only", "spark_rows": len(srows)}
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = _pandas_rows(res.fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "err": f"duckdb: {type(e).__name__}"}
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # show first differing canonical line for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sl = sorted("\x1f".join(_canon(r[i]) for i in so) for r in srows)
                ol = sorted("\x1f".join(_canon(r[i]) for i in oo) for r in orows)
                for a, b in zip(sl, ol):
                    if a != b:
                        problems.append(f"  spark={a[:200]}")
                        problems.append(f"  duck ={b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            results[name] = {"status": "fail", "err": problems[0]}
            n_fail += 1
        else:
            print(f"pass  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            results[name] = {
                "status": "pass",
                "rows": len(srows),
                # gate wall-clock: Spark AND DuckDB AND pandas
                # materialization, under sweep-concurrent load — NOT a
                # performance number (VERDICT r7 item 8)
                "gate_sec": round(time.time() - t0, 2),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_path:
        import json as _json

        payload = {
            "sf_dir": SF_DIR,
            "timing_note": (
                "gate_sec = differential-gate wall-clock (Spark + DuckDB"
                " + pandas hashing, run under sweep-concurrent load);"
                " comparable only within one sweep, never to bench.py"
                " medians or across rounds (VERDICT r7 item 8)"
            ),
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": n_rowsonly,
            "queries": results,
        }
        with open(json_path, "w") as f:
            _json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
