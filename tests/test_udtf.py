"""§2.9 UDTF surface: Spark 3.5+ Python user-defined table functions —
the ksqlDB UDTF registration analog. One row in, N rows out, usable
from SQL via ``SELECT * FROM udtf(...)``."""

from __future__ import annotations

import pytest


def test_python_udtf_shingles(spark):
    try:
        from pyspark.sql.functions import lit, udtf
    except ImportError:
        pytest.skip("Python UDTF API not available in this PySpark")

    @udtf(returnType="shingle: string, pos: int")
    class Shingle:
        def eval(self, text: str, k: int):
            words = text.split(" ")
            for i in range(max(len(words) - k + 1, 0)):
                yield " ".join(words[i : i + k]), i

    spark.udtf.register("shingle", Shingle)
    rows = spark.sql(
        "SELECT * FROM shingle('a b c d', 3) ORDER BY pos"
    ).collect()
    assert [(r["shingle"], r["pos"]) for r in rows] == [
        ("a b c", 0),
        ("b c d", 1),
    ]
    # lateral join form: apply the UDTF per input row
    spark.createDataFrame(
        [("x y z",), ("p q",)], "t string"
    ).createOrReplaceTempView("docs")
    n = spark.sql(
        "SELECT d.t, s.shingle FROM docs d, LATERAL shingle(d.t, 2) s"
    ).count()
    assert n == 3  # 2 shingles from 'x y z' + 1 from 'p q'
