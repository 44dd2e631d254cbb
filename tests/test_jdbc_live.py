"""S5 JDBC source (and Spark JDBC write) against a REAL database.

The container bundles Apache Derby (embedded JVM RDBMS,
derby-10.16.1.1.jar in the Spark jars dir), so the actual
``spark.read.format("jdbc")`` code path — connection, dialect, SQL
generation, partitioned parallel read, predicate pushdown — runs
offline, upgrading S5 from "arg-validation only" to live-tested. The
reference's JDBC source/sink connectors (Dockerfile:68-69,
README.md:775-798) talk to Postgres the same way; only the URL/driver
differ.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.streaming.source import read_jdbc_table

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _seed(spark, url: str) -> None:
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE products (id INT PRIMARY KEY, name VARCHAR(50), "
        "stock INT)"
    )
    for i in range(100):
        st.execute(
            f"INSERT INTO products VALUES ({i}, 'prod_{i}', {i * 10})"
        )
    st.close()
    conn.close()


def test_jdbc_partitioned_read_from_live_db(spark, tmp_path):
    url = _derby_url(tmp_path)
    _seed(spark, url)
    df = read_jdbc_table(
        spark,
        url,
        "products",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        driver=DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4  # the parallel-read contract
    assert df.count() == 100
    # Derby folds unquoted DDL identifiers to uppercase — the returned
    # schema mirrors the database's casing, like any JDBC source
    got = {r["ID"]: r["STOCK"] for r in df.collect()}
    assert got[0] == 0 and got[99] == 990

    # predicate + column pushdown reach the generated SQL: the scan node
    # advertises the pushed filter and reads only the pruned columns
    pruned = df.filter(F.col("ID") >= 90).select("ID", "NAME")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ID" in plan
    assert pruned.count() == 10


def test_jdbc_unpartitioned_requires_no_bounds_and_validates(spark, tmp_path):
    url = _derby_url(tmp_path / "v")
    _seed(spark, url)
    # single-partition read works without the quadruple
    df = read_jdbc_table(spark, url, "products", driver=DRIVER)
    assert df.count() == 100
    # ...but a partial quadruple is an explicit error
    with pytest.raises(ValueError, match="partition_column requires"):
        read_jdbc_table(spark, url, "products", partition_column="id")


def test_spark_jdbc_write_round_trip(spark, tmp_path):
    """The K2 JDBC write path (append mode — the auto.create analog:
    Spark derives the DDL from the DataFrame schema)."""
    url = _derby_url(tmp_path / "w")
    src = spark.range(50).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "sink_table")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    back = read_jdbc_table(spark, url, "sink_table", driver=DRIVER)
    assert back.count() == 50
    assert {r["name"] for r in back.filter("id < 3").collect()} == {
        "n0",
        "n1",
        "n2",
    }
