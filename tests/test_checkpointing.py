"""Durable-vs-local lineage truncation (VERDICT r3 item 5): both modes
must produce identical results for the CC fixpoint and the state-table
merge; durable mode must demand a checkpoint dir."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.checkpointing import (
    DURABLE_CONF,
    truncate_lineage,
)
from olr_cdc_oracle_no_dbz_spark.streaming.state import ParquetStateTable
from olr_cdc_oracle_no_dbz_spark.workload import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def durable(spark, tmp_path):
    spark.conf.set(DURABLE_CONF, "true")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    yield
    spark.conf.set(DURABLE_CONF, "false")


def test_durable_requires_checkpoint_dir(spark):
    # setCheckpointDir is irreversible on the shared SparkContext, so if
    # another durable test ran first this assertion CANNOT execute —
    # skip loudly rather than pass vacuously (review r4 finding).
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set on the shared context")
    spark.conf.set(DURABLE_CONF, "true")
    try:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            truncate_lineage(spark.range(3))
    finally:
        spark.conf.set(DURABLE_CONF, "false")


def test_truncate_lineage_value_identical_both_modes(spark, durable):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = truncate_lineage(df)
    assert sorted(r["v"] for r in out.collect()) == [2 * i for i in range(100)]


def test_dedup_clusters_identical_under_durable(spark, durable):
    got = {
        (r["doc_id"], r["cluster_id"], r["n_clustered"])
        for r in queries()["dedup_clusters"](spark, SF_DIR).collect()
    }
    spark.conf.set(DURABLE_CONF, "false")
    base = {
        (r["doc_id"], r["cluster_id"], r["n_clustered"])
        for r in queries()["dedup_clusters"](spark, SF_DIR).collect()
    }
    assert got == base and got


def test_state_merge_identical_under_durable(spark, durable, tmp_path):
    rows = [(i % 7, i, 0, i % 11 == 0, float(i)) for i in range(50)]
    schema = "id int, scn long, seq int, __deleted boolean, val double"

    def run(path):
        st = ParquetStateTable(spark, str(path), key_cols=("id",))
        st.merge_batch(spark.createDataFrame(rows[:30], schema))
        st.merge_batch(spark.createDataFrame(rows[30:], schema))
        return {tuple(r) for r in st.current().select("id", "val").collect()}

    got = run(tmp_path / "durable_state")
    spark.conf.set(DURABLE_CONF, "false")
    base = run(tmp_path / "local_state")
    assert got == base and got
