"""Transaction grouping / commit ordering (SURVEY.md §2 A2).

The reference emits begin/commit markers per transaction (``message:2``,
scripts/OpenLogReplicator.json:20) and only committed work ever reaches
the topic — OLR assembles transactions in bounded memory and emits on
COMMIT (set-up-orl.sql:249-261 test protocol). In a replay/batch setting
the engine re-establishes that guarantee itself: DML whose transaction
never committed must not be applied.

Scale shape: one hash join of the DML stream against the (much smaller)
commit-marker set on ``xid`` — broadcastable per micro-batch, AQE picks
the strategy; no window over the full stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olr_cdc_oracle_no_dbz_spark.cdc.decode import DML_OPS


def committed_only(df: DataFrame) -> DataFrame:
    """Keep DML belonging to transactions with a commit marker; stamp
    each row with the transaction's ``commit_scn`` so apply order is
    commit order (the reference's semantics: events carry the COMMIT
    scn). Uncommitted/in-flight transactions are held back entirely.
    """
    commits = (
        df.filter(F.col("op") == "commit")
        .groupBy("xid")
        .agg(F.max("scn").alias("commit_scn"))
    )
    dml = df.filter(F.col("op").isin(*DML_OPS))
    return dml.join(commits, "xid", "inner")


def transaction_summary(df: DataFrame) -> DataFrame:
    """Per-transaction audit view: op counts, scn span, commit flag —
    the Kafka-UI-style monitoring cut of the change stream (ST7)."""
    return df.groupBy("xid").agg(
        F.sum(F.when(F.col("op") == "c", 1).otherwise(0)).alias("n_inserts"),
        F.sum(F.when(F.col("op") == "u", 1).otherwise(0)).alias("n_updates"),
        F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("n_deletes"),
        F.min("scn").alias("first_scn"),
        F.max("scn").alias("last_scn"),
        F.max((F.col("op") == "commit").cast("int")).cast("boolean").alias(
            "committed"
        ),
    )
