"""olr_cdc_oracle_no_dbz_spark — a PySpark-native analytics + CDC engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline ``somatra-dev/olr-cdc-oracle-no-dbz`` (an Oracle →
OpenLogReplicator → Kafka → ksqlDB/Kafka-Connect → Postgres CDC stack),
re-expressed Spark-first:

- change-event ingestion  → Structured Streaming file/Kafka sources
  (reference: scripts/OpenLogReplicator.json:8-13, docker-compose-olr.yml:58-59)
- envelope decode/filter  → ``from_json`` + nested-column projection
  (reference: scripts/OpenLogReplicator.json:15-39)
- continuous queries      → DataFrame / Spark SQL (the ksqlDB role,
  docker-compose-main.yml:112-141)
- current-state sink      → LWW dedup + merge materializer (the JDBC sink
  role, reference README.md:775-798)

plus the driver-mandated LLM-data-pipeline extensions (dedup, similarity
search, multimodal columns, text analysis).

Everything is built on the public Apache Spark DataFrame/SQL API; physical
execution is delegated to Catalyst/Tungsten/AQE. No RDDs in the hot path.
"""

from olr_cdc_oracle_no_dbz_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
