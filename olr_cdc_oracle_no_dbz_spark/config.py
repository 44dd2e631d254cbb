"""Config-driven pipeline assembly — the reference's deployment surface.

The reference defines its entire pipeline as two JSON documents: the
OLR capture config (scripts/OpenLogReplicator.json:1-55 — source reader,
output-format flags, memory caps, owner/table filter, Kafka target) and
the Connect sink connector spec (README.md:775-798 — topics, pk fields,
insert/delete modes, table naming). A user of the reference "switches
engines" by bringing those documents; this module accepts the same
shapes and assembles the Spark pipeline from them, so the migration is
config-translation-free.

Mapping (reference key → engine setting):

- ``source[0].filter.table[0]`` owner/table → source allowlist (P1;
  scripts/OpenLogReplicator.json:32-39)
- ``source[0].format`` flags → ``project_envelope`` verbosity (P4;
  scripts/OpenLogReplicator.json:15-26): ``db>0, rid, xid,
  timestamp-all, schema>0, column`` (2=full / 0=changed-only images)
- ``source[0].memory.max-mb`` → ``maxFilesPerTrigger`` backpressure
  (ST4; scripts/OpenLogReplicator.json:28-31) at one file per 64 MB
- ``target[0].writer`` type kafka + topic → changelog relay topic (K1;
  scripts/OpenLogReplicator.json:42-53)
- connector ``pk.fields`` → state-table key columns (P3; README.md:790)
- connector ``delete.handling.mode`` rewrite/drop → publish mode (K3;
  README.md:793-795)
- connector ``table.name.format`` + topic → sink table name (K6;
  README.md:791); ``auto.create``/``auto.evolve`` are inherent to
  ``ParquetStateTable`` (K4/K5)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


@dataclass(frozen=True)
class PipelineConfig:
    """Engine-level pipeline spec assembled from reference-shaped JSON."""

    owner: str
    table: str
    format_flags: dict = field(default_factory=dict)
    max_files_per_trigger: int | None = None
    topic: str | None = None
    sink_table: str | None = None
    key_cols: tuple[str, ...] = ("id",)
    delete_mode: str = "drop"

    @property
    def images(self) -> str:
        return "changed" if self.format_flags.get("column", 2) == 0 else "full"


def load_capture_config(olr: dict) -> PipelineConfig:
    """Parse an OLR-shaped capture config (the scripts/OpenLogReplicator
    .json:1-55 document structure) into a :class:`PipelineConfig`."""
    sources = olr.get("source") or []
    if len(sources) != 1:
        raise ValueError(f"exactly one source supported, got {len(sources)}")
    src = sources[0]
    tables = (src.get("filter") or {}).get("table") or []
    if len(tables) != 1:
        raise ValueError(f"exactly one filter.table supported, got {len(tables)}")
    fmt = src.get("format") or {}
    if fmt.get("type", "json") != "json":
        raise ValueError(f"format.type must be json, got {fmt.get('type')!r}")
    max_mb = (src.get("memory") or {}).get("max-mb")
    max_files = max(1, int(max_mb) // 64) if max_mb is not None else None
    targets = olr.get("target") or []
    topic = None
    for tgt in targets:
        writer = tgt.get("writer") or {}
        if writer.get("type") == "kafka":
            topic = writer.get("topic")
    return PipelineConfig(
        owner=tables[0]["owner"],
        table=tables[0]["table"],
        format_flags=dict(fmt),
        max_files_per_trigger=max_files,
        topic=topic,
    )


def apply_sink_config(cfg: PipelineConfig, connector: dict) -> PipelineConfig:
    """Overlay a Connect-sink-shaped connector spec (README.md:775-798
    document structure) onto a capture config."""
    from olr_cdc_oracle_no_dbz_spark.streaming.pipeline import sink_table_name

    c = connector.get("config", connector)
    mode = c.get("insert.mode", "upsert")
    if mode != "upsert":
        raise ValueError(f"insert.mode must be upsert, got {mode!r}")
    delete_enabled = str(c.get("delete.enabled", "true")).lower() == "true"
    handling = c.get("delete.handling.mode", "drop" if delete_enabled else "none")
    delete_mode = "rewrite" if handling == "rewrite" else "drop"
    pk = c.get("pk.fields", "ID")
    topic = c.get("topics", cfg.topic) or cfg.table
    return PipelineConfig(
        owner=cfg.owner,
        table=cfg.table,
        format_flags=cfg.format_flags,
        max_files_per_trigger=cfg.max_files_per_trigger,
        topic=cfg.topic,
        sink_table=sink_table_name(topic, c.get("table.name.format", "${topic}")),
        key_cols=tuple(f.strip().lower() for f in pk.split(",")),
        delete_mode=delete_mode,
    )


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    source_dir: str,
    work_dir: str,
    available_now: bool = True,
) -> tuple[StreamingQuery, "object"]:
    """Assemble and start the configured pipeline: file change-feed →
    decode → owner/table filter → unwrap → keyed state merge. Returns
    ``(query, state_table)``; state and checkpoint live under
    ``work_dir`` named after the sink table (K6)."""
    from olr_cdc_oracle_no_dbz_spark.streaming.pipeline import materialize_stream
    from olr_cdc_oracle_no_dbz_spark.streaming.state import ParquetStateTable

    sink = cfg.sink_table or (cfg.topic or cfg.table.lower())
    state = ParquetStateTable(
        spark, os.path.join(work_dir, f"state-{sink}"), key_cols=cfg.key_cols
    )
    query = materialize_stream(
        spark,
        source_dir,
        state,
        os.path.join(work_dir, f"ckpt-{sink}"),
        owner=cfg.owner,
        table=cfg.table,
        max_files_per_trigger=cfg.max_files_per_trigger,
        available_now=available_now,
    )
    return query, state
