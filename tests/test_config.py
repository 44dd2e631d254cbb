"""Config-driven pipeline assembly (config.py): reference-shaped JSON
documents (capture config + sink connector spec) build and run the whole
pipeline."""

from __future__ import annotations

import pytest

from olr_cdc_oracle_no_dbz_spark.config import (
    PipelineConfig,
    apply_sink_config,
    load_capture_config,
    run_pipeline,
)
from tests.conftest import event, product_row, write_tx_file

# Same document SHAPE as scripts/OpenLogReplicator.json:1-55, our own
# values (the engine reads a simulated file feed, not Oracle).
CAPTURE = {
    "version": "1.8.7",
    "source": [
        {
            "alias": "SOURCE",
            "reader": {"type": "online"},
            "format": {"type": "json", "column": 2, "db": 3, "rid": 1, "xid": 1},
            "memory": {"min-mb": 64, "max-mb": 256},
            "filter": {"table": [{"owner": "OLR_DB", "table": "PRODUCT"}]},
        }
    ],
    "target": [
        {
            "alias": "KAFKA_DIRECT",
            "source": "SOURCE",
            "writer": {"type": "kafka", "topic": "oracle.olr.OLR_DB.PRODUCT"},
        }
    ],
}

# Same document shape as the sink connector spec (README.md:775-798).
CONNECTOR = {
    "name": "jdbc-sink-products",
    "config": {
        "topics": "oracle.olr.OLR_DB.PRODUCT",
        "insert.mode": "upsert",
        "pk.mode": "record_key",
        "pk.fields": "ID",
        "delete.enabled": "true",
        "delete.handling.mode": "rewrite",
        "table.name.format": "products",
        "auto.create": "true",
        "auto.evolve": "true",
    },
}


def test_capture_config_mapping():
    cfg = load_capture_config(CAPTURE)
    assert (cfg.owner, cfg.table) == ("OLR_DB", "PRODUCT")
    assert cfg.max_files_per_trigger == 4  # 256 MB / 64
    assert cfg.topic == "oracle.olr.OLR_DB.PRODUCT"
    assert cfg.images == "full"  # column: 2
    changed = load_capture_config(
        {
            "source": [
                {
                    "format": {"type": "json", "column": 0},
                    "filter": {"table": [{"owner": "A", "table": "B"}]},
                }
            ]
        }
    )
    assert changed.images == "changed"


def test_sink_config_mapping():
    cfg = apply_sink_config(load_capture_config(CAPTURE), CONNECTOR)
    assert cfg.sink_table == "products"  # K6 rename
    assert cfg.key_cols == ("id",)
    assert cfg.delete_mode == "rewrite"
    with pytest.raises(ValueError, match="insert.mode"):
        apply_sink_config(
            PipelineConfig("A", "B"), {"config": {"insert.mode": "insert"}}
        )


def test_config_rejects_multi_source_and_non_json():
    with pytest.raises(ValueError, match="one source"):
        load_capture_config({"source": []})
    with pytest.raises(ValueError, match="format.type"):
        load_capture_config(
            {
                "source": [
                    {
                        "format": {"type": "protobuf"},
                        "filter": {"table": [{"owner": "A", "table": "B"}]},
                    }
                ]
            }
        )


def test_config_driven_pipeline_end_to_end(spark, tmp_path):
    """The reference's own protocol (README.md:806-822) through the
    config facade: insert → update → delete materializes per the
    connector's delete.handling.mode."""
    cfg = apply_sink_config(load_capture_config(CAPTURE), CONNECTOR)
    src = str(tmp_path / "src")
    r1 = product_row(1, "Widget", "99.99", 10)
    write_tx_file(src, "tx1.json", [event(100, "c", after=r1)])
    write_tx_file(src, "tx2.json", [event(150, "c", after=product_row(2, "Other"))])
    r1b = dict(r1, price=149.99)
    write_tx_file(src, "tx3.json", [event(200, "u", before=r1, after=r1b)])
    write_tx_file(src, "tx4.json", [event(300, "d", before=r1b)])
    # an event for a foreign table must be filtered by the config allowlist
    write_tx_file(
        src, "tx5.json", [event(400, "c", after=product_row(9, "Drop"), owner="X")]
    )

    query, state = run_pipeline(spark, cfg, src, str(tmp_path / "work"))
    query.awaitTermination(120)

    rows = {r["id"]: r.asDict() for r in state.current(cfg.delete_mode).collect()}
    assert set(rows) == {1, 2}  # rewrite mode keeps the tombstone
    assert rows[1]["__deleted"] is True
    assert rows[2]["__deleted"] is False
    assert state.current("drop").count() == 1
