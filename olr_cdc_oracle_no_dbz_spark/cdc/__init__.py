"""Changelog (CDC) semantics: decode, filter, unwrap, materialize."""

from olr_cdc_oracle_no_dbz_spark.cdc.decode import (
    decode_events,
    filter_source,
    unwrap,
)
from olr_cdc_oracle_no_dbz_spark.cdc.history import (
    merge_into_history,
    publish_history,
    scd2_chain,
)
from olr_cdc_oracle_no_dbz_spark.cdc.materialize import (
    latest_state,
    materialize_state,
    merge_into_state,
    publish,
)

__all__ = [
    "decode_events",
    "filter_source",
    "unwrap",
    "latest_state",
    "materialize_state",
    "merge_into_state",
    "merge_into_history",
    "publish",
    "publish_history",
    "scd2_chain",
]
