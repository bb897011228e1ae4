"""Relational operators over the event-sourced forget-table."""

from forgettable_spark.operators.snapshot import snapshot, incr, incr_events
from forgettable_spark.operators.read_ops import (
    decayed_state,
    get_dist,
    get_field,
    n_most_probable,
    db_size,
    live_distributions,
)
from forgettable_spark.operators.serialize import to_json_payload

__all__ = [
    "snapshot",
    "incr",
    "incr_events",
    "decayed_state",
    "get_dist",
    "get_field",
    "n_most_probable",
    "db_size",
    "live_distributions",
    "to_json_payload",
]
