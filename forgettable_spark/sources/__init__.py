"""Source connectors: driver parquet testdata and event-log projections."""

from forgettable_spark.sources.tables import (
    TABLES,
    load_table,
    load_events,
    load_forget_events,
    events_to_forget_events,
)
from forgettable_spark.sources.txn import (
    CommitConflictError,
    ManifestTable,
    compact_to_table,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_events",
    "load_forget_events",
    "events_to_forget_events",
    "CommitConflictError",
    "ManifestTable",
    "compact_to_table",
]
