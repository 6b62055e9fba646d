from nicefox_graphdb_spark.sources.snapshot import (
    SnapshotScheduler,
    clean_old_snapshots,
    list_snapshots,
    load_snapshot,
    snapshot_graph,
    snapshot_status,
)
from nicefox_graphdb_spark.sources.tpch import load_tpch_graph, read_tables

__all__ = [
    "load_tpch_graph",
    "read_tables",
    "snapshot_graph",
    "SnapshotScheduler",
    "load_snapshot",
    "list_snapshots",
    "clean_old_snapshots",
    "snapshot_status",
]
