from nicefox_graphdb_spark.sources.tpch import load_tpch_graph, read_tables

__all__ = ["load_tpch_graph", "read_tables"]
