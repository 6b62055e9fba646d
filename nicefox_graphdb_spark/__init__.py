"""nicefox_graphdb_spark — a PySpark-native property-graph analytics engine.

A from-scratch engine with the query capabilities of the LeanGraph reference
(co-l/nicefox-graphdb: openCypher over SQLite, see /root/reference): an
openCypher parser + compiler that targets Spark DataFrames directly, so
Catalyst/Tungsten/AQE do the physical planning, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) that the reference lacks.

Design notes (100 TB scale):
- Property graph is stored as *typed, per-label* columnar tables
  (`GraphCatalog`), not one row-per-entity JSON-bag table like the reference's
  SQLite schema (reference src/db.ts:47-70). Per-label typed columns give
  parquet predicate pushdown, column pruning, and partition pruning for free.
- Cypher compiles straight to DataFrame transformations (no SQL-text IR like
  the reference's translator.ts); Catalyst replaces the reference's hand-rolled
  phase machinery (reference src/executor.ts:1247-1416).
- Traversals: fixed-length patterns are equi-join chains; variable-length
  paths are an iterative BFS with cycle checks and LIMIT-aware early stop
  (reference compiles these to recursive CTEs, src/translator.ts:3300-4244).
"""

from nicefox_graphdb_spark.catalog import EdgeTable, GraphCatalog, NodeTable
from nicefox_graphdb_spark.engine import CypherEngine
from nicefox_graphdb_spark.session import get_spark

__all__ = [
    "CypherEngine",
    "EdgeTable",
    "GraphCatalog",
    "NodeTable",
    "get_spark",
]

__version__ = "0.1.0"
