"""CypherEngine — the user-facing query API.

Equivalent of the reference's `LeanGraphClient.query` (reference
src/types.ts:92-167, src/local.ts:47-60) but returning a lazily-evaluated
Spark DataFrame: parse → compile to a DataFrame plan → let Catalyst/AQE
optimize and execute on trigger. `query_rows` mirrors the reference's
row-of-dicts result format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nicefox_graphdb_spark.catalog import GraphCatalog
from nicefox_graphdb_spark.cypher.compiler import CypherToSpark
from nicefox_graphdb_spark.cypher.parser import parse


class CypherEngine:
    def __init__(self, spark: SparkSession, catalog: GraphCatalog, max_hops: int = 12):
        self.spark = spark
        self.catalog = catalog
        self.max_hops = max_hops

    def dataframe(self, cypher: str, params: dict | None = None) -> DataFrame:
        """Compile a Cypher query to a (lazy) DataFrame."""
        q = parse(cypher)
        compiler = CypherToSpark(
            self.spark, self.catalog, params=params, max_hops=self.max_hops
        )
        return compiler.compile_query(q)

    # reference-parity convenience API
    def query(self, cypher: str, params: dict | None = None) -> list[dict]:
        """Execute and return rows as dicts (reference result format)."""
        return [r.asDict(recursive=True) for r in self.dataframe(cypher, params).collect()]

    def explain(self, cypher: str, params: dict | None = None, mode: str = "formatted"):
        self.dataframe(cypher, params).explain(mode)
