from nicefox_graphdb_spark.cypher.parser import CypherSyntaxError, parse

__all__ = ["CypherSyntaxError", "parse"]
