"""Client-surface parity: QueryResponse envelope and validation nits
(reference src/types.ts:55-68, src/translator.ts:5414-5418)."""

import pytest

from nicefox_graphdb_spark.cypher.expressions import CypherCompileError


def test_query_response_success(engine):
    resp = engine.query_response(
        "MATCH (n:Nation) RETURN n.name AS name ORDER BY name LIMIT 2"
    )
    assert resp["success"] is True
    assert resp["meta"]["count"] == 2 == len(resp["data"])
    assert resp["meta"]["time_ms"] >= 0
    assert "error" not in resp


def test_query_response_syntax_error_line_col(engine):
    resp = engine.query_response("MATCH (n:Nation\nRETURN n")
    assert resp["success"] is False
    assert resp["data"] == [] and resp["meta"]["count"] == 0
    assert resp["error"]["line"] >= 1
    assert "column" in resp["error"]


def test_rand_banned_inside_aggregates(engine):
    with pytest.raises(CypherCompileError, match="non-deterministic"):
        engine.query("MATCH (n:Nation) RETURN collect(rand()) AS xs")
    with pytest.raises(CypherCompileError, match="non-deterministic"):
        engine.query("MATCH (n:Nation) RETURN sum(n.nationkey + rand()) AS s")
    # outside aggregates rand() is fine
    rows = engine.query("RETURN rand() >= 0 AS ok")
    assert rows == [{"ok": True}]
