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


def test_query_response_runtime_error_positions(engine):
    """Compile/runtime errors carry {message, line, column} like parse
    errors (r10, VERDICT r9 #6; reference src/types.ts:55-68)."""
    # semantic: unknown function, located at the call site
    resp = engine.query_response("RETURN frobnicate(1) AS v")
    assert resp["success"] is False
    assert resp["error"]["line"] == 1 and resp["error"]["column"] == 8
    assert "unknown function" in resp["error"]["message"]
    # second line locates correctly
    resp = engine.query_response("MATCH (n:Nation)\nRETURN type(n) AS t")
    assert resp["error"]["line"] == 2 and resp["error"]["column"] == 8
    # errors with no known AST anchor omit the fields rather than lying
    resp = engine.query_response(
        "MATCH (n:Nation) RETURN n.name AS a, n.name AS a"
    )
    assert resp["success"] is False and "message" in resp["error"]


def test_rand_banned_inside_aggregates(engine):
    with pytest.raises(CypherCompileError, match="non-deterministic"):
        engine.query("MATCH (n:Nation) RETURN collect(rand()) AS xs")
    with pytest.raises(CypherCompileError, match="non-deterministic"):
        engine.query("MATCH (n:Nation) RETURN sum(n.nationkey + rand()) AS s")
    # outside aggregates rand() is fine
    rows = engine.query("RETURN rand() >= 0 AS ok")
    assert rows == [{"ok": True}]


# -- remote transport: the same client surface over HTTP (reference
# TEST_MODE=remote re-runs its e2e suite through src/remote.ts;
# test/utils.ts:7-49) ------------------------------------------------------


@pytest.fixture(scope="module")
def remote(spark):
    import threading

    from nicefox_graphdb_spark.remote import RemoteEngine
    from nicefox_graphdb_spark.server import create_server

    httpd, _ = create_server(
        spark, host="127.0.0.1", port=0, api_keys={"sekret"}
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield RemoteEngine(url, project="remote_suite", api_key="sekret")
    httpd.shutdown()


def test_remote_health_and_roundtrip(remote):
    assert remote.health()["status"] == "ok"
    remote.query("CREATE (:P {name: 'a', v: 1})")
    remote.query("CREATE (:P {name: 'b', v: 2})")
    rows = remote.query(
        "MATCH (p:P) WHERE p.v >= $min RETURN p.name AS name ORDER BY name",
        {"min": 1},
    )
    assert rows == [{"name": "a"}, {"name": "b"}]


def test_remote_query_response_envelope(remote):
    resp = remote.query_response("MATCH (p:P) RETURN count(*) AS c")
    assert resp["success"] is True
    assert resp["meta"]["count"] == 1
    assert resp["meta"]["time_ms"] >= 0
    assert resp["data"] == [{"c": 2}]


def test_remote_syntax_error_envelope(remote):
    from nicefox_graphdb_spark.remote import RemoteQueryError

    resp = remote.query_response("MATCH (p:P\nRETURN p")
    assert resp["success"] is False
    assert resp["error"]["line"] >= 1
    with pytest.raises(RemoteQueryError) as ei:
        remote.query("MATCH (p:P\nRETURN p")
    assert ei.value.line >= 1


def test_remote_execute_alias_and_projects(remote):
    assert remote.execute("RETURN 1 + 1 AS two") == [{"two": 2}]
    assert "remote_suite" in remote.list_projects()


def test_remote_auth_rejected(remote):
    from nicefox_graphdb_spark.remote import (
        RemoteEngine,
        RemoteTransportError,
    )

    bad = RemoteEngine(remote.base, project="x", api_key="wrong")
    with pytest.raises(RemoteTransportError):
        bad.query("RETURN 1 AS x")


def test_remote_projects_isolated(remote):
    from nicefox_graphdb_spark.remote import RemoteEngine

    other = RemoteEngine(
        remote.base, project="other_project", api_key="sekret"
    )
    assert other.query("MATCH (p:P) RETURN count(*) AS c") == [{"c": 0}]


def test_remote_cli_query_url(remote, capsys):
    from nicefox_graphdb_spark.cli import main

    rc = main(
        [
            "query",
            "RETURN 40 + 2 AS answer",
            "--url",
            remote.base,
            "--project",
            "remote_suite",
            "--api-key",
            "sekret",
            "--json",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    import json as _json

    envelope = _json.loads(out)
    assert envelope["success"] is True and envelope["data"] == [{"answer": 42}]


# -- convenience client surface (reference LeanGraphClient,
# src/types.ts:92-166, src/local.ts:86-167) --------------------------------


@pytest.fixture()
def wengine(spark):
    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.catalog import GraphCatalog

    return CypherEngine(spark, GraphCatalog(spark), mutable=True)


def test_create_get_update_delete_node(wengine):
    nid = wengine.create_node("Person", {"name": "Ada", "age": 36})
    assert isinstance(nid, str) and nid
    got = wengine.get_node("Person", {"name": "Ada"})
    assert got is not None and got["age"] == 36
    wengine.update_node(nid, {"age": 37, "title": "eng"})
    got = wengine.get_node("Person", {"name": "Ada"})
    assert got["age"] == 37 and got["title"] == "eng"
    assert wengine.get_node("Person", {"name": "Nobody"}) is None
    wengine.delete_node(nid)
    assert wengine.get_node("Person", {"name": "Ada"}) is None


def test_create_edge_and_execute(wengine):
    a = wengine.create_node("P", {"k": 1})
    b = wengine.create_node("P", {"k": 2})
    wengine.create_edge(a, "KNOWS", b, {"since": 2020})
    rows = wengine.query(
        "MATCH (x:P)-[r:KNOWS]->(y:P) RETURN x.k AS a, r.since AS s, y.k AS b"
    )
    assert rows == [{"a": 1, "s": 2020, "b": 2}]
    # MERGE semantics: a second create_edge with the same shape is a no-op
    wengine.create_edge(a, "KNOWS", b, {"since": 2020})
    assert wengine.query(
        "MATCH (:P)-[r:KNOWS]->(:P) RETURN count(r) AS c"
    ) == [{"c": 1}]
    wengine.execute("MATCH (x:P {k: 1}) SET x.seen = true")
    assert wengine.query("MATCH (x:P {k: 1}) RETURN x.seen AS s") == [{"s": True}]
    # detach delete via client surface removes the edge too
    wengine.delete_node(a)
    assert wengine.query(
        "MATCH ()-[r:KNOWS]->() RETURN count(r) AS c"
    ) == [{"c": 0}]


def test_client_ops_reject_hostile_identifiers(wengine):
    with pytest.raises(ValueError):
        wengine.create_node("Person) DETACH DELETE (m", {})
    with pytest.raises(ValueError):
        wengine.create_node("Person", {"a: 1} SET n.x": 2})
    assert wengine.health()["status"] == "ok"


def test_remote_convenience_surface(remote):
    nid = remote.create_node("RC", {"name": "bob"})
    assert remote.get_node("RC", {"name": "bob"}) is not None
    remote.update_node(nid, {"name": "rob"})
    assert remote.get_node("RC", {"name": "rob"}) is not None
    remote.delete_node(nid)
    assert remote.get_node("RC", {"name": "rob"}) is None


# -- project admin + per-project API keys (reference cli.ts
# create/delete/list/wipe/clone/apikey; auth.ts:8-16 restriction) -----------


def test_project_admin_roundtrip(tmp_path):
    from nicefox_graphdb_spark import projects as pj
    from nicefox_graphdb_spark.cli import main as cli_main

    data = str(tmp_path / "projects")
    assert cli_main(["create", "alpha", "--data", data, "--no-key"]) == 0
    assert cli_main(["create", "alpha", "--data", data, "--no-key"]) == 1
    assert cli_main(["create", "beta", "--data", data, "--no-key"]) == 0
    assert [p.name for p in pj.list_projects(data)] == ["alpha", "beta"]
    assert cli_main(["clone", "alpha", "gamma", "--data", data]) == 0
    assert cli_main(["wipe", "beta", "--data", data]) == 0
    assert cli_main(["delete", "alpha", "--data", data]) == 0
    assert [p.name for p in pj.list_projects(data)] == ["beta", "gamma"]
    # names that would escape the data dir are rejected
    with pytest.raises(ValueError):
        pj.create_project(data, "../evil")


def test_api_key_lifecycle(tmp_path):
    from nicefox_graphdb_spark import projects as pj

    data = str(tmp_path / "projects")
    k1 = pj.add_api_key(data, "alpha")
    k2 = pj.add_api_key(data, None)
    assert len(k1) == 32 and k1 != k2
    keys = pj.load_api_keys(data)
    assert keys[k1] == {"project": "alpha"}
    assert keys[k2] == {"project": None}
    assert pj.remove_api_keys(data, k1[:8]) == 1
    assert k1 not in pj.load_api_keys(data)
    # deleting a project prunes its keys
    pj.create_project(data, "beta")
    k3 = pj.add_api_key(data, "beta")
    pj.delete_project(data, "beta")
    assert k3 not in pj.load_api_keys(data)


def test_server_per_project_key_restriction(spark, tmp_path):
    import threading

    from nicefox_graphdb_spark.remote import RemoteEngine, RemoteTransportError
    from nicefox_graphdb_spark.server import create_server

    keys = {"alphakey": {"project": "alpha"}, "rootkey": {"project": None}}
    httpd, _ = create_server(
        spark, host="127.0.0.1", port=0, api_keys=keys,
        data_dir=str(tmp_path / "pdata"),
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        alpha = RemoteEngine(url, project="alpha", api_key="alphakey")
        assert alpha.query("RETURN 1 AS x") == [{"x": 1}]
        # restricted key on the wrong project → 403, not data
        wrong = RemoteEngine(url, project="beta", api_key="alphakey")
        with pytest.raises(Exception):
            wrong.query("RETURN 1 AS x")
        # unrestricted key reaches both
        root = RemoteEngine(url, project="beta", api_key="rootkey")
        assert root.query("RETURN 1 AS x") == [{"x": 1}]
        # durable: alpha's writes live under data_dir and survive a fresh
        # manager (same path re-opened)
        alpha.execute("CREATE (:D {k: 1})")
        assert alpha.query("MATCH (d:D) RETURN count(*) AS c") == [{"c": 1}]
    finally:
        httpd.shutdown()
