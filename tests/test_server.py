"""HTTP server + CLI surface tests (reference routes.ts/auth.ts/cli.ts)."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from nicefox_graphdb_spark.server import create_server


@pytest.fixture(scope="module")
def server(spark):
    httpd, manager = create_server(
        spark, host="127.0.0.1", port=0, api_keys={"sekret"}
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()


def _req(url, payload=None, key=None):
    headers = {"Content-Type": "application/json"}
    if key:
        headers["Authorization"] = f"Bearer {key}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, headers=headers)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_no_auth(server):
    status, body = _req(f"{server}/health")
    assert status == 200 and body["status"] == "ok" and "timestamp" in body


def test_query_roundtrip_with_auth(server):
    status, body = _req(
        f"{server}/query/proj1",
        {"cypher": "CREATE (:P {name: 'a', v: 1})"},
        key="sekret",
    )
    assert status == 200 and body["success"] is True
    status, body = _req(
        f"{server}/query/proj1",
        {
            "cypher": "MATCH (p:P) WHERE p.v = $v RETURN p.name AS name",
            "params": {"v": 1},
        },
        key="sekret",
    )
    assert status == 200
    assert body["data"] == [{"name": "a"}]
    assert body["meta"]["count"] == 1


def test_projects_are_isolated(server):
    status, body = _req(
        f"{server}/query/proj2",
        {"cypher": "MATCH (p:P) RETURN count(*) AS c"},
        key="sekret",
    )
    assert status == 200 and body["data"] == [{"c": 0}]
    status, body = _req(f"{server}/admin/list", key="sekret")
    assert status == 200 and "proj1" in body["data"]["projects"]


def test_auth_rejections(server):
    status, body = _req(f"{server}/query/proj1", {"cypher": "RETURN 1 AS x"})
    assert status == 401 and "Authorization" in body["error"]["message"]
    status, body = _req(
        f"{server}/query/proj1", {"cypher": "RETURN 1 AS x"}, key="wrong"
    )
    assert status == 401 and body["error"]["message"] == "Invalid API key"


def test_bad_requests(server):
    status, body = _req(f"{server}/query/proj1", {"nope": 1}, key="sekret")
    assert status == 400 and "cypher" in body["error"]["message"]
    status, body = _req(
        f"{server}/query/proj1", {"cypher": "MATCH (p:P RETURN p"}, key="sekret"
    )
    assert status == 400 and body["success"] is False
    assert "line" in body["error"]


def test_cli_query_json(capsys, monkeypatch):
    from nicefox_graphdb_spark import cli

    rc = cli.main(["query", "--json", "RETURN 1 + 1 AS two"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["success"] is True and out["data"] == [{"two": 2}]


def test_cli_table_format():
    from nicefox_graphdb_spark.cli import _format_table

    txt = _format_table([{"a": 1, "b": "xy"}, {"a": 22, "b": None}])
    lines = txt.splitlines()
    assert lines[0].split(" | ")[0].strip() == "a"
    assert len(lines) == 4


def test_admin_project_create_wipe_backup(spark, tmp_path):
    import json
    import threading
    import urllib.request

    from nicefox_graphdb_spark.server import create_server

    httpd, mgr = create_server(
        spark, host="127.0.0.1", port=0,
        backup_dir=str(tmp_path / "backups"),
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path):
        req = urllib.request.Request(url + path, method="POST", data=b"")
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def get(path):
        with urllib.request.urlopen(url + path) as r:
            return json.loads(r.read())

    try:
        # create by access (reference routes.ts:110-120)
        assert post("/admin/projects/padmin")["success"] is True
        assert "padmin" in get("/admin/list")["data"]["projects"]
        mgr.engine("padmin").execute("CREATE (:W {k: 1})")
        # wipe clears all data (reference routes.ts:122-135)
        assert post("/admin/wipe/padmin")["success"] is True
        assert mgr.engine("padmin").query(
            "MATCH (n) RETURN count(*) AS c"
        ) == [{"c": 0}]
        # backup writes a snapshot and status reports it
        mgr.engine("padmin").execute("CREATE (:W {k: 2})")
        resp = post("/admin/backup?project=padmin")
        assert resp["success"] is True
        status = get("/admin/backup")["data"]["padmin"]
        assert status["total_snapshots"] == 1
    finally:
        httpd.shutdown()


def test_admin_backup_unconfigured_400(spark):
    import json
    import threading
    import urllib.error
    import urllib.request

    from nicefox_graphdb_spark.server import create_server

    httpd, _ = create_server(spark, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/admin/backup", method="POST", data=b""
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert json.loads(e.read())["error"]["message"].startswith(
                "Backup not configured"
            )
    finally:
        httpd.shutdown()
