"""Embedded HTTP server — reference client-surface parity
(reference src/routes.ts: /health, POST /query/:project, /admin/list;
src/auth.ts: Bearer-token API keys; src/cli.ts `serve`).

Stdlib-only (http.server): the point is the protocol surface, not a web
framework. One SparkSession serves every project; each project is an
isolated mutable graph (the reference maps projects to SQLite files,
routes.ts:85-95 dbManager.getDatabase).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from nicefox_graphdb_spark.catalog import GraphCatalog
from nicefox_graphdb_spark.engine import CypherEngine


class ProjectManager:
    """Lazily materializes one mutable CypherEngine per project name.

    With ``data_dir`` set, each project opens the DURABLE store at
    ``<data_dir>/<project>`` (the reference's one-SQLite-file-per-project
    layout, routes.ts:85-95) — restarts recover every project's writes.
    Without it, projects are session-scoped in-memory graphs."""

    def __init__(
        self,
        spark: SparkSession,
        data_dir: str | None = None,
        backup_dir: str | None = None,
    ):
        self.spark = spark
        self.data_dir = data_dir
        self.backup_dir = backup_dir
        self._engines: dict[str, CypherEngine] = {}
        self._lock = threading.Lock()

    def engine(self, project: str) -> CypherEngine:
        with self._lock:
            if project not in self._engines:
                data_path = None
                if self.data_dir is not None:
                    from nicefox_graphdb_spark.projects import project_path

                    data_path = project_path(self.data_dir, project)
                self._engines[project] = CypherEngine(
                    self.spark,
                    GraphCatalog(self.spark),
                    mutable=True,
                    data_path=data_path,
                )
            return self._engines[project]

    def register(self, project: str, engine: CypherEngine) -> None:
        with self._lock:
            self._engines[project] = engine

    def list_projects(self) -> list[str]:
        with self._lock:
            names = set(self._engines)
        if self.data_dir is not None:
            from nicefox_graphdb_spark.projects import list_projects

            names.update(p.name for p in list_projects(self.data_dir))
        return sorted(names)


def _make_handler(manager: ProjectManager, api_keys: set[str] | None):
    class Handler(BaseHTTPRequestHandler):
        # quiet the default per-request stderr logging
        def log_message(self, fmt, *args):  # noqa: A003
            pass

        def _json(self, status: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self, project: str | None = None) -> bool:
            """api_keys as a SET authorizes every project; as a DICT
            (key → {"project": name-or-None}) a key with a project
            restriction only reaches that project (reference
            src/auth.ts:8-16, routes.ts:167-176)."""
            if not api_keys:
                return True
            auth = self.headers.get("Authorization", "")
            if not auth:
                self._json(
                    401,
                    {
                        "success": False,
                        "error": {"message": "Missing Authorization header"},
                    },
                )
                return False
            if not auth.startswith("Bearer "):
                self._json(
                    401,
                    {
                        "success": False,
                        "error": {
                            "message": "Authorization header must use Bearer scheme"
                        },
                    },
                )
                return False
            key = auth[7:]
            if key not in api_keys:
                self._json(
                    401,
                    {"success": False, "error": {"message": "Invalid API key"}},
                )
                return False
            if isinstance(api_keys, dict) and project is not None:
                restriction = (api_keys.get(key) or {}).get("project")
                if restriction is not None and restriction != project:
                    self._json(
                        403,
                        {
                            "success": False,
                            "error": {
                                "message": "API key not authorized for project"
                            },
                        },
                    )
                    return False
            return True

        def do_GET(self):  # noqa: N802
            if self.path in ("/health", "/api/health"):
                self._json(
                    200,
                    {
                        "status": "ok",
                        "timestamp": time.strftime(
                            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                        ),
                    },
                )
                return
            if self.path == "/admin/list":
                if not self._authorized():
                    return
                self._json(
                    200,
                    {
                        "success": True,
                        "data": {"projects": manager.list_projects()},
                    },
                )
                return
            if self.path == "/admin/backup":
                if not self._authorized():
                    return
                if manager.backup_dir is None:
                    self._json(
                        400,
                        {
                            "success": False,
                            "error": {
                                "message": "Backup not configured. Set "
                                "backup_dir in server options."
                            },
                        },
                    )
                    return
                from nicefox_graphdb_spark.sources.snapshot import (
                    snapshot_status,
                )

                status = {
                    p: snapshot_status(
                        f"{manager.backup_dir}/{p}"
                    ).__dict__
                    for p in manager.list_projects()
                }
                self._json(200, {"success": True, "data": status})
                return
            self._json(404, {"success": False, "error": {"message": "Not found"}})

        def do_POST(self):  # noqa: N802
            # admin endpoints (reference src/routes.ts:110-139,159-220)
            if self.path.startswith("/admin/projects/"):
                if not self._authorized():
                    return
                project = self.path[len("/admin/projects/"):].strip("/")
                manager.engine(project)  # creating by accessing it
                self._json(
                    200,
                    {"success": True,
                     "message": f"Created database for {project}"},
                )
                return
            if self.path.startswith("/admin/wipe/"):
                if not self._authorized():
                    return
                project = self.path[len("/admin/wipe/"):].strip("/")
                manager.engine(project).execute("MATCH (n) DETACH DELETE n")
                self._json(
                    200,
                    {"success": True,
                     "message": f"Wiped database for {project}"},
                )
                return
            if self.path.startswith("/admin/backup"):
                if not self._authorized():
                    return
                if manager.backup_dir is None:
                    self._json(
                        400,
                        {
                            "success": False,
                            "error": {
                                "message": "Backup not configured. Set "
                                "backup_dir in server options."
                            },
                        },
                    )
                    return
                from urllib.parse import parse_qs, urlparse

                from nicefox_graphdb_spark.sources.snapshot import (
                    snapshot_graph,
                )

                qs = parse_qs(urlparse(self.path).query)
                targets = qs.get("project") or manager.list_projects()
                results = {}
                for p in targets:
                    res = snapshot_graph(
                        manager.engine(p).catalog,
                        f"{manager.backup_dir}/{p}",
                    )
                    results[p] = res.__dict__
                ok = all(r.get("success") for r in results.values())
                self._json(
                    200 if ok else 400, {"success": ok, "data": results}
                )
                return
            if not self.path.startswith("/query/"):
                self._json(404, {"success": False, "error": {"message": "Not found"}})
                return
            project = self.path[len("/query/"):].strip("/")
            if not self._authorized(project):
                return
            length = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(length) or b"")
            except json.JSONDecodeError:
                self._json(
                    400,
                    {"success": False, "error": {"message": "Invalid JSON body"}},
                )
                return
            cypher = body.get("cypher") if isinstance(body, dict) else None
            if not isinstance(cypher, str) or not cypher:
                self._json(
                    400,
                    {
                        "success": False,
                        "error": {"message": "Missing or invalid 'cypher' field"},
                    },
                )
                return
            resp = manager.engine(project).query_response(
                cypher, body.get("params") or None
            )
            self._json(200 if resp["success"] else 400, resp)

    return Handler


def create_server(
    spark: SparkSession,
    host: str = "localhost",
    port: int = 3000,
    api_keys: "set[str] | dict[str, dict] | None" = None,
    manager: ProjectManager | None = None,
    data_dir: str | None = None,
    backup_dir: str | None = None,
) -> tuple[ThreadingHTTPServer, ProjectManager]:
    """Build (but don't start) the HTTP server. Call serve_forever() or use
    `serve()` for the blocking variant. ``api_keys`` is a set (every key
    reaches every project) or a dict key → {"project": name-or-None} with
    per-project restriction; ``data_dir`` makes projects durable stores
    under that directory; ``backup_dir`` enables the /admin/backup
    endpoints (reference serve --backup, routes.ts:141-220)."""
    manager = manager or ProjectManager(
        spark, data_dir=data_dir, backup_dir=backup_dir
    )
    httpd = ThreadingHTTPServer((host, port), _make_handler(manager, api_keys))
    return httpd, manager


def serve(
    spark: SparkSession,
    host: str = "localhost",
    port: int = 3000,
    api_keys: "set[str] | dict[str, dict] | None" = None,
    data_dir: str | None = None,
) -> None:
    httpd, _ = create_server(spark, host, port, api_keys, data_dir=data_dir)
    httpd.serve_forever()
