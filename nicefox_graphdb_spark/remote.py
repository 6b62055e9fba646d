"""RemoteEngine — HTTP client for a nicefox_graphdb_spark server.

The Python equivalent of the reference's remote transport
(`RemoteLeanGraphClient`, reference src/remote.ts; client interface
src/types.ts:92-167): the same `query` / `execute` / `query_response`
surface as the in-process `CypherEngine`, but speaking the QueryResponse
JSON envelope over HTTP to `server.py` (routes: /health,
POST /query/:project, /admin/list; Bearer auth per src/auth.ts:106-143).

stdlib-only (urllib) — a client must not drag a SparkSession in.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from nicefox_graphdb_spark.client_ops import ClientOps


class RemoteQueryError(Exception):
    """Server-side query failure, carrying the structured error the server
    returned (message + line/column for syntax errors — reference remote.ts
    rethrows the envelope error the same way)."""

    def __init__(self, message: str, line: int | None = None, column: int | None = None):
        super().__init__(message)
        self.message = message
        self.line = line
        self.column = column


class RemoteTransportError(Exception):
    """Network/auth-level failure (non-envelope HTTP error)."""


class RemoteEngine(ClientOps):
    """Drop-in remote counterpart of `CypherEngine`'s client surface.

    >>> eng = RemoteEngine("http://localhost:3000", project="demo",
    ...                    api_key="sekret")
    >>> eng.query("MATCH (n) RETURN count(*) AS c")
    [{'c': 0}]
    """

    def __init__(
        self,
        url: str,
        project: str = "default",
        api_key: str | None = None,
        timeout: float = 60.0,
    ):
        self.base = url.rstrip("/")
        self.project = project
        self.api_key = api_key
        self.timeout = timeout

    # -- transport ---------------------------------------------------------
    def _request(self, method: str, path: str, payload: dict | None = None):
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(
            f"{self.base}{path}", data=data, headers=headers, method=method
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            # envelope errors (400 with success=false) are still JSON
            try:
                return e.code, json.loads(e.read())
            except (json.JSONDecodeError, ValueError):
                raise RemoteTransportError(f"HTTP {e.code}") from e
        except urllib.error.URLError as e:
            raise RemoteTransportError(str(e.reason)) from e

    # -- client surface (reference src/types.ts:92-167) ---------------------
    def query_response(self, cypher: str, params: dict | None = None) -> dict:
        """Full QueryResponse envelope, never raises on query errors."""
        body: dict = {"cypher": cypher}
        if params:
            body["params"] = params
        status, resp = self._request(
            "POST", f"/query/{self.project}", body
        )
        if status in (401, 403):
            # auth failures are transport-level, not query envelopes
            msg = (resp.get("error") or {}).get("message", "unauthorized")
            raise RemoteTransportError(msg)
        if not isinstance(resp, dict) or "success" not in resp:
            raise RemoteTransportError(f"malformed response (HTTP {status})")
        return resp

    def query(self, cypher: str, params: dict | None = None) -> list[dict]:
        """Execute and return rows; raises RemoteQueryError on failure."""
        resp = self.query_response(cypher, params)
        if not resp["success"]:
            err = resp.get("error") or {}
            raise RemoteQueryError(
                err.get("message", "query failed"),
                line=err.get("line"),
                column=err.get("column"),
            )
        return resp["data"]

    execute = query  # reference client API alias

    # -- server admin surface ------------------------------------------------
    def health(self) -> dict:
        status, resp = self._request("GET", "/health")
        if status != 200:
            raise RemoteTransportError(f"health check failed (HTTP {status})")
        return resp

    def list_projects(self) -> list[str]:
        status, resp = self._request("GET", "/admin/list")
        if status != 200 or not resp.get("success"):
            raise RemoteTransportError(f"admin/list failed (HTTP {status})")
        return resp["data"]["projects"]
