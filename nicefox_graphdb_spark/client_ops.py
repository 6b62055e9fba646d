"""Convenience client surface shared by the embedded engine and the remote
client — parity with the reference's ``LeanGraphClient`` interface
(reference src/types.ts:92-166, implementations src/local.ts:86-167): thin
Cypher wrappers, so every helper goes through the same compile/execute path
as ``query`` and inherits its atomicity and durability semantics.

Mixed into ``CypherEngine`` and ``RemoteEngine``; requires only a
``query(cypher, params) -> list[dict]`` method on the host class.
"""

from __future__ import annotations

import datetime as _dt

_IDENT_ERR = "label/type must be a plain identifier, got {!r}"


def _ident(name: str) -> str:
    """Labels and relationship types interpolate into Cypher text (they are
    not parameterizable, same as the reference's template strings) — reject
    anything that is not a bare identifier so a hostile label can't smuggle
    clauses."""
    if not name or not (name[0].isalpha() or name[0] == "_") or not all(
        c.isalnum() or c == "_" for c in name
    ):
        raise ValueError(_IDENT_ERR.format(name))
    return name


def _prop_keys(properties: dict) -> list[str]:
    return [_ident(k) for k in properties]


class ClientOps:
    """Reference-parity convenience methods (src/local.ts:86-167)."""

    def execute(self, cypher: str, params: dict | None = None) -> None:
        """Run a mutating query, discarding any returned rows."""
        self.query(cypher, params)

    def create_node(self, label: str, properties: dict | None = None) -> str:
        """CREATE a node, returning its generated id
        (reference src/local.ts:96-107)."""
        props = dict(properties or {})
        body = (
            " {" + ", ".join(f"{k}: ${k}" for k in _prop_keys(props)) + "}"
            if props
            else ""
        )
        rows = self.query(
            f"CREATE (n:{_ident(label)}{body}) RETURN id(n) AS id", props
        )
        return rows[0]["id"] if rows else None

    def create_edge(
        self,
        source_id: str,
        type_: str,
        target_id: str,
        properties: dict | None = None,
    ) -> None:
        """MERGE an edge between two nodes addressed by id
        (reference src/local.ts:109-128)."""
        props = dict(properties or {})
        body = (
            " {" + ", ".join(f"{k}: ${k}" for k in _prop_keys(props)) + "}"
            if props
            else ""
        )
        self.execute(
            "MATCH (source), (target) "
            "WHERE id(source) = $sourceId AND id(target) = $targetId "
            f"MERGE (source)-[:{_ident(type_)}{body}]->(target)",
            {"sourceId": source_id, "targetId": target_id, **props},
        )

    def get_node(self, label: str, filter: dict) -> dict | None:
        """First node of the label matching the property filter, rendered as
        an entity map, or None (reference src/local.ts:130-141)."""
        body = ", ".join(f"{k}: ${k}" for k in _prop_keys(filter))
        rows = self.query(
            f"MATCH (n:{_ident(label)} {{{body}}}) RETURN n LIMIT 1", dict(filter)
        )
        return rows[0]["n"] if rows else None

    def delete_node(self, id: str) -> None:
        """DETACH DELETE by node id (reference src/local.ts:143-145)."""
        self.execute("MATCH (n) WHERE id(n) = $id DETACH DELETE n", {"id": id})

    def update_node(self, id: str, properties: dict) -> None:
        """SET properties on a node addressed by id
        (reference src/local.ts:147-157)."""
        if not properties:
            return
        sets = ", ".join(f"n.{k} = ${k}" for k in _prop_keys(properties))
        self.execute(
            f"MATCH (n) WHERE id(n) = $id SET {sets}",
            {"id": id, **properties},
        )

    def health(self) -> dict:
        """Liveness envelope (reference src/local.ts:159-164)."""
        return {
            "status": "ok",
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }
