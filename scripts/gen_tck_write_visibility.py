"""Generate tests/tck/features/write_visibility_matrix.feature.

Clause-to-clause WRITE VISIBILITY: a write clause's effects must be seen
by every LATER clause of the same query (openCypher linear-composition
semantics; the reference executes clauses sequentially against live
SQLite state, src/executor.ts merge/create interpreters) — and row
cardinality must multiply correctly (a write under k rows runs k times;
a MATCH after a write re-expands over the post-write graph).

Expected values come from an INDEPENDENT row-by-row simulator over plain
python dicts (below), not from the engine — the feature is an oracle.

Covers: CREATE/MERGE/SET/REMOVE/DELETE/DETACH DELETE followed by MATCH /
OPTIONAL MATCH / aggregating RETURN in the SAME query; UNWIND-driven
writes; CREATE-then-MERGE same key; DELETE-then-CREATE same key; and the
same reads as a SEPARATE next query (durability of the visibility).
"""

from __future__ import annotations

import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "tck", "features",
    "write_visibility_matrix.feature",
)

SEED = (
    "      CREATE (a:N {k: 1, v: 10}), (:N {k: 2, v: 20}), (m:M {k: 3}),\n"
    "             (a)-[:R]->(m)\n"
)


# --------------------------------------------------------------- simulator
class G:
    """Tiny property-graph state: nodes {id: (set(labels), dict props)},
    edges [(eid, src, type, dst)]."""

    def __init__(self) -> None:
        self.nodes: dict[int, tuple[set, dict]] = {}
        self.edges: list[tuple[int, int, str, int]] = []
        self._next = 100

    def seed(self) -> "G":
        self.nodes[1] = ({"N"}, {"k": 1, "v": 10})
        self.nodes[2] = ({"N"}, {"k": 2, "v": 20})
        self.nodes[3] = ({"M"}, {"k": 3})
        self.edges.append((1, 1, "R", 3))
        return self

    def create(self, labels: set, props: dict) -> int:
        self._next += 1
        self.nodes[self._next] = (set(labels), dict(props))
        return self._next

    def match(self, label: str | None, props: dict) -> list[int]:
        out = []
        for nid, (ls, ps) in sorted(self.nodes.items()):
            if label is not None and label not in ls:
                continue
            if all(ps.get(k) == v for k, v in props.items()):
                out.append(nid)
        return out

    def delete(self, nid: int, detach: bool) -> str | None:
        incident = [e for e in self.edges if e[1] == nid or e[3] == nid]
        if incident and not detach:
            return "error"
        self.edges = [e for e in self.edges if e[1] != nid and e[3] != nid]
        self.nodes.pop(nid, None)
        return None


# Clauses are (kind, *args) tuples; rows are lists of {var: node_id} dicts.
def run(clauses, g: "G | None" = None) -> tuple[list, "G", str | None]:
    g = g if g is not None else G().seed()
    rows: list[dict] = [{}]
    for cl in clauses:
        kind = cl[0]
        if kind == "match":
            _, var, label, props = cl
            nxt = []
            for r in rows:
                for nid in g.match(label, props):
                    nr = dict(r)
                    nr[var] = nid
                    nxt.append(nr)
            rows = nxt
        elif kind == "optmatch":
            _, var, label, props = cl
            nxt = []
            for r in rows:
                hits = g.match(label, props)
                if hits:
                    for nid in hits:
                        nr = dict(r)
                        nr[var] = nid
                        nxt.append(nr)
                else:
                    nr = dict(r)
                    nr[var] = None
                    nxt.append(nr)
            rows = nxt
        elif kind == "unwind":
            _, var, values = cl
            rows = [dict(r, **{var: ("val", v)}) for r in rows for v in values]
        elif kind == "create":
            _, var, labels, props = cl
            for r in rows:
                nid = g.create(labels, props)
                if var:
                    r[var] = nid
        elif kind == "create_k_from_unwind":
            # CREATE (:L {k: i}) where i is the unwind variable
            _, labels, key, uvar = cl
            for r in rows:
                g.create(labels, {key: r[uvar][1]})
        elif kind == "merge":
            # per-row sequential MERGE: first unmatched row creates, later
            # rows see the creation (Neo4j executes MERGE once per row)
            _, var, label, props = cl
            nxt = []
            for r in rows:
                hits = g.match(label, props)
                if not hits:
                    hits = [g.create({label}, props)]
                for nid in hits:
                    nr = dict(r)
                    if var:
                        nr[var] = nid
                    nxt.append(nr)
            rows = nxt
        elif kind == "set":
            _, var, key, value = cl
            for r in rows:
                if r.get(var) is not None:
                    g.nodes[r[var]][1][key] = value
        elif kind == "remove":
            _, var, key = cl
            for r in rows:
                if r.get(var) is not None:
                    g.nodes[r[var]][1].pop(key, None)
        elif kind == "delete":
            _, var, detach = cl
            for r in rows:
                nid = r.get(var)
                if nid is not None and nid in g.nodes:
                    if g.delete(nid, detach) == "error":
                        return [], g, "error"
        elif kind == "with_count":
            _, alias = cl
            rows = [{alias: ("val", len(rows))}]
        else:  # pragma: no cover
            raise AssertionError(kind)
    return rows, g, None


def agg(rows: list, g: G, what: str):
    if what == "count":
        return len(rows)
    if what.startswith("sum:"):
        var, key = what[4:].split(".")
        tot, any_ = 0, False
        for r in rows:
            nid = r.get(var)
            if nid is not None and key in g.nodes[nid][1]:
                tot += g.nodes[nid][1][key]
                any_ = True
        return tot if any_ else None
    raise AssertionError(what)


# ----------------------------------------------------------------- emission
def fmt(v) -> str:
    if v is None:
        return "null"
    return str(v)


SCENARIOS: list[str] = []


def emit(title: str, queries: list[str], final: str, header: list[str],
         rows: list[list]) -> None:
    out = [f"  Scenario: {title}", "    Given an empty graph",
           "    And having executed:", '      """', SEED.rstrip(), '      """']
    for q in queries:
        out += ["    And having executed:", '      """', f"      {q}", '      """']
    out += ["    When executing query:", '      """', f"      {final}", '      """',
            "    Then the result should be, in any order:",
            "      | " + " | ".join(header) + " |"]
    for r in rows:
        out.append("      | " + " | ".join(fmt(v) for v in r) + " |")
    SCENARIOS.append("\n".join(out))


def emit_error(title: str, queries: list[str], final: str) -> None:
    out = [f"  Scenario: {title}", "    Given an empty graph",
           "    And having executed:", '      """', SEED.rstrip(), '      """']
    for q in queries:
        out += ["    And having executed:", '      """', f"      {q}", '      """']
    out += ["    When executing query:", '      """', f"      {final}", '      """',
            "    Then an error should be raised"]
    SCENARIOS.append("\n".join(out))


# each case: (slug, cypher write prefix, simulator clauses for the prefix)
WRITES = [
    ("create node", "CREATE (:N {k: 9, v: 90})",
     [("create", None, {"N"}, {"k": 9, "v": 90})]),
    ("create under rows", "MATCH (x:N) CREATE (:N {k: 9, v: 90})",
     [("match", "x", "N", {}),
      ("create", None, {"N"}, {"k": 9, "v": 90})]),
    ("merge existing", "MERGE (n:N {k: 2})",
     [("merge", "n", "N", {"k": 2})]),
    ("merge creating", "MERGE (n:N {k: 9})",
     [("merge", "n", "N", {"k": 9})]),
    ("set", "MATCH (n:N {k: 1}) SET n.v = 99",
     [("match", "n", "N", {"k": 1}), ("set", "n", "v", 99)]),
    ("remove prop", "MATCH (n:N {k: 1}) REMOVE n.v",
     [("match", "n", "N", {"k": 1}), ("remove", "n", "v")]),
    ("delete leaf", "MATCH (n:N {k: 2}) DELETE n",
     [("match", "n", "N", {"k": 2}), ("delete", "n", False)]),
    ("detach delete hub", "MATCH (n:N {k: 1}) DETACH DELETE n",
     [("match", "n", "N", {"k": 1}), ("delete", "n", True)]),
]

READS = [
    ("count", "MATCH (m:N) RETURN count(*) AS c", "count",
     [("match", "m", "N", {})], ["c"]),
    ("sum", "MATCH (m:N) RETURN sum(m.v) AS s", "sum:m.v",
     [("match", "m", "N", {})], ["s"]),
    ("optional count", "OPTIONAL MATCH (m:N {k: 9}) RETURN count(m) AS c",
     "count_nonnull", [("optmatch", "m", "N", {"k": 9})], ["c"]),
]


def read_value(rows, g, mode, read_clauses):
    rrows, g2, err = rows, g, None
    if mode == "count":
        return agg(rrows, g2, "count")
    if mode == "sum:m.v" or mode.startswith("sum:"):
        return agg(rrows, g2, mode)
    if mode == "count_nonnull":
        return sum(1 for r in rrows if r.get("m") is not None)
    raise AssertionError(mode)


def main() -> None:
    # --- same-query visibility: write prefix + read suffix ----------------
    for wslug, wcy, wsim in WRITES:
        for rslug, rcy, rmode, rsim, header in READS:
            rows, g, err = run(wsim + rsim)
            assert err is None, (wslug, rslug)
            v = read_value(rows, g, rmode, rsim)
            # WITH bridges the write to the read (Neo4j requires WITH
            # between a write clause and MATCH); non-aggregating, so row
            # cardinality is preserved
            emit(
                f"{wslug} then same-query {rslug}",
                [],
                f"{wcy} WITH 1 AS one {rcy}",
                header,
                [[v]],
            )
            # --- next-query visibility (write committed, read separately:
            # the read starts from a FRESH single row over the post-write
            # graph, so its cardinality is not multiplied by write rows) --
            _, g2, err2 = run(wsim)
            assert err2 is None
            rows3, _, _ = run(rsim, g2)
            v2 = read_value(rows3, g2, rmode, rsim)
            emit(
                f"{wslug} then next-query {rslug}",
                [wcy],
                rcy,
                header,
                [[v2]],
            )

    # --- compound interplay ----------------------------------------------
    rows, g, _ = run([
        ("unwind", "i", [7, 8, 9]),
        ("create_k_from_unwind", {"N"}, "k", "i"),
        ("match", "m", "N", {}),
    ])
    emit(
        "unwind-driven creates multiply a later match",
        [],
        "UNWIND [7, 8, 9] AS i CREATE (:N {k: i}) "
        "WITH i MATCH (m:N) RETURN count(*) AS c",
        ["c"],
        [[agg(rows, g, "count")]],
    )

    rows, g, _ = run([
        ("create", "a", {"N"}, {"k": 9, "v": 90}),
        ("merge", "n", "N", {"k": 9}),
        ("match", "m", "N", {}),
    ])
    emit(
        "merge sees a node created earlier in the same query",
        [],
        "CREATE (a:N {k: 9, v: 90}) MERGE (n:N {k: 9}) "
        "WITH n MATCH (m:N) RETURN count(*) AS c",
        ["c"],
        [[agg(rows, g, "count")]],
    )

    rows, g, _ = run([
        ("match", "n", "N", {"k": 2}),
        ("delete", "n", False),
        ("create", None, {"N"}, {"k": 2, "v": 21}),
        ("match", "m", "N", {"k": 2}),
    ])
    emit(
        "delete then create the same key in one query",
        [],
        "MATCH (n:N {k: 2}) DELETE n CREATE (:N {k: 2, v: 21}) "
        "WITH 1 AS one MATCH (m:N {k: 2}) RETURN count(*) AS c, sum(m.v) AS s",
        ["c", "s"],
        [[agg(rows, g, "count"), agg(rows, g, "sum:m.v")]],
    )

    rows, g, _ = run([
        ("match", "n", "N", {"k": 1}),
        ("set", "n", "v", 99),
        ("match", "m", "N", {}),
    ])
    emit(
        "set is visible to a later match aggregate",
        [],
        "MATCH (n:N {k: 1}) SET n.v = 99 "
        "WITH n MATCH (m:N) RETURN sum(m.v) AS s",
        ["s"],
        [[agg(rows, g, "sum:m.v")]],
    )

    rows, g, _ = run([
        ("match", "n", "N", {"k": 1}),
        ("remove", "n", "v"),
        ("match", "m", "N", {}),
    ])
    emit(
        "remove is visible to a later match aggregate",
        [],
        "MATCH (n:N {k: 1}) REMOVE n.v "
        "WITH n MATCH (m:N) RETURN sum(m.v) AS s",
        ["s"],
        [[agg(rows, g, "sum:m.v")]],
    )

    rows, g, _ = run([
        ("match", "n", "N", {"k": 2}),
        ("delete", "n", False),
        ("optmatch", "m", "N", {"k": 2}),
    ])
    emit(
        "optional match after delete yields a null row",
        [],
        "MATCH (n:N {k: 2}) DELETE n "
        "WITH 1 AS one OPTIONAL MATCH (m:N {k: 2}) "
        "RETURN count(*) AS rows, count(m) AS found",
        ["rows", "found"],
        [[len(rows), sum(1 for r in rows if r.get("m") is not None)]],
    )

    rows, g, _ = run([
        ("unwind", "i", [2, 2, 9]),
        ("merge", "n", "N", {"k": 9}),
        ("match", "m", "N", {}),
    ])
    emit(
        "merge under repeated rows creates once",
        [],
        "UNWIND [2, 2, 9] AS i MERGE (n:N {k: 9}) "
        "WITH i MATCH (m:N) RETURN count(*) AS c",
        ["c"],
        [[agg(rows, g, "count")]],
    )

    rows, g, _ = run([
        ("unwind", "i", [7, 8]),
        ("create_k_from_unwind", {"N"}, "k", "i"),
        ("with_count", "w"),
        ("match", "m", "N", {}),
    ])
    emit(
        "aggregating WITH after a write still sees the write downstream",
        [],
        "UNWIND [7, 8] AS i CREATE (:N {k: i}) "
        "WITH count(*) AS w MATCH (m:N) RETURN w, count(*) AS c",
        ["w", "c"],
        [[2, agg(rows, g, "count")]],
    )

    # --- error parity: plain DELETE with live relationships --------------
    emit_error(
        "plain delete of a node with relationships errors",
        [],
        "MATCH (n:N {k: 1}) DELETE n",
    )
    emit_error(
        "plain delete errors even after removing only one edge end",
        [],
        "MATCH (:N {k: 1})-[r:R]->() DELETE r WITH 1 AS one "
        "MATCH (n:M {k: 3}) CREATE (n)-[:R2]->(n) WITH n DELETE n",
    )

    body = "\n\n".join(SCENARIOS)
    header = (
        "Feature: Write visibility matrix — every clause sees earlier "
        "writes in the same query\n\n"
        "  # Generated by scripts/gen_tck_write_visibility.py; expected\n"
        "  # values come from the generator's independent row-by-row\n"
        "  # simulator, not the engine (openCypher linear composition;\n"
        "  # reference executes clauses sequentially, src/executor.ts).\n\n"
    )
    with open(OUT, "w") as fh:
        fh.write(header + body + "\n")
    print(f"wrote {OUT}: {len(SCENARIOS)} scenarios")


if __name__ == "__main__":
    main()
