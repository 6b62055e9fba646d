"""Generate tests/tck/features/delete_interplay_matrix.feature.

DELETE / REMOVE × MATCH interplay, the round-6 verdict's last named
uncovered TCK area: edge deletes, node deletes, mixed same-clause deletes
(reference processes DELETE variables in WRITTEN ORDER with a per-variable
dangling check, src/executor.ts:10144-10163 — `DELETE r, n` succeeds,
`DELETE n, r` errors), REMOVE label/prop, row-cardinality multiplication
through a write, and the same read as a separate next query.

Expected values come from an INDEPENDENT row-by-row simulator over plain
python dicts (below), never from the engine — the feature is an oracle.
"""

from __future__ import annotations

import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "tck", "features",
    "delete_interplay_matrix.feature",
)

# seed graph:
#   (a:N {k:1, v:10})-[:R {w:1}]->(m:M {k:3})
#   (b:N {k:2, v:20})-[:R {w:2}]->(m)
#   (m)-[:S {w:9}]->(c:N:Extra {k:4, v:40})
SEED = (
    "      CREATE (a:N {k: 1, v: 10}), (b:N {k: 2, v: 20}),\n"
    "             (c:N:Extra {k: 4, v: 40}), (m:M {k: 3}),\n"
    "             (a)-[:R {w: 1}]->(m), (b)-[:R {w: 2}]->(m),\n"
    "             (m)-[:S {w: 9}]->(c)\n"
)


# --------------------------------------------------------------- simulator
class G:
    def __init__(self) -> None:
        self.nodes: dict[int, tuple[set, dict]] = {}
        self.edges: dict[int, tuple[int, str, int, dict]] = {}

    def seed(self) -> "G":
        self.nodes[1] = ({"N"}, {"k": 1, "v": 10})
        self.nodes[2] = ({"N"}, {"k": 2, "v": 20})
        self.nodes[4] = ({"N", "Extra"}, {"k": 4, "v": 40})
        self.nodes[3] = ({"M"}, {"k": 3})
        self.edges[101] = (1, "R", 3, {"w": 1})
        self.edges[102] = (2, "R", 3, {"w": 2})
        self.edges[103] = (3, "S", 4, {"w": 9})
        return self

    def match_nodes(self, labels: list, props: dict) -> list[int]:
        out = []
        for nid, (ls, ps) in sorted(self.nodes.items()):
            if any(l_ not in ls for l_ in labels):
                continue
            if all(ps.get(k) == v for k, v in props.items()):
                out.append(nid)
        return out

    def match_edges(
        self, etype: str | None, eprops: dict,
        src_labels: list, src_props: dict, dst_labels: list, dst_props: dict,
    ) -> list[tuple[int, int, int]]:
        """(eid, src, dst) for directed (src)-[e]->(dst) pattern matches."""
        out = []
        for eid, (s, t, d, ps) in sorted(self.edges.items()):
            if etype is not None and t != etype:
                continue
            if not all(ps.get(k) == v for k, v in eprops.items()):
                continue
            if s not in self.nodes or d not in self.nodes:
                continue
            sls, sps = self.nodes[s]
            dls, dps = self.nodes[d]
            if any(l_ not in sls for l_ in src_labels):
                continue
            if not all(sps.get(k) == v for k, v in src_props.items()):
                continue
            if any(l_ not in dls for l_ in dst_labels):
                continue
            if not all(dps.get(k) == v for k, v in dst_props.items()):
                continue
            out.append((eid, s, d))
        return out

    def incident(self, nid: int) -> list[int]:
        return [e for e, (s, _, d, _) in self.edges.items() if s == nid or d == nid]


def run(clauses, g: "G | None" = None):
    """Returns (rows, g, err). Rows are {var: ("n", id) | ("e", id) |
    ("val", v) | None}."""
    g = g if g is not None else G().seed()
    rows: list[dict] = [{}]
    for cl in clauses:
        kind = cl[0]
        if kind in ("match_n", "optmatch_n"):
            _, var, labels, props = cl
            nxt = []
            for r in rows:
                hits = g.match_nodes(labels, props)
                if hits:
                    for nid in hits:
                        nxt.append(dict(r, **{var: ("n", nid)}))
                elif kind == "optmatch_n":
                    nxt.append(dict(r, **{var: None}))
            rows = nxt
        elif kind in ("match_e", "optmatch_e"):
            (_, avar, albl, aprops, evar, etype, eprops,
             bvar, blbl, bprops) = cl
            nxt = []
            for r in rows:
                hits = g.match_edges(etype, eprops, albl, aprops, blbl, bprops)
                if hits:
                    for eid, s, d in hits:
                        nr = dict(r)
                        if avar:
                            nr[avar] = ("n", s)
                        if evar:
                            nr[evar] = ("e", eid)
                        if bvar:
                            nr[bvar] = ("n", d)
                        nxt.append(nr)
                elif kind == "optmatch_e":
                    nr = dict(r)
                    for v in (avar, evar, bvar):
                        if v:
                            nr[v] = None
                    nxt.append(nr)
            rows = nxt
        elif kind == "unwind":
            _, var, values = cl
            rows = [dict(r, **{var: ("val", v)}) for r in rows for v in values]
        elif kind == "delete":
            # reference parity: variables processed in WRITTEN order with a
            # per-variable dangling check (executor.ts:10144-10163)
            _, vars_, detach = cl
            for r in rows:
                for var in vars_:
                    ent = r.get(var)
                    if ent is None:
                        continue
                    ekind, eid = ent
                    if ekind == "e":
                        g.edges.pop(eid, None)
                    else:
                        if eid not in g.nodes:
                            continue  # already deleted by an earlier row
                        inc = g.incident(eid)
                        if inc and not detach:
                            return [], g, "error"
                        for e2 in inc:
                            g.edges.pop(e2, None)
                        g.nodes.pop(eid)
        elif kind == "remove_label":
            _, var, label = cl
            for r in rows:
                ent = r.get(var)
                if ent and ent[0] == "n" and ent[1] in g.nodes:
                    g.nodes[ent[1]][0].discard(label)
        elif kind == "remove_prop":
            _, var, key = cl
            for r in rows:
                ent = r.get(var)
                if ent and ent[0] == "n" and ent[1] in g.nodes:
                    g.nodes[ent[1]][1].pop(key, None)
        else:  # pragma: no cover
            raise AssertionError(kind)
    return rows, g, None


# ----------------------------------------------------------------- reads
def read_count_rows(rows, g):
    return len(rows)


def read_count_nonnull(var):
    def f(rows, g):
        return sum(1 for r in rows if r.get(var) is not None)

    return f


def read_sum(var, key):
    # Cypher sum() over zero non-null inputs is 0, not null (Neo4j 3.5)
    def f(rows, g):
        tot = 0
        for r in rows:
            ent = r.get(var)
            if ent and ent[0] == "n" and ent[1] in g.nodes:
                v = g.nodes[ent[1]][1].get(key)
                if v is not None:
                    tot += v
        return tot

    return f


# ----------------------------------------------------------------- emission
SCENARIOS: list[str] = []


def fmt(v) -> str:
    return "null" if v is None else str(v)


def emit(title, pre_queries, final, header, rows):
    out = [f"  Scenario: {title}", "    Given an empty graph",
           "    And having executed:", '      """', SEED.rstrip(), '      """']
    for q in pre_queries:
        out += ["    And having executed:", '      """', f"      {q}", '      """']
    out += ["    When executing query:", '      """', f"      {final}", '      """',
            "    Then the result should be, in any order:",
            "      | " + " | ".join(header) + " |"]
    for r in rows:
        out.append("      | " + " | ".join(fmt(v) for v in r) + " |")
    SCENARIOS.append("\n".join(out))


def emit_error(title, pre_queries, final):
    out = [f"  Scenario: {title}", "    Given an empty graph",
           "    And having executed:", '      """', SEED.rstrip(), '      """']
    for q in pre_queries:
        out += ["    And having executed:", '      """', f"      {q}", '      """']
    out += ["    When executing query:", '      """', f"      {final}", '      """',
            "    Then an error should be raised"]
    SCENARIOS.append("\n".join(out))


# writes: (slug, cypher, sim clauses)
WRITES = [
    ("edge delete", "MATCH (:N {k: 1})-[r:R]->() DELETE r",
     [("match_e", None, ["N"], {"k": 1}, "r", "R", {}, None, [], {}),
      ("delete", ["r"], False)]),
    ("edge delete by prop", "MATCH ()-[r:R {w: 2}]->() DELETE r",
     [("match_e", None, [], {}, "r", "R", {"w": 2}, None, [], {}),
      ("delete", ["r"], False)]),
    ("all-edge delete", "MATCH ()-[r]->() DELETE r",
     [("match_e", None, [], {}, "r", None, {}, None, [], {}),
      ("delete", ["r"], False)]),
    ("detach delete one", "MATCH (n:N {k: 2}) DETACH DELETE n",
     [("match_n", "n", ["N"], {"k": 2}), ("delete", ["n"], True)]),
    ("detach delete hub", "MATCH (n:M) DETACH DELETE n",
     [("match_n", "n", ["M"], {}), ("delete", ["n"], True)]),
    ("detach delete multilabel", "MATCH (n:Extra) DETACH DELETE n",
     [("match_n", "n", ["Extra"], {}), ("delete", ["n"], True)]),
    ("noop delete of unmatched optional",
     "OPTIONAL MATCH (n:N {k: 99}) DELETE n",
     [("optmatch_n", "n", ["N"], {"k": 99}), ("delete", ["n"], False)]),
    ("edge-then-node one clause",
     "MATCH (n:N {k: 1})-[r:R]->() DELETE r, n",
     [("match_e", "n", ["N"], {"k": 1}, "r", "R", {}, None, [], {}),
      ("delete", ["r", "n"], False)]),
    ("remove label", "MATCH (n:Extra) REMOVE n:Extra",
     [("match_n", "n", ["Extra"], {}), ("remove_label", "n", "Extra")]),
    ("remove prop", "MATCH (n:N {k: 1}) REMOVE n.v",
     [("match_n", "n", ["N"], {"k": 1}), ("remove_prop", "n", "v")]),
    ("remove missing prop", "MATCH (n:M) REMOVE n.v",
     [("match_n", "n", ["M"], {}), ("remove_prop", "n", "v")]),
    ("repeated detach delete under unwind",
     "UNWIND [1, 2] AS i MATCH (n:M) DETACH DELETE n",
     [("unwind", "i", [1, 2]), ("match_n", "n", ["M"], {}),
      ("delete", ["n"], True)]),
]

READS = [
    ("n count", "MATCH (x:N) RETURN count(*) AS c",
     [("match_n", "x", ["N"], {})], read_count_rows, ["c"]),
    ("edge count", "OPTIONAL MATCH ()-[e]->() RETURN count(e) AS c",
     [("optmatch_e", None, [], {}, "e", None, {}, None, [], {})],
     read_count_nonnull("e"), ["c"]),
    ("extra-label count", "OPTIONAL MATCH (x:Extra) RETURN count(x) AS c",
     [("optmatch_n", "x", ["Extra"], {})], read_count_nonnull("x"), ["c"]),
    ("r-edge count", "OPTIONAL MATCH ()-[e:R]->() RETURN count(e) AS c",
     [("optmatch_e", None, [], {}, "e", "R", {}, None, [], {})],
     read_count_nonnull("e"), ["c"]),
    ("sum v", "MATCH (x:N) RETURN sum(x.v) AS s",
     [("match_n", "x", ["N"], {})], read_sum("x", "v"), ["s"]),
]


def main() -> None:
    for wslug, wcy, wsim in WRITES:
        for rslug, rcy, rsim, rfn, header in READS:
            # same-query: write rows multiply the read
            rows, g, err = run(wsim + rsim)
            assert err is None, (wslug, rslug)
            emit(f"{wslug} then same-query {rslug}", [],
                 f"{wcy} WITH 1 AS one {rcy}", header, [[rfn(rows, g)]])
            # next-query: fresh single row over the post-write graph
            _, g2, err2 = run(wsim)
            assert err2 is None, wslug
            rows3, _, _ = run(rsim, g2)
            emit(f"{wslug} then next-query {rslug}", [wcy], rcy, header,
                 [[rfn(rows3, g2)]])

    # --- compound flows ---------------------------------------------------
    rows, g, _ = run([
        ("match_e", None, [], {}, "r", None, {}, None, [], {}),
        ("delete", ["r"], False),
        ("match_n", "n", ["M"], {}),
        ("delete", ["n"], False),
        ("optmatch_n", "x", ["M"], {}),
    ])
    emit("plain delete succeeds after all edges deleted earlier in query", [],
         "MATCH ()-[r]->() DELETE r WITH 1 AS one "
         "MATCH (n:M) DELETE n WITH 1 AS one "
         "OPTIONAL MATCH (x:M) RETURN count(x) AS c",
         ["c"], [[read_count_nonnull("x")(rows, g)]])

    rows, g, _ = run([
        ("match_n", "n", ["Extra"], {}),
        ("remove_label", "n", "Extra"),
        ("optmatch_n", "x", ["Extra"], {}),
    ])
    emit("label removed mid-query is invisible to a later label match", [],
         "MATCH (n:Extra) REMOVE n:Extra WITH 1 AS one "
         "OPTIONAL MATCH (x:Extra) RETURN count(x) AS c",
         ["c"], [[read_count_nonnull("x")(rows, g)]])

    rows, g, _ = run([
        ("match_n", "n", ["Extra"], {}),
        ("remove_label", "n", "Extra"),
        ("match_n", "x", ["N"], {}),
    ])
    emit("removing one label keeps the node under its other label", [],
         "MATCH (n:Extra) REMOVE n:Extra WITH 1 AS one "
         "MATCH (x:N) RETURN count(*) AS c, sum(x.v) AS s",
         ["c", "s"],
         [[read_count_rows(rows, g), read_sum("x", "v")(rows, g)]])

    rows, g, _ = run([
        ("match_n", "n", ["N"], {"k": 2}),
        ("delete", ["n"], True),
        ("match_n", "x", ["N"], {}),
        ("remove_prop", "x", "v"),
        ("match_n", "y", ["N"], {}),
    ])
    emit("detach delete then remove across the survivors", [],
         "MATCH (n:N {k: 2}) DETACH DELETE n WITH 1 AS one "
         "MATCH (x:N) REMOVE x.v WITH 1 AS one "
         "MATCH (y:N) RETURN count(*) AS c, sum(y.v) AS s",
         ["c", "s"],
         [[read_count_rows(rows, g), read_sum("y", "v")(rows, g)]])

    # --- error parity: written-order dangling check ------------------------
    emit_error(
        "node-before-edge delete order errors (reference written-order check)",
        [], "MATCH (n:N {k: 1})-[r:R]->() DELETE n, r")
    emit_error(
        "plain delete of a connected node errors even under optional rows",
        [], "OPTIONAL MATCH (n:M) DELETE n")
    emit_error(
        "plain delete errors when only the other endpoint's edges were removed",
        ["MATCH (:N {k: 1})-[r:R]->() DELETE r"],
        "MATCH (n:M) DELETE n")

    body = "\n\n".join(SCENARIOS)
    header = (
        "Feature: DELETE and REMOVE interplay matrix — cardinality, "
        "visibility, written-order parity\n\n"
        "  # Generated by scripts/gen_tck_delete_interplay.py; expected\n"
        "  # values come from the generator's independent row-by-row\n"
        "  # simulator, not the engine. DELETE variable order parity:\n"
        "  # reference checks dangling per-variable in written order\n"
        "  # (src/executor.ts:10144-10163).\n\n"
    )
    with open(OUT, "w") as fh:
        fh.write(header + body + "\n")
    print(f"wrote {OUT}: {len(SCENARIOS)} scenarios")


if __name__ == "__main__":
    main()
