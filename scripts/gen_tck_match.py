"""Generate tests/tck/features/match_shape_matrix.feature.

Re-authors the semantic space of the reference's certified MATCH suites
(test/tck/neo4j35-baseline.ts "clauses/match > Match1-9", ~352 scenarios):
every pattern shape (single-hop x direction x type x label, two-hop chains,
triangles) over one fixed graph containing the classic traps — parallel
edges, a self-loop, an unlabeled node, a multi-label node, a cycle.

Expected counts come from an INDEPENDENT brute-force subgraph matcher
below (openCypher semantics: relationship-isomorphism — distinct rel
variables bind distinct edges; nodes may repeat), not from running the
engine — so the feature is an oracle, not a snapshot.
"""

from __future__ import annotations

import itertools
import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "tck", "features",
    "match_shape_matrix.feature",
)

# ------------------------------------------------------------ fixed graph
# node -> set of labels
NODES = {
    1: {"A"},
    2: {"A", "B"},
    3: {"B"},
    4: {"C"},
    5: set(),        # unlabeled
    6: {"A"},
}
# (edge_id, src, type, dst) — includes a parallel edge (e2/e3), a
# self-loop (e5), and a 1→2→3→1 cycle
EDGES = [
    (1, 1, "X", 2),
    (2, 2, "X", 3),
    (3, 2, "X", 3),   # parallel to e2
    (4, 3, "Y", 1),
    (5, 4, "X", 4),   # self-loop
    (6, 1, "Y", 4),
    (7, 5, "Y", 6),
    (8, 6, "X", 1),
]

CREATE = (
    "      CREATE (n1:A {k: 1}), (n2:A:B {k: 2}), (n3:B {k: 3}),\n"
    "             (n4:C {k: 4}), (n5 {k: 5}), (n6:A {k: 6}),\n"
    "             (n1)-[:X]->(n2), (n2)-[:X]->(n3), (n2)-[:X]->(n3),\n"
    "             (n3)-[:Y]->(n1), (n4)-[:X]->(n4), (n1)-[:Y]->(n4),\n"
    "             (n5)-[:Y]->(n6), (n6)-[:X]->(n1)\n"
)


# ------------------------------------------------------- brute-force oracle
def node_ok(n: int, label: str | None) -> bool:
    return label is None or label in NODES[n]


def edge_candidates(src_bound: int | None, typ: str | None,
                    dst_bound: int | None, direction: str):
    """Yield (edge_id, src_node, dst_node) honoring the pattern arrow.
    direction: 'out' = left-[..]->right, 'in' = left<-[..]-right,
    'und' = either."""
    for eid, s, t, d in EDGES:
        if typ is not None and t != typ:
            continue
        orientations = []
        if direction in ("out", "und"):
            orientations.append((s, d))
        if direction in ("in", "und"):
            orientations.append((d, s))
        seen = set()
        for left, right in orientations:
            if (left, right) in seen:
                continue  # self-loop matched once per undirected pattern? no:
            seen.add((left, right))
            if src_bound is not None and left != src_bound:
                continue
            if dst_bound is not None and right != dst_bound:
                continue
            yield (eid, left, right)


def count_chain(hops: list[tuple[str | None, str]],
                labels: list[str | None]) -> int:
    """Count matches of (n0:l0)-[hop0]-(n1:l1)-[hop1]-(n2:l2)... with
    relationship-uniqueness. hops[i] = (type, direction)."""
    total = 0

    def rec(i: int, cur: int, used: frozenset[int]):
        nonlocal total
        if i == len(hops):
            total += 1
            return
        typ, direction = hops[i]
        for eid, left, right in edge_candidates(cur, typ, None, direction):
            if eid in used:
                continue
            if not node_ok(right, labels[i + 1]):
                continue
            rec(i + 1, right, used | {eid})

    for n in NODES:
        if node_ok(n, labels[0]):
            rec(0, n, frozenset())
    return total


def count_triangle(t1, d1, t2, d2, t3, d3) -> int:
    """(a)-[hop1]-(b)-[hop2]-(c)-[hop3]-(a), rel-unique."""
    total = 0
    for e1, a, b in [(e, l, r) for e, l, r in
                     itertools.chain(*[edge_candidates(n, t1, None, d1)
                                       for n in NODES])]:
        for e2, b2, c in edge_candidates(b, t2, None, d2):
            if e2 == e1:
                continue
            for e3, c2, a2 in edge_candidates(c, t3, None, d3):
                if e3 in (e1, e2) or a2 != a:
                    continue
                total += 1
    return total


# ---------------------------------------------------------------- emission
ARROW = {
    "out": ("-", "->"),
    "in": ("<-", "-"),
    "und": ("-", "-"),
}


def rel_text(typ: str | None, direction: str, var: str | None = None) -> str:
    l, r = ARROW[direction]
    body = ""
    if var or typ:
        body = f"[{var or ''}{':' + typ if typ else ''}]"
    return f"{l}{body}{r}"


def scenario(title: str, query: str, count: int) -> str:
    return (
        f"  Scenario: {title}\n"
        "    Given an empty graph\n"
        "    And having executed:\n"
        '      """\n'
        f"{CREATE}"
        '      """\n'
        "    When executing query:\n"
        '      """\n'
        f"{query}"
        '      """\n'
        "    Then the result should be, in any order:\n"
        "      | c |\n"
        f"      | {count} |\n"
    )


def main() -> None:
    parts = [
        "Feature: MATCH shape matrix — single/two-hop/triangle patterns over "
        "a trap graph (reference Match1-9)\n",
        "\n  Generated by scripts/gen_tck_match.py; expected counts from an "
        "independent brute-force rel-isomorphic matcher.\n  Graph traps: "
        "parallel edge, self-loop, unlabeled node, multi-label node, cycle.\n\n",
    ]

    labels = [None, "A", "B", "C"]
    types = [None, "X", "Y"]
    dirs = ["out", "in", "und"]

    # 1) single-hop: label x type x direction x label
    for la, typ, d, lb in itertools.product(labels, types, dirs, labels):
        # skip half of the symmetric duplicates to keep the matrix tight:
        # an 'in' pattern with swapped labels equals an 'out' pattern
        if d == "in" and (la or "", lb or "") >= (lb or "", la or ""):
            continue
        cnt = count_chain([(typ, d)], [la, lb])
        a = f"a{':' + la if la else ''}"
        b = f"b{':' + lb if lb else ''}"
        q = f"      MATCH ({a}){rel_text(typ, d, 'r')}({b})\n" \
            "      RETURN count(*) AS c\n"
        parts.append(
            scenario(
                f"single hop {la or '*'} {rel_text(typ, d)} {lb or '*'}",
                q, cnt,
            )
        )

    # 2) two-hop chains: direction pairs x type pairs, mid-label variants
    type_pairs = [(None, None), ("X", "X"), ("X", "Y"), ("Y", None)]
    for (d1, d2), (t1, t2), lm in itertools.product(
        itertools.product(dirs, dirs), type_pairs, [None, "B"]
    ):
        cnt = count_chain([(t1, d1), (t2, d2)], [None, lm, None])
        m = f"m{':' + lm if lm else ''}"
        q = (
            f"      MATCH (a){rel_text(t1, d1, 'r1')}({m})"
            f"{rel_text(t2, d2, 'r2')}(b)\n"
            "      RETURN count(*) AS c\n"
        )
        parts.append(
            scenario(
                f"two hop {rel_text(t1, d1)} {lm or '*'} {rel_text(t2, d2)}",
                q, cnt,
            )
        )

    # 3) triangles
    tri_cases = [
        ((None, "out"), (None, "out"), (None, "out")),
        ((None, "out"), (None, "out"), (None, "in")),
        (("X", "out"), ("X", "out"), ("Y", "out")),
        ((None, "und"), (None, "und"), (None, "und")),
        (("X", "out"), (None, "und"), (None, "out")),
    ]
    for (t1, d1), (t2, d2), (t3, d3) in tri_cases:
        cnt = count_triangle(t1, d1, t2, d2, t3, d3)
        q = (
            f"      MATCH (a){rel_text(t1, d1, 'r1')}(b)"
            f"{rel_text(t2, d2, 'r2')}(c)"
            f"{rel_text(t3, d3, 'r3')}(a)\n"
            "      RETURN count(*) AS c\n"
        )
        parts.append(
            scenario(
                f"triangle {rel_text(t1, d1)} {rel_text(t2, d2)} "
                f"{rel_text(t3, d3)}",
                q, cnt,
            )
        )

    # 4) repeated node variable: (a)-->(a) self-loop only
    cnt = sum(1 for _e, l, r in
              itertools.chain(*[edge_candidates(n, None, n, "out")
                                for n in NODES]))
    parts.append(
        scenario(
            "repeated node variable matches only the self-loop",
            "      MATCH (a)-[r]->(a)\n      RETURN count(*) AS c\n",
            cnt,
        )
    )

    # 5) same rel variable in two patterns must bind the same edge
    parts.append(
        scenario(
            "comma patterns share node bindings",
            "      MATCH (a:A)-[:X]->(b), (b)-[:X]->(c)\n"
            "      RETURN count(*) AS c\n",
            count_chain([("X", "out"), ("X", "out")], ["A", None, None]),
        )
    )

    out = "".join(parts)
    with open(OUT, "w") as f:
        f.write(out)
    print(f"wrote {OUT}: {out.count('Scenario:')} scenarios")


if __name__ == "__main__":
    main()
