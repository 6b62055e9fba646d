"""Generate tests/tck/features/error_parity_matrix.feature.

Error-semantics parity: invalid queries must ERROR — with the same
classification the reference gives them — never return rows. Sources of
truth for each rule (cited per section below):

- structured parse errors          reference src/parser.ts:284-293
- MERGE-null rules                 reference src/translator.ts:829-842
- InvalidPropertyType domain       reference src/property-value.ts:1-25,
                                   src/translator.ts:1057-1108
- Neo4j 3.5 semantics the reference's TCK baseline certifies (undefined
  variables, already-declared variables, WITH alias rule, SKIP/LIMIT
  domain, duplicate result columns, aggregation placement, clause order)

Each error scenario is paired, where a legal twin exists, with a positive
scenario asserting the rule does NOT over-fire (e.g. SET n.p = null is
legal removal while MERGE (n {p: null}) is an error).
"""

from __future__ import annotations

import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "tck", "features",
    "error_parity_matrix.feature",
)

SETUP_SMALL = "CREATE (:EA {k: 1}), (:EB {k: 2})"
SETUP_REL = "CREATE (:EA {k: 1})-[:ER {w: 1}]->(:EB {k: 2})"

# (title, setup | None, query, params | None, expect)
# expect: "syntax" | "error" | (columns, rows) positive
CASES: list = []


def err(title, query, setup=None, params=None, syntax=False):
    CASES.append((title, setup, query, params, "syntax" if syntax else "error"))


def ok(title, query, columns, rows, setup=None, params=None):
    CASES.append((title, setup, query, params, (columns, rows)))


# -- A. InvalidPropertyType (property-value.ts:1-25) ------------------------
_BAD_VALUES = [
    ("map literal", "{a: 1}", None),
    ("nested list", "[[1, 2]]", None),
    ("list with null", "[1, null]", None),
    ("param map", "$p", {"p": {"a": 1}}),
    ("param nested list", "$p", {"p": [[1]]}),
    ("param list with null", "$p", {"p": [1, None]}),
]
for vname, vtext, vparams in _BAD_VALUES:
    err(f"create node prop {vname}", f"CREATE (n:EX {{p: {vtext}}})",
        params=vparams)
    err(f"create rel prop {vname}",
        f"CREATE (:EX)-[:ER {{p: {vtext}}}]->(:EY)", params=vparams)
    err(f"set prop {vname}", f"MATCH (n:EA) SET n.p = {vtext}",
        setup=SETUP_SMALL, params=vparams)
    err(f"set plus-eq {vname}", f"MATCH (n:EA) SET n += {{p: {vtext}}}",
        setup=SETUP_SMALL, params=vparams)
    err(f"set replace {vname}", f"MATCH (n:EA) SET n = {{p: {vtext}}}",
        setup=SETUP_SMALL, params=vparams)
    err(f"merge node prop {vname}", f"MERGE (n:EX {{p: {vtext}}})",
        params=vparams)

# null assignment is REMOVAL, not an error (translator.ts:1043-1049)
ok("set null removes property",
   "MATCH (n:EA) SET n.p = null RETURN n.k AS k",
   ["k"], [{"k": "1"}], setup="CREATE (:EA {k: 1, p: 9})")
ok("set plus-eq null removes property",
   "MATCH (n:EA) SET n += {p: null} RETURN n.k AS k",
   ["k"], [{"k": "1"}], setup="CREATE (:EA {k: 1, p: 9})")
ok("set param null removes property",
   "MATCH (n:EA) SET n.p = $v RETURN n.k AS k",
   ["k"], [{"k": "1"}], setup="CREATE (:EA {k: 1, p: 9})",
   params={"v": None})
ok("create null prop is absent",
   "CREATE (n:EX {p: null, k: 1}) RETURN n.p AS p, n.k AS k",
   ["p", "k"], [{"p": "null", "k": "1"}])

# -- B. MERGE-null rules (translator.ts:829-842) ----------------------------
err("merge node null prop", "MERGE (n:EX {p: null})")
err("merge node null param", "MERGE (n:EX {p: $p})", params={"p": None})
err("merge rel null prop",
    "MATCH (a:EA), (b:EB) MERGE (a)-[r:ER {w: null}]->(b)",
    setup=SETUP_SMALL)
err("merge rel null param",
    "MATCH (a:EA), (b:EB) MERGE (a)-[r:ER {w: $w}]->(b)",
    setup=SETUP_SMALL, params={"w": None})
err("merge chain null prop",
    "MERGE (a:EX {k: 1})-[:ER]->(b:EY {p: null})")
ok("merge on-create set null is legal",
   "MERGE (n:EX {k: 1}) ON CREATE SET n.p = null RETURN n.k AS k",
   ["k"], [{"k": "1"}])

# -- C. SKIP/LIMIT domain (Neo4j 3.5: non-negative integers only) ----------
for clause in ("SKIP", "LIMIT"):
    err(f"{clause.lower()} negative literal",
        f"MATCH (n:EA) RETURN n.k AS k {clause} -1", setup=SETUP_SMALL)
    err(f"{clause.lower()} float literal",
        f"MATCH (n:EA) RETURN n.k AS k {clause} 1.5", setup=SETUP_SMALL)
    err(f"{clause.lower()} negative param",
        f"MATCH (n:EA) RETURN n.k AS k {clause} $c", setup=SETUP_SMALL,
        params={"c": -2})
    err(f"{clause.lower()} float param",
        f"MATCH (n:EA) RETURN n.k AS k {clause} $c", setup=SETUP_SMALL,
        params={"c": 2.5})
    err(f"{clause.lower()} string param",
        f"MATCH (n:EA) RETURN n.k AS k {clause} $c", setup=SETUP_SMALL,
        params={"c": "x"})
    err(f"{clause.lower()} boolean literal",
        f"MATCH (n:EA) RETURN n.k AS k {clause} true", setup=SETUP_SMALL)
ok("skip zero limit zero legal",
   "MATCH (n:EA) RETURN n.k AS k SKIP 0 LIMIT 0", ["k"], [],
   setup=SETUP_SMALL)
ok("skip limit int params legal",
   "UNWIND [1,2,3,4] AS x RETURN x SKIP $s LIMIT $l",
   ["x"], [{"x": "2"}, {"x": "3"}], params={"s": 1, "l": 2})

# -- D. Undefined variables (Neo4j: SyntaxError) ---------------------------
_UNDEF = [
    ("return", "RETURN zz"),
    ("return prop", "MATCH (n:EA) RETURN zz.k"),
    ("where", "MATCH (n:EA) WHERE zz.k = 1 RETURN n.k AS k"),
    ("order by", "MATCH (n:EA) RETURN n.k AS k ORDER BY zz.k"),
    ("set target", "MATCH (n:EA) SET zz.k = 1"),
    ("set value", "MATCH (n:EA) SET n.p = zz.k"),
    ("delete", "MATCH (n:EA) DELETE zz"),
    ("unwind source", "UNWIND zz AS x RETURN x"),
    ("merge prop", "MERGE (n:EX {k: zz.k})"),
    ("create prop", "CREATE (n:EX {k: zz.k})"),
    ("with", "MATCH (n:EA) WITH zz AS w RETURN w"),
]
for where, q in _UNDEF:
    err(f"undefined variable in {where}", q, setup=SETUP_SMALL)

# -- E. Already-declared variables -----------------------------------------
err("create rebinds bound var with label",
    "MATCH (n:EA) CREATE (n:EB)", setup=SETUP_SMALL)
err("create rebinds bound var with props",
    "MATCH (n:EA) CREATE (n {k: 9})", setup=SETUP_SMALL)
err("merge rebinds bound var with label",
    "MATCH (n:EA) MERGE (n:EB)", setup=SETUP_SMALL)
err("unwind shadows bound var",
    "MATCH (n:EA) UNWIND [1] AS n RETURN n", setup=SETUP_SMALL)
err("match shadows value var as node",
    "WITH 1 AS n MATCH (n:EA) RETURN n", setup=SETUP_SMALL)
err("merge rel var already bound",
    "MATCH (a:EA)-[r:ER]->() MERGE (a)-[r:ER]->(x:EB)", setup=SETUP_REL)
ok("create bare bound var endpoint is legal",
   "MATCH (n:EA) CREATE (n)-[:E2]->(m:EY {k: 7}) RETURN m.k AS k",
   ["k"], [{"k": "7"}], setup=SETUP_SMALL)

# -- F. Clause structure / parse shapes (parser.ts:284-293) ----------------
_SYNTAX = [
    ("unclosed node paren", "MATCH (n RETURN n"),
    ("bare return", "RETURN"),
    ("limit missing operand", "MATCH (n) RETURN n LIMIT"),
    ("where missing expression", "MATCH (n) WHERE RETURN n"),
    ("prop missing value", "CREATE (n:EX {k: })"),
    ("unterminated string", "RETURN 'oops"),
    ("unclosed list", "RETURN [1,2"),
    ("unclosed map", "RETURN {a: 1"),
    ("not a clause", "FOO BAR"),
    ("trailing comma in return", "RETURN 1,"),
    ("case without end", "RETURN CASE WHEN true THEN 1"),
    ("node without parens", "MATCH n RETURN n"),
    ("empty label", "MATCH (n:) RETURN n"),
    ("empty reltype", "MATCH (n)-[:]->(m) RETURN n"),
    ("unwind without as", "UNWIND [1,2] RETURN 1"),
    ("remove bare variable", "MATCH (n) REMOVE n"),
    ("where after return", "MATCH (n) RETURN n WHERE n.k = 1"),
    ("with unaliased property", "MATCH (n) WITH n.k RETURN *"),
    ("with unaliased arithmetic", "MATCH (n) WITH n.k + 1 RETURN *"),
    ("with unaliased literal", "MATCH (n) WITH 1 RETURN *"),
    ("with unaliased function", "MATCH (n) WITH count(*) RETURN *"),
]
for title, q in _SYNTAX:
    err(title, q, setup=SETUP_SMALL, syntax=True)
err("return must be final", "RETURN 1 AS a RETURN 2 AS b")
err("match after return", "RETURN 1 AS a MATCH (n) RETURN n")
ok("with aliased expression legal",
   "MATCH (n:EA) WITH n.k AS k RETURN k", ["k"], [{"k": "1"}],
   setup=SETUP_SMALL)
ok("with bare variable legal",
   "MATCH (n:EA) WITH n RETURN n.k AS k", ["k"], [{"k": "1"}],
   setup=SETUP_SMALL)

# -- G. Duplicate result columns (Neo4j 3.5 ColumnNameConflict) ------------
err("duplicate return aliases", "RETURN 1 AS a, 2 AS a")
err("duplicate with aliases", "WITH 1 AS a, 2 AS a RETURN a")
err("duplicate implicit columns",
    "MATCH (n:EA) RETURN n.k, n.k", setup=SETUP_SMALL)
err("star plus duplicate variable",
    "MATCH (n:EA) RETURN *, n", setup=SETUP_SMALL)
ok("same expression distinct aliases legal",
   "MATCH (n:EA) RETURN n.k AS a, n.k AS b", ["a", "b"],
   [{"a": "1", "b": "1"}], setup=SETUP_SMALL)

# -- H. Write-clause shape rules -------------------------------------------
err("varlength in create", "CREATE (a:EX)-[:ER*2]->(b:EY)")
err("varlength in merge", "MERGE (a:EX)-[:ER*2]->(b:EY)")
err("undirected create rel", "CREATE (a:EX)-[:ER]-(b:EY)")
err("multi-type create rel", "CREATE (a:EX)-[r:ER|E2]->(b:EY)")
err("untyped create rel", "CREATE (a:EX)-[]->(b:EY)")
err("untyped merge rel", "MERGE (a:EX {k:1})-[r]->(b:EY {k:2})")
err("delete property", "MATCH (n:EA) DELETE n.k", setup=SETUP_SMALL)
err("delete expression", "MATCH (n:EA) DELETE 1 + 1", setup=SETUP_SMALL)
err("set label on relationship",
    "MATCH ()-[r:ER]->() SET r:EX", setup=SETUP_REL)
err("remove label on relationship",
    "MATCH ()-[r:ER]->() REMOVE r:EX", setup=SETUP_REL)
err("aggregate in where",
    "MATCH (n:EA) WHERE count(n) > 0 RETURN n.k AS k", setup=SETUP_SMALL)
err("aggregate in set",
    "MATCH (n:EA) SET n.p = count(n)", setup=SETUP_SMALL)
err("aggregate in merge prop",
    "MATCH (n:EA) MERGE (m:EX {k: count(n)})", setup=SETUP_SMALL)
err("aggregate in unwind",
    "MATCH (n:EA) UNWIND collect(n.k) AS x RETURN x", setup=SETUP_SMALL)

# -- I. Misc ---------------------------------------------------------------
err("missing parameter", "RETURN $nope AS v")
err("union column mismatch", "RETURN 1 AS a UNION RETURN 2 AS b")
ok("union matching columns legal",
   "RETURN 1 AS a UNION RETURN 2 AS a", ["a"], [{"a": "1"}, {"a": "2"}])

# -- J. Function / expression typing (round-9 sweep: the top user-facing
#    mistakes beyond the A-I families; each invalid query must raise a
#    TYPED CypherCompileError/CypherSyntaxError, never a Spark analysis
#    stack bomb, and each legal twin must pass) ----------------------------
err("unknown function", "RETURN frobnicate(1) AS v")
err("unknown function in where",
    "MATCH (n:EA) WHERE frob(n.k) RETURN n.k AS k", setup=SETUP_SMALL)
err("aggregate of aggregate", "RETURN count(count(*)) AS v")
err("aggregate nested in scalar aggregate arg",
    "MATCH (n:EA) RETURN sum(1 + count(n)) AS v", setup=SETUP_SMALL)
err("type() on a node", "MATCH (n:EA) RETURN type(n) AS t",
    setup=SETUP_SMALL)
err("nodes() on a node", "MATCH (n:EA) RETURN nodes(n) AS x",
    setup=SETUP_SMALL)
err("relationships() on a rel",
    "MATCH ()-[r:ER]->() RETURN relationships(r) AS x", setup=SETUP_REL)
err("labels() requires a variable", "RETURN labels(1) AS l")
err("id() requires a variable", "RETURN id(1) AS i")
err("range() zero step literal", "RETURN range(1, 10, 0) AS r")
err("split() non-string delimiter", "RETURN split('a,b', 1) AS s")
err("duration() bad iso literal", "RETURN duration('P1X') AS d")
err("duration() non-map non-string", "RETURN duration(1) AS d")
err("temporal unknown accessor",
    "RETURN date('2020-01-02').century AS c")
err("duration unknown accessor",
    "RETURN duration('P1D').fortnights AS f")
err("datetime timezone must be literal string",
    "RETURN datetime({year: 2020, timezone: 5}) AS d")
ok("type() on a relationship legal",
   "MATCH ()-[r:ER]->() RETURN type(r) AS t", ["t"], [{"t": "'ER'"}],
   setup=SETUP_REL)
ok("labels() on a node legal",
   "MATCH (n:EA) RETURN labels(n) AS l", ["l"], [{"l": "['EA']"}],
   setup=SETUP_SMALL)
ok("range() positive step legal",
   "RETURN range(1, 5, 2) AS r", ["r"], [{"r": "[1, 3, 5]"}])


# -- K. Structured error positions (r10, VERDICT r9 #6) --------------------
# The reference's QueryResponse carries {message, line, column} on ALL
# errors (src/types.ts:55-68); these scenarios pin the top runtime/semantic
# errors' positions — computed from the query text by locating the token
# the engine anchors each error to (function name, $param, variable,
# MERGE/DELETE keyword). The TCK runner asserts the raised exception's
# .line/.col attributes, the same fields engine.query_response surfaces.


def err_at(title, query, token, setup=None, params=None, occurrence=1):
    idx = -1
    for _ in range(occurrence):
        idx = query.find(token, idx + 1)
    assert idx >= 0, f"{title}: token {token!r} not in query"
    line = query.count("\n", 0, idx) + 1
    col = idx - (query.rfind("\n", 0, idx) + 1) + 1
    CASES.append((title, setup, query, params, ("error_at", line, col)))


err_at("pos: unknown function", "RETURN frobnicate(1) AS v", "frobnicate")
err_at("pos: unknown function in where",
       "MATCH (n:EA) WHERE frob(n.k) RETURN n.k AS k", "frob",
       setup=SETUP_SMALL)
err_at("pos: type() on a node", "MATCH (n:EA) RETURN type(n) AS t", "type",
       setup=SETUP_SMALL)
err_at("pos: nodes() on a node", "MATCH (n:EA) RETURN nodes(n) AS x",
       "nodes", setup=SETUP_SMALL)
err_at("pos: relationships() on a rel",
       "MATCH ()-[r:ER]->() RETURN relationships(r) AS x", "relationships",
       setup=SETUP_REL)
err_at("pos: labels() non-variable", "RETURN labels(1) AS l", "labels")
err_at("pos: id() non-variable", "RETURN id(1) AS i", "id")
err_at("pos: range() zero step", "RETURN range(1, 10, 0) AS r", "range")
err_at("pos: split() non-string delimiter",
       "RETURN split('a,b', 1) AS s", "split")
err_at("pos: duration() bad iso", "RETURN duration('P1X') AS d", "duration")
err_at("pos: unknown temporal accessor",
       "RETURN date('2020-01-02').century AS c", "century")
err_at("pos: unknown duration accessor",
       "RETURN duration('P1D').fortnights AS f", "fortnights")
err_at("pos: timezone must be literal",
       "RETURN datetime({year: 2020, timezone: 5}) AS d", "datetime")
err_at("pos: missing parameter", "RETURN $nope AS v", "$nope")
err_at("pos: undefined variable in return", "RETURN zz AS v", "zz")
err_at("pos: undefined variable prop in return",
       "MATCH (n:EA) RETURN zz.k AS k", "zz", setup=SETUP_SMALL)
err_at("pos: undefined variable in where",
       "MATCH (n:EA) WHERE zz.k = 1 RETURN n.k AS k", "zz",
       setup=SETUP_SMALL)
err_at("pos: undefined variable in delete",
       "MATCH (n:EA) DELETE zz", "zz", setup=SETUP_SMALL)
err_at("pos: merge node null prop", "MERGE (n:EX {p: null})", "MERGE")
err_at("pos: merge node null param", "MERGE (n:EX {p: $p})", "MERGE",
       params={"p": None})
err_at("pos: merge rel null prop",
       "MATCH (a:EA), (b:EB) MERGE (a)-[r:ER {w: null}]->(b)", "MERGE",
       setup=SETUP_SMALL)
err_at("pos: merge second line locates clause",
       "MATCH (a:EA)\nMERGE (n:EX {p: null})", "MERGE", setup=SETUP_SMALL)
err_at("pos: plain delete with relationships",
       "MATCH (a:EA) DELETE a", "DELETE", setup=SETUP_REL)
err_at("pos: delete on second line locates clause",
       "MATCH (a:EA)\nDELETE a", "DELETE", setup=SETUP_REL)
err_at("pos: limit negative param",
       "MATCH (n:EA) RETURN n.k AS k LIMIT $c", "$c", setup=SETUP_SMALL,
       params={"c": -2})
err_at("pos: skip string param",
       "MATCH (n:EA) RETURN n.k AS k SKIP $c", "$c", setup=SETUP_SMALL,
       params={"c": "x"})


def emit() -> str:
    lines = [
        "Feature: Error-semantics parity matrix — invalid queries error, "
        "legal twins do not",
        "",
        "  Generated by scripts/gen_tck_errors.py; each rule cites its "
        "reference source in the generator.",
        "",
    ]
    for title, setup, query, params, expect in CASES:
        lines.append(f"  Scenario: {title}")
        lines.append("    Given an empty graph")
        if setup:
            lines.append("    And having executed:")
            lines.append('      """')
            lines.append(f"      {setup}")
            lines.append('      """')
        if params:
            lines.append("    And parameters are:")
            for k, v in params.items():
                lines.append(f"      | {k} | {_param_literal(v)} |")
        lines.append("    When executing query:")
        lines.append('      """')
        for qline in query.split("\n"):
            lines.append(f"      {qline}")
        lines.append('      """')
        if expect == "syntax":
            lines.append("    Then a SyntaxError should be raised")
        elif expect == "error":
            lines.append("    Then an error should be raised")
        elif isinstance(expect, tuple) and expect[0] == "error_at":
            lines.append(
                f"    Then an error should be raised at line {expect[1]} "
                f"column {expect[2]}"
            )
        else:
            columns, rows = expect
            if not rows:
                lines.append("    Then the result should be empty")
            else:
                lines.append(
                    "    Then the result should be, in any order:"
                )
                lines.append(
                    "      | " + " | ".join(columns) + " |"
                )
                for r in rows:
                    lines.append(
                        "      | "
                        + " | ".join(r[c] for c in columns)
                        + " |"
                    )
        lines.append("")
    return "\n".join(lines)


def _param_literal(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return f"'{v}'"
    if isinstance(v, list):
        return "[" + ", ".join(_param_literal(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(f"{k}: {_param_literal(x)}" for k, x in v.items())
            + "}"
        )
    return str(v)


if __name__ == "__main__":
    text = emit()
    with open(OUT, "w") as f:
        f.write(text)
    n = text.count("Scenario:")
    print(f"wrote {OUT}: {n} scenarios")
