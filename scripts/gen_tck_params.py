"""Generate tests/tck/features/parameter_position_matrix.feature.

Parameters in EVERY expression position the reference accepts (reference
parser parameter expression type src/parser.ts:119, evaluated via
ctx.paramValues throughout src/translator.ts): pattern props, WHERE
comparisons, IN lists, string predicates, regex, SKIP/LIMIT grids, range
bounds/step, list index, map access, arithmetic, CASE comparand,
quantifier sources, reduce init, string functions, write values and MERGE
keys. Expected values come from the independent Python evaluator below —
never from running the engine.

Fixture: six :PP nodes (k: 1..6, s: <greek name>, even: k % 2 = 0).
"""

from __future__ import annotations

import os

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "tck", "features",
    "parameter_position_matrix.feature",
)

NAMES = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
FIX = [{"k": i + 1, "s": NAMES[i], "even": (i + 1) % 2 == 0} for i in range(6)]
SETUP = "CREATE " + ", ".join(
    f"(:PP {{k: {r['k']}, s: '{r['s']}', even: {'true' if r['even'] else 'false'}}})"
    for r in FIX
)

CASES: list = []  # (title, query, params, columns, rows, ordered)


def case(title, query, params, columns, rows, ordered=False):
    CASES.append((title, query, params, columns, rows, ordered))


def fmt(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        s = repr(v)
        return s if "." in s or "e" in s else s + ".0"
    if isinstance(v, str):
        return f"'{v}'"
    if isinstance(v, list):
        return "[" + ", ".join(fmt(x) for x in v) + "]"
    return str(v)


# -- 1. pattern-prop params ------------------------------------------------
for k in (1, 3, 6, 99):
    expect = [{"s": r["s"]} for r in FIX if r["k"] == k]
    case(f"pattern prop param k={k}",
         "MATCH (n:PP {k: $k}) RETURN n.s AS s", {"k": k}, ["s"], expect)
case("pattern prop param string",
     "MATCH (n:PP {s: $s}) RETURN n.k AS k", {"s": "gamma"}, ["k"],
     [{"k": 3}])
case("pattern prop param bool",
     "MATCH (n:PP {even: $e}) RETURN count(*) AS c", {"e": True}, ["c"],
     [{"c": sum(1 for r in FIX if r["even"])}])

# -- 2. WHERE comparison params --------------------------------------------
_OPS = {
    "=": lambda a, b: a == b, "<>": lambda a, b: a != b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
}
for op, f in _OPS.items():
    for v in (2, 4):
        n = sum(1 for r in FIX if f(r["k"], v))
        case(f"where k {op} param {v}",
             f"MATCH (n:PP) WHERE n.k {op} $v RETURN count(*) AS c",
             {"v": v}, ["c"], [{"c": n}])

# -- 3. IN param lists -----------------------------------------------------
for xs in ([1, 3, 5], [2], [], [7, 8]):
    n = sum(1 for r in FIX if r["k"] in xs)
    case(f"where k in param list {xs}",
         "MATCH (n:PP) WHERE n.k IN $xs RETURN count(*) AS c",
         {"xs": xs}, ["c"], [{"c": n}])

# -- 4. string predicate params --------------------------------------------
for pred, f in (
    ("STARTS WITH", lambda s, p: s.startswith(p)),
    ("ENDS WITH", lambda s, p: s.endswith(p)),
    ("CONTAINS", lambda s, p: p in s),
):
    for p in ("a", "ta", "lt"):
        n = sum(1 for r in FIX if f(r["s"], p))
        case(f"where s {pred.lower()} param '{p}'",
             f"MATCH (n:PP) WHERE n.s {pred} $p RETURN count(*) AS c",
             {"p": p}, ["c"], [{"c": n}])

import re as _re
for pat in ("^.e.*", ".*a$"):
    n = sum(1 for r in FIX if _re.fullmatch(pat, r["s"]))
    case(f"where s regex param '{pat}'",
         "MATCH (n:PP) WHERE n.s =~ $re RETURN count(*) AS c",
         {"re": pat}, ["c"], [{"c": n}])

# -- 5. SKIP/LIMIT param grid ----------------------------------------------
ks = sorted(r["k"] for r in FIX)
for s in (0, 1, 2):
    for l_ in (0, 1, 3):
        expect = [{"k": k} for k in ks[s:s + l_]]
        case(f"skip {s} limit {l_} params",
             "MATCH (n:PP) RETURN n.k AS k ORDER BY k SKIP $s LIMIT $l",
             {"s": s, "l": l_}, ["k"], expect, ordered=True)

# -- 6. range bounds/step params -------------------------------------------
for a, b, st in ((1, 5, 1), (0, 0, 1), (3, 1, 1), (1, 9, 3), (10, 2, -4)):
    vals = list(range(a, b + (1 if st > 0 else -1), st)) if st else []
    case(f"range params {a},{b},{st}",
         "RETURN range($a, $b, $st) AS r", {"a": a, "b": b, "st": st},
         ["r"], [{"r": vals}])

# -- 7. UNWIND / list index / map access -----------------------------------
case("unwind param list",
     "UNWIND $xs AS x RETURN x ORDER BY x", {"xs": [3, 1, 2]},
     ["x"], [{"x": 1}, {"x": 2}, {"x": 3}], ordered=True)
case("unwind param list strings",
     "UNWIND $xs AS x RETURN x ORDER BY x", {"xs": ["b", "a"]},
     ["x"], [{"x": "a"}, {"x": "b"}], ordered=True)
for i, want in ((0, 10), (2, 30), (-1, 30), (5, None)):
    case(f"list index param {i}",
         "RETURN $xs[$i] AS v", {"xs": [10, 20, 30], "i": i},
         ["v"], [{"v": want}])
case("map dot access param", "RETURN $m.b AS v", {"m": {"a": 1, "b": 2}},
     ["v"], [{"v": 2}])
case("map bracket access param key",
     "RETURN $m[$key] AS v", {"m": {"a": 1, "b": 2}, "key": "a"},
     ["v"], [{"v": 1}])

# -- 8. arithmetic params --------------------------------------------------
for op, f in (
    ("+", lambda a, b: a + b), ("-", lambda a, b: a - b),
    ("*", lambda a, b: a * b), ("/", lambda a, b: int(a / b)),
    ("%", lambda a, b: a - b * int(a / b)),
):
    case(f"arithmetic param {op}",
         f"RETURN $a {op} $b AS v", {"a": 7, "b": 2}, ["v"],
         [{"v": f(7, 2)}])
case("string concat param", "RETURN $a + $b AS v", {"a": "ab", "b": "cd"},
     ["v"], [{"v": "abcd"}])

# -- 9. CASE comparand params ----------------------------------------------
for x, want in ((1, "one"), (2, "two"), (5, "many")):
    case(f"case comparand param {x}",
         "RETURN CASE $x WHEN 1 THEN 'one' WHEN 2 THEN 'two' "
         "ELSE 'many' END AS v", {"x": x}, ["v"], [{"v": want}])

# -- 10. quantifiers / reduce / coalesce / size ----------------------------
for kind, f in (
    ("all", all), ("any", any),
    ("none", lambda bs: not any(bs)),
    ("single", lambda bs: sum(bs) == 1),
):
    for xs, t in (([4, 5, 6], 3), ([1, 5], 3)):
        want = f([x > t for x in xs])
        case(f"{kind} over param list {xs} t={t}",
             f"RETURN {kind}(x IN $xs WHERE x > $t) AS v",
             {"xs": xs, "t": t}, ["v"], [{"v": want}])
case("reduce param init",
     "RETURN reduce(acc = $init, x IN $xs | acc + x) AS v",
     {"init": 10, "xs": [1, 2, 3]}, ["v"], [{"v": 16}])
case("list comprehension param source",
     "RETURN [x IN $xs WHERE x % 2 = 0 | x * $m] AS v",
     {"xs": [1, 2, 3, 4], "m": 10}, ["v"], [{"v": [20, 40]}])
case("coalesce params", "RETURN coalesce($a, $b) AS v",
     {"a": None, "b": 7}, ["v"], [{"v": 7}])
case("size param list", "RETURN size($xs) AS v", {"xs": [1, 2, 3]},
     ["v"], [{"v": 3}])
case("size param string", "RETURN size($s) AS v", {"s": "abcd"},
     ["v"], [{"v": 4}])

# -- 11. string function params --------------------------------------------
case("substring params", "RETURN substring($s, $i, $n) AS v",
     {"s": "abcdef", "i": 1, "n": 3}, ["v"], [{"v": "bcd"}])
case("left param", "RETURN left($s, $n) AS v", {"s": "abcdef", "n": 2},
     ["v"], [{"v": "ab"}])
case("right param", "RETURN right($s, $n) AS v", {"s": "abcdef", "n": 2},
     ["v"], [{"v": "ef"}])
case("replace params", "RETURN replace($s, $from, $to) AS v",
     {"s": "banana", "from": "na", "to": "x"}, ["v"], [{"v": "baxx"}])
case("split param", "RETURN split($s, $sep) AS v",
     {"s": "a,b,c", "sep": ","}, ["v"], [{"v": ["a", "b", "c"]}])
case("param inside list literal", "RETURN [$a, $b, 3] AS v",
     {"a": 1, "b": 2}, ["v"], [{"v": [1, 2, 3]}])
case("param inside map literal", "RETURN {x: $a, y: 2}.x AS v",
     {"a": 9}, ["v"], [{"v": 9}])

# -- 12. params in write positions -----------------------------------------
case("set value param",
     "MATCH (n:PP {k: $k}) SET n.tag = $tag RETURN n.tag AS tag",
     {"k": 2, "tag": "hit"}, ["tag"], [{"tag": "hit"}])
case("merge key param matches existing",
     "MERGE (n:PP {k: $k}) ON CREATE SET n.s = 'new' RETURN n.s AS s",
     {"k": 4}, ["s"], [{"s": NAMES[3]}])
case("merge key param creates missing",
     "MERGE (n:PP {k: $k}) ON CREATE SET n.s = 'new' RETURN n.s AS s",
     {"k": 44}, ["s"], [{"s": "new"}])
case("create prop params",
     "CREATE (n:QQ {k: $k, s: $s}) RETURN n.k AS k, n.s AS s",
     {"k": 9, "s": "nine"}, ["k", "s"], [{"k": 9, "s": "nine"}])
case("delete guarded by param",
     "MATCH (n:PP) WHERE n.k = $k DETACH DELETE n "
     "RETURN count(*) AS deleted",
     {"k": 5}, ["deleted"], [{"deleted": 1}])

# -- 13. order-by expression param ----------------------------------------
case("order by k times param sign desc",
     "MATCH (n:PP) RETURN n.k AS k ORDER BY n.k * $sign LIMIT 2",
     {"sign": -1}, ["k"], [{"k": 6}, {"k": 5}], ordered=True)
case("order by k times param sign asc",
     "MATCH (n:PP) RETURN n.k AS k ORDER BY n.k * $sign LIMIT 2",
     {"sign": 1}, ["k"], [{"k": 1}, {"k": 2}], ordered=True)


def emit() -> str:
    lines = [
        "Feature: Parameter position matrix — parameters accepted in every "
        "expression position",
        "",
        "  Generated by scripts/gen_tck_params.py; expected values from "
        "the generator's independent Python evaluator.",
        "",
    ]
    for title, query, params, columns, rows, ordered in CASES:
        lines.append(f"  Scenario: {title}")
        lines.append("    Given an empty graph")
        lines.append("    And having executed:")
        lines.append('      """')
        lines.append(f"      {SETUP}")
        lines.append('      """')
        if params:
            lines.append("    And parameters are:")
            for k, v in params.items():
                lines.append(f"      | {k} | {fmt(v)} |")
        lines.append("    When executing query:")
        lines.append('      """')
        lines.append(f"      {query}")
        lines.append('      """')
        if not rows:
            lines.append("    Then the result should be empty")
        else:
            kind = "in order" if ordered else "in any order"
            lines.append(f"    Then the result should be, {kind}:")
            lines.append("      | " + " | ".join(columns) + " |")
            for r in rows:
                lines.append(
                    "      | " + " | ".join(fmt(r[c]) for c in columns) + " |"
                )
        lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    text = emit()
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {OUT}: {text.count('Scenario:')} scenarios")
