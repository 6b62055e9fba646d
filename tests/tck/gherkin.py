"""Minimal Gherkin parser + value grammar for openCypher-TCK-style
feature files.

The openCypher TCK (github.com/opencypher/openCypher, Apache-2.0) expresses
engine-agnostic Cypher conformance scenarios in Gherkin. The official
feature corpus isn't vendored here (no network in this environment); the
scenarios under ``features/`` are authored in the same dialect to cover the
long-tail semantics the TCK exercises — null propagation, MERGE variable
rules, ORDER BY scoping, aggregation corners (reference runs the real TCK:
test/tck/tck-parser.ts, README.md "2,684 scenarios").

Supported steps (the subset the scenario corpus uses):

    Given an empty graph
    Given any graph
    And having executed: <docstring>
    And parameters are: <table name|value>
    When executing query: <docstring>
    Then the result should be, in any order: <table>
    Then the result should be, in order: <table>
    Then the result should be empty
    Then a SyntaxError should be raised
    Then an error should be raised
    Then an error should be raised at line L column C
    And no side effects / And the side effects should be: (recorded, unchecked)

Expected-value cells use the TCK literal grammar: null, booleans, integers,
floats, 'strings', [lists], {maps}, (:Label {props}) nodes and
[:TYPE {props}] relationships. Nodes/relationships compare by property map
(the engine returns entities as property maps).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Scenario:
    feature: str
    name: str
    setup: list[str] = field(default_factory=list)  # "having executed" queries
    params: dict = field(default_factory=dict)
    query: str = ""
    # one of: rows_any_order / rows_in_order / empty / syntax_error / error
    # / error_at (error with an asserted structured (line, col) position)
    expect_kind: str = "rows_any_order"
    columns: list[str] = field(default_factory=list)
    rows: list[dict] = field(default_factory=list)
    error_pos: tuple | None = None  # for error_at

    @property
    def id(self) -> str:
        return f"{self.feature}::{self.name}"


# -- TCK value literals -------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^'\\]|\\.)*')
      | (?P<float>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
      | (?P<int>-?\d+)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<punct>[\[\]{}(),:])
    )""",
    re.X,
)


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m:
                if text[pos:].strip():
                    raise ValueError(f"bad TCK value near {text[pos:]!r}")
                break
            pos = m.end()
            for kind in ("str", "float", "int", "word", "punct"):
                v = m.group(kind)
                if v is not None:
                    self.toks.append((kind, v))
                    break
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def eat(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {kind} {val}, got {k} {v}")
        return v


def _unescape(s: str) -> str:
    return s[1:-1].replace("\\'", "'").replace("\\\\", "\\")


def parse_value(text: str):
    """Parse one TCK cell value into a comparable Python object."""
    toks = _Tokens(text)
    v = _parse(toks)
    if toks.peek()[0] is not None:
        raise ValueError(f"trailing tokens in TCK value {text!r}")
    return v


def _parse(toks: _Tokens):
    kind, val = toks.peek()
    if kind == "str":
        toks.next()
        return _unescape(val)
    if kind == "float":
        toks.next()
        return float(val)
    if kind == "int":
        toks.next()
        return int(val)
    if kind == "word":
        toks.next()
        low = val.lower()
        if low == "null":
            return None
        if low == "true":
            return True
        if low == "false":
            return False
        raise ValueError(f"bare word {val!r} in TCK value")
    if kind == "punct" and val == "[":
        toks.next()
        # relationship [:TYPE {...}] or list
        if toks.peek() == ("punct", ":"):
            toks.next()
            toks.eat("word")
            props = {}
            if toks.peek() == ("punct", "{"):
                props = _parse_map(toks)
            toks.eat("punct", "]")
            return props  # entity == its property map (engine shape)
        items = []
        while toks.peek() != ("punct", "]"):
            items.append(_parse(toks))
            if toks.peek() == ("punct", ","):
                toks.next()
        toks.eat("punct", "]")
        return items
    if kind == "punct" and val == "{":
        return _parse_map(toks)
    if kind == "punct" and val == "(":
        # node (:L1:L2 {props}) — labels recorded but compared by props
        toks.next()
        while toks.peek() == ("punct", ":"):
            toks.next()
            toks.eat("word")
        props = {}
        if toks.peek() == ("punct", "{"):
            props = _parse_map(toks)
        toks.eat("punct", ")")
        return props
    raise ValueError(f"unexpected token {kind} {val}")


def _parse_map(toks: _Tokens) -> dict:
    toks.eat("punct", "{")
    out = {}
    while toks.peek() != ("punct", "}"):
        k = toks.next()[1]
        if k.startswith("'"):
            k = _unescape(k)
        toks.eat("punct", ":")
        out[k] = _parse(toks)
        if toks.peek() == ("punct", ","):
            toks.next()
    toks.eat("punct", "}")
    return out


# -- feature file parsing -----------------------------------------------------

def _split_table_row(line: str) -> list[str]:
    assert line.startswith("|") and line.endswith("|"), line
    return [c.strip() for c in line[1:-1].split("|")]


def parse_feature(text: str, feature_name: str) -> list[Scenario]:
    lines = text.splitlines()
    scenarios: list[Scenario] = []
    cur: Scenario | None = None
    i = 0

    def read_docstring(i: int) -> tuple[str, int]:
        assert lines[i].strip() == '"""', f"expected docstring at line {i+1}"
        # standard Gherkin: indentation relative to the opening ``\"\"\"``
        # is stripped — position-asserting steps (error_at) then address
        # the query's own 1-based (line, col) coordinates
        indent = len(lines[i]) - len(lines[i].lstrip())
        i += 1
        body = []
        while lines[i].strip() != '"""':
            ln = lines[i]
            body.append(ln[indent:] if ln[:indent].strip() == "" else ln.lstrip())
            i += 1
        return "\n".join(body), i + 1

    def read_table(i: int) -> tuple[list[str], list[list[str]], int]:
        header = _split_table_row(lines[i].strip())
        i += 1
        rows = []
        while i < len(lines) and lines[i].strip().startswith("|"):
            rows.append(_split_table_row(lines[i].strip()))
            i += 1
        return header, rows, i

    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line or line.startswith("#") or line.startswith("Feature:"):
            continue
        if line.startswith("Scenario:"):
            cur = Scenario(feature=feature_name, name=line[9:].strip())
            scenarios.append(cur)
            continue
        if cur is None:
            continue
        if line in ("Given an empty graph", "Given any graph"):
            continue
        if line == "And having executed:":
            q, i = read_docstring(i)
            cur.setup.append(q)
            continue
        if line == "And parameters are:":
            # headerless name|value rows (TCK parameter-table convention)
            while i < len(lines) and lines[i].strip().startswith("|"):
                r = _split_table_row(lines[i].strip())
                cur.params[r[0]] = parse_value(r[1])
                i += 1
            continue
        if line == "When executing query:":
            cur.query, i = read_docstring(i)
            continue
        if line.startswith("Then the result should be, in any order:"):
            cur.expect_kind = "rows_any_order"
            header, rows, i = read_table(i)
            cur.columns = header
            cur.rows = [
                {h: parse_value(c) for h, c in zip(header, r)} for r in rows
            ]
            continue
        if line.startswith("Then the result should be, in order:"):
            cur.expect_kind = "rows_in_order"
            header, rows, i = read_table(i)
            cur.columns = header
            cur.rows = [
                {h: parse_value(c) for h, c in zip(header, r)} for r in rows
            ]
            continue
        if line == "Then the result should be empty":
            cur.expect_kind = "empty"
            continue
        if line.startswith("Then a SyntaxError should be raised"):
            cur.expect_kind = "syntax_error"
            continue
        if line.startswith("Then an error should be raised at line "):
            m = re.match(
                r"Then an error should be raised at line (\d+) column (\d+)",
                line,
            )
            if not m:
                raise ValueError(f"{feature_name}: bad position step {line!r}")
            cur.expect_kind = "error_at"
            cur.error_pos = (int(m.group(1)), int(m.group(2)))
            continue
        if line.startswith("Then an error should be raised"):
            cur.expect_kind = "error"
            continue
        if line == "And no side effects" or line.startswith(
            "And the side effects should be:"
        ):
            # side-effect accounting is not modeled; skip trailing table
            while i < len(lines) and lines[i].strip().startswith("|"):
                i += 1
            continue
        raise ValueError(f"{feature_name}: unsupported step {line!r}")
    return scenarios
