"""Batched algebraic differential tests.

Each test UNWINDs one literal list of randomized cases through the engine
and compares against a Python model of the Cypher semantics the reference
implements (integer division truncates toward zero, modulo follows the
dividend, division by zero is null, 3VL boolean algebra, clamped string /
list slicing). One Spark job per property keeps hundreds of cases cheap.
"""

from __future__ import annotations

import math
import random

import pytest

from nicefox_graphdb_spark import CypherEngine
from nicefox_graphdb_spark.catalog import GraphCatalog


@pytest.fixture(scope="module")
def eng(spark):
    return CypherEngine(spark, GraphCatalog(spark), mutable=True)


def _run_pairs(eng, pairs, expr, alias="r"):
    lit = ", ".join(f"[{a}, {b}]" for a, b in pairs)
    rows = eng.query(f"UNWIND [{lit}] AS p RETURN {expr} AS {alias}")
    return [r[alias] for r in rows]


def test_integer_division_truncates_toward_zero(eng):
    rng = random.Random(42)
    pairs = [
        (rng.randint(-100, 100), rng.choice([v for v in range(-9, 10)]))
        for _ in range(200)
    ]
    got = _run_pairs(eng, pairs, "p[0] / p[1]")
    for (a, b), g in zip(pairs, got):
        if b == 0:
            assert g is None, (a, b, g)  # reference SQLite parity: x/0 → null
        else:
            want = int(a / b)  # trunc toward zero, not Python floor
            assert g == want, (a, b, g, want)


def test_modulo_follows_dividend_sign(eng):
    rng = random.Random(43)
    pairs = [
        (rng.randint(-100, 100), rng.choice([v for v in range(-9, 10)]))
        for _ in range(200)
    ]
    got = _run_pairs(eng, pairs, "p[0] % p[1]")
    for (a, b), g in zip(pairs, got):
        if b == 0:
            assert g is None, (a, b, g)
        else:
            want = int(math.fmod(a, b))  # C-style: sign of the dividend
            assert g == want, (a, b, g, want)


def test_float_division_matches_ieee(eng):
    rng = random.Random(44)
    pairs = [
        (round(rng.uniform(-50, 50), 3), round(rng.uniform(0.5, 9), 3))
        for _ in range(150)
    ]
    got = _run_pairs(eng, pairs, "p[0] / p[1]")
    for (a, b), g in zip(pairs, got):
        assert g == pytest.approx(a / b, rel=1e-12), (a, b, g)


def test_three_valued_boolean_algebra_exhaustive(eng):
    # all 9 combinations for AND / OR / XOR plus NOT over 3 inputs,
    # encoded with 0/1/2 → false/true/null
    vals = {"0": False, "1": True, "2": None}
    cases = [(x, y) for x in "012" for y in "012"]
    lit = ", ".join(f"[{x}, {y}]" for x, y in cases)
    decode = (
        "CASE p[0] WHEN 0 THEN false WHEN 1 THEN true ELSE null END AS x, "
        "CASE p[1] WHEN 0 THEN false WHEN 1 THEN true ELSE null END AS y"
    )
    rows = eng.query(
        f"UNWIND [{lit}] AS p WITH {decode} "
        "RETURN x AND y AS a, x OR y AS o, x XOR y AS xo, NOT x AS n"
    )

    def k_and(x, y):
        if x is False or y is False:
            return False
        if x is None or y is None:
            return None
        return True

    def k_or(x, y):
        if x is True or y is True:
            return True
        if x is None or y is None:
            return None
        return False

    def k_xor(x, y):
        if x is None or y is None:
            return None
        return x != y

    def k_not(x):
        return None if x is None else not x

    for (xs, ys), r in zip(cases, rows):
        x, y = vals[xs], vals[ys]
        assert r["a"] == k_and(x, y), (x, y, r)
        assert r["o"] == k_or(x, y), (x, y, r)
        assert r["xo"] == k_xor(x, y), (x, y, r)
        assert r["n"] == k_not(x), (x, r)


def test_list_slice_matches_python_clamping(eng):
    rng = random.Random(45)
    base = list(range(7))
    cases = [
        (rng.randint(-10, 10), rng.randint(-10, 10)) for _ in range(120)
    ]
    lit = ", ".join(f"[{a}, {b}]" for a, b in cases)
    rows = eng.query(
        f"UNWIND [{lit}] AS p "
        f"RETURN [0,1,2,3,4,5,6][p[0]..p[1]] AS s"
    )
    for (a, b), r in zip(cases, rows):
        # Cypher slice: negative wraps from the end, out-of-range clamps,
        # start >= end is empty — identical to Python raw slicing semantics
        want = base[a:b]
        assert r["s"] == want, (a, b, r["s"], want)


def test_list_index_matches_python_wrap(eng):
    cases = list(range(-10, 10))
    lit = ", ".join(f"[{i}, 0]" for i in cases)
    rows = eng.query(
        f"UNWIND [{lit}] AS p RETURN [10,20,30][p[0]] AS v"
    )
    base = [10, 20, 30]
    for i, r in zip(cases, rows):
        want = base[i] if -len(base) <= i < len(base) else None
        assert r["v"] == want, (i, r["v"], want)


def test_substring_clamps_like_reference(eng):
    rng = random.Random(46)
    s = "abcdefgh"
    cases = [(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(80)]
    lit = ", ".join(f"[{a}, {b}]" for a, b in cases)
    rows = eng.query(
        f"UNWIND [{lit}] AS p RETURN substring('{s}', p[0], p[1]) AS v"
    )
    for (a, b), r in zip(cases, rows):
        want = s[a : a + b]
        assert r["v"] == want, (a, b, r["v"], want)


def test_range_matches_python(eng):
    rng = random.Random(47)
    cases = [
        (rng.randint(-5, 8), rng.randint(-5, 8), rng.choice([-3, -2, -1, 1, 2, 3]))
        for _ in range(120)
    ]
    lit = ", ".join(f"[{a}, {b}, {st}]" for a, b, st in cases)
    rows = eng.query(
        f"UNWIND [{lit}] AS p RETURN range(p[0], p[1], p[2]) AS v"
    )
    for (a, b, st), r in zip(cases, rows):
        # Cypher range is END-INCLUSIVE; empty when step points away
        if st > 0:
            want = list(range(a, b + 1, st))
        else:
            want = list(range(a, b - 1, st))
        assert r["v"] == want, (a, b, st, r["v"], want)


def test_comparison_chain_matches_python(eng):
    rng = random.Random(48)
    cases = [
        (rng.randint(0, 5), rng.randint(0, 5), rng.randint(0, 5))
        for _ in range(100)
    ]
    lit = ", ".join(f"[{a}, {b}, {c}]" for a, b, c in cases)
    rows = eng.query(
        f"UNWIND [{lit}] AS p RETURN p[0] < p[1] <= p[2] AS v"
    )
    for (a, b, c), r in zip(cases, rows):
        assert r["v"] == (a < b <= c), (a, b, c, r["v"])


def test_power_left_associative_float(eng):
    rng = random.Random(49)
    cases = [(rng.randint(1, 4), rng.randint(0, 3), rng.randint(0, 2)) for _ in range(60)]
    lit = ", ".join(f"[{a}, {b}, {c}]" for a, b, c in cases)
    rows = eng.query(f"UNWIND [{lit}] AS p RETURN p[0] ^ p[1] ^ p[2] AS v")
    for (a, b, c), r in zip(cases, rows):
        want = float((a**b) ** c)  # Cypher ^ is LEFT-associative, returns float
        assert r["v"] == pytest.approx(want), (a, b, c, r["v"], want)
