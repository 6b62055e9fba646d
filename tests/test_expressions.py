"""Expression semantics tests (data-independent, via RETURN/UNWIND)."""

import math

import pytest


def one(engine, expr, params=None):
    rows = engine.query(f"RETURN {expr} AS x", params)
    return rows[0]["x"]


def test_arithmetic(engine):
    assert one(engine, "1 + 2 * 3") == 7
    assert one(engine, "2 ^ 3") == 8.0
    assert one(engine, "7 % 3") == 1
    assert one(engine, "7 / 2") == 3  # integer division
    assert one(engine, "7.0 / 2") == 3.5
    assert one(engine, "-(3)") == -3


def test_string_concat_plus(engine):
    assert one(engine, "'a' + 'b'") == "ab"
    assert one(engine, "'n' + 1") == "n1"


def test_list_ops(engine):
    assert one(engine, "[1,2,3] + [4]") == [1, 2, 3, 4]
    assert one(engine, "[1,2,3][0]") == 1
    assert one(engine, "[1,2,3][-1]") == 3
    assert one(engine, "[1,2,3,4][1..3]") == [2, 3]
    assert one(engine, "[1,2,3,4][..2]") == [1, 2]
    assert one(engine, "[1,2,3,4][2..]") == [3, 4]
    assert one(engine, "head([1,2])") == 1
    assert one(engine, "last([1,2])") == 2
    assert one(engine, "tail([1,2,3])") == [2, 3]
    assert one(engine, "size([1,2,3])") == 3
    assert one(engine, "reverse([1,2])") == [2, 1]
    assert one(engine, "range(1, 4)") == [1, 2, 3, 4]
    assert one(engine, "range(0, 10, 5)") == [0, 5, 10]


def test_comparisons_and_bool(engine):
    assert one(engine, "1 < 2 < 3") is True
    assert one(engine, "1 < 2 AND 2 < 1") is False
    assert one(engine, "true XOR false") is True
    assert one(engine, "NOT true") is False
    assert one(engine, "null IS NULL") is True
    assert one(engine, "1 IN [1,2]") is True
    assert one(engine, "3 IN [1,2]") is False


def test_three_valued_logic(engine):
    assert one(engine, "null AND true") is None
    assert one(engine, "null AND false") is False
    assert one(engine, "null OR true") is True
    assert one(engine, "null OR false") is None
    assert one(engine, "NOT null") is None
    assert one(engine, "null = null") is None
    assert one(engine, "null + 1") is None


def test_string_functions(engine):
    assert one(engine, "toUpper('ab')") == "AB"
    assert one(engine, "toLower('AB')") == "ab"
    assert one(engine, "trim('  x ')") == "x"
    assert one(engine, "substring('hello', 1, 3)") == "ell"
    assert one(engine, "substring('hello', 1)") == "ello"
    assert one(engine, "replace('axa', 'x', 'y')") == "aya"
    assert one(engine, "split('a,b,c', ',')") == ["a", "b", "c"]
    assert one(engine, "left('hello', 2)") == "he"
    assert one(engine, "right('hello', 2)") == "lo"
    assert one(engine, "reverse('abc')") == "cba"
    assert one(engine, "size('abcd')") == 4
    assert one(engine, "'abc' STARTS WITH 'ab'") is True
    assert one(engine, "'abc' ENDS WITH 'bc'") is True
    assert one(engine, "'abc' CONTAINS 'b'") is True
    assert one(engine, "'abc' =~ 'a.c'") is True
    assert one(engine, "'abc' =~ 'a'") is False  # full match


def test_conversions(engine):
    assert one(engine, "toInteger('42')") == 42
    assert one(engine, "toInteger('x')") is None
    assert one(engine, "toInteger(3.9)") == 3
    assert one(engine, "toFloat('1.5')") == 1.5
    assert one(engine, "toBoolean('true')") is True
    assert one(engine, "toBoolean('nope')") is None
    assert one(engine, "toString(1.5)") == "1.5"
    assert one(engine, "toString(true)") == "true"


def test_math_functions(engine):
    assert one(engine, "abs(-3)") == 3
    assert one(engine, "round(2.5)") == 3.0
    assert one(engine, "floor(2.9)") == 2.0
    assert one(engine, "ceil(2.1)") == 3.0
    assert one(engine, "sqrt(9)") == 3.0
    assert one(engine, "sign(-5)") == -1
    assert abs(one(engine, "pi()") - math.pi) < 1e-12
    assert abs(one(engine, "exp(1)") - math.e) < 1e-12


def test_case_expressions(engine):
    assert one(engine, "CASE WHEN 1 = 1 THEN 'y' ELSE 'n' END") == "y"
    assert one(engine, "CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END") == "b"
    assert one(engine, "CASE 9 WHEN 1 THEN 'a' END") is None


def test_comprehension_and_quantifiers(engine):
    assert one(engine, "[x IN [1,2,3] WHERE x > 1 | x * 10]") == [20, 30]
    assert one(engine, "[x IN [1,2,3] WHERE x > 1]") == [2, 3]
    assert one(engine, "all(x IN [1,2] WHERE x > 0)") is True
    assert one(engine, "any(x IN [1,2] WHERE x > 1)") is True
    assert one(engine, "none(x IN [1,2] WHERE x > 2)") is True
    assert one(engine, "single(x IN [1,2] WHERE x = 1)") is True
    assert one(engine, "reduce(acc = 0, x IN [1,2,3] | acc + x)") == 6


def test_coalesce(engine):
    assert one(engine, "coalesce(null, 2)") == 2
    assert one(engine, "coalesce(null, null)") is None


def test_unwind_pipeline(engine):
    rows = engine.query(
        "UNWIND range(1, 5) AS x WITH x WHERE x % 2 = 1 RETURN sum(x) AS s"
    )
    assert rows == [{"s": 9}]


def test_unwind_empty_and_null(engine):
    assert engine.query("UNWIND [] AS x RETURN x") == []
    assert engine.query("UNWIND null AS x RETURN x") == []


def test_map_literal_access(engine):
    assert one(engine, "{a: 1, b: 'x'}.b") == "x"
    assert one(engine, "{a: {b: 2}}.a.b") == 2


def test_percentiles(engine):
    rows = engine.query(
        "UNWIND [1.0, 2.0, 3.0, 4.0] AS v "
        "RETURN percentileCont(v, 0.5) AS c, percentileDisc(v, 0.5) AS d"
    )
    assert rows[0]["c"] == 2.5
    assert rows[0]["d"] == 2.0


def test_aggregate_distinct(engine):
    rows = engine.query(
        "UNWIND [1, 1, 2, 3] AS v RETURN count(DISTINCT v) AS cd, count(v) AS c"
    )
    assert rows == [{"cd": 3, "c": 4}]


def test_stdev(engine):
    rows = engine.query("UNWIND [1.0, 2.0, 3.0] AS v RETURN stDev(v) AS s")
    assert abs(rows[0]["s"] - 1.0) < 1e-12


def test_ordered_collect_after_with_order(engine):
    rows = engine.query(
        "UNWIND [3, 1, 2] AS x WITH x ORDER BY x DESC RETURN collect(x) AS l"
    )
    assert rows == [{"l": [3, 2, 1]}]
    rows = engine.query(
        "UNWIND [3, 1, 2] AS x WITH x ORDER BY x ASC RETURN collect(x) AS l"
    )
    assert rows == [{"l": [1, 2, 3]}]


def test_ordered_collect_grouped(engine):
    rows = engine.query(
        "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
        "WITH r, n ORDER BY n.name DESC "
        "RETURN r.name AS region, collect(n.name) AS nations ORDER BY region LIMIT 1"
    )
    names = rows[0]["nations"]
    assert names == sorted(names, reverse=True)


def test_time_of_day(engine):
    rows = engine.query(
        "RETURN time('12:31:14').hour AS h, localtime('07:05:00').minute AS m"
    )
    assert rows == [{"h": 12, "m": 5}]


def test_cross_type_comparison_null(engine):
    # Cypher: comparisons across incomparable types yield null
    assert one(engine, "1 < 'a'") is None
    assert one(engine, "true < 'x'") is None


def test_json_property_bag_access(engine):
    rows = engine.query(
        "MATCH (e:Event {event_id: 0}) RETURN toInteger(e.props.k) AS k"
    )
    assert isinstance(rows[0]["k"], int)


def test_approx_aggregates(engine):
    rows = engine.query(
        "MATCH (o:Order) RETURN count(DISTINCT o.orderkey) AS exact, "
        "approxCountDistinct(o.orderkey, 0.01) AS approx, "
        "approxPercentile(o.totalprice, 0.5) AS p50a, "
        "percentileCont(o.totalprice, 0.5) AS p50e"
    )
    r = rows[0]
    assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05
    assert abs(r["p50a"] - r["p50e"]) / r["p50e"] < 0.05


def test_percentile_disc_exact_on_large_group(engine):
    """percentileDisc is exact regardless of group size (rank/window
    two-pass; reference is exact, src/translator.ts:5288-5409). 1.1M rows
    exceeds the old sketch's 1e6 accuracy, where rank error was possible."""
    rows = engine.query(
        "UNWIND range(1, 1100000) AS x RETURN percentileDisc(x, 0.37) AS p"
    )
    assert rows == [{"p": 407000}]


def test_percentile_disc_bounds_and_groups(engine):
    rows = engine.query(
        "UNWIND [1, 2, 3, 4] AS x "
        "RETURN percentileDisc(x, 0.0) AS lo, percentileDisc(x, 1.0) AS hi, "
        "percentileDisc(x, 0.5) AS med"
    )
    assert rows == [{"lo": 1, "hi": 4, "med": 2}]
    rows = engine.query(
        "UNWIND [{g: 'a', v: 1}, {g: 'a', v: 2}, {g: 'a', v: 3},"
        " {g: 'b', v: 10}] AS r "
        "RETURN r.g AS g, percentileDisc(r.v, 0.5) AS med ORDER BY g"
    )
    assert rows == [{"g": "a", "med": 2}, {"g": "b", "med": 10}]
