"""Temporal extensions (round 2): IANA-zone datetimes, week/ordinal/quarter
date constructors, sub-second accessors (reference src/translator.ts:69-130,
6418-6806, 13221-13332)."""

import datetime as dt

import pytest

from nicefox_graphdb_spark import CypherEngine
from nicefox_graphdb_spark.catalog import GraphCatalog


@pytest.fixture(scope="module")
def g(spark):
    return CypherEngine(spark, GraphCatalog(spark), mutable=True)


def test_week_date_constructor(g):
    rows = g.query(
        "RETURN date({year: 2021, week: 1, dayOfWeek: 1}) AS d1, "
        "date({year: 2020, week: 53, dayOfWeek: 5}) AS d2"
    )
    # ISO: 2021-W01-1 = Mon Jan 4 2021; 2020-W53-5 = Fri Jan 1 2021
    assert rows == [{"d1": dt.date(2021, 1, 4), "d2": dt.date(2021, 1, 1)}]


def test_ordinal_and_quarter_date_constructors(g):
    rows = g.query(
        "RETURN date({year: 2020, ordinalDay: 366}) AS leap_end, "
        "date({year: 2021, quarter: 4, dayOfQuarter: 92}) AS q4_end"
    )
    assert rows == [
        {"leap_end": dt.date(2020, 12, 31), "q4_end": dt.date(2021, 12, 31)}
    ]


def test_zoned_datetime_literal_accessors(g):
    rows = g.query(
        "WITH datetime('2020-06-01T12:30:45[America/New_York]') AS d "
        "RETURN d.year AS y, d.hour AS h, d.timezone AS tz, "
        "d.offset AS off, d.epochSeconds AS es"
    )
    # local wall clock preserved; instant is 16:30:45Z (EDT = UTC-4)
    assert rows == [
        {
            "y": 2020,
            "h": 12,
            "tz": "America/New_York",
            "off": "-04:00",
            "es": 1591029045,
        }
    ]


def test_zoned_datetime_map_constructor_dst_winter(g):
    rows = g.query(
        "WITH datetime({year: 2020, month: 1, day: 15, hour: 6, "
        "timezone: 'America/New_York'}) AS d "
        "RETURN d.hour AS h, d.offset AS off, d.epochSeconds AS es"
    )
    # January = EST = UTC-5
    assert rows == [{"h": 6, "off": "-05:00", "es": 1579086000}]


def test_subsecond_accessors(g):
    rows = g.query(
        "WITH datetime('2020-01-01T00:00:00.123456') AS d "
        "RETURN d.millisecond AS ms, d.microsecond AS us, d.nanosecond AS ns"
    )
    assert rows == [{"ms": 123, "us": 123456, "ns": 123456000}]


def test_naive_datetime_timezone_is_utc(g):
    rows = g.query(
        "WITH datetime('2020-01-01T00:00:00') AS d "
        "RETURN d.timezone AS tz, d.offset AS off"
    )
    assert rows == [{"tz": "Z", "off": "+00:00"}]


def test_duration_scale_division(spark):
    from nicefox_graphdb_spark import CypherEngine

    e = CypherEngine(spark, None, mutable=True)
    q = lambda s: e.query(s)[0]["x"]  # noqa: E731
    assert q("RETURN toString(duration('PT2H') / 2) AS x") == "PT1H"
    assert q("RETURN toString(duration('P1D') / 2) AS x") == "PT12H"
    assert q("RETURN toString(duration('P1D') * 1.5) AS x") == "P1DT12H"
    # fractional months carry at Neo4j's 30.4375-day average month
    assert q("RETURN toString(duration('P1M') / 2) AS x") == "P15DT5H15M"
    assert q("RETURN toString(duration('PT3H') / 3) AS x") == "PT1H"


def test_temporal_arithmetic_type_errors(spark):
    import pytest as _pt

    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.cypher.expressions import CypherCompileError

    e = CypherEngine(spark, None, mutable=True)
    with _pt.raises(CypherCompileError, match="added to durations"):
        e.query("RETURN date('2024-01-01') + 1 AS x")
    with _pt.raises(CypherCompileError, match="subtracted from temporal"):
        e.query("RETURN date('2024-03-01') - date('2024-01-01') AS x")
    with _pt.raises(CypherCompileError, match="divide by a duration"):
        e.query("RETURN 1 / duration('P1D') AS x")
    # null propagates instead of erroring
    assert e.query("RETURN date('2024-01-01') + null AS x") == [{"x": None}]
