"""Generate tests/tck/features/temporal_deep_matrix.feature.

Re-authors the semantic space of the reference's certified temporal suites
(test/tck/neo4j35-baseline.ts "expressions/temporal > Temporal*", ~369
scenarios): accessor matrices over boundary datetimes (leap day, ISO
week-year rollovers, DST transitions), truncate units, calendar-aware
duration arithmetic (month clamping, leap years, DST wall-clock days),
duration.between decomposition, and duration component-group totals.

Every expected value comes from an INDEPENDENT evaluator below built on
Python's datetime + zoneinfo implementing openCypher/Neo4j semantics —
not from running the engine — so the feature is an oracle, not a snapshot.
"""

from __future__ import annotations

import os
from datetime import date, datetime, timedelta, timezone
from zoneinfo import ZoneInfo

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "tck", "features",
    "temporal_deep_matrix.feature",
)

UTC = timezone.utc


# ---------------------------------------------------------------- evaluator
def iso_weekyear(d: date) -> int:
    return d.isocalendar()[0]


def iso_week(d: date) -> int:
    return d.isocalendar()[1]


def day_of_week(d: date) -> int:  # ISO: Monday=1..Sunday=7
    return d.isoweekday()


def quarter(d: date) -> int:
    return (d.month - 1) // 3 + 1


def ordinal_day(d: date) -> int:
    return d.timetuple().tm_yday


DT_ACCESSORS = {
    "year": lambda dt: dt.year,
    "quarter": lambda dt: quarter(dt.date()),
    "month": lambda dt: dt.month,
    "week": lambda dt: iso_week(dt.date()),
    "weekYear": lambda dt: iso_weekyear(dt.date()),
    "day": lambda dt: dt.day,
    "ordinalDay": lambda dt: ordinal_day(dt.date()),
    "dayOfWeek": lambda dt: day_of_week(dt.date()),
    "hour": lambda dt: dt.hour,
    "minute": lambda dt: dt.minute,
    "second": lambda dt: dt.second,
    "millisecond": lambda dt: dt.microsecond // 1000,
    "microsecond": lambda dt: dt.microsecond,
    "epochSeconds": lambda dt: int(dt.timestamp()),
    "epochMillis": lambda dt: int(dt.timestamp() * 1000),
}

DATE_ACCESSORS = {
    "year": lambda d: d.year,
    "quarter": quarter,
    "month": lambda d: d.month,
    "week": iso_week,
    "weekYear": iso_weekyear,
    "day": lambda d: d.day,
    "ordinalDay": ordinal_day,
    "dayOfWeek": day_of_week,
}


def clamp_add_months(d: date, months: int) -> date:
    """Calendar month addition with end-of-month clamping (openCypher)."""
    y, m0 = divmod((d.year * 12 + d.month - 1) + months, 12)
    m = m0 + 1
    last = (date(y + (m == 12), (m % 12) + 1, 1) - timedelta(days=1)).day
    return date(y, m, min(d.day, last))


def cypher_add(dt: datetime, months: int, days: int, secs: float) -> datetime:
    """openCypher datetime + duration: months then days applied to the
    WALL CLOCK (re-resolving the zone offset), then seconds applied to
    the absolute instant (reference src/translator.ts temporal add)."""
    nd = clamp_add_months(dt.date(), months) + timedelta(days=days)
    wall = datetime.combine(nd, dt.time())  # naive wall clock
    # re-resolve offset at the new wall time (zoneinfo: PEP 495, fold=0)
    out = wall.replace(tzinfo=dt.tzinfo)
    if secs:
        # seconds add on the absolute INSTANT (python aware arithmetic is
        # wall-clock — convert through UTC to get instant semantics)
        out = (out.astimezone(UTC) + timedelta(seconds=secs)).astimezone(
            out.tzinfo
        )
    return out


def between(a: datetime, b: datetime) -> tuple[int, int, int]:
    """duration.between full decomposition → (months, days, seconds).
    Months walked on the calendar, then whole wall-clock days, then exact
    seconds on the instant — the a + between(a,b) = b invariant."""
    sign = 1 if b >= a else -1
    if sign < 0:
        a, b = b, a
    months = 0
    while cypher_add(a, months + 1, 0, 0) <= b:
        months += 1
    a2 = cypher_add(a, months, 0, 0)
    days = 0
    while cypher_add(a2, 0, days + 1, 0) <= b:
        days += 1
    a3 = cypher_add(a2, 0, days, 0)
    secs = int((b - a3).total_seconds())
    return (sign * months, sign * days, sign * secs)


# ---------------------------------------------------------------- emission
def scenario(title: str, query: str, cols: list[str], rows: list[list[str]],
             ordered: bool = False) -> str:
    head = " | ".join(cols)
    body = "".join(f"      | {' | '.join(r)} |\n" for r in rows)
    kind = "in order" if ordered else "in any order"
    return (
        f"  Scenario: {title}\n"
        "    Given an empty graph\n"
        "    When executing query:\n"
        '      """\n'
        f"{query}"
        '      """\n'
        f"    Then the result should be, {kind}:\n"
        f"      | {head} |\n"
        f"{body}"
    )


def lit(dt_str: str) -> str:
    return f"datetime('{dt_str}')"


def parse(dt_str: str) -> datetime:
    """Parse our scenario literal the way Cypher does: trailing [Zone]
    resolves an IANA zone; bare datetimes default to UTC."""
    if dt_str.endswith("]"):
        body, zone = dt_str[:-1].split("[")
        tz = ZoneInfo(zone)
        if "+" in body[10:] or "-" in body[10:] or body.endswith("Z"):
            return datetime.fromisoformat(body).astimezone(tz)
        return datetime.fromisoformat(body).replace(tzinfo=tz)
    d = datetime.fromisoformat(dt_str.replace("Z", "+00:00"))
    return d if d.tzinfo else d.replace(tzinfo=UTC)


def main() -> None:
    parts = [
        "Feature: Temporal deep matrix — accessors, truncate, calendar "
        "arithmetic, duration.between (reference Temporal1-10)\n",
        "\n  Generated by scripts/gen_tck_temporal.py; expected values from "
        "an independent datetime+zoneinfo evaluator.\n\n",
    ]

    # 1) datetime accessor matrix over boundary instants
    BOUNDARY_DTS = [
        "2024-02-29T23:59:59.999999",          # leap day, subsecond edge
        "2021-01-01T00:00:00",                 # ISO week 53 of weekYear 2020
        "2020-12-31T12:00:00",                 # week 53, weekYear 2020
        "2024-12-30T08:30:15",                 # week 1 of weekYear 2025
        "2026-01-04T23:00:00",                 # Sunday of week 1
        "1969-12-31T23:59:59",                 # pre-epoch
        "2000-02-29T00:00:00",                 # century leap day
        "2024-03-10T07:30:00[America/New_York]",   # spring-forward morning
        "2024-11-03T01:30:00[America/New_York]",   # ambiguous fall-back wall
        "2024-06-15T22:45:30.123456[Asia/Kolkata]",  # +05:30 zone
    ]
    acc_names = list(DT_ACCESSORS)
    for ds in BOUNDARY_DTS:
        dt = parse(ds)
        for i in range(0, len(acc_names), 5):
            chunk = acc_names[i : i + 5]
            cols = [a.lower() for a in chunk]
            exprs = [f"t.{a} AS {a.lower()}" for a in chunk]
            rows = [[str(DT_ACCESSORS[a](dt)) for a in chunk]]
            parts.append(
                scenario(
                    f"datetime accessors {'/'.join(chunk)} on {ds}",
                    f"      WITH {lit(ds)} AS t\n"
                    "      RETURN " + ", ".join(exprs) + "\n",
                    cols, rows,
                )
            )

    # 2) date accessor matrix
    BOUNDARY_DATES = [
        "2024-02-29", "2021-01-01", "2020-12-31", "2024-12-30",
        "2019-12-30", "2026-01-04", "1900-02-28", "2000-01-01",
    ]
    dacc = list(DATE_ACCESSORS)
    for ds in BOUNDARY_DATES:
        d = date.fromisoformat(ds)
        cols = [a.lower() for a in dacc]
        exprs = [f"d.{a} AS {a.lower()}" for a in dacc]
        rows = [[str(DATE_ACCESSORS[a](d)) for a in dacc]]
        parts.append(
            scenario(
                f"date accessors on {ds}",
                f"      WITH date('{ds}') AS d\n"
                "      RETURN " + ", ".join(exprs) + "\n",
                cols, rows,
            )
        )

    # 3) truncate matrix (UTC datetimes; zoned truncate covered in
    #    temporal_zone_offset_matrix.feature)
    TRUNC_UNITS = {
        "year": lambda dt: dt.replace(month=1, day=1, hour=0, minute=0,
                                      second=0, microsecond=0),
        "quarter": lambda dt: dt.replace(month=(quarter(dt.date()) - 1) * 3 + 1,
                                         day=1, hour=0, minute=0, second=0,
                                         microsecond=0),
        "month": lambda dt: dt.replace(day=1, hour=0, minute=0, second=0,
                                       microsecond=0),
        "week": lambda dt: (datetime.combine(
            dt.date() - timedelta(days=dt.date().isoweekday() - 1),
            dt.time().replace(hour=0, minute=0, second=0, microsecond=0),
        ).replace(tzinfo=dt.tzinfo)),
        "day": lambda dt: dt.replace(hour=0, minute=0, second=0, microsecond=0),
        "hour": lambda dt: dt.replace(minute=0, second=0, microsecond=0),
        "minute": lambda dt: dt.replace(second=0, microsecond=0),
        "second": lambda dt: dt.replace(microsecond=0),
    }
    TRUNC_DTS = [
        "2024-02-29T13:37:45.654321",
        "2021-01-02T23:59:59",      # week-truncates into the prior year
        "2024-07-01T00:00:00",      # already on a quarter boundary
        "2024-12-31T06:07:08.9",
    ]
    for ds in TRUNC_DTS:
        dt = parse(ds)
        units = list(TRUNC_UNITS)
        for i in range(0, len(units), 4):
            chunk = units[i : i + 4]
            cols = [f"t_{u}" for u in chunk]
            exprs = [
                f"datetime.truncate('{u}', t).epochSeconds AS t_{u}"
                for u in chunk
            ]
            rows = [[str(int(TRUNC_UNITS[u](dt).timestamp())) for u in chunk]]
            parts.append(
                scenario(
                    f"truncate {'/'.join(chunk)} on {ds}",
                    f"      WITH {lit(ds)} AS t\n"
                    "      RETURN " + ", ".join(exprs) + "\n",
                    cols, rows,
                )
            )

    # 4) calendar arithmetic: clamping, leap years, DST wall-clock days
    ADD_CASES = [
        # (datetime, duration-literal, months, days, seconds)
        ("2024-01-31T12:00:00", "P1M", 1, 0, 0),        # clamp to Feb 29
        ("2023-01-31T12:00:00", "P1M", 1, 0, 0),        # clamp to Feb 28
        ("2024-02-29T12:00:00", "P1Y", 12, 0, 0),       # leap → non-leap
        ("2024-02-29T12:00:00", "P4Y", 48, 0, 0),       # leap → leap
        ("2023-11-30T00:00:00", "P3M1D", 3, 1, 0),      # months then days
        ("2024-01-31T00:00:00", "P2M", 2, 0, 0),        # clamp NOT sticky
        ("2024-01-01T00:00:00", "P1Y2M3DT4H5M6S", 14, 3, 4 * 3600 + 306),
        ("2024-03-09T12:00:00[America/New_York]", "P1D", 0, 1, 0),   # 23h day
        ("2024-11-02T12:00:00[America/New_York]", "P1D", 0, 1, 0),   # 25h day
        ("2024-03-09T12:00:00[America/New_York]", "PT24H", 0, 0, 86400),
        ("2024-03-10T01:30:00[America/New_York]", "PT1H", 0, 0, 3600),  # over the gap
    ]
    for ds, dur, mo, dd, ss in ADD_CASES:
        dt = parse(ds)
        res = cypher_add(dt, mo, dd, ss)
        parts.append(
            scenario(
                f"{ds} + duration('{dur}')",
                f"      WITH {lit(ds)} + duration('{dur}') AS r\n"
                "      RETURN r.year AS y, r.month AS mo, r.day AS d,\n"
                "             r.hour AS h, r.minute AS mi,\n"
                "             r.epochSeconds AS es\n",
                ["y", "mo", "d", "h", "mi", "es"],
                [[str(res.year), str(res.month), str(res.day), str(res.hour),
                  str(res.minute), str(int(res.timestamp()))]],
            )
        )
        # subtraction round-trip on the pure calendar cases (no clamp loss)
        if ss == 0 and dd == 0 and mo and dt.day <= 28:
            back = cypher_add(res, -mo, 0, 0)
            parts.append(
                scenario(
                    f"{ds} + duration('{dur}') - duration('{dur}')",
                    f"      WITH {lit(ds)} + duration('{dur}') - duration('{dur}') AS r\n"
                    "      RETURN r.epochSeconds AS es\n",
                    ["es"],
                    [[str(int(back.timestamp()))]],
                )
            )

    # 5) duration.between decomposition + invariant
    BETWEEN_CASES = [
        ("2024-01-31T00:00:00", "2024-03-01T00:00:00"),
        ("2024-02-29T00:00:00", "2025-02-28T00:00:00"),
        ("2020-01-01T00:00:00", "2024-07-15T06:30:45"),
        ("2024-03-15T10:00:00", "2024-03-15T09:59:00"),   # negative
        ("2024-03-09T12:00:00[America/New_York]",
         "2024-03-11T12:00:00[America/New_York]"),         # across DST
        ("2024-01-15T12:00:00", "2024-01-15T12:00:00"),   # zero
    ]
    for a_s, b_s in BETWEEN_CASES:
        a, b = parse(a_s), parse(b_s)
        mo, dd, ss = between(a, b)
        parts.append(
            scenario(
                f"duration.between({a_s}, {b_s})",
                f"      WITH duration.between({lit(a_s)}, {lit(b_s)}) AS d,\n"
                f"           {lit(a_s)} AS a, {lit(b_s)} AS b\n"
                "      RETURN d.months AS mo, d.days AS dd,\n"
                "             d.seconds AS ss,\n"
                "             (a + d) = b AS inv\n",
                ["mo", "dd", "ss", "inv"],
                [[str(mo), str(dd), str(ss), "true"]],
            )
        )

    # 6) duration component-group totals (Neo4j: totals WITHIN a group —
    #    months group / days group / seconds group are independent)
    DUR_CASES = [
        # (iso, months, days, seconds)
        ("P1Y2M3DT4H5M6S", 14, 3, 4 * 3600 + 5 * 60 + 6),
        ("P3Y", 36, 0, 0),
        ("P40D", 0, 40, 0),
        ("PT2H30M", 0, 0, 9000),
        ("P2W", 0, 14, 0),
        ("PT90061S", 0, 0, 90061),
        ("P1M-1D", 1, -1, 0),
    ]
    for iso, mo, dd, ss in DUR_CASES:
        vals = {
            "years": mo // 12 if mo >= 0 else -((-mo) // 12),
            "months": mo,
            "weeks": dd // 7 if dd >= 0 else -((-dd) // 7),
            "days": dd,
            "hours": ss // 3600 if ss >= 0 else -((-ss) // 3600),
            "minutes": ss // 60 if ss >= 0 else -((-ss) // 60),
            "seconds": ss,
        }
        cols = list(vals)
        parts.append(
            scenario(
                f"duration('{iso}') component-group totals",
                f"      WITH duration('{iso}') AS d\n"
                "      RETURN "
                + ", ".join(f"d.{k} AS {k}" for k in cols)
                + "\n",
                cols, [[str(vals[k]) for k in cols]],
            )
        )

    # 7) temporal comparison matrix (same-type ordering)
    parts.append(
        scenario(
            "datetime comparisons across zones compare instants",
            "      WITH datetime('2024-06-01T12:00:00') AS a,\n"
            "           datetime('2024-06-01T08:00:00-04:00') AS b,\n"
            "           datetime('2024-06-01T11:59:59') AS c\n"
            "      RETURN a = b AS eq, c < a AS lt, c >= b AS ge,\n"
            "             a <> c AS ne\n",
            ["eq", "lt", "ge", "ne"],
            [["true", "true", "false", "true"]],
        )
    )
    parts.append(
        scenario(
            "date ordering and equality",
            "      WITH date('2024-02-29') AS a, date('2024-03-01') AS b\n"
            "      RETURN a < b AS lt, a = date('2024-02-29') AS eq,\n"
            "             b <= a AS le\n",
            ["lt", "eq", "le"],
            [["true", "true", "false"]],
        )
    )

    # 8) component construction round-trips the accessor matrix
    CONSTRUCT = [
        ({"year": 2024, "month": 2, "day": 29}, date(2024, 2, 29)),
        ({"year": 2020, "week": 53, "dayOfWeek": 5}, date(2021, 1, 1)),
        ({"year": 2024, "ordinalDay": 60}, date(2024, 2, 29)),
        ({"year": 2024, "quarter": 3, "dayOfQuarter": 1}, date(2024, 7, 1)),
    ]
    for comp, expect in CONSTRUCT:
        kv = ", ".join(f"{k}: {v}" for k, v in comp.items())
        parts.append(
            scenario(
                f"date({{{kv}}}) construction",
                f"      WITH date({{{kv}}}) AS d\n"
                "      RETURN d.year AS y, d.month AS m, d.day AS dd\n",
                ["y", "m", "dd"],
                [[str(expect.year), str(expect.month), str(expect.day)]],
            )
        )

    out = "".join(parts)
    with open(OUT, "w") as f:
        f.write(out)
    print(f"wrote {OUT}: {out.count('Scenario:')} scenarios")


if __name__ == "__main__":
    main()
