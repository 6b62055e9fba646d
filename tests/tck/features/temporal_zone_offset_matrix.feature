Feature: Temporal zone and offset matrix (beyond the DST basics)

  # America/New_York: spring forward 2024-03-10 02:00 → 03:00 (-05 → -04)
  #                   fall back    2024-11-03 02:00 → 01:00 (-04 → -05)
  # Australia/Lord_Howe: +10:30 / +11:00 (half-hour DST shift)

  Scenario: same instant in two zones compares equal
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-06-01T12:00:00[Europe/Paris]') AS p,
           datetime('2024-06-01T06:00:00-04:00[America/New_York]') AS n
      RETURN p = n AS eq, p.epochSeconds = n.epochSeconds AS same_epoch
      """
    Then the result should be, in any order:
      | eq   | same_epoch |
      | true | true       |

  Scenario: ordering zoned datetimes orders by instant
    Given an empty graph
    When executing query:
      """
      UNWIND [datetime('2024-06-01T23:00:00[Asia/Tokyo]'),
              datetime('2024-06-01T12:00:00[Europe/Paris]'),
              datetime('2024-06-01T08:00:00-04:00[America/New_York]')] AS t
      RETURN t.epochSeconds AS es ORDER BY t
      """
    Then the result should be, in order:
      | es         |
      | 1717236000 |
      | 1717243200 |
      | 1717250400 |

  Scenario: offset accessor on a positive half-hour zone
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-06-01T12:00:00+05:30') AS t
      RETURN t.offset AS off
      """
    Then the result should be, in any order:
      | off      |
      | '+05:30' |

  Scenario: offsetMinutes accessor
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-06-01T12:00:00+05:30') AS t
      RETURN t.offsetMinutes AS om
      """
    Then the result should be, in any order:
      | om  |
      | 330 |

  Scenario: timezone accessor yields the IANA name
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-06-01T12:00:00[Europe/Paris]') AS t
      RETURN t.timezone AS tz
      """
    Then the result should be, in any order:
      | tz             |
      | 'Europe/Paris' |

  Scenario: negative offset accessor
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-01-15T12:00:00[America/New_York]') AS t
      RETURN t.offset AS off, t.offsetMinutes AS om
      """
    Then the result should be, in any order:
      | off      | om   |
      | '-05:00' | -300 |

  Scenario: summer offset differs from winter offset in a DST zone
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-01-15T12:00:00[America/New_York]') AS w,
           datetime('2024-07-15T12:00:00[America/New_York]') AS s
      RETURN w.offset AS winter, s.offset AS summer
      """
    Then the result should be, in any order:
      | winter   | summer   |
      | '-05:00' | '-04:00' |

  Scenario: epochSeconds constructor with zone applies local accessors
    Given an empty graph
    When executing query:
      """
      WITH datetime({epochSeconds: 1717243200, timezone: 'America/New_York'}) AS t
      RETURN t.hour AS h, t.day AS d
      """
    Then the result should be, in any order:
      | h | d |
      | 8 | 1 |

  Scenario: spring-forward gap hour resolves forward
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-10T01:30:00[America/New_York]') + duration('PT1H') AS t
      RETURN toString(t) AS s
      """
    Then the result should be, in any order:
      | s                                             |
      | '2024-03-10T03:30:00-04:00[America/New_York]' |

  Scenario: duration.between across spring-forward in hours
    Given an empty graph
    When executing query:
      """
      WITH duration.between(datetime('2024-03-10T00:00:00[America/New_York]'),
                            datetime('2024-03-10T06:00:00[America/New_York]')) AS d
      RETURN d.hours AS h
      """
    Then the result should be, in any order:
      | h |
      | 5 |

  Scenario: truncate day on a zoned datetime keeps the zone midnight
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-10T15:30:00[America/New_York]').truncate('day') AS t
      RETURN t.hour AS h, t.day AS d
      """
    Then the result should be, in any order:
      | h | d  |
      | 0 | 10 |

  Scenario: adding months lands on the short-month clamp
    Given an empty graph
    When executing query:
      """
      WITH date('2024-01-31') + duration({months: 1}) AS d
      RETURN toString(d) AS s
      """
    Then the result should be, in any order:
      | s            |
      | '2024-02-29' |

  Scenario: subtracting a mixed duration applies calendar then exact parts
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-31T02:00:00') - duration('P1MT2H') AS t
      RETURN toString(t) AS s
      """
    Then the result should be, in any order:
      | s                      |
      | '2024-02-29T00:00:00Z' |

  Scenario: datetime minus itself is zero duration via between
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-05-05T10:00:00') AS t
      RETURN duration.between(t, t) AS d
      """
    Then the result should be, in any order:
      | d      |
      | 'PT0S' |

  Scenario: duration.between is negative when reversed
    Given an empty graph
    When executing query:
      """
      WITH duration.between(datetime('2024-05-05T12:00:00'),
                            datetime('2024-05-05T10:00:00')) AS d
      RETURN d.hours AS h
      """
    Then the result should be, in any order:
      | h  |
      | -2 |

  Scenario: localdatetime ignores zone arithmetic entirely
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2024-03-10T01:30:00') + duration('PT1H') AS t
      RETURN toString(t) AS s
      """
    Then the result should be, in any order:
      | s                     |
      | '2024-03-10T02:30:00' |

  Scenario: date from a zoned datetime truncation
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-10T23:30:00[America/New_York]') AS t
      RETURN t.truncate('day').day AS d, t.truncate('month').day AS md
      """
    Then the result should be, in any order:
      | d  | md |
      | 10 | 1  |

  Scenario: week accessor at an ISO year boundary
    Given an empty graph
    When executing query:
      """
      RETURN date('2021-01-01').week AS w, date('2021-01-01').weekYear AS wy
      """
    Then the result should be, in any order:
      | w  | wy   |
      | 53 | 2020 |

  Scenario: epochMillis accessor includes sub-second component
    Given an empty graph
    When executing query:
      """
      WITH datetime('1970-01-01T00:00:01.250') AS t
      RETURN t.epochMillis AS em
      """
    Then the result should be, in any order:
      | em   |
      | 1250 |

  Scenario: comparing date and zoned datetime within the same day
    Given an empty graph
    When executing query:
      """
      RETURN date('2024-06-01') <= datetime('2024-06-01T10:00:00') AS le
      """
    Then the result should be, in any order:
      | le   |
      | true |

  Scenario: adding a week-denominated duration
    Given an empty graph
    When executing query:
      """
      WITH date('2024-03-01') + duration({weeks: 2}) AS d
      RETURN toString(d) AS s
      """
    Then the result should be, in any order:
      | s            |
      | '2024-03-15' |

  Scenario: fall-back day is one calendar day via between
    Given an empty graph
    When executing query:
      """
      WITH duration.between(datetime('2024-11-03T00:00:00[America/New_York]'),
                            datetime('2024-11-04T00:00:00[America/New_York]')) AS d
      RETURN toString(d) AS s, d.hours AS h
      """
    Then the result should be, in any order:
      | s     | h |
      | 'P1D' | 0 |

  Scenario: fall-back day is 25 exact hours via inSeconds
    Given an empty graph
    When executing query:
      """
      WITH duration.inSeconds(datetime('2024-11-03T00:00:00[America/New_York]'),
                              datetime('2024-11-04T00:00:00[America/New_York]')) AS d
      RETURN d.hours AS h
      """
    Then the result should be, in any order:
      | h  |
      | 25 |

  Scenario: half-hour DST zone keeps wall-clock on calendar day add
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-04-06T12:00:00[Australia/Lord_Howe]') + duration('P1D') AS t
      RETURN t.hour AS h
      """
    Then the result should be, in any order:
      | h  |
      | 12 |

  Scenario: zone survives truncation and arithmetic chain
    Given an empty graph
    When executing query:
      """
      WITH (datetime('2024-07-04T17:45:00[America/New_York]')
            .truncate('hour') + duration('PT30M')) AS t
      RETURN toString(t) AS s
      """
    Then the result should be, in any order:
      | s                                             |
      | '2024-07-04T17:30:00-04:00[America/New_York]' |

  Scenario: datetime construction from components with zone
    Given an empty graph
    When executing query:
      """
      WITH datetime({year: 2024, month: 11, day: 3, hour: 1, minute: 30,
                     timezone: 'America/New_York'}) AS t
      RETURN t.hour AS h, t.minute AS m, t.timezone AS tz
      """
    Then the result should be, in any order:
      | h | m  | tz                 |
      | 1 | 30 | 'America/New_York' |

  Scenario: duration normalization keeps component groups separate
    Given an empty graph
    When executing query:
      """
      WITH duration('P1M40DT25H') AS d
      RETURN d.months AS mo, d.days AS dd, d.hours AS h
      """
    Then the result should be, in any order:
      | mo | dd | h  |
      | 1  | 40 | 25 |

  Scenario: adding two durations adds component-wise
    Given an empty graph
    When executing query:
      """
      RETURN toString(duration('P1MT1H') + duration('P2MT30M')) AS s
      """
    Then the result should be, in any order:
      | s           |
      | 'P3MT1H30M' |

  Scenario: negating a duration via subtraction from zero-duration
    Given an empty graph
    When executing query:
      """
      WITH duration('PT2H') - duration('PT3H') AS d
      RETURN d.hours AS h
      """
    Then the result should be, in any order:
      | h  |
      | -1 |
