Feature: Temporal accessors, constructors, truncation, and duration arithmetic
  # Reference surface: src/translator.ts:69-130 (zoned constructors),
  # 6418-6806 (week/ordinal/quarter dates), 13221-13332 (sub-second accessors).

  Scenario: Calendar accessors on a date literal
    Given an empty graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN d.year AS y, d.month AS m, d.day AS dd, d.quarter AS q
      """
    Then the result should be, in any order:
      | y    | m | dd | q |
      | 2024 | 3 | 15 | 1 |

  Scenario: Week and ordinal-day accessors
    Given an empty graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN d.week AS w, d.ordinalDay AS od, d.dayOfWeek AS dow
      """
    Then the result should be, in any order:
      | w  | od | dow |
      | 11 | 75 | 5   |

  Scenario: Time-of-day accessors on a datetime
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-15T13:45:30') AS t
      RETURN t.hour AS h, t.minute AS mi, t.second AS s
      """
    Then the result should be, in any order:
      | h  | mi | s  |
      | 13 | 45 | 30 |

  Scenario: Sub-second accessors report microsecond precision
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-01-01T00:00:00.123456') AS t
      RETURN t.millisecond AS ms, t.microsecond AS us, t.nanosecond AS ns
      """
    Then the result should be, in any order:
      | ms  | us     | ns        |
      | 123 | 123456 | 123456000 |

  Scenario: Epoch accessors
    Given an empty graph
    When executing query:
      """
      WITH datetime('1970-01-02T00:00:00') AS t
      RETURN t.epochSeconds AS es, t.epochMillis AS em
      """
    Then the result should be, in any order:
      | es    | em       |
      | 86400 | 86400000 |

  Scenario: Component-map datetime constructor
    Given an empty graph
    When executing query:
      """
      WITH datetime({year: 2021, month: 3, day: 14, hour: 5, minute: 30}) AS t
      RETURN t.year AS y, t.month AS m, t.day AS d, t.hour AS h, t.minute AS mi
      """
    Then the result should be, in any order:
      | y    | m | d  | h | mi |
      | 2021 | 3 | 14 | 5 | 30 |

  Scenario: Week-date constructor resolves ISO week and weekday
    Given an empty graph
    When executing query:
      """
      WITH date({year: 2024, week: 9, dayOfWeek: 2}) AS d
      RETURN d.year AS y, d.month AS m, d.day AS dd
      """
    Then the result should be, in any order:
      | y    | m | dd |
      | 2024 | 2 | 27 |

  Scenario: Ordinal-date constructor
    Given an empty graph
    When executing query:
      """
      WITH date({year: 2024, ordinalDay: 60}) AS d
      RETURN d.month AS m, d.day AS dd
      """
    Then the result should be, in any order:
      | m | dd |
      | 2 | 29 |

  Scenario: Quarter-date constructor
    Given an empty graph
    When executing query:
      """
      WITH date({year: 2023, quarter: 3, dayOfQuarter: 32}) AS d
      RETURN d.month AS m, d.day AS dd
      """
    Then the result should be, in any order:
      | m | dd |
      | 8 | 1  |

  Scenario: truncate to month day and hour
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-15T13:45:30') AS t
      RETURN t.truncate('month').day AS md,
             t.truncate('day').hour AS dh,
             t.truncate('hour').minute AS hm
      """
    Then the result should be, in any order:
      | md | dh | hm |
      | 1  | 0  | 0  |

  Scenario: truncate to year
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-15T13:45:30') AS t
      RETURN t.truncate('year').month AS m, t.truncate('year').day AS d
      """
    Then the result should be, in any order:
      | m | d |
      | 1 | 1 |

  Scenario: Datetime plus duration crosses a month boundary
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-01-31T00:00:00') + duration({days: 1}) AS t
      RETURN t.month AS m, t.day AS d
      """
    Then the result should be, in any order:
      | m | d |
      | 2 | 1 |

  Scenario: Adding months clamps to end of shorter month
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-01-31T00:00:00') + duration({months: 1}) AS t
      RETURN t.month AS m, t.day AS d
      """
    Then the result should be, in any order:
      | m | d  |
      | 2 | 29 |

  Scenario: Datetime minus duration
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-01T00:00:00') - duration({hours: 1}) AS t
      RETURN t.month AS m, t.day AS d, t.hour AS h
      """
    Then the result should be, in any order:
      | m | d  | h  |
      | 2 | 29 | 23 |

  Scenario: duration.between splits months then exact time
    Given an empty graph
    When executing query:
      """
      WITH duration.between(datetime('2024-01-01T00:00:00'),
                            datetime('2024-03-01T12:00:00')) AS du,
           duration.inDays(datetime('2024-01-01T00:00:00'),
                           datetime('2024-03-01T12:00:00')) AS dd
      RETURN du.months AS mo, du.days AS d, du.hours AS h, dd.days AS wd
      """
    Then the result should be, in any order:
      | mo | d | h  | wd |
      | 2  | 0 | 12 | 60 |

  Scenario: Datetime comparison orders chronologically
    Given an empty graph
    When executing query:
      """
      RETURN datetime('2024-01-01T00:00:00') < datetime('2024-01-02T00:00:00') AS lt,
             date('2024-05-05') = date('2024-05-05') AS eq
      """
    Then the result should be, in any order:
      | lt   | eq   |
      | true | true |

  Scenario: Zoned constructor normalizes to UTC epoch
    Given an empty graph
    When executing query:
      """
      WITH datetime('2020-06-01T12:30:45[America/New_York]') AS zd
      RETURN zd.epochSeconds AS es, zd.offset AS off
      """
    Then the result should be, in any order:
      | es         | off      |
      | 1591029045 | '-04:00' |

  Scenario: Component map with IANA timezone
    Given an empty graph
    When executing query:
      """
      WITH datetime({year: 2021, month: 3, day: 14, hour: 5, minute: 30,
                     timezone: 'Asia/Tokyo'}) AS t
      RETURN t.epochSeconds AS es, t.offset AS off
      """
    Then the result should be, in any order:
      | es         | off      |
      | 1615667400 | '+09:00' |

  Scenario: Temporal accessor on null propagates
    Given an empty graph
    When executing query:
      """
      WITH null AS t
      RETURN t.year IS NULL AS y
      """
    Then the result should be, in any order:
      | y    |
      | true |

  Scenario: date strips the time component
    Given an empty graph
    When executing query:
      """
      WITH date('2024-03-15') AS d, datetime('2024-03-15T10:30:00') AS t
      RETURN d <= t AS within_day
      """
    Then the result should be, in any order:
      | within_day |
      | true       |

  Scenario: Week-date ordinal-date and quarter-date string constructors
    Given an empty graph
    When executing query:
      """
      RETURN toString(date('2015-W30-2')) AS wd,
             toString(date('2015-202')) AS od,
             toString(date('2015-Q2-60')) AS qd
      """
    Then the result should be, in any order:
      | wd           | od           | qd           |
      | '2015-07-21' | '2015-07-21' | '2015-05-30' |

  Scenario: Epoch seconds constructor defines the instant
    Given an empty graph
    When executing query:
      """
      WITH datetime({epochSeconds: 1588291200}) AS dt
      RETURN dt.year AS y, dt.month AS m, dt.day AS d, dt.hour AS h
      """
    Then the result should be, in any order:
      | y    | m | d | h |
      | 2020 | 5 | 1 | 0 |

  Scenario: Epoch millis constructor keeps sub-second precision
    Given an empty graph
    When executing query:
      """
      RETURN datetime({epochMillis: 1588291200500}).millisecond AS ms
      """
    Then the result should be, in any order:
      | ms  |
      | 500 |

  Scenario: Epoch constructor with a display timezone shifts accessors
    Given an empty graph
    When executing query:
      """
      RETURN datetime({epochSeconds: 1588291200, timezone: 'Europe/Paris'}).hour AS h
      """
    Then the result should be, in any order:
      | h |
      | 2 |
