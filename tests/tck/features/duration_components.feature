Feature: Single-component duration constructors (duration.inMonths/inDays/inSeconds)

  Scenario: inMonths counts whole months with end-of-month clamping
    Given an empty graph
    When executing query:
      """
      RETURN duration.inMonths(date('2020-01-31'), date('2021-03-01')).months AS m
      """
    Then the result should be, in any order:
      | m  |
      | 13 |

  Scenario: inDays between dates counts whole days
    Given an empty graph
    When executing query:
      """
      RETURN duration.inDays(date('2020-01-01'), date('2020-03-01')).days AS d
      """
    Then the result should be, in any order:
      | d  |
      | 60 |

  Scenario: inDays truncates partial days between datetimes
    Given an empty graph
    When executing query:
      """
      RETURN duration.inDays(datetime('2020-01-01T12:00:00'), datetime('2020-01-03T11:00:00')).days AS d
      """
    Then the result should be, in any order:
      | d |
      | 1 |

  Scenario: inSeconds totals the elapsed seconds
    Given an empty graph
    When executing query:
      """
      RETURN duration.inSeconds(datetime('2020-01-01T00:00:00'), datetime('2020-01-01T01:30:45')).seconds AS s
      """
    Then the result should be, in any order:
      | s    |
      | 5445 |

  Scenario: inSeconds exposes hour and minute group accessors
    Given an empty graph
    When executing query:
      """
      WITH duration.inSeconds(datetime('2020-01-01T00:00:00'), datetime('2020-01-01T02:15:30')) AS d
      RETURN d.hours AS h, d.minutes AS m
      """
    Then the result should be, in any order:
      | h | m   |
      | 2 | 135 |

  Scenario: inMonths across a year boundary backwards is negative
    Given an empty graph
    When executing query:
      """
      RETURN duration.inMonths(date('2021-02-01'), date('2020-12-01')).months AS m
      """
    Then the result should be, in any order:
      | m  |
      | -2 |

  Scenario: inMonths year accessor groups by twelves
    Given an empty graph
    When executing query:
      """
      WITH duration.inMonths(date('2018-03-01'), date('2021-05-01')) AS d
      RETURN d.years AS y, d.monthsOfYear AS moy
      """
    Then the result should be, in any order:
      | y | moy |
      | 3 | 2   |

  Scenario: Accessors on a constructed ISO duration report group totals
    Given an empty graph
    When executing query:
      """
      WITH duration('P1Y2M3DT4H5M6S') AS d
      RETURN d.years AS y, d.months AS mo, d.days AS dd, d.hours AS h, d.minutes AS mi
      """
    Then the result should be, in any order:
      | y | mo | dd | h | mi  |
      | 1 | 14 | 3  | 4 | 245 |

  Scenario: Fractional seconds carry into milliseconds
    Given an empty graph
    When executing query:
      """
      RETURN duration('PT1.5S').milliseconds AS ms
      """
    Then the result should be, in any order:
      | ms   |
      | 1500 |

  Scenario: Weeks normalize to days
    Given an empty graph
    When executing query:
      """
      RETURN duration('P2W').days AS d
      """
    Then the result should be, in any order:
      | d  |
      | 14 |

  Scenario: Duration addition combines component groups
    Given an empty graph
    When executing query:
      """
      WITH duration('P1D') + duration('PT12H') AS d
      RETURN d.days AS dd, d.hours AS h
      """
    Then the result should be, in any order:
      | dd | h  |
      | 1  | 12 |

  Scenario: Duration negation and scaling
    Given an empty graph
    When executing query:
      """
      RETURN (duration('P1D') * 2).days AS dbl, toString(-duration('P1D')) AS neg
      """
    Then the result should be, in any order:
      | dbl | neg    |
      | 2   | 'P-1D' |

  Scenario: toString renders ISO-8601 with carried units
    Given an empty graph
    When executing query:
      """
      RETURN toString(duration({years: 1, days: 2, seconds: 90})) AS s,
             toString(duration('PT0S')) AS z
      """
    Then the result should be, in any order:
      | s             | z      |
      | 'P1Y2DT1M30S' | 'PT0S' |

  Scenario: Returning a duration value yields its ISO form
    Given an empty graph
    When executing query:
      """
      RETURN duration('P1DT2H') AS d
      """
    Then the result should be, in any order:
      | d        |
      | 'P1DT2H' |

  Scenario: Minutes cascade into hours group totals
    Given an empty graph
    When executing query:
      """
      WITH duration({minutes: 90}) AS d
      RETURN d.hours AS h, d.minutesOfHour AS moh
      """
    Then the result should be, in any order:
      | h | moh |
      | 1 | 30  |
