Feature: Temporal arithmetic and accessor corners (duration maths, truncate
  units, component accessors; reference temporal translator paths)

  Scenario: Date plus day duration
    Given an empty graph
    When executing query:
      """
      RETURN toString(date('2024-01-30') + duration({days: 3})) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2024-02-02' |

  Scenario: Datetime plus hours crosses midnight
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2024-03-15T23:30:00') + duration({hours: 1}) AS t
      RETURN t.day AS day, t.hour AS hour
      """
    Then the result should be, in any order:
      | day | hour |
      | 16  | 0    |

  Scenario: Duration subtraction
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2024-03-15T10:00:00') - duration({minutes: 90}) AS t
      RETURN t.hour AS h, t.minute AS m
      """
    Then the result should be, in any order:
      | h | m  |
      | 8 | 30 |

  Scenario: duration.between two datetimes
    Given an empty graph
    When executing query:
      """
      WITH duration.between(localdatetime('2024-03-15T10:00:00'),
                            localdatetime('2024-03-15T12:30:00')) AS d
      RETURN d.hours AS h, d.minutes AS m
      """
    Then the result should be, in any order:
      | h | m   |
      | 2 | 150 |

  Scenario: Truncate to day zeroes the time
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2024-03-15T10:31:22').truncate('day') AS t
      RETURN t.hour AS h, t.minute AS m, t.day AS d
      """
    Then the result should be, in any order:
      | h | m | d  |
      | 0 | 0 | 15 |

  Scenario: Truncate to month and year
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2024-03-15T10:31:22') AS t
      RETURN t.truncate('month').day AS md, t.truncate('year').month AS ym
      """
    Then the result should be, in any order:
      | md | ym |
      | 1  | 1  |

  Scenario: Week accessor follows ISO weeks
    Given an empty graph
    When executing query:
      """
      RETURN date('2024-01-01').week AS w1, date('2024-12-30').week AS w53
      """
    Then the result should be, in any order:
      | w1 | w53 |
      | 1  | 1   |

  Scenario: dayOfWeek is ISO Monday=1
    Given an empty graph
    When executing query:
      """
      RETURN date('2024-03-11').dayOfWeek AS mon, date('2024-03-17').dayOfWeek AS sun
      """
    Then the result should be, in any order:
      | mon | sun |
      | 1   | 7   |

  Scenario: Quarter accessor
    Given an empty graph
    When executing query:
      """
      RETURN date('2024-02-10').quarter AS q1, date('2024-11-10').quarter AS q4
      """
    Then the result should be, in any order:
      | q1 | q4 |
      | 1  | 4  |

  Scenario: ordinalDay accessor
    Given an empty graph
    When executing query:
      """
      RETURN date('2024-01-01').ordinalDay AS first, date('2024-12-31').ordinalDay AS last
      """
    Then the result should be, in any order:
      | first | last |
      | 1     | 366  |

  Scenario: Leap-year February arithmetic
    Given an empty graph
    When executing query:
      """
      RETURN toString(date('2024-02-28') + duration({days: 1})) AS leap,
             toString(date('2023-02-28') + duration({days: 1})) AS noleap
      """
    Then the result should be, in any order:
      | leap         | noleap       |
      | '2024-02-29' | '2023-03-01' |

  Scenario: Temporal comparison across a duration add
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2024-03-15T10:00:00') AS t
      RETURN t + duration({minutes: 1}) > t AS later
      """
    Then the result should be, in any order:
      | later |
      | true  |

  Scenario: epochSeconds round trip ordering
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-15T10:00:00Z') AS a, datetime('2024-03-15T10:00:01Z') AS b
      RETURN b.epochSeconds - a.epochSeconds AS diff
      """
    Then the result should be, in any order:
      | diff |
      | 1    |

  Scenario: Date components constructor round trip
    Given an empty graph
    When executing query:
      """
      WITH date({year: 2024, month: 3, day: 15}) AS d
      RETURN d.year AS y, d.month AS m, d.day AS dd
      """
    Then the result should be, in any order:
      | y    | m | dd |
      | 2024 | 3 | 15 |

  Scenario: Stored temporal property arithmetic
    Given an empty graph
    And having executed:
      """
      CREATE (:E {at: localdatetime('2024-03-15T10:00:00')})
      """
    When executing query:
      """
      MATCH (e:E) RETURN (e.at + duration({days: 1})).day AS d
      """
    Then the result should be, in any order:
      | d  |
      | 16 |
