Feature: Temporal truncate across every supported unit

  Scenario: Truncate datetime to week lands on Monday
    Given an empty graph
    When executing query:
      """
      WITH datetime('2020-05-15T13:45:30') AS dt
      RETURN toString(date(dt.truncate('week'))) AS monday, dt.truncate('week').dayOfWeek AS dow
      """
    Then the result should be, in any order:
      | monday       | dow |
      | '2020-05-11' | 1   |

  Scenario: Truncate datetime to quarter lands on the quarter start
    Given an empty graph
    When executing query:
      """
      WITH datetime('2020-08-20T10:00:00') AS dt
      RETURN dt.truncate('quarter').month AS m, dt.truncate('quarter').day AS d
      """
    Then the result should be, in any order:
      | m | d |
      | 7 | 1 |

  Scenario: Truncate to minute and second zero smaller fields
    Given an empty graph
    When executing query:
      """
      WITH datetime('2020-01-02T03:04:05.678') AS dt
      RETURN dt.truncate('minute').second AS s, dt.truncate('second').millisecond AS ms
      """
    Then the result should be, in any order:
      | s | ms |
      | 0 | 0  |

  Scenario: Truncate to hour keeps the hour
    Given an empty graph
    When executing query:
      """
      WITH datetime('2020-01-02T03:44:05') AS dt
      RETURN dt.truncate('hour').hour AS h, dt.truncate('hour').minute AS m
      """
    Then the result should be, in any order:
      | h | m |
      | 3 | 0 |

  Scenario: Truncate a date to year and month
    Given an empty graph
    When executing query:
      """
      WITH date('2021-11-23') AS d
      RETURN toString(d.truncate('year')) AS y, toString(d.truncate('month')) AS m
      """
    Then the result should be, in any order:
      | y            | m            |
      | '2021-01-01' | '2021-11-01' |

  Scenario: Truncate week on a date type
    Given an empty graph
    When executing query:
      """
      WITH date('2021-01-01') AS d
      RETURN toString(d.truncate('week')) AS w
      """
    Then the result should be, in any order:
      | w            |
      | '2020-12-28' |

  Scenario: Truncated datetime equality with constructed datetime
    Given an empty graph
    When executing query:
      """
      RETURN datetime('2020-05-05T10:30:00').truncate('day') = datetime({year: 2020, month: 5, day: 5}) AS eq
      """
    Then the result should be, in any order:
      | eq   |
      | true |

  Scenario: Truncate ordering is monotone
    Given an empty graph
    When executing query:
      """
      WITH datetime('2020-05-05T10:30:00') AS dt
      RETURN dt.truncate('day') <= dt AS le, dt.truncate('year') <= dt.truncate('month') AS ym
      """
    Then the result should be, in any order:
      | le   | ym   |
      | true | true |

  Scenario: Truncate on null propagates
    Given an empty graph
    When executing query:
      """
      WITH null AS dt
      RETURN dt.truncate('day') AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: Truncate localdatetime to day
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2020-07-04T09:08:07') AS dt
      RETURN dt.truncate('day').hour AS h, dt.truncate('day').day AS d
      """
    Then the result should be, in any order:
      | h | d |
      | 0 | 4 |
