Feature: Single-component duration constructors (duration.inMonths/inDays/inSeconds)

  Scenario: inMonths is the calendar year and month difference
    Given an empty graph
    When executing query:
      """
      RETURN duration.inMonths(date('2020-01-31'), date('2021-03-01')).months AS m
      """
    Then the result should be, in any order:
      | m  |
      | 14 |

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
