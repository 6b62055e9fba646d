Feature: UNWIND of scalars and ISO toString of temporals

  Scenario: UNWIND of a scalar yields one row
    Given an empty graph
    When executing query:
      """
      UNWIND 5 AS x RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 5 |

  Scenario: UNWIND of a string yields the string once
    Given an empty graph
    When executing query:
      """
      UNWIND 'abc' AS x RETURN x
      """
    Then the result should be, in any order:
      | x     |
      | 'abc' |

  Scenario: UNWIND of a map yields the map once
    Given an empty graph
    When executing query:
      """
      UNWIND {a: 1} AS m RETURN m.a AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |

  Scenario: toString of a zoned datetime is ISO with Z
    Given an empty graph
    When executing query:
      """
      RETURN toString(datetime('2020-05-05T10:00:00Z')) AS dt
      """
    Then the result should be, in any order:
      | dt                     |
      | '2020-05-05T10:00:00Z' |

  Scenario: toString keeps fractional seconds when present
    Given an empty graph
    When executing query:
      """
      RETURN toString(datetime('2020-05-05T10:00:00.123Z')) AS dt
      """
    Then the result should be, in any order:
      | dt                         |
      | '2020-05-05T10:00:00.123Z' |

  Scenario: toString of localdatetime has no zone suffix
    Given an empty graph
    When executing query:
      """
      RETURN toString(localdatetime('2020-05-05T10:00:00')) AS dt
      """
    Then the result should be, in any order:
      | dt                    |
      | '2020-05-05T10:00:00' |

  Scenario: toString of a zoned constructor carries offset and zone
    Given an empty graph
    When executing query:
      """
      RETURN toString(datetime({year: 2020, month: 6, day: 1, hour: 12, timezone: 'Europe/Paris'})) AS dt
      """
    Then the result should be, in any order:
      | dt                                       |
      | '2020-06-01T12:00:00+02:00[Europe/Paris]' |

  Scenario: properties of a map value is the map itself
    Given an empty graph
    When executing query:
      """
      RETURN properties({a: 1, b: 'x'}).a AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |

  Scenario: properties of null is null
    Given an empty graph
    When executing query:
      """
      WITH null AS m RETURN properties(m) AS p
      """
    Then the result should be, in any order:
      | p    |
      | null |
