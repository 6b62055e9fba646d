Feature: Temporal arithmetic across DST boundaries (zoned datetimes)

  # America/New_York: spring forward 2024-03-10 02:00 → 03:00 (-05:00 → -04:00)
  #                   fall back    2024-11-03 02:00 → 01:00 (-04:00 → -05:00)

  Scenario: calendar day across spring-forward keeps wall-clock time
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-09T12:00:00[America/New_York]') AS d
      RETURN toString(d + duration('P1D')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-03-10T12:00:00-04:00[America/New_York]' |

  Scenario: exact 24 hours across spring-forward lands one hour later
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-09T12:00:00[America/New_York]') AS d
      RETURN toString(d + duration('PT24H')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-03-10T13:00:00-04:00[America/New_York]' |

  Scenario: calendar day across fall-back keeps wall-clock time
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-11-02T12:00:00[America/New_York]') AS d
      RETURN toString(d + duration('P1D')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-11-03T12:00:00-05:00[America/New_York]' |

  Scenario: exact 24 hours across fall-back lands one hour earlier
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-11-02T12:00:00[America/New_York]') AS d
      RETURN toString(d + duration('PT24H')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-11-03T11:00:00-05:00[America/New_York]' |

  Scenario: mixed duration applies days as calendar then hours exactly
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-09T12:00:00[America/New_York]') AS d
      RETURN toString(d + duration('P1DT1H')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-03-10T13:00:00-04:00[America/New_York]' |

  Scenario: subtracting a calendar day back across fall-back
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-11-03T12:00:00[America/New_York]') AS d
      RETURN toString(d - duration('P1D')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-11-02T12:00:00-04:00[America/New_York]' |

  Scenario: one calendar month across spring-forward keeps wall clock
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-02-10T12:00:00[America/New_York]') AS d
      RETURN toString(d + duration('P1M')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-03-10T12:00:00-04:00[America/New_York]' |

  Scenario: UTC datetimes have no DST gap
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-09T12:00:00Z') AS d
      RETURN toString(d + duration('P1D')) AS r
      """
    Then the result should be, in any order:
      | r                     |
      | '2024-03-10T12:00:00Z' |

  Scenario: offset accessor flips across spring-forward
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-09T12:00:00[America/New_York]') AS d
      RETURN (d + duration('P1D')).offset AS o1, d.offset AS o0
      """
    Then the result should be, in any order:
      | o1       | o0       |
      | '-04:00' | '-05:00' |

  Scenario: epoch difference across spring-forward day is 23 hours
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-10T00:00:00[America/New_York]') AS a,
           datetime('2024-03-11T00:00:00[America/New_York]') AS b
      RETURN b.epochSeconds - a.epochSeconds AS secs
      """
    Then the result should be, in any order:
      | secs  |
      | 82800 |

  Scenario: epoch difference across fall-back day is 25 hours
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-11-03T00:00:00[America/New_York]') AS a,
           datetime('2024-11-04T00:00:00[America/New_York]') AS b
      RETURN b.epochSeconds - a.epochSeconds AS secs
      """
    Then the result should be, in any order:
      | secs  |
      | 90000 |

  Scenario: southern-hemisphere zone spring-forward
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-10-05T12:00:00[Australia/Sydney]') AS d
      RETURN toString(d + duration('P1D')) AS r
      """
    Then the result should be, in any order:
      | r                                           |
      | '2024-10-06T12:00:00+11:00[Australia/Sydney]' |

  Scenario: adding a week lands on the same wall-clock time
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-06T08:30:00[America/New_York]') AS d
      RETURN toString(d + duration('P7D')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-03-13T08:30:00-04:00[America/New_York]' |

  Scenario: minutes accumulate exactly across the gap
    Given an empty graph
    When executing query:
      """
      WITH datetime('2024-03-10T01:30:00[America/New_York]') AS d
      RETURN toString(d + duration('PT60M')) AS r
      """
    Then the result should be, in any order:
      | r                                            |
      | '2024-03-10T03:30:00-04:00[America/New_York]' |

  Scenario: zone-less local datetime arithmetic ignores DST
    Given an empty graph
    When executing query:
      """
      WITH localdatetime('2024-03-09T12:00:00') AS d
      RETURN toString(d + duration('P1D')) AS r
      """
    Then the result should be, in any order:
      | r                    |
      | '2024-03-10T12:00:00' |
