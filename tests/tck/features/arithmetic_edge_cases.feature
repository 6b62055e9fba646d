Feature: Arithmetic edge cases (division by zero, modulo signs, overflow
  ranges, float formatting — reference SQLite-parity choices)

  Scenario: Division by zero is null
    Given an empty graph
    When executing query:
      """
      RETURN 1 / 0 AS a, 1.0 / 0 AS b, 0 / 0 AS c, 5 % 0 AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: Integer division truncates toward zero
    Given an empty graph
    When executing query:
      """
      RETURN 7 / 2 AS a, -7 / 2 AS b, 7 / -2 AS c
      """
    Then the result should be, in any order:
      | a | b  | c  |
      | 3 | -3 | -3 |

  Scenario: Modulo follows the dividend sign
    Given an empty graph
    When executing query:
      """
      RETURN 7 % 3 AS a, -7 % 3 AS b, 7 % -3 AS c
      """
    Then the result should be, in any order:
      | a | b  | c |
      | 1 | -1 | 1 |

  Scenario: Float modulo
    Given an empty graph
    When executing query:
      """
      RETURN 7.5 % 2 AS a
      """
    Then the result should be, in any order:
      | a   |
      | 1.5 |

  Scenario: Mixed int float arithmetic widens to float
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 0.5 AS a, 2 * 1.5 AS b, 1 - 0.5 AS c
      """
    Then the result should be, in any order:
      | a   | b   | c   |
      | 1.5 | 3.0 | 0.5 |

  Scenario: Power always yields float
    Given an empty graph
    When executing query:
      """
      RETURN 2 ^ 3 AS a, 4 ^ 0.5 AS b, 2 ^ 0 AS c
      """
    Then the result should be, in any order:
      | a   | b   | c   |
      | 8.0 | 2.0 | 1.0 |

  Scenario: Negative zero equals zero
    Given an empty graph
    When executing query:
      """
      RETURN -0.0 = 0.0 AS z
      """
    Then the result should be, in any order:
      | z    |
      | true |

  Scenario: Large integer arithmetic stays integral
    Given an empty graph
    When executing query:
      """
      RETURN 1000000000 * 1000 AS big
      """
    Then the result should be, in any order:
      | big           |
      | 1000000000000 |

  Scenario: abs of the most common numeric shapes
    Given an empty graph
    When executing query:
      """
      RETURN abs(-5) AS i, abs(-5.5) AS f, abs(0) AS z
      """
    Then the result should be, in any order:
      | i | f   | z |
      | 5 | 5.5 | 0 |

  Scenario: round half away from zero on positive values
    Given an empty graph
    When executing query:
      """
      RETURN round(0.5) AS a, round(1.49) AS b, round(2.5) AS c
      """
    Then the result should be, in any order:
      | a   | b   | c   |
      | 1.0 | 1.0 | 3.0 |

  Scenario: Unary plus and minus chains
    Given an empty graph
    When executing query:
      """
      RETURN +5 AS a, --5 AS b, -+-5 AS c
      """
    Then the result should be, in any order:
      | a | b | c |
      | 5 | 5 | 5 |

  Scenario: Arithmetic on missing property is null not error
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v * p.missing AS x, p.v + 1 AS ok
      """
    Then the result should be, in any order:
      | x    | ok |
      | null | 3  |

  Scenario: sign on floats and negatives
    Given an empty graph
    When executing query:
      """
      RETURN sign(-0.5) AS a, sign(0.0) AS b, sign(42) AS c
      """
    Then the result should be, in any order:
      | a  | b | c |
      | -1 | 0 | 1 |

  Scenario: exp and log round trip
    Given an empty graph
    When executing query:
      """
      RETURN round(log(exp(2.0)) * 1000) / 1000 AS two
      """
    Then the result should be, in any order:
      | two |
      | 2.0 |

  Scenario: Long range boundaries parse as 64-bit integers
    Given an empty graph
    When executing query:
      """
      RETURN 9223372036854775807 AS maxlong, -9223372036854775808 AS minlong
      """
    Then the result should be, in any order:
      | maxlong             | minlong              |
      | 9223372036854775807 | -9223372036854775808 |

  Scenario: Hexadecimal integer literals
    Given an empty graph
    When executing query:
      """
      RETURN 0xFF AS h, -0x10 AS nh
      """
    Then the result should be, in any order:
      | h   | nh  |
      | 255 | -16 |
