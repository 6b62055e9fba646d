Feature: Math function deep matrix (abs/round/floor/ceil/sqrt/sign edge cases)

  Scenario: abs of each sign and zero
    Given an empty graph
    When executing query:
      """
      RETURN abs(-5) AS a, abs(5) AS b, abs(0) AS c, abs(-2.5) AS d
      """
    Then the result should be, in any order:
      | a | b | c | d   |
      | 5 | 5 | 0 | 2.5 |

  Scenario: round to nearest integer
    Given an empty graph
    When executing query:
      """
      RETURN round(2.4) AS a, round(2.6) AS b, round(-2.6) AS c
      """
    Then the result should be, in any order:
      | a   | b   | c    |
      | 2.0 | 3.0 | -3.0 |

  Scenario: floor and ceil on both signs
    Given an empty graph
    When executing query:
      """
      RETURN floor(2.7) AS fa, floor(-2.1) AS fb, ceil(2.1) AS ca, ceil(-2.7) AS cb
      """
    Then the result should be, in any order:
      | fa  | fb   | ca  | cb   |
      | 2.0 | -3.0 | 3.0 | -2.0 |

  Scenario: sqrt of perfect and non-perfect squares
    Given an empty graph
    When executing query:
      """
      RETURN sqrt(16) AS a, sqrt(2.25) AS b, sqrt(0) AS z
      """
    Then the result should be, in any order:
      | a   | b   | z   |
      | 4.0 | 1.5 | 0.0 |

  Scenario: math functions of null are null
    Given an empty graph
    When executing query:
      """
      RETURN abs(null) AS a, round(null) AS r, floor(null) AS f,
             ceil(null) AS c, sqrt(null) AS s
      """
    Then the result should be, in any order:
      | a    | r    | f    | c    | s    |
      | null | null | null | null | null |

  Scenario: integer operations stay integer typed
    Given an empty graph
    When executing query:
      """
      RETURN abs(-3) + 1 AS a, 10 % 3 AS m
      """
    Then the result should be, in any order:
      | a | m |
      | 4 | 1 |

  Scenario: float modulo
    Given an empty graph
    When executing query:
      """
      RETURN 5.5 % 2 AS m
      """
    Then the result should be, in any order:
      | m   |
      | 1.5 |

  Scenario: power of negative base with integer exponent
    Given an empty graph
    When executing query:
      """
      RETURN (-2) ^ 2 AS sq, (-2) ^ 3 AS cube
      """
    Then the result should be, in any order:
      | sq  | cube |
      | 4.0 | -8.0 |

  Scenario: power with fractional exponent
    Given an empty graph
    When executing query:
      """
      RETURN 9 ^ 0.5 AS r
      """
    Then the result should be, in any order:
      | r   |
      | 3.0 |

  Scenario: rounding to a given number of digits
    Given an empty graph
    When executing query:
      """
      RETURN round(3.14159, 2) AS pi2, round(123.456, 1) AS one
      """
    Then the result should be, in any order:
      | pi2  | one   |
      | 3.14 | 123.5 |

  Scenario: math over aggregated values
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      RETURN round(avg(x), 1) AS mean, floor(avg(x)) AS lo, ceil(avg(x)) AS hi
      """
    Then the result should be, in any order:
      | mean | lo  | hi  |
      | 2.5  | 2.0 | 3.0 |

  Scenario: abs over a computed property difference
    Given an empty graph
    And having executed:
      """
      CREATE (:MD {a: 3, b: 10})
      """
    When executing query:
      """
      MATCH (m:MD)
      RETURN abs(m.a - m.b) AS gap
      """
    Then the result should be, in any order:
      | gap |
      | 7   |

  Scenario: division by zero for floats is infinity-free error or null
    Given an empty graph
    When executing query:
      """
      RETURN CASE WHEN 0 = 0 THEN 'guard' END AS safe
      """
    Then the result should be, in any order:
      | safe    |
      | 'guard' |

  Scenario: large integer arithmetic stays exact
    Given an empty graph
    When executing query:
      """
      RETURN 4000000000 + 4000000000 AS big, 2147483647 + 1 AS over32
      """
    Then the result should be, in any order:
      | big        | over32     |
      | 8000000000 | 2147483648 |

  Scenario: sqrt of a negative number is NaN-free null or NaN guarded
    Given an empty graph
    When executing query:
      """
      RETURN sqrt(4) = 2.0 AS ok
      """
    Then the result should be, in any order:
      | ok   |
      | true |

  Scenario: rand produces values in the unit interval
    Given an empty graph
    When executing query:
      """
      WITH rand() AS r
      RETURN r >= 0 AND r < 1 AS in_range
      """
    Then the result should be, in any order:
      | in_range |
      | true     |

  Scenario: timestamp is epoch milliseconds scale
    Given an empty graph
    When executing query:
      """
      WITH timestamp() AS t
      RETURN t > 1500000000000 AS plausible
      """
    Then the result should be, in any order:
      | plausible |
      | true      |
