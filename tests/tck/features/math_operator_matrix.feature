Feature: Arithmetic operator matrix — division, modulo, power, rounding

  Scenario: integer division truncates toward zero
    Given an empty graph
    When executing query:
      """
      RETURN 7 / 2 AS a, -7 / 2 AS b, 7 / -2 AS c
      """
    Then the result should be, in any order:
      | a | b  | c  |
      | 3 | -3 | -3 |

  Scenario: float division is exact
    Given an empty graph
    When executing query:
      """
      RETURN 7.0 / 2 AS a, 7 / 2.0 AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 3.5 | 3.5 |

  Scenario: modulo takes the dividend's sign
    Given an empty graph
    When executing query:
      """
      RETURN 7 % 3 AS a, -7 % 3 AS b, 7 % -3 AS c
      """
    Then the result should be, in any order:
      | a | b  | c |
      | 1 | -1 | 1 |

  Scenario: float modulo
    Given an empty graph
    When executing query:
      """
      RETURN 5.5 % 2 AS v
      """
    Then the result should be, in any order:
      | v   |
      | 1.5 |

  Scenario: power always yields float
    Given an empty graph
    When executing query:
      """
      RETURN 2 ^ 10 AS a, 9 ^ 0.5 AS b, 2 ^ -1 AS c
      """
    Then the result should be, in any order:
      | a      | b   | c   |
      | 1024.0 | 3.0 | 0.5 |

  Scenario: unary minus distributes over expressions
    Given an empty graph
    When executing query:
      """
      WITH 3 AS x RETURN -x AS a, -(x * 2) AS b, -(-x) AS c
      """
    Then the result should be, in any order:
      | a  | b  | c |
      | -3 | -6 | 3 |

  Scenario: rounding halves away from zero
    Given an empty graph
    When executing query:
      """
      RETURN round(2.5) AS a, round(-2.5) AS b, round(2.4) AS c
      """
    Then the result should be, in any order:
      | a   | b    | c   |
      | 3.0 | -3.0 | 2.0 |

  Scenario: ceil and floor on negatives
    Given an empty graph
    When executing query:
      """
      RETURN ceil(-1.5) AS a, floor(-1.5) AS b, ceil(1.5) AS c, floor(1.5) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c   | d   |
      | -1.0 | -2.0 | 2.0 | 1.0 |

  Scenario: sign of negatives zero positives
    Given an empty graph
    When executing query:
      """
      RETURN sign(-5) AS a, sign(0) AS b, sign(0.1) AS c
      """
    Then the result should be, in any order:
      | a  | b | c |
      | -1 | 0 | 1 |

  Scenario: abs over ints and floats
    Given an empty graph
    When executing query:
      """
      RETURN abs(-3) AS a, abs(-3.5) AS b, abs(3) AS c
      """
    Then the result should be, in any order:
      | a | b   | c |
      | 3 | 3.5 | 3 |

  Scenario: null propagates through every arithmetic operator
    Given an empty graph
    When executing query:
      """
      RETURN 1 + null AS a, null - 1 AS b, null * 2 AS c, null / 2 AS d,
             null % 2 AS e, 2 ^ null AS f
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    | e    | f    |
      | null | null | null | null | null | null |

  Scenario: precedence of power over unary minus argument
    Given an empty graph
    When executing query:
      """
      RETURN 2 ^ 2 + 1 AS a, 2 * 3 ^ 2 AS b
      """
    Then the result should be, in any order:
      | a   | b    |
      | 5.0 | 18.0 |

  Scenario: integer plus float widens
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 0.5 AS a, 2 * 0.5 AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 1.5 | 1.0 |

  Scenario: sqrt exp log functions
    Given an empty graph
    When executing query:
      """
      RETURN sqrt(16) AS a, exp(0) AS b, log(1) AS c, log10(100) AS d
      """
    Then the result should be, in any order:
      | a   | b   | c   | d   |
      | 4.0 | 1.0 | 0.0 | 2.0 |

  Scenario: e and pi constants exist
    Given an empty graph
    When executing query:
      """
      RETURN round(pi() * 10000) AS p, round(e() * 10000) AS ee
      """
    Then the result should be, in any order:
      | p       | ee      |
      | 31416.0 | 27183.0 |

  Scenario: comparison chain desugars to conjunction
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 2 < 3 AS a, 1 < 2 > 5 AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: arithmetic inside aggregate argument
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN sum(x * x) AS s, avg(x * 1.0) AS a
      """
    Then the result should be, in any order:
      | s  | a   |
      | 14 | 2.0 |
