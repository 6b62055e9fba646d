Feature: Scalar and list functions propagate null arguments

  Scenario: String functions of null are null
    Given an empty graph
    When executing query:
      """
      RETURN substring(null, 1) AS a, replace(null, 'x', 'y') AS b,
             split(null, ',') AS c, left(null, 2) AS d, reverse(null) AS e
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    | e    |
      | null | null | null | null | null |

  Scenario: Math functions of null are null
    Given an empty graph
    When executing query:
      """
      RETURN abs(null) AS a, sqrt(null) AS b, round(null) AS c, sign(null) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: List accessors of null are null
    Given an empty graph
    When executing query:
      """
      WITH null AS l
      RETURN size(l) AS a, head(l) AS b, last(l) AS c, tail(l) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: keys of null is null
    Given an empty graph
    When executing query:
      """
      WITH null AS m RETURN keys(m) AS k
      """
    Then the result should be, in any order:
      | k    |
      | null |

  Scenario: Conversions of null are null
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(null) AS a, toFloat(null) AS b, toBoolean(null) AS c, toString(null) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: Arithmetic with null operands is null
    Given an empty graph
    When executing query:
      """
      RETURN 1 + null AS a, null * 2 AS b, null % 3 AS c, null ^ 2 AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: String concatenation with null is null
    Given an empty graph
    When executing query:
      """
      RETURN 'a' + null AS a, null + 'b' AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: coalesce skips nulls from functions
    Given an empty graph
    When executing query:
      """
      RETURN coalesce(toInteger(null), abs(null), 7) AS v
      """
    Then the result should be, in any order:
      | v |
      | 7 |

  Scenario: trim family of null is null
    Given an empty graph
    When executing query:
      """
      RETURN trim(null) AS a, ltrim(null) AS b, rtrim(null) AS c,
             toUpper(null) AS d, toLower(null) AS e
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    | e    |
      | null | null | null | null | null |

  Scenario: Comparison of null values is null not true
    Given an empty graph
    When executing query:
      """
      WITH null AS a, null AS b
      RETURN a = b AS eq, a <> b AS ne, a < b AS lt
      """
    Then the result should be, in any order:
      | eq   | ne   | lt   |
      | null | null | null |
