Feature: Operator precedence and boolean algebra deep matrix

  Scenario: arithmetic precedence binds multiplication first
    Given an empty graph
    When executing query:
      """
      RETURN 2 + 3 * 4 AS a, (2 + 3) * 4 AS b, 2 * 3 + 4 AS c
      """
    Then the result should be, in any order:
      | a  | b  | c  |
      | 14 | 20 | 10 |

  Scenario: exponent binds tighter than unary minus application order
    Given an empty graph
    When executing query:
      """
      RETURN 2 ^ 3 AS p, 2 ^ 2 ^ 3 AS chain
      """
    Then the result should be, in any order:
      | p   | chain |
      | 8.0 | 64.0  |

  Scenario: modulo and division left to right
    Given an empty graph
    When executing query:
      """
      RETURN 17 % 5 AS m, 17 / 5 AS d, 17.0 / 5 AS f
      """
    Then the result should be, in any order:
      | m | d | f   |
      | 2 | 3 | 3.4 |

  Scenario: unary minus with subtraction
    Given an empty graph
    When executing query:
      """
      RETURN -3 - -4 AS r, -(3 - 4) AS s
      """
    Then the result should be, in any order:
      | r | s |
      | 1 | 1 |

  Scenario: NOT binds tighter than AND
    Given an empty graph
    When executing query:
      """
      RETURN NOT true AND false AS a, NOT (true AND false) AS b
      """
    Then the result should be, in any order:
      | a     | b    |
      | false | true |

  Scenario: AND binds tighter than OR
    Given an empty graph
    When executing query:
      """
      RETURN true OR false AND false AS a, (true OR false) AND false AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: comparison binds tighter than boolean operators
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 2 AND 3 < 4 AS both, 1 < 2 OR 5 < 4 AS either
      """
    Then the result should be, in any order:
      | both | either |
      | true | true   |

  Scenario: three-valued AND truth table
    Given an empty graph
    When executing query:
      """
      WITH null AS u
      RETURN (true AND u) IS NULL AS tu, false AND u AS fu,
             (u AND u) IS NULL AS uu
      """
    Then the result should be, in any order:
      | tu   | fu    | uu   |
      | true | false | true |

  Scenario: three-valued OR truth table
    Given an empty graph
    When executing query:
      """
      WITH null AS u
      RETURN true OR u AS tu, (false OR u) IS NULL AS fu,
             (u OR u) IS NULL AS uu
      """
    Then the result should be, in any order:
      | tu   | fu   | uu   |
      | true | true | true |

  Scenario: three-valued XOR truth table
    Given an empty graph
    When executing query:
      """
      WITH null AS u
      RETURN true XOR false AS tf, true XOR true AS tt,
             (true XOR u) IS NULL AS tu, (u XOR u) IS NULL AS uu
      """
    Then the result should be, in any order:
      | tf   | tt    | tu   | uu   |
      | true | false | true | true |

  Scenario: NOT of null is null
    Given an empty graph
    When executing query:
      """
      WITH null AS u
      RETURN (NOT u) IS NULL AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |

  Scenario: double negation restores the value
    Given an empty graph
    When executing query:
      """
      RETURN NOT NOT true AS t, NOT NOT false AS f
      """
    Then the result should be, in any order:
      | t    | f     |
      | true | false |

  Scenario: chained comparisons evaluate pairwise
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 2 < 3 AS asc_ok
      """
    Then the result should be, in any order:
      | asc_ok |
      | true   |

  Scenario: equality chains compare pairwise with cross-type false
    Given an empty graph
    When executing query:
      """
      RETURN 1 = 1 = true AS weird
      """
    Then the result should be, in any order:
      | weird |
      | false |

  Scenario: string concatenation groups left to right with numbers
    Given an empty graph
    When executing query:
      """
      RETURN 'v' + 1 + 2 AS s
      """
    Then the result should be, in any order:
      | s     |
      | 'v12' |

  Scenario: IN binds looser than arithmetic
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 1 IN [2, 3] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |

  Scenario: parenthesized boolean subexpressions in WHERE
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4, 5, 6] AS x
      WITH x WHERE (x % 2 = 0 OR x > 4) AND NOT x = 6
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs        |
      | [2, 4, 5] |

  Scenario: comparison of negative numbers
    Given an empty graph
    When executing query:
      """
      RETURN -5 < -1 AS a, -1 <= -1 AS b, -0.0 = 0.0 AS z
      """
    Then the result should be, in any order:
      | a    | b    | z    |
      | true | true | true |

  Scenario: integer float equality across representations
    Given an empty graph
    When executing query:
      """
      RETURN 1 = 1.0 AS a, 0.1 + 0.2 = 0.3 AS fp
      """
    Then the result should be, in any order:
      | a    | fp    |
      | true | false |

  Scenario: boolean property in bare WHERE position
    Given an empty graph
    And having executed:
      """
      CREATE (:BF {id: 1, on: true}), (:BF {id: 2, on: false}), (:BF {id: 3})
      """
    When executing query:
      """
      MATCH (b:BF) WHERE b.on RETURN b.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |
