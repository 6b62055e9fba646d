Feature: Simple CASE type-tagged equality (reference cypher_case_eq)

  Scenario: Integer operand matches a float branch value
    Given an empty graph
    When executing query:
      """
      RETURN CASE 1 WHEN 1.0 THEN 'num' ELSE 'no' END AS v
      """
    Then the result should be, in any order:
      | v     |
      | 'num' |

  Scenario: Number never matches a string branch
    Given an empty graph
    When executing query:
      """
      RETURN CASE 1 WHEN '1' THEN 'str' ELSE 'no' END AS v
      """
    Then the result should be, in any order:
      | v    |
      | 'no' |

  Scenario: Boolean never matches a number branch
    Given an empty graph
    When executing query:
      """
      RETURN CASE true WHEN 1 THEN 'one' ELSE 'no' END AS v
      """
    Then the result should be, in any order:
      | v    |
      | 'no' |

  Scenario: List operand matches deep-equal list branch
    Given an empty graph
    When executing query:
      """
      RETURN CASE [1, 2] WHEN [1, 2] THEN 'list' ELSE 'no' END AS v
      """
    Then the result should be, in any order:
      | v      |
      | 'list' |

  Scenario: Null operand always takes the default
    Given an empty graph
    When executing query:
      """
      RETURN CASE null WHEN null THEN 'matched' ELSE 'default' END AS v
      """
    Then the result should be, in any order:
      | v         |
      | 'default' |

  Scenario: Missing property operand takes the default
    Given an empty graph
    And having executed:
      """
      CREATE (:P {known: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN CASE p.unknown WHEN 1 THEN 'one' ELSE 'none' END AS v
      """
    Then the result should be, in any order:
      | v      |
      | 'none' |

  Scenario: Float operand matches integer branch numerically
    Given an empty graph
    When executing query:
      """
      RETURN CASE 2.0 WHEN 2 THEN 'two' ELSE 'no' END AS v
      """
    Then the result should be, in any order:
      | v     |
      | 'two' |

  Scenario: String operand with string branches
    Given an empty graph
    When executing query:
      """
      UNWIND ['a', 'b', 'c'] AS s
      RETURN s, CASE s WHEN 'a' THEN 1 WHEN 'b' THEN 2 ELSE 0 END AS v ORDER BY s
      """
    Then the result should be, in order:
      | s   | v |
      | 'a' | 1 |
      | 'b' | 2 |
      | 'c' | 0 |

  Scenario: CASE without default yields null when nothing matches
    Given an empty graph
    When executing query:
      """
      RETURN CASE 9 WHEN 1 THEN 'one' END AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: Branch expressions may be computed
    Given an empty graph
    When executing query:
      """
      WITH 4 AS x
      RETURN CASE x WHEN 2 + 2 THEN 'four' ELSE 'no' END AS v
      """
    Then the result should be, in any order:
      | v      |
      | 'four' |

  Scenario: Mixed-type branch results keep their own types
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      RETURN x, CASE WHEN x % 2 = 0 THEN x ELSE 'odd' END AS v ORDER BY x
      """
    Then the result should be, in order:
      | x | v     |
      | 1 | 'odd' |
      | 2 | 2     |
      | 3 | 'odd' |

  Scenario: Mixed-type CASE taking the numeric branch returns a number
    Given an empty graph
    When executing query:
      """
      RETURN CASE WHEN true THEN 1 ELSE 'x' END AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
