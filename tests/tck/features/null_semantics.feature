Feature: Null propagation and ternary logic (TCK expressions/null corners)

  Scenario: Null equality is null, not true
    Given an empty graph
    When executing query:
      """
      RETURN null = null AS eq, null <> null AS ne
      """
    Then the result should be, in any order:
      | eq   | ne   |
      | null | null |

  Scenario: Comparison with null propagates
    Given an empty graph
    When executing query:
      """
      RETURN 1 < null AS a, null <= 1 AS b, 'x' > null AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |

  Scenario: AND ternary truth table
    Given an empty graph
    When executing query:
      """
      RETURN true AND null AS tn, false AND null AS fn, null AND null AS nn
      """
    Then the result should be, in any order:
      | tn   | fn    | nn   |
      | null | false | null |

  Scenario: OR ternary truth table
    Given an empty graph
    When executing query:
      """
      RETURN true OR null AS tn, false OR null AS fn, null OR null AS nn
      """
    Then the result should be, in any order:
      | tn   | fn   | nn   |
      | true | null | null |

  Scenario: XOR with null is always null
    Given an empty graph
    When executing query:
      """
      RETURN true XOR null AS tn, false XOR null AS fn
      """
    Then the result should be, in any order:
      | tn   | fn   |
      | null | null |

  Scenario: NOT null is null
    Given an empty graph
    When executing query:
      """
      RETURN NOT null AS n
      """
    Then the result should be, in any order:
      | n    |
      | null |

  Scenario: Arithmetic with null propagates
    Given an empty graph
    When executing query:
      """
      RETURN 1 + null AS a, null * 2 AS b, null / 0 AS c, -null AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: IN with null element and null subject
    Given an empty graph
    When executing query:
      """
      RETURN 3 IN [1, 2, null] AS maybe, 1 IN [1, null] AS yes,
             null IN [1, 2] AS subj, null IN [] AS emptylist
      """
    Then the result should be, in any order:
      | maybe | yes  | subj | emptylist |
      | null  | true | null | false     |

  Scenario: WHERE null filters the row out
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.v > 1 RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: WHERE NOT null also filters the row out
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) WHERE NOT (p.v > 1) RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: Missing property access returns null
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.missing AS m
      """
    Then the result should be, in any order:
      | m    |
      | null |

  Scenario: IS NULL and IS NOT NULL are never null
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P)
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.v IS NULL AS isn, p.v IS NOT NULL AS isnn
      """
    Then the result should be, in any order:
      | isn   | isnn  |
      | false | true  |
      | true  | false |

  Scenario: STARTS WITH on null operands
    Given an empty graph
    When executing query:
      """
      RETURN null STARTS WITH 'a' AS a, 'abc' STARTS WITH null AS b,
             null CONTAINS 'a' AS c, 'abc' ENDS WITH null AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: size of null and null list index
    Given an empty graph
    When executing query:
      """
      RETURN size(null) AS s, [1, 2, 3][null] AS i
      """
    Then the result should be, in any order:
      | s    | i    |
      | null | null |

  Scenario: coalesce picks first non-null
    Given an empty graph
    When executing query:
      """
      RETURN coalesce(null, null, 3, 4) AS c, coalesce(null) AS n
      """
    Then the result should be, in any order:
      | c | n    |
      | 3 | null |

  Scenario: String functions propagate null
    Given an empty graph
    When executing query:
      """
      RETURN toUpper(null) AS u, substring(null, 1) AS s, trim(null) AS t
      """
    Then the result should be, in any order:
      | u    | s    | t    |
      | null | null | null |

  Scenario: toInteger on a non-numeric string is null
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('nope') AS a, toFloat('1.5') AS b, toInteger('42') AS c
      """
    Then the result should be, in any order:
      | a    | b   | c  |
      | null | 1.5 | 42 |

  Scenario: CASE falls to else on null subject
    Given an empty graph
    When executing query:
      """
      RETURN CASE null WHEN 1 THEN 'one' ELSE 'other' END AS simple,
             CASE WHEN null THEN 'yes' ELSE 'no' END AS searched
      """
    Then the result should be, in any order:
      | simple  | searched |
      | 'other' | 'no'     |

  Scenario: CASE without else yields null
    Given an empty graph
    When executing query:
      """
      RETURN CASE 5 WHEN 1 THEN 'one' END AS c
      """
    Then the result should be, in any order:
      | c    |
      | null |

  Scenario: List concatenation with null is null
    Given an empty graph
    When executing query:
      """
      RETURN [1] + null AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |

  Scenario: Null-safe equality inside a list literal
    Given an empty graph
    When executing query:
      """
      RETURN [null = 1, 2 = 2] AS pairs
      """
    Then the result should be, in any order:
      | pairs          |
      | [null, true]   |
