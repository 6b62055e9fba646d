Feature: CASE expression corners (TCK Case; reference CASE emission with
  3VL conditions)

  Scenario: Searched CASE with no default yields null
    Given an empty graph
    When executing query:
      """
      RETURN CASE WHEN false THEN 1 END AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |

  Scenario: Searched CASE null condition is not taken
    Given an empty graph
    When executing query:
      """
      RETURN CASE WHEN null THEN 'taken' ELSE 'not' END AS x
      """
    Then the result should be, in any order:
      | x     |
      | 'not' |

  Scenario: Simple CASE matches by equality
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS v
      RETURN v, CASE v WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS w
      ORDER BY v
      """
    Then the result should be, in order:
      | v | w      |
      | 1 | 'one'  |
      | 2 | 'two'  |
      | 3 | 'many' |

  Scenario: Simple CASE on null operand takes the default
    Given an empty graph
    When executing query:
      """
      RETURN CASE null WHEN null THEN 'eq' ELSE 'default' END AS x
      """
    Then the result should be, in any order:
      | x         |
      | 'default' |

  Scenario: CASE branches evaluate in order, first win
    Given an empty graph
    When executing query:
      """
      RETURN CASE WHEN true THEN 'first' WHEN true THEN 'second' END AS x
      """
    Then the result should be, in any order:
      | x       |
      | 'first' |

  Scenario: Nested CASE
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 5, 15] AS v
      RETURN CASE WHEN v < 10
                  THEN CASE WHEN v < 3 THEN 'tiny' ELSE 'small' END
                  ELSE 'big' END AS size_
      ORDER BY v
      """
    Then the result should be, in order:
      | size_   |
      | 'tiny'  |
      | 'small' |
      | 'big'   |

  Scenario: CASE over a missing property
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P)
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN CASE WHEN p.v IS NULL THEN 'missing' ELSE 'present' END AS st
      ORDER BY st
      """
    Then the result should be, in order:
      | st        |
      | 'missing' |
      | 'present' |

  Scenario: CASE result type can be numeric
    Given an empty graph
    When executing query:
      """
      UNWIND ['a', 'bb'] AS s
      RETURN CASE WHEN size(s) > 1 THEN size(s) ELSE 0 END AS n ORDER BY n
      """
    Then the result should be, in order:
      | n |
      | 0 |
      | 2 |

  Scenario: CASE inside an aggregate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 5}), (:P {v: 9})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN sum(CASE WHEN p.v > 3 THEN 1 ELSE 0 END) AS bigs
      """
    Then the result should be, in any order:
      | bigs |
      | 2    |

  Scenario: CASE in WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P {v: 7})
      """
    When executing query:
      """
      MATCH (p:P)
      WHERE CASE WHEN p.v > 5 THEN true ELSE false END
      RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 7 |

  Scenario: CASE with comparison operand cascade
    Given an empty graph
    When executing query:
      """
      UNWIND [0, 50, 150] AS v
      RETURN CASE WHEN v >= 100 THEN 'high'
                  WHEN v >= 10 THEN 'mid'
                  ELSE 'low' END AS b
      ORDER BY v
      """
    Then the result should be, in order:
      | b      |
      | 'low'  |
      | 'mid'  |
      | 'high' |

  Scenario: Simple CASE with expression operand
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS v
      RETURN CASE v % 2 WHEN 0 THEN 'even' WHEN 1 THEN 'odd' END AS par
      ORDER BY par
      """
    Then the result should be, in order:
      | par    |
      | 'even' |
      | 'odd'  |
