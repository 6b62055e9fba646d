Feature: ORDER BY and WITH scoping errors (reference src/executor.ts:862-956
  validateOrderByVariables — out-of-scope references are compile errors)

  Scenario: ORDER BY in WITH may reference an incoming variable the projection drops
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A {v: 2})
      """
    When executing query:
      """
      MATCH (a:A) WITH a.v AS v ORDER BY a.v DESC RETURN collect(v) AS l
      """
    Then the result should be, in any order:
      | l      |
      | [2, 1] |

  Scenario: ORDER BY an undefined variable is an error
    Given an empty graph
    When executing query:
      """
      MATCH (a:A) RETURN a.v AS v ORDER BY missing
      """
    Then a SyntaxError should be raised

  Scenario: ORDER BY can use the output alias
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 3}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
      | 3 |

  Scenario: ORDER BY can use the pre-projection variable in RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 3, w: 1}), (:P {v: 1, w: 3}), (:P {v: 2, w: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v ORDER BY p.w
      """
    Then the result should be, in order:
      | v |
      | 3 |
      | 2 |
      | 1 |

  Scenario: WITH ORDER BY then LIMIT applies before the next clause
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 5}), (:P {v: 1}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P) WITH p ORDER BY p.v DESC LIMIT 2
      RETURN sum(p.v) AS s
      """
    Then the result should be, in any order:
      | s |
      | 8 |

  Scenario: ORDER BY on aggregated WITH uses the alias
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 9})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.g AS g, sum(p.v) AS s ORDER BY s DESC
      RETURN g, s
      """
    Then the result should be, in order:
      | g   | s |
      | 'b' | 9 |
      | 'a' | 3 |

  Scenario: ORDER BY after aggregation cannot use the pre-aggregation variable
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.g AS g, count(*) AS c ORDER BY p.v RETURN g
      """
    Then a SyntaxError should be raised

  Scenario: WHERE cannot use an alias not yet projected
    Given an empty graph
    When executing query:
      """
      MATCH (p:P) WHERE q.v > 1 RETURN p.v AS v
      """
    Then a SyntaxError should be raised

  Scenario: WITH drops variables from scope for later clauses
    Given an empty graph
    When executing query:
      """
      MATCH (a:A) WITH a.v AS v RETURN a.v AS w
      """
    Then a SyntaxError should be raised

  Scenario: SET referencing an undefined variable is an error
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) SET p.v = missing RETURN p.v AS v
      """
    Then a SyntaxError should be raised

  Scenario: ORDER BY expression over two in-scope aliases
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 9}), (:P {a: 5, b: 1}), (:P {a: 3, b: 3})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a, p.b AS b ORDER BY a + b DESC, a
      """
    Then the result should be, in order:
      | a | b |
      | 1 | 9 |
      | 3 | 3 |
      | 5 | 1 |

  Scenario: SKIP and LIMIT with ORDER BY are deterministic
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 3}), (:P {v: 4})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v ORDER BY v SKIP 1 LIMIT 2
      """
    Then the result should be, in order:
      | v |
      | 2 |
      | 3 |

  Scenario: WITH * keeps all variables in scope
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})-[:R]->(:B {w: 2})
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B) WITH * RETURN a.v AS v, b.w AS w
      """
    Then the result should be, in any order:
      | v | w |
      | 1 | 2 |

  Scenario: Aliasing an expression hides the original name
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 7})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.v + 1 AS v RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 8 |
