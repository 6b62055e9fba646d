Feature: ORDER BY and WITH scoping (reference executor ORDER BY scoping rules)

  Scenario: ORDER BY a returned alias
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

  Scenario: ORDER BY an expression over the underlying variable
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 3}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v ORDER BY p.v DESC
      """
    Then the result should be, in order:
      | v |
      | 3 |
      | 2 |
      | 1 |

  Scenario: ORDER BY a column not in the projection
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 9}), (:P {a: 2, b: 5}), (:P {a: 3, b: 7})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a ORDER BY p.b
      """
    Then the result should be, in order:
      | a |
      | 2 |
      | 3 |
      | 1 |

  Scenario: Nulls sort last ascending, first descending
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P), (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | v    |
      | 1    |
      | 2    |
      | null |

  Scenario: Descending puts nulls first
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P), (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v ORDER BY v DESC
      """
    Then the result should be, in order:
      | v    |
      | null |
      | 2    |
      | 1    |

  Scenario: ORDER BY after aggregation uses the aggregate alias
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a'}), (:P {g: 'b'}), (:P {g: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.g AS g, count(*) AS c ORDER BY c DESC, g
      """
    Then the result should be, in order:
      | g   | c |
      | 'b' | 2 |
      | 'a' | 1 |

  Scenario: WITH ORDER BY LIMIT then further matching
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {v: 1}), (b:P {v: 2}), (c:P {v: 3})
      CREATE (a)-[:T]->(b), (b)-[:T]->(c)
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p ORDER BY p.v DESC LIMIT 1
      MATCH (q:P)-[:T]->(p)
      RETURN q.v AS qv
      """
    Then the result should be, in any order:
      | qv |
      | 2  |

  Scenario: WITH alias shadows the original variable
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.v AS p
      RETURN p + 1 AS r
      """
    Then the result should be, in any order:
      | r |
      | 2 |

  Scenario: Variable not carried through WITH is out of scope
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1, w: 9})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.v AS v
      RETURN p.w AS w
      """
    Then a SyntaxError should be raised

  Scenario: SKIP and LIMIT compose after ORDER BY
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

  Scenario: ORDER BY on strings is lexicographic
    Given an empty graph
    And having executed:
      """
      CREATE (:P {s: 'b'}), (:P {s: 'a'}), (:P {s: 'ab'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.s AS s ORDER BY s
      """
    Then the result should be, in order:
      | s    |
      | 'a'  |
      | 'ab' |
      | 'b'  |

  Scenario: WITH WHERE filters before RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 5})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.v AS v WHERE v > 2
      RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 5 |

  Scenario: Ordered collect preserves WITH ORDER BY order
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P {v: 3}), (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p ORDER BY p.v DESC
      RETURN collect(p.v) AS vs
      """
    Then the result should be, in any order:
      | vs        |
      | [3, 2, 1] |

  Scenario: RETURN DISTINCT dedups full rows
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 1}), (:P {a: 1, b: 1}), (:P {a: 1, b: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN DISTINCT p.a AS a, p.b AS b ORDER BY a, b
      """
    Then the result should be, in order:
      | a | b |
      | 1 | 1 |
      | 1 | 2 |

  Scenario: UNION removes duplicate rows, UNION ALL keeps them
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:Q {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v
      UNION
      MATCH (q:Q) RETURN q.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: UNION ALL keeps duplicates
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:Q {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v
      UNION ALL
      MATCH (q:Q) RETURN q.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 1 |
