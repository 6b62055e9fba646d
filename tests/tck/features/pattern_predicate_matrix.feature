Feature: Pattern predicates in WHERE — EXISTS and bare patterns

  Scenario: bare pattern predicate keeps rows with the edge
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:R]->(:Q) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: NOT pattern predicate keeps rows without the edge
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE NOT (p)-[:R]->(:Q) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: EXISTS function form
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE EXISTS((p)-[:R]->()) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: pattern predicate with incoming direction
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})<-[:R]-(:Q), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)<-[:R]-(:Q) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: pattern predicate respecting inline properties
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q {flag: true}), (:P {k: 2})-[:R]->(:Q {flag: false})
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:R]->(:Q {flag: true}) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: two pattern predicates conjoined
    Given an empty graph
    And having executed:
      """
      CREATE (p:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) CREATE (p)-[:A]->(:QA), (p)-[:B]->(:QB)
      """
    And having executed:
      """
      CREATE (q:P {k: 2})
      """
    And having executed:
      """
      MATCH (q:P {k: 2}) CREATE (q)-[:A]->(:QA)
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:A]->() AND (p)-[:B]->() RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: pattern predicate OR property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 99})
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:R]->() OR p.k = 99 RETURN p.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k  |
      | 1  |
      | 99 |

  Scenario: two-hop pattern predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:M)-[:S]->(:Q), (:P {k: 2})-[:R]->(:M)
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:R]->()-[:S]->(:Q) RETURN p.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: pattern predicate does not multiply result rows
    Given an empty graph
    And having executed:
      """
      CREATE (p:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) CREATE (p)-[:R]->(:Q), (p)-[:R]->(:Q)
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:R]->(:Q) RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: pattern predicate in CASE expression
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.k AS k, CASE WHEN (p)-[:R]->() THEN 'yes' ELSE 'no' END AS e
      ORDER BY k
      """
    Then the result should be, in order:
      | k | e     |
      | 1 | 'yes' |
      | 2 | 'no'  |

  Scenario: NOT EXISTS matches the complement set
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 2}), (:P {k: 3})
      """
    When executing query:
      """
      MATCH (p:P) WHERE NOT EXISTS((p)-[:R]->()) RETURN p.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 2 |
      | 3 |

  Scenario: pattern comprehension as a filtered projection
    Given an empty graph
    And having executed:
      """
      CREATE (p:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) CREATE (p)-[:R {w: 1}]->(:Q {v: 10}), (p)-[:R {w: 2}]->(:Q {v: 20})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN [(p)-[r:R]->(q:Q) WHERE r.w > 1 | q.v] AS vs
      """
    Then the result should be, in any order:
      | vs   |
      | [20] |
