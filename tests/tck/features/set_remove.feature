Feature: SET / REMOVE / write semantics (TCK clauses/set, clauses/remove)

  Scenario: SET a new property on matched nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'}), (:P {name: 'b'})
      """
    And having executed:
      """
      MATCH (p:P) SET p.flag = true
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS name, p.flag AS flag ORDER BY name
      """
    Then the result should be, in order:
      | name | flag |
      | 'a'  | true |
      | 'b'  | true |

  Scenario: SET property to null removes it
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', v: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p.v = null
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v IS NULL AS gone
      """
    Then the result should be, in any order:
      | gone |
      | true |

  Scenario: SET computed from the node itself
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 10})
      """
    And having executed:
      """
      MATCH (p:P) SET p.v = p.v * 2 + 1
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 21 |

  Scenario: SET plus-equals merges properties
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 2})
      """
    And having executed:
      """
      MATCH (p:P) SET p += {b: 20, c: 30}
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a, p.b AS b, p.c AS c
      """
    Then the result should be, in any order:
      | a | b  | c  |
      | 1 | 20 | 30 |

  Scenario: SET equals replaces all properties
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 2})
      """
    And having executed:
      """
      MATCH (p:P) SET p = {c: 3}
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a IS NULL AS na, p.b IS NULL AS nb, p.c AS c
      """
    Then the result should be, in any order:
      | na   | nb   | c |
      | true | true | 3 |

  Scenario: REMOVE a property
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 2})
      """
    And having executed:
      """
      MATCH (p:P) REMOVE p.a
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a IS NULL AS na, p.b AS b
      """
    Then the result should be, in any order:
      | na   | b |
      | true | 2 |

  Scenario: SET adds a label and label scan sees it
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})
      """
    And having executed:
      """
      MATCH (p:P) SET p:Extra
      """
    When executing query:
      """
      MATCH (e:Extra) RETURN e.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |

  Scenario: REMOVE a label
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})
      """
    And having executed:
      """
      MATCH (p:P) SET p:Extra
      """
    And having executed:
      """
      MATCH (p:P) REMOVE p:Extra
      """
    When executing query:
      """
      MATCH (e:Extra) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: SET on a relationship property
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:T {w: 1}]->(:B)
      """
    And having executed:
      """
      MATCH ()-[r:T]->() SET r.w = r.w + 10
      """
    When executing query:
      """
      MATCH ()-[r:T]->() RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w  |
      | 11 |

  Scenario: DELETE a relationship keeps its endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})-[:T]->(:B {name: 'b'})
      """
    And having executed:
      """
      MATCH ()-[r:T]->() DELETE r
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: CREATE uses values computed by the preceding MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:Src {v: 7})
      """
    And having executed:
      """
      MATCH (s:Src) CREATE (:Copy {v: s.v * 2})
      """
    When executing query:
      """
      MATCH (c:Copy) RETURN c.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 14 |

  Scenario: UNWIND CREATE makes one node per element
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 3] AS x CREATE (:N {v: x})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS c, sum(n.v) AS s
      """
    Then the result should be, in any order:
      | c | s |
      | 3 | 6 |

  Scenario: Writes in earlier statements are visible to later reads
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p.v = 2
      """
    And having executed:
      """
      MATCH (p:P) WHERE p.v = 2 SET p.v = 3
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 3 |
