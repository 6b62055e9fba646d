Feature: Write+read combinations in one statement (CREATE...RETURN,
  SET...RETURN, MATCH...CREATE...RETURN chains; reference executor write
  paths return the post-write bindings)

  Scenario: CREATE RETURN projects the created properties
    Given an empty graph
    When executing query:
      """
      CREATE (n:P {name: 'x', v: 1}) RETURN n.name AS name, n.v AS v
      """
    Then the result should be, in any order:
      | name | v |
      | 'x'  | 1 |

  Scenario: CREATE a relationship and return its property
    Given an empty graph
    When executing query:
      """
      CREATE (:A)-[r:R {w: 7}]->(:B) RETURN r.w AS w, type(r) AS t
      """
    Then the result should be, in any order:
      | w | t   |
      | 7 | 'R' |

  Scenario: MATCH then CREATE per row
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'u1'}), (:U {name: 'u2'})
      """
    And having executed:
      """
      MATCH (u:U) CREATE (:Log {who: u.name})
      """
    When executing query:
      """
      MATCH (l:Log) RETURN l.who AS who ORDER BY who
      """
    Then the result should be, in order:
      | who  |
      | 'u1' |
      | 'u2' |

  Scenario: SET then RETURN reflects the new value
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) SET p.v = p.v * 10 RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 10 |

  Scenario: SET multiple properties in one clause
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p.b = 2, p.c = 3
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a, p.b AS b, p.c AS c
      """
    Then the result should be, in any order:
      | a | b | c |
      | 1 | 2 | 3 |

  Scenario: SET n = map replaces all properties
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
      MATCH (p:P) RETURN p.a AS a, p.b AS b, p.c AS c
      """
    Then the result should be, in any order:
      | a    | b    | c |
      | null | null | 3 |

  Scenario: SET n += map merges properties
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

  Scenario: REMOVE a property leaves others
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
      MATCH (p:P) RETURN p.a AS a, p.b AS b
      """
    Then the result should be, in any order:
      | a    | b |
      | null | 2 |

  Scenario: Setting a property to null removes it
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 2})
      """
    And having executed:
      """
      MATCH (p:P) SET p.a = null
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a, p.b AS b
      """
    Then the result should be, in any order:
      | a    | b |
      | null | 2 |

  Scenario: CREATE multiple patterns in one clause
    Given an empty graph
    When executing query:
      """
      CREATE (:X {id: 1}), (:X {id: 2}), (:Y {id: 3})
      RETURN 'done' AS st
      """
    Then the result should be, in any order:
      | st     |
      | 'done' |

  Scenario: Created nodes visible to the next statement not the same MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})
      """
    And having executed:
      """
      CREATE (:N {id: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: UNWIND CREATE RETURN per row
    Given an empty graph
    When executing query:
      """
      UNWIND [10, 20] AS v CREATE (n:P {v: v}) RETURN n.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | v  |
      | 10 |
      | 20 |

  Scenario: MERGE RETURN yields the merged node in both paths
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1, tag: 'old'})
      """
    When executing query:
      """
      MERGE (p:P {id: 1}) RETURN p.tag AS tag
      """
    Then the result should be, in any order:
      | tag   |
      | 'old' |

  Scenario: WITH between write clauses carries bindings
    Given an empty graph
    When executing query:
      """
      CREATE (a:A {v: 1})
      WITH a
      CREATE (b:B {v: a.v + 1})
      RETURN a.v AS av, b.v AS bv
      """
    Then the result should be, in any order:
      | av | bv |
      | 1  | 2  |

  Scenario: Labels added by SET are visible in a later statement
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p:Extra
      """
    When executing query:
      """
      MATCH (p:Extra) RETURN p.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |
