Feature: Label and property match combinations (reference Match1)

  Scenario: Inline property map with multiple keys requires all
    Given an empty graph
    And having executed:
      """
      CREATE (:M1 {a: 1, b: 'x'}), (:M1 {a: 1, b: 'y'})
      """
    When executing query:
      """
      MATCH (n:M1 {a: 1, b: 'x'}) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Inline property plus WHERE combine conjunctively
    Given an empty graph
    And having executed:
      """
      CREATE (:M1 {a: 1, b: 'x'}), (:M1 {a: 2, b: 'x'})
      """
    When executing query:
      """
      MATCH (n:M1 {b: 'x'}) WHERE n.a > 1 RETURN n.a AS a
      """
    Then the result should be, in any order:
      | a |
      | 2 |

  Scenario: Multi-label pattern intersects memberships
    Given an empty graph
    And having executed:
      """
      CREATE (:A1:B1 {v: 1}), (:A1 {v: 2}), (:B1 {v: 3})
      """
    When executing query:
      """
      MATCH (n:A1:B1) RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: Label in pattern and WHERE label predicate combine
    Given an empty graph
    And having executed:
      """
      CREATE (:A1:B1 {v: 1}), (:A1 {v: 2})
      """
    When executing query:
      """
      MATCH (n:A1) WHERE n:B1 RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: Negated label predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:A1:B1 {v: 1}), (:A1 {v: 2})
      """
    When executing query:
      """
      MATCH (n:A1) WHERE NOT n:B1 RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: Matching a nonexistent label yields nothing quietly
    Given an empty graph
    And having executed:
      """
      CREATE (:A1 {v: 1})
      """
    When executing query:
      """
      MATCH (n:NoSuchLabel) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Inline property referencing a parameter
    Given an empty graph
    And having executed:
      """
      CREATE (:M2 {k: 42}), (:M2 {k: 7})
      """
    And parameters are:
      | k | 42 |
    When executing query:
      """
      MATCH (n:M2 {k: $k}) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k  |
      | 42 |

  Scenario: Property equality on booleans
    Given an empty graph
    And having executed:
      """
      CREATE (:M3 {flag: true}), (:M3 {flag: false})
      """
    When executing query:
      """
      MATCH (n:M3 {flag: true}) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Property map on the relationship and both endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:M4 {n: 'a'})-[:R {w: 1}]->(:M4 {n: 'b'}),
             (:M4 {n: 'a'})-[:R {w: 2}]->(:M4 {n: 'b'})
      """
    When executing query:
      """
      MATCH (:M4 {n: 'a'})-[r:R {w: 2}]->(:M4 {n: 'b'}) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Anonymous node with inline properties
    Given an empty graph
    And having executed:
      """
      CREATE (:M5 {n: 'hub'})-[:R]->(:M5 {n: 'x', keep: true}),
             (:M5 {n: 'hub'})-[:R]->(:M5 {n: 'y'})
      """
    When executing query:
      """
      MATCH (:M5 {n: 'hub'})-[:R]->({keep: true}) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
