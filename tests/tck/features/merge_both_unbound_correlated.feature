Feature: Correlated MERGE with both endpoints unbound (per-row full-pattern match-else-create)

  Scenario: one pattern per distinct correlated key
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 1, 2, 3] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x) WITH x MERGE (a:A {k: x.k})-[:R]->(b:B)
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B) RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: created source nodes carry the correlated key values
    Given an empty graph
    And having executed:
      """
      UNWIND [10, 20] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      """
    When executing query:
      """
      MATCH (a:A) RETURN a.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k  |
      | 10 |
      | 20 |

  Scenario: re-running the same MERGE creates nothing new
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN count(r) AS edges
      """
    Then the result should be, in any order:
      | edges |
      | 2     |

  Scenario: existing full pattern is matched, partial pattern is not reused
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B)
      """
    And having executed:
      """
      CREATE (:A {k: 2})
      """
    And having executed:
      """
      UNWIND [1, 2] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      """
    When executing query:
      """
      MATCH (a:A) RETURN count(a) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: ON CREATE SET fires only for created patterns
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B)
      """
    And having executed:
      """
      UNWIND [1, 2] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      ON CREATE SET a.created = true
      """
    When executing query:
      """
      MATCH (a:A) WHERE a.created RETURN a.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: ON MATCH SET fires only for matched patterns
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B)
      """
    And having executed:
      """
      UNWIND [1, 2] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      ON MATCH SET b.seen = true
      """
    When executing query:
      """
      MATCH (b:B) WHERE b.seen RETURN count(b) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: propertyless pattern under outer scope creates exactly one
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 3] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:C)-[:RC]->(b:D)
      """
    When executing query:
      """
      MATCH (c:C)-[:RC]->(d:D) RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: merging with a null correlated key raises
    Given an empty graph
    And having executed:
      """
      CREATE (:X {k: 1}), (:X)
      """
    When executing query:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      """
    Then an error should be raised

  Scenario: relationship properties participate in the full-pattern key
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2] AS i CREATE (:X {k: i})
      """
    And having executed:
      """
      MATCH (x:X) MERGE (a:A)-[r:R {w: x.k}]->(b:B)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.w AS w ORDER BY w
      """
    Then the result should be, in order:
      | w |
      | 1 |
      | 2 |

  Scenario: rows binding after merge see the merged elements
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2] AS i CREATE (:X {k: i})
      """
    When executing query:
      """
      MATCH (x:X) MERGE (a:A {k: x.k})-[:R]->(b:B)
      RETURN x.k AS xk, a.k AS ak ORDER BY xk
      """
    Then the result should be, in order:
      | xk | ak |
      | 1  | 1  |
      | 2  | 2  |
