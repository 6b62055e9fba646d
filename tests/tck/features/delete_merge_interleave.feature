Feature: DELETE / MERGE interleavings across statements

  Scenario: MERGE recreates after DELETE
    Given an empty graph
    And having executed:
      """
      CREATE (:C {k: 1, tag: 'old'})
      """
    And having executed:
      """
      MATCH (c:C {k: 1}) DELETE c
      """
    When executing query:
      """
      MERGE (c:C {k: 1}) ON CREATE SET c.tag = 'new' RETURN c.tag AS tag
      """
    Then the result should be, in any order:
      | tag   |
      | 'new' |

  Scenario: MERGE matches survivor after selective delete
    Given an empty graph
    And having executed:
      """
      CREATE (:C {k: 1}), (:C {k: 2})
      """
    And having executed:
      """
      MATCH (c:C {k: 1}) DELETE c
      """
    When executing query:
      """
      MERGE (c:C {k: 2}) ON MATCH SET c.seen = true ON CREATE SET c.seen = false
      RETURN c.seen AS seen
      """
    Then the result should be, in any order:
      | seen |
      | true |

  Scenario: DETACH DELETE then edge MERGE recreates the relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    And having executed:
      """
      MATCH (b:B {k: 2}) DETACH DELETE b
      """
    And having executed:
      """
      CREATE (:B {k: 2})
      """
    And having executed:
      """
      MATCH (a:A {k: 1}), (b:B {k: 2}) MERGE (a)-[:R]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: delete all then MATCH yields empty
    Given an empty graph
    And having executed:
      """
      CREATE (:X {v: 1}), (:X {v: 2})
      """
    And having executed:
      """
      MATCH (x:X) DELETE x
      """
    When executing query:
      """
      MATCH (x:X) RETURN x.v AS v
      """
    Then the result should be empty

  Scenario: DETACH DELETE removes edges in both directions
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 'mid'})
      """
    And having executed:
      """
      MATCH (a:N {k: 'mid'}) CREATE (:N {k: 'in'})-[:R]->(a), (a)-[:R]->(:N {k: 'out'})
      """
    And having executed:
      """
      MATCH (a:N {k: 'mid'}) DETACH DELETE a
      """
    When executing query:
      """
      MATCH (:N)-[r:R]->(:N) RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: plain DELETE of connected node raises
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    When executing query:
      """
      MATCH (a:A {k: 1}) DELETE a
      """
    Then an error should be raised

  Scenario: DELETE relationship then plain DELETE of node succeeds
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    And having executed:
      """
      MATCH (:A)-[r:R]->(:B) DELETE r
      """
    And having executed:
      """
      MATCH (a:A {k: 1}) DELETE a
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: MERGE ON MATCH after property REMOVE sees removed prop as null
    Given an empty graph
    And having executed:
      """
      CREATE (:C {k: 1, extra: 'x'})
      """
    And having executed:
      """
      MATCH (c:C {k: 1}) REMOVE c.extra
      """
    When executing query:
      """
      MERGE (c:C {k: 1}) ON MATCH SET c.had = c.extra IS NULL RETURN c.had AS had
      """
    Then the result should be, in any order:
      | had  |
      | true |

  Scenario: MERGE relationship is idempotent across repeats
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:L]->(b)
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:L]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:L]->(:B) RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: delete edge keeps its endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})
      """
    And having executed:
      """
      MATCH ()-[r:R]->() DELETE r
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: MERGE after label REMOVE creates a fresh node for the label
    Given an empty graph
    And having executed:
      """
      CREATE (:L1 {k: 1})
      """
    And having executed:
      """
      MATCH (n:L1) SET n:L2
      """
    And having executed:
      """
      MATCH (n:L1) REMOVE n:L1
      """
    When executing query:
      """
      MERGE (m:L1 {k: 1}) ON CREATE SET m.fresh = true RETURN m.fresh AS fresh
      """
    Then the result should be, in any order:
      | fresh |
      | true  |

  Scenario: recreate then MERGE matches the newest node
    Given an empty graph
    And having executed:
      """
      CREATE (:C {k: 1, gen: 1})
      """
    And having executed:
      """
      MATCH (c:C {k: 1}) DELETE c
      """
    And having executed:
      """
      CREATE (:C {k: 1, gen: 2})
      """
    When executing query:
      """
      MERGE (c:C {k: 1}) RETURN c.gen AS gen
      """
    Then the result should be, in any order:
      | gen |
      | 2   |

  Scenario: DELETE via WITH-filtered subset
    Given an empty graph
    And having executed:
      """
      CREATE (:D {v: 1}), (:D {v: 2}), (:D {v: 3})
      """
    And having executed:
      """
      MATCH (d:D) WITH d WHERE d.v < 3 DELETE d
      """
    When executing query:
      """
      MATCH (d:D) RETURN d.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 3 |

  Scenario: DETACH DELETE a node matched through its own edge
    Given an empty graph
    And having executed:
      """
      CREATE (:H {k: 'hub'})
      """
    And having executed:
      """
      MATCH (h:H) CREATE (h)-[:S]->(:Leaf {k: 1}), (h)-[:S]->(:Leaf {k: 2})
      """
    And having executed:
      """
      MATCH (h:H)-[:S]->(:Leaf) DETACH DELETE h
      """
    When executing query:
      """
      MATCH (l:Leaf) RETURN count(l) AS leaves
      """
    Then the result should be, in any order:
      | leaves |
      | 2      |

  Scenario: MERGE node sees nodes created by earlier CREATE statement
    Given an empty graph
    And having executed:
      """
      CREATE (:M {k: 5, origin: 'create'})
      """
    When executing query:
      """
      MERGE (m:M {k: 5}) ON CREATE SET m.origin = 'merge' RETURN m.origin AS o
      """
    Then the result should be, in any order:
      | o        |
      | 'create' |

  Scenario: UNWIND MERGE dedups within one statement
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 1, 2] AS k MERGE (:U {k: k})
      """
    When executing query:
      """
      MATCH (u:U) RETURN count(u) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: MERGE then DELETE then MERGE across statements
    Given an empty graph
    And having executed:
      """
      MERGE (:Z {k: 9})
      """
    And having executed:
      """
      MATCH (z:Z) DELETE z
      """
    And having executed:
      """
      MERGE (:Z {k: 9})
      """
    When executing query:
      """
      MATCH (z:Z) RETURN count(z) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: DELETE null is a no-op
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:NOPE]->(x) DELETE x RETURN a.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: SET on merged node persists for later statements
    Given an empty graph
    And having executed:
      """
      MERGE (c:K {k: 1}) ON CREATE SET c.n = 10
      """
    And having executed:
      """
      MERGE (c:K {k: 1}) ON MATCH SET c.n = c.n + 1
      """
    When executing query:
      """
      MATCH (c:K) RETURN c.n AS n
      """
    Then the result should be, in any order:
      | n  |
      | 11 |
