Feature: Undirected MERGE relationship (match either orientation, create left-to-right)

  # Neo4j 3.5: MERGE (a)-[:R]-(b) matches an existing R in EITHER direction;
  # when none exists it creates a DIRECTED edge a->b. Multi-type MERGE
  # ([:X|Y]) is rejected outright.

  Scenario: undirected MERGE matches an existing forward edge
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:R]->(b:N {k: 2})
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2}) MERGE (a)-[:R]-(b)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: undirected MERGE matches an existing reverse edge
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})<-[:R]-(b:N {k: 2})
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2}) MERGE (a)-[:R]-(b)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: undirected MERGE creates left-to-right when nothing matches
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1}), (:N {k: 2})
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2}) MERGE (a)-[:R]-(b)
      """
    When executing query:
      """
      MATCH (s)-[r:R]->(d) RETURN s.k AS src, d.k AS dst
      """
    Then the result should be, in any order:
      | src | dst |
      | 1   | 2   |

  Scenario: undirected MERGE binds both edges when both orientations exist
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:R {w: 10}]->(b:N {k: 2}),
             (a)<-[:R {w: 20}]-(b)
      """
    When executing query:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2})
      MERGE (a)-[r:R]-(b)
      RETURN r.w AS w ORDER BY w
      """
    Then the result should be, in order:
      | w  |
      | 10 |
      | 20 |

  Scenario: undirected MERGE with ON MATCH touches edges of both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:R {w: 10}]->(b:N {k: 2}),
             (a)<-[:R {w: 20}]-(b)
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2})
      MERGE (a)-[r:R]-(b) ON MATCH SET r.hit = true
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN count(*) AS n, sum(CASE WHEN r.hit THEN 1 ELSE 0 END) AS hits
      """
    Then the result should be, in any order:
      | n | hits |
      | 2 | 2    |

  Scenario: undirected MERGE with ON CREATE sets only the new edge
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1}), (:N {k: 2})
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2})
      MERGE (a)-[r:R]-(b) ON CREATE SET r.fresh = true
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.fresh AS fresh
      """
    Then the result should be, in any order:
      | fresh |
      | true  |

  Scenario: undirected MERGE is idempotent across re-runs
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1}), (:N {k: 2})
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2}) MERGE (a)-[:R]-(b)
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2}) MERGE (a)-[:R]-(b)
      """
    And having executed:
      """
      MATCH (a:N {k: 2}), (b:N {k: 1}) MERGE (a)-[:R]-(b)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: undirected MERGE with relationship properties matches the full pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:R {w: 1}]->(b:N {k: 2})
      """
    And having executed:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2}) MERGE (a)-[:R {w: 2}]-(b)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.w AS w ORDER BY w
      """
    Then the result should be, in order:
      | w |
      | 1 |
      | 2 |

  Scenario: undirected MERGE self-loop binds once
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {k: 1})-[:R {w: 7}]->(a)
      """
    When executing query:
      """
      MATCH (a:N {k: 1})
      MERGE (a)-[r:R]-(a)
      RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: multi-type MERGE is rejected
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1}), (:N {k: 2})
      """
    When executing query:
      """
      MATCH (a:N {k: 1}), (b:N {k: 2}) MERGE (a)-[:X|Y]->(b)
      """
    Then a SyntaxError should be raised

  Scenario: undirected MERGE between two pairs creates one edge per pair
    Given an empty graph
    And having executed:
      """
      CREATE (:L {k: 1}), (:L {k: 2}), (:M {k: 3}), (:M {k: 4})
      """
    And having executed:
      """
      MATCH (l:L), (m:M) MERGE (l)-[:R]-(m)
      """
    When executing query:
      """
      MATCH (s:L)-[r:R]->(d:M) RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 4 |

  Scenario: undirected MERGE with an unbound endpoint matches either orientation
    Given an empty graph
    And having executed:
      """
      CREATE (:B {k: 1})-[:R]->(:A {k: 1})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]-(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: undirected MERGE with an unbound endpoint creates bound-to-unbound
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 2})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]-(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B)
      RETURN a.k AS ak, b.k AS bk
      """
    Then the result should be, in order:
      | ak | bk |
      | 2  | 2  |

  Scenario: undirected unbound-endpoint MERGE is idempotent across orientations
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 3})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]-(b:B {k: a.k})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]-(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: undirected unbound-endpoint MERGE ON MATCH against a reverse edge
    Given an empty graph
    And having executed:
      """
      CREATE (:B {k: 4})-[:R {w: 1}]->(:A {k: 4})
      """
    When executing query:
      """
      MATCH (a:A)
      MERGE (a)-[r:R]-(b:B {k: a.k})
      ON MATCH SET r.seen = true
      ON CREATE SET r.made = true
      RETURN r.w AS w, r.seen AS seen, r.made AS made
      """
    Then the result should be, in any order:
      | w | seen | made |
      | 1 | true | null |

  Scenario: standalone undirected MERGE with both endpoints unbound creates left-to-right
    Given an empty graph
    And having executed:
      """
      MERGE (a:A {k: 1})-[:R]-(b:B {k: 2})
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B) RETURN a.k AS ak, b.k AS bk
      """
    Then the result should be, in any order:
      | ak | bk |
      | 1  | 2  |

  Scenario: standalone undirected both-unbound MERGE matches a reverse edge
    Given an empty graph
    And having executed:
      """
      CREATE (:B {k: 2})-[:R]->(:A {k: 1})
      """
    And having executed:
      """
      MERGE (a:A {k: 1})-[:R]-(b:B {k: 2})
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: correlated undirected both-unbound MERGE matches either orientation
    Given an empty graph
    And having executed:
      """
      CREATE (:B {k: 9})-[:R]->(:A {k: 9})
      """
    And having executed:
      """
      UNWIND [9, 5] AS i
      MERGE (a:A {k: i})-[:R]-(b:B {k: i})
      """
    When executing query:
      """
      MATCH (a:A)-[r:R]-(b:B)
      RETURN a.k AS k, count(r) AS c ORDER BY k
      """
    Then the result should be, in order:
      | k | c |
      | 5 | 1 |
      | 9 | 1 |
