Feature: Multi-hop MERGE — full-pattern atomicity over chains

  # openCypher MERGE over a multi-element path matches the ENTIRE pattern
  # or creates the ENTIRE pattern — never a half-created chain (reference
  # merge interpreters, src/executor.ts:6835-7121). Variable-length
  # relationships are illegal in MERGE and CREATE.

  Scenario: absent chain is created whole
    Given an empty graph
    And having executed:
      """
      MERGE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      """
    When executing query:
      """
      MATCH (a:A)-[:X]->(b:B)-[:Y]->(c:C)
      RETURN a.k AS ak, b.k AS bk, c.k AS ck
      """
    Then the result should be, in any order:
      | ak | bk | ck |
      | 1  | 2  | 3  |

  Scenario: existing chain is matched, not duplicated
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      """
    And having executed:
      """
      MERGE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 3     |

  Scenario: partial chain never reused — the whole pattern is created
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {k: 1})-[:X]->(b:B {k: 2})
      """
    And having executed:
      """
      MERGE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      """
    When executing query:
      """
      MATCH (n) WITH count(n) AS nodes
      MATCH ()-[r]->() RETURN nodes, count(r) AS rels
      """
    Then the result should be, in any order:
      | nodes | rels |
      | 5     | 3    |

  Scenario: multi-hop MERGE binds its variables for RETURN
    Given an empty graph
    When executing query:
      """
      MERGE (a:A {k: 1})-[x:X {w: 9}]->(b:B {k: 2})-[y:Y]->(c:C {k: 3})
      RETURN a.k AS ak, x.w AS xw, b.k AS bk, c.k AS ck
      """
    Then the result should be, in any order:
      | ak | xw | bk | ck |
      | 1  | 9  | 2  | 3  |

  Scenario: re-running a multi-hop MERGE is idempotent and rebinds
    Given an empty graph
    And having executed:
      """
      MERGE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      """
    When executing query:
      """
      MERGE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      RETURN a.k + b.k + c.k AS total
      """
    Then the result should be, in any order:
      | total |
      | 6     |

  Scenario: ON CREATE SET fires when the chain is created
    Given an empty graph
    When executing query:
      """
      MERGE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      ON CREATE SET a.made = true, c.made = true
      RETURN a.made AS am, b.made AS bm, c.made AS cm
      """
    Then the result should be, in any order:
      | am   | bm   | cm   |
      | true | null | true |

  Scenario: ON MATCH SET fires when the chain already exists
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      """
    When executing query:
      """
      MERGE (a:A {k: 1})-[:X]->(b:B {k: 2})-[:Y]->(c:C {k: 3})
      ON MATCH SET b.seen = true
      ON CREATE SET b.made = true
      RETURN b.seen AS seen, b.made AS made
      """
    Then the result should be, in any order:
      | seen | made |
      | true | null |

  Scenario: uncorrelated multi-hop MERGE under multiple rows creates once
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 3] AS i
      MERGE (:A)-[:X]->(:B)-[:Y]->(:C)
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 3     |

  Scenario: uncorrelated multi-hop MERGE binds the chain to every row
    Given an empty graph
    When executing query:
      """
      UNWIND [10, 20] AS i
      MERGE (a:A {k: 1})-[:X]->(:B)-[:Y]->(:C)
      RETURN i, a.k AS ak ORDER BY i
      """
    Then the result should be, in order:
      | i  | ak |
      | 10 | 1  |
      | 20 | 1  |

  Scenario: three-hop chain merges whole
    Given an empty graph
    And having executed:
      """
      MERGE (:A {k: 1})-[:X]->(:B {k: 2})-[:Y]->(:C {k: 3})-[:Z]->(:D {k: 4})
      """
    And having executed:
      """
      MERGE (:A {k: 1})-[:X]->(:B {k: 2})-[:Y]->(:C {k: 3})-[:Z]->(:D {k: 4})
      """
    When executing query:
      """
      MATCH (n) WITH count(n) AS nodes
      MATCH ()-[r]->() RETURN nodes, count(r) AS rels
      """
    Then the result should be, in any order:
      | nodes | rels |
      | 4     | 3    |

  Scenario: mixed-direction multi-hop MERGE matches and creates correctly
    Given an empty graph
    And having executed:
      """
      MERGE (a:A {k: 1})<-[:X]-(b:B {k: 2})-[:Y]->(c:C {k: 3})
      """
    When executing query:
      """
      MATCH (a:A)<-[:X]-(b:B)-[:Y]->(c:C)
      RETURN a.k AS ak, b.k AS bk, c.k AS ck
      """
    Then the result should be, in any order:
      | ak | bk | ck |
      | 1  | 2  | 3  |

  Scenario: correlated multi-hop MERGE from a bound endpoint creates per row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:A {k: 2})
      """
    And having executed:
      """
      MATCH (a:A)
      MERGE (a)-[:X]->(b:B {k: a.k})-[:Y]->(c:C)
      """
    When executing query:
      """
      MATCH (a:A)-[:X]->(b:B)-[:Y]->(:C)
      RETURN a.k AS ak, b.k AS bk ORDER BY ak
      """
    Then the result should be, in order:
      | ak | bk |
      | 1  | 1  |
      | 2  | 2  |

  Scenario: correlated multi-hop MERGE is idempotent per key tuple
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:A {k: 2})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:X]->(b:B {k: a.k})-[:Y]->(c:C)
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:X]->(b:B {k: a.k})-[:Y]->(c:C)
      """
    When executing query:
      """
      MATCH (n) WITH count(n) AS nodes
      MATCH ()-[r]->() RETURN nodes, count(r) AS rels
      """
    Then the result should be, in any order:
      | nodes | rels |
      | 6     | 4    |

  Scenario: outer-variable property multi-hop MERGE creates one chain per value
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 1] AS i
      MERGE (:A {k: i})-[:X]->(:B {k: i * 10})-[:Y]->(:C)
      """
    When executing query:
      """
      MATCH (a:A)-[:X]->(b:B)-[:Y]->(:C)
      RETURN a.k AS ak, b.k AS bk ORDER BY ak
      """
    Then the result should be, in order:
      | ak | bk |
      | 1  | 10 |
      | 2  | 20 |

  Scenario: correlated multi-hop MERGE with both end nodes bound
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 1}), (:T {k: 9})
      """
    And having executed:
      """
      MATCH (s:S), (t:T)
      MERGE (s)-[:X]->(m:M)-[:Y]->(t)
      """
    When executing query:
      """
      MATCH (s:S)-[:X]->(m:M)-[:Y]->(t:T)
      RETURN s.k AS sk, t.k AS tk
      """
    Then the result should be, in any order:
      | sk | tk |
      | 1  | 9  |

  Scenario: correlated multi-hop MERGE never extends a partial chain
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {k: 1})-[:X]->(:B {k: 1})
      """
    And having executed:
      """
      MATCH (a:A)
      MERGE (a)-[:X]->(b:B {k: a.k})-[:Y]->(c:C)
      """
    When executing query:
      """
      MATCH (n) WITH count(n) AS nodes
      MATCH ()-[r]->() RETURN nodes, count(r) AS rels
      """
    Then the result should be, in any order:
      | nodes | rels |
      | 4     | 3    |

  Scenario: correlated multi-hop MERGE ON CREATE and ON MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:A {k: 2})
      """
    And having executed:
      """
      MATCH (a:A) WHERE a.k = 1
      MERGE (a)-[:X]->(:B {k: a.k})-[:Y]->(:C)
      """
    When executing query:
      """
      MATCH (a:A)
      MERGE (a)-[x:X]->(:B {k: a.k})-[:Y]->(:C)
      ON CREATE SET x.made = true
      ON MATCH SET x.seen = true
      RETURN a.k AS ak, x.made AS made, x.seen AS seen ORDER BY ak
      """
    Then the result should be, in order:
      | ak | made | seen |
      | 1  | null | true |
      | 2  | true | null |

  Scenario: correlated multi-hop MERGE rebinds matching chains for all rows
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 7})
      """
    When executing query:
      """
      MATCH (a:A)
      MERGE (a)-[:X]->(b:B {k: a.k})-[:Y]->(c:C {tag: 'end'})
      RETURN a.k AS ak, b.k AS bk, c.tag AS tag
      """
    Then the result should be, in any order:
      | ak | bk | tag  |
      | 7  | 7  | 'end' |

  Scenario: variable length relationship in MERGE is rejected
    Given an empty graph
    When executing query:
      """
      MERGE (a:A)-[:X*2]->(b:B)
      """
    Then an error should be raised

  Scenario: variable length relationship in CREATE is rejected
    Given an empty graph
    When executing query:
      """
      CREATE (a:A)-[:X*1..2]->(b:B)
      """
    Then an error should be raised
