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

  Scenario: pre-bound variable in a multi-hop MERGE is rejected
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      MERGE (a)-[:X]->(:B)-[:Y]->(:C)
      """
    Then an error should be raised

  Scenario: outer-variable property in a multi-hop MERGE is rejected
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      MERGE (:A {k: i})-[:X]->(:B)-[:Y]->(:C)
      """
    Then an error should be raised

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
