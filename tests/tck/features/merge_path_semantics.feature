Feature: MERGE whole-pattern and cardinality semantics

  Scenario: MERGE of an unmatched whole path creates every element
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'}), (:U {n: 'b'})
      """
    When executing query:
      """
      MERGE (u:U {n: 'a'})-[:LIKES]->(v:U {n: 'zz'})
      RETURN v.n AS vn
      """
    Then the result should be, in any order:
      | vn   |
      | 'zz' |

  Scenario: Whole-path MERGE does not reuse existing nodes partially
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'})
      """
    And having executed:
      """
      MERGE (u:U {n: 'a'})-[:LIKES]->(v:U {n: 'zz'})
      """
    When executing query:
      """
      MATCH (u:U) RETURN count(u) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |

  Scenario: MERGE matching several nodes yields one row per match
    Given an empty graph
    And having executed:
      """
      CREATE (:M {k: 1, t: 'x'}), (:M {k: 1, t: 'y'})
      """
    When executing query:
      """
      MERGE (m:M {k: 1})
      RETURN m.t AS t ORDER BY t
      """
    Then the result should be, in order:
      | t   |
      | 'x' |
      | 'y' |

  Scenario: Relationship MERGE between multiply-matched endpoints creates per row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {n: 'a1'}), (:A {n: 'a2'}), (:B {n: 'b'})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Re-running a relationship MERGE is idempotent
    Given an empty graph
    And having executed:
      """
      CREATE (:A {n: 'a'}), (:B {n: 'b'})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R]->(b)
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: ON CREATE and ON MATCH are mutually exclusive per row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {n: 'a'}), (:B {n: 'b'})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[r:K]->(b) ON CREATE SET r.new = true
      """
    When executing query:
      """
      MATCH (a:A), (b:B)
      MERGE (a)-[r:K]->(b)
      ON CREATE SET r.new2 = true
      ON MATCH SET r.seen = true
      RETURN r.new AS new, r.new2 AS new2, r.seen AS seen
      """
    Then the result should be, in any order:
      | new  | new2 | seen |
      | true | null | true |

  Scenario: UNWIND MERGE deduplicates within the statement
    Given an empty graph
    When executing query:
      """
      UNWIND ['p', 'p', 'r'] AS n
      MERGE (m:MU {n: n})
      RETURN count(m) AS rows
      """
    Then the result should be, in any order:
      | rows |
      | 3    |

  Scenario: UNWIND MERGE creates one node per distinct key
    Given an empty graph
    And having executed:
      """
      UNWIND ['p', 'p', 'r'] AS n MERGE (m:MU {n: n})
      """
    When executing query:
      """
      MATCH (m:MU) RETURN count(m) AS total
      """
    Then the result should be, in any order:
      | total |
      | 2     |

  Scenario: MERGE chain binds then connects existing nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'}), (:U {n: 'b'})
      """
    And having executed:
      """
      MERGE (x:U {n: 'a'}) MERGE (y:U {n: 'b'}) MERGE (x)-[:PAIR]->(y)
      """
    When executing query:
      """
      MATCH (u:U) WITH count(u) AS nodes
      MATCH ()-[r:PAIR]->() RETURN nodes, count(r) AS rels
      """
    Then the result should be, in any order:
      | nodes | rels |
      | 2     | 1    |
