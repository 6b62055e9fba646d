Feature: DELETE semantics (reference src/executor.ts delete paths — dangling-
  relationship protection, DETACH cascade, delete of null endpoints)

  Scenario: DELETE a node with relationships raises
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) DELETE a
      """
    Then an error should be raised

  Scenario: DETACH DELETE removes the node and its relationships
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})
      """
    And having executed:
      """
      MATCH (a:A) DETACH DELETE a
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN count(r) AS rels
      """
    Then the result should be, in any order:
      | rels |
      | 0    |

  Scenario: DETACH DELETE leaves unrelated nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2}), (:C {id: 3})
      """
    And having executed:
      """
      MATCH (b:B) DETACH DELETE b
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: DELETE a relationship keeps its endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})
      """
    And having executed:
      """
      MATCH (:A)-[r:R]->(:B) DELETE r
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: DELETE null is a no-op
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[r:R]->() DELETE r RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: Deleted nodes are invisible to later reads
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1}), (:N {id: 2}), (:N {id: 3})
      """
    And having executed:
      """
      MATCH (n:N) WHERE n.id = 2 DETACH DELETE n
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 3  |

  Scenario: DETACH DELETE all nodes empties the graph
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})
      """
    And having executed:
      """
      MATCH (n) DETACH DELETE n
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Delete a relationship matched in either direction once
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})
      """
    And having executed:
      """
      MATCH (:A)-[r:R]-(:B) DELETE r
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN count(r) AS rels
      """
    Then the result should be, in any order:
      | rels |
      | 0    |

  Scenario: DETACH DELETE with self-loop
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {id: 1}) CREATE (a)-[:SELF]->(a)
      """
    And having executed:
      """
      MATCH (a:A) DETACH DELETE a
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Delete then create in separate statements
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})
      """
    And having executed:
      """
      MATCH (n:N) DETACH DELETE n
      """
    And having executed:
      """
      CREATE (:N {id: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |
