Feature: MERGE relationship corners (reference src/executor.ts:6835-7610
  MERGE variants — direction, properties, ON CREATE/ON MATCH for rels)

  Scenario: MERGE relationship with properties matches only the full map
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R {w: 1}]->(:B {id: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R {w: 2}]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: MERGE relationship ON CREATE SET
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1}), (:B {id: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B)
      MERGE (a)-[r:R]->(b) ON CREATE SET r.made = true
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.made AS made
      """
    Then the result should be, in any order:
      | made |
      | true |

  Scenario: MERGE relationship ON MATCH SET
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R {n: 0}]->(:B {id: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B)
      MERGE (a)-[r:R]->(b) ON MATCH SET r.n = r.n + 1
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.n AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: MERGE whole path creates endpoints when absent
    Given an empty graph
    And having executed:
      """
      MERGE (:City {name: 'Rome'})-[:IN]->(:Country {name: 'IT'})
      """
    When executing query:
      """
      MATCH (c:City)-[:IN]->(k:Country)
      RETURN c.name AS city, k.name AS country
      """
    Then the result should be, in any order:
      | city   | country |
      | 'Rome' | 'IT'    |

  Scenario: Repeated MERGE of the whole path is idempotent
    Given an empty graph
    And having executed:
      """
      MERGE (:City {name: 'Rome'})-[:IN]->(:Country {name: 'IT'})
      """
    And having executed:
      """
      MERGE (:City {name: 'Rome'})-[:IN]->(:Country {name: 'IT'})
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS nodes
      """
    Then the result should be, in any order:
      | nodes |
      | 2     |

  Scenario: MERGE direction matters
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})<-[:R]-(:B {id: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:R]->(b)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: MERGE node after UNWIND with map parameter rows
    Given an empty graph
    And parameters are:
      | rows | [{id: 1}, {id: 2}, {id: 1}] |
    When executing query:
      """
      UNWIND $rows AS row MERGE (n:N {id: row.id})
      RETURN count(*) AS touched
      """
    Then the result should be, in any order:
      | touched |
      | 3       |

  Scenario: MERGE binds the node for immediate reuse
    Given an empty graph
    And having executed:
      """
      MERGE (a:P {id: 1}) MERGE (b:P {id: 2}) MERGE (a)-[:KNOWS]->(b)
      """
    When executing query:
      """
      MATCH (a:P {id: 1})-[:KNOWS]->(b:P {id: 2}) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: MERGE with backtick-free label and multiple key props
    Given an empty graph
    And having executed:
      """
      CREATE (:Point {x: 1, y: 2})
      """
    And having executed:
      """
      MERGE (:Point {x: 1, y: 3})
      """
    When executing query:
      """
      MATCH (p:Point) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: MERGE relationship between merged endpoints in one statement
    Given an empty graph
    And having executed:
      """
      MERGE (a:U {id: 1}) MERGE (b:U {id: 2}) MERGE (a)-[:F]->(b)
      """
    And having executed:
      """
      MERGE (a:U {id: 1}) MERGE (b:U {id: 2}) MERGE (a)-[:F]->(b)
      """
    When executing query:
      """
      MATCH (:U)-[r:F]->(:U) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
