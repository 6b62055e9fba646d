Feature: MERGE variable binding rules (reference src/executor.ts:810-850
  validateMergeVariables — MATCH-bound variables cannot be re-merged as
  standalone patterns; repeated MERGE of the same variable is valid)

  Scenario: MERGE reusing a MATCH-bound variable standalone is an error
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})
      """
    When executing query:
      """
      MATCH (p:P) MERGE (p) RETURN p.name AS name
      """
    Then an error should be raised

  Scenario: MERGE relationship between MATCH-bound endpoints is valid
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1}), (:B {id: 2})
      """
    When executing query:
      """
      MATCH (a:A), (b:B) MERGE (a)-[r:LINKS]->(b)
      RETURN a.id AS aid, b.id AS bid
      """
    Then the result should be, in any order:
      | aid | bid |
      | 1   | 2   |

  Scenario: MERGE relationship twice creates one relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1}), (:B {id: 2})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:LINKS]->(b)
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:LINKS]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:LINKS]->(:B) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: MERGE node matches on full property map
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', v: 1})
      """
    And having executed:
      """
      MERGE (p:P {name: 'a', v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: MERGE ON CREATE sets only on the create path
    Given an empty graph
    And having executed:
      """
      MERGE (p:P {id: 1}) ON CREATE SET p.made = true ON MATCH SET p.seen = true
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.made AS made, p.seen AS seen
      """
    Then the result should be, in any order:
      | made | seen |
      | true | null |

  Scenario: MERGE ON MATCH sets only on the match path
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1})
      """
    And having executed:
      """
      MERGE (p:P {id: 1}) ON CREATE SET p.made = true ON MATCH SET p.seen = true
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.made AS made, p.seen AS seen
      """
    Then the result should be, in any order:
      | made | seen |
      | null | true |

  Scenario: MERGE after MERGE of the same variable pattern is valid
    Given an empty graph
    And having executed:
      """
      MERGE (c:C {id: 1}) MERGE (d:D {id: 2}) MERGE (c)-[:R]->(d)
      """
    When executing query:
      """
      MATCH (c:C)-[:R]->(d:D) RETURN c.id AS c, d.id AS d
      """
    Then the result should be, in any order:
      | c | d |
      | 1 | 2 |

  Scenario: MERGE creates the whole pattern when no full match exists
    Given an empty graph
    And having executed:
      """
      CREATE (:U {id: 1})
      """
    And having executed:
      """
      MERGE (:U {id: 1})-[:OWNS]->(:V {id: 9})
      """
    When executing query:
      """
      MATCH (u:U) RETURN count(u) AS us
      """
    Then the result should be, in any order:
      | us |
      | 2  |

  Scenario: MERGE with null property value raises
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {id: null}) RETURN p
      """
    Then an error should be raised

  Scenario: UNWIND MERGE binds per row and dedups
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 1, 3, 2] AS i MERGE (:N {id: i})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |

  Scenario: MERGE ON CREATE accumulates across UNWIND rows
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 1, 2] AS i MERGE (n:N {id: i}) ON CREATE SET n.first = i * 10
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.id AS id, n.first AS first ORDER BY id
      """
    Then the result should be, in order:
      | id | first |
      | 1  | 10    |
      | 2  | 20    |
