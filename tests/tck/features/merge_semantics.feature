Feature: MERGE variable rules (reference executor MERGE semantics)

  Scenario: MERGE creates when absent
    Given an empty graph
    When executing query:
      """
      MERGE (p:P {name: 'x'})
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'x'  |

  Scenario: MERGE matches when present without duplicating
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x'})
      """
    And having executed:
      """
      MERGE (p:P {name: 'x'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: MERGE ON CREATE SET runs only for created nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x', seen: 1})
      """
    And having executed:
      """
      MERGE (p:P {name: 'x'}) ON CREATE SET p.seen = 99
      """
    And having executed:
      """
      MERGE (p:P {name: 'y'}) ON CREATE SET p.seen = 42
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS name, p.seen AS seen ORDER BY name
      """
    Then the result should be, in order:
      | name | seen |
      | 'x'  | 1    |
      | 'y'  | 42   |

  Scenario: MERGE ON MATCH SET runs only for matched nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x', hits: 0})
      """
    And having executed:
      """
      MERGE (p:P {name: 'x'}) ON MATCH SET p.hits = p.hits + 1
      """
    And having executed:
      """
      MERGE (p:P {name: 'y'}) ON MATCH SET p.hits = 100
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS name, p.hits AS hits ORDER BY name
      """
    Then the result should be, in order:
      | name | hits |
      | 'x'  | 1    |
      | 'y'  | null |

  Scenario: MERGE on a bound variable is an error
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x'})
      """
    When executing query:
      """
      MATCH (p:P) MERGE (p:P {name: 'y'}) RETURN p
      """
    Then a SyntaxError should be raised

  Scenario: MERGE relationship between matched endpoints creates once
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'}), (:B {name: 'b'})
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:T]->(b)
      """
    And having executed:
      """
      MATCH (a:A), (b:B) MERGE (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (:A)-[r:T]->(:B) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: MERGE matches null-property pattern by absence
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x', v: 1})
      """
    And having executed:
      """
      MERGE (p:P {name: 'x', v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: MERGE creates the full path when no match exists
    Given an empty graph
    And having executed:
      """
      MERGE (a:A {name: 'a'})-[:T]->(b:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:A)-[:T]->(b:B) RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'a' | 'b' |
