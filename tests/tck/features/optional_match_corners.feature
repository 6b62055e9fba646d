Feature: OPTIONAL MATCH corners (TCK OptionalMatch; reference left-join
  emission translator.ts OPTIONAL paths)

  Scenario: Optional match on an empty graph returns one null row
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (n:Nope) RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: Optional expansion keeps the anchor row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2}), (:A {id: 3})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS a, b.id AS b ORDER BY a
      """
    Then the result should be, in order:
      | a | b    |
      | 1 | 2    |
      | 3 | null |

  Scenario: Properties of an unmatched optional variable are null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[r:R]->(b:B)
      RETURN a.id AS a, r.w AS w, b.id AS b
      """
    Then the result should be, in any order:
      | a | w    | b    |
      | 1 | null | null |

  Scenario: count over optional rows counts matches only
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN count(b) AS matched, count(*) AS rows
      """
    Then the result should be, in any order:
      | matched | rows |
      | 1       | 2    |

  Scenario: Two chained optional matches
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      OPTIONAL MATCH (b)-[:S]->(c:C)
      RETURN a.id AS a, b.id AS b, c.id AS c
      """
    Then the result should be, in any order:
      | a | b | c    |
      | 1 | 2 | null |

  Scenario: Optional match from a null start stays null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      OPTIONAL MATCH (b)-[:S]->(c:C)
      RETURN a.id AS a, b.id AS b, c.id AS c
      """
    Then the result should be, in any order:
      | a | b    | c    |
      | 1 | null | null |

  Scenario: WHERE inside optional match filters the join not the row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {v: 5}), (:A {id: 2})-[:R]->(:B {v: 50})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B) WHERE b.v > 10
      RETURN a.id AS a, b.v AS v ORDER BY a
      """
    Then the result should be, in order:
      | a | v    |
      | 1 | null |
      | 2 | 50   |

  Scenario: WHERE after optional in a later WITH filters rows
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {v: 5}), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B)
      WITH a, b WHERE b IS NOT NULL
      RETURN a.id AS a, b.v AS v
      """
    Then the result should be, in any order:
      | a | v |
      | 1 | 5 |

  Scenario: Optional match with label that exists but no edges
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1}), (:B {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS a, b.id AS b
      """
    Then the result should be, in any order:
      | a | b    |
      | 1 | null |

  Scenario: Aggregation groups unmatched optionals under null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {g: 'x'}),
             (:A {id: 2})-[:R]->(:B {g: 'x'}),
             (:A {id: 3})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN b.g AS g, count(*) AS c ORDER BY g
      """
    Then the result should be, in order:
      | g    | c |
      | 'x'  | 2 |
      | null | 1 |

  Scenario: Disconnected optional match is a left cross join on true
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1}), (:C {id: 7})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (c:C)
      RETURN a.id AS a, c.id AS c
      """
    Then the result should be, in any order:
      | a | c |
      | 1 | 7 |

  Scenario: Optional var-length expansion keeps anchors without paths
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})-[:R]->(:B {id: 3}), (:A {id: 9})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R*1..2]->(b:B)
      RETURN a.id AS a, b.id AS b ORDER BY a, b
      """
    Then the result should be, in order:
      | a | b    |
      | 1 | 2    |
      | 1 | 3    |
      | 9 | null |
