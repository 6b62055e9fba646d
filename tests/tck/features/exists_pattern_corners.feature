Feature: EXISTS and pattern predicate corners (reference EXISTS semi-join
  emission; pattern predicates in WHERE)

  Scenario: EXISTS pattern as a WHERE filter
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WHERE EXISTS((a)-[:R]->(:B)) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: NOT pattern as an anti filter
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WHERE NOT (a)-[:R]->(:B) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: Bare pattern predicate in WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R]->(:B) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: EXISTS on a property
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) WHERE EXISTS(p.v) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Pattern predicate in a boolean expression
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      RETURN a.id AS id, EXISTS((a)-[:R]->()) AS has_r ORDER BY id
      """
    Then the result should be, in order:
      | id | has_r |
      | 1  | true  |
      | 2  | false |

  Scenario: Pattern predicate with relationship property filter
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R {w: 5}]->(:B), (:A {id: 2})-[:R {w: 1}]->(:B)
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R {w: 5}]->(:B) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: EXISTS pattern against undirected expansion
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R]-() RETURN a.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: Pattern predicate OR property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2, vip: true}), (:A {id: 3})
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R]->(:B) OR a.vip = true
      RETURN a.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: NOT EXISTS with two-hop pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:M)-[:S]->(:B)
      CREATE (:A {id: 2})-[:R]->(:M)
      """
    When executing query:
      """
      MATCH (a:A) WHERE NOT EXISTS((a)-[:R]->()-[:S]->(:B))
      RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: Pattern comprehension counts per anchor
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {id: 1}) CREATE (a)-[:R]->(:B {v: 1}) CREATE (a)-[:R]->(:B {v: 2})
      CREATE (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      RETURN a.id AS id, size([(a)-[:R]->(b:B) | b.v]) AS n ORDER BY id
      """
    Then the result should be, in order:
      | id | n |
      | 1  | 2 |
      | 2  | 0 |

  Scenario: EXISTS inside CASE
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      RETURN a.id AS id,
             CASE WHEN EXISTS((a)-[:R]->()) THEN 'linked' ELSE 'bare' END AS st
      ORDER BY id
      """
    Then the result should be, in order:
      | id | st       |
      | 1  | 'linked' |
      | 2  | 'bare'   |
