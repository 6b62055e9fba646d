Feature: OPTIONAL MATCH deep matrix (chains, WHERE placement, null flow)

  Scenario: two independent optional matches on one row
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {id: 1})-[:X]->(:BX {v: 'x'})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:X]->(x:BX)
      OPTIONAL MATCH (a)-[:Y]->(y:BY)
      RETURN a.id AS id, x.v AS xv, y.v AS yv
      """
    Then the result should be, in any order:
      | id | xv  | yv   |
      | 1  | 'x' | null |

  Scenario: chained optional match through a null binding stays null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:X]->(m)
      OPTIONAL MATCH (m)-[:Y]->(n)
      RETURN a.id AS id, m IS NULL AS mn, n IS NULL AS nn
      """
    Then the result should be, in any order:
      | id | mn   | nn   |
      | 1  | true | true |

  Scenario: WHERE on the optional pattern filters the match, not the row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R {w: 1}]->(:B), (:A {id: 2})-[:R {w: 9}]->(:B)
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[r:R]->(b:B) WHERE r.w > 5
      RETURN a.id AS id, r.w AS w ORDER BY id
      """
    Then the result should be, in order:
      | id | w    |
      | 1  | null |
      | 2  | 9    |

  Scenario: optional match repeated rows multiply per match
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {id: 1})-[:R]->(:B {v: 1})
      """
    And having executed:
      """
      MATCH (a:A {id: 1}) CREATE (a)-[:R]->(:B {v: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS id, b.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | id | v |
      | 1  | 1 |
      | 1  | 2 |

  Scenario: properties of a null entity are null not errors
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[r:R]->(b)
      RETURN a.id AS id, b.anything AS bp, r.weight AS rp,
             labels(b) AS bl, type(r) AS rt
      """
    Then the result should be, in any order:
      | id | bp   | rp   | bl   | rt   |
      | 1  | null | null | null | null |

  Scenario: id of a null entity is null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b)
      RETURN id(b) IS NULL AS nullid
      """
    Then the result should be, in any order:
      | nullid |
      | true   |

  Scenario: optional match before a required match keeps only real joins
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 10})-[:S]->(:C {id: 100})
      """
    And having executed:
      """
      CREATE (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      WITH a, b WHERE b IS NOT NULL
      MATCH (b)-[:S]->(c:C)
      RETURN a.id AS aid, c.id AS cid
      """
    Then the result should be, in any order:
      | aid | cid |
      | 1   | 100 |

  Scenario: aggregation over optional misses counts zero not one
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS id, count(b) AS n, count(*) AS rows ORDER BY id
      """
    Then the result should be, in order:
      | id | n | rows |
      | 1  | 1 | 1    |
      | 2  | 0 | 1    |

  Scenario: collect over optional misses yields empty list
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS id, collect(b.v) AS vs
      """
    Then the result should be, in any order:
      | id | vs |
      | 1  | [] |

  Scenario: optional match with label-only target on missing label
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:NeverSeen)
      RETURN a.id AS id, b IS NULL AS missing
      """
    Then the result should be, in any order:
      | id | missing |
      | 1  | true    |

  Scenario: whole-query optional match with no prior rows
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (n:Empty)
      RETURN n IS NULL AS missing
      """
    Then the result should be, in any order:
      | missing |
      | true    |

  Scenario: optional two-hop pattern is all-or-nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 10})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)-[:S]->(c:C)
      RETURN a.id AS id, b IS NULL AS bn, c IS NULL AS cn
      """
    Then the result should be, in any order:
      | id | bn   | cn   |
      | 1  | true | true |

  Scenario: comparison against a null optional property is unknown
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      WITH a, b WHERE b.v > 5
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: coalesce over optional chain picks the first match
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:SECOND]->(:B {v: 'fallback'})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:FIRST]->(f:B)
      OPTIONAL MATCH (a)-[:SECOND]->(s:B)
      RETURN coalesce(f.v, s.v, 'none') AS v
      """
    Then the result should be, in any order:
      | v          |
      | 'fallback' |

  Scenario: ORDER BY a nullable optional property places nulls last ascending
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {v: 5}), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS id, b.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | id | v    |
      | 1  | 5    |
      | 2  | null |

  Scenario: optional match sharing a relationship variable with WHERE on type
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:GOOD {w: 1}]->(:B)
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[r:GOOD]->(b:B)
      RETURN type(r) AS t, r.w AS w
      """
    Then the result should be, in any order:
      | t      | w |
      | 'GOOD' | 1 |

  Scenario: DISTINCT after optional preserves single null row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1}), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN DISTINCT b.v AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: optional match into CASE classification
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS id,
             CASE WHEN b IS NULL THEN 'alone' ELSE 'linked' END AS status
      ORDER BY id
      """
    Then the result should be, in order:
      | id | status   |
      | 1  | 'linked' |
      | 2  | 'alone'  |
