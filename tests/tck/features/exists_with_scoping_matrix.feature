Feature: EXISTS and pattern predicates under WITH scoping (nested pipeline corners)

  Scenario: pattern predicate survives a WITH projection of the node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WITH a WHERE (a)-[:R]->(:B) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: pattern predicate after WITH rename
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WITH a AS x WHERE (x)-[:R]->(:B) RETURN x.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: EXISTS pattern after an aggregating WITH keeps the grouped node
    Given an empty graph
    And having executed:
      """
      CREATE (a1:A {id: 1})-[:R]->(:B), (a2:A {id: 2})
      """
    And having executed:
      """
      MATCH (a:A) CREATE (a)-[:OWNS]->(:C)
      """
    When executing query:
      """
      MATCH (a:A)-[:OWNS]->(c:C)
      WITH a, count(c) AS n
      WHERE EXISTS((a)-[:R]->(:B))
      RETURN a.id AS id, n
      """
    Then the result should be, in any order:
      | id | n |
      | 1  | 1 |

  Scenario: NOT pattern after an aggregating WITH
    Given an empty graph
    And having executed:
      """
      CREATE (a1:A {id: 1})-[:R]->(:B), (a2:A {id: 2})
      """
    And having executed:
      """
      MATCH (a:A) CREATE (a)-[:OWNS]->(:C)
      """
    When executing query:
      """
      MATCH (a:A)-[:OWNS]->(c:C)
      WITH a, count(c) AS n
      WHERE NOT (a)-[:R]->(:B)
      RETURN a.id AS id, n
      """
    Then the result should be, in any order:
      | id | n |
      | 2  | 1 |

  Scenario: pattern predicate between two WITH-carried nodes
    Given an empty graph
    And having executed:
      """
      CREATE (a1:A {id: 1})-[:R]->(b1:B {id: 10})
      """
    And having executed:
      """
      CREATE (:A {id: 2}), (:B {id: 20})
      """
    When executing query:
      """
      MATCH (a:A), (b:B)
      WITH a, b
      WHERE (a)-[:R]->(b)
      RETURN a.id AS aid, b.id AS bid
      """
    Then the result should be, in any order:
      | aid | bid |
      | 1   | 10  |

  Scenario: EXISTS inside a searched CASE after WITH
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      WITH a
      RETURN a.id AS id,
             CASE WHEN (a)-[:R]->(:B) THEN 'linked' ELSE 'lonely' END AS s
      ORDER BY id
      """
    Then the result should be, in order:
      | id | s        |
      | 1  | 'linked' |
      | 2  | 'lonely' |

  Scenario: EXISTS pattern as a RETURN projection value
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) RETURN a.id AS id, EXISTS((a)-[:R]->(:B)) AS has
      ORDER BY id
      """
    Then the result should be, in order:
      | id | has   |
      | 1  | true  |
      | 2  | false |

  Scenario: pattern predicate under OPTIONAL MATCH null binding is null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:NOPE]->(m)
      WITH a, m
      RETURN a.id AS id, m IS NULL AS mnull
      """
    Then the result should be, in any order:
      | id | mnull |
      | 1  | true  |

  Scenario: EXISTS with a property map inside the pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {k: 5}), (:A {id: 2})-[:R]->(:B {k: 6})
      """
    When executing query:
      """
      MATCH (a:A) WHERE EXISTS((a)-[:R]->(:B {k: 5})) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: EXISTS with an edge property map
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R {w: 1}]->(:B), (:A {id: 2})-[:R {w: 2}]->(:B)
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R {w: 1}]->(:B) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: incoming-direction pattern predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 10})
      """
    And having executed:
      """
      CREATE (:B {id: 20})
      """
    When executing query:
      """
      MATCH (b:B) WHERE (b)<-[:R]-(:A) RETURN b.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 10 |

  Scenario: undirected pattern predicate matches either direction
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R]->(:N {id: 2})
      """
    And having executed:
      """
      CREATE (:N {id: 3})
      """
    When executing query:
      """
      MATCH (n:N) WHERE (n)-[:R]-() RETURN n.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: conjunction of two pattern predicates
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})-[:S]->(:B)
      """
    And having executed:
      """
      MATCH (a:A {id: 1}) CREATE (a)-[:S]->(:B)
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R]->(:B) AND (a)-[:S]->(:B) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: disjunction of pattern predicate and property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2, vip: true})
      """
    And having executed:
      """
      CREATE (:A {id: 3})
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

  Scenario: NOT EXISTS of a two-hop pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B)-[:R]->(:C)
      """
    And having executed:
      """
      CREATE (:A {id: 2})-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (a:A) WHERE NOT (a)-[:R]->(:B)-[:R]->(:C) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: pattern predicate after WITH DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {id: 1})-[:R]->(:B), (a)-[:R]->(:B)
      """
    And having executed:
      """
      CREATE (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      WITH DISTINCT a
      WHERE (a)-[:R]->(:B)
      RETURN count(a) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: pattern predicate after WITH ORDER BY LIMIT
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})-[:R]->(:B), (:A {id: 3})
      """
    When executing query:
      """
      MATCH (a:A)
      WITH a ORDER BY a.id LIMIT 2
      WHERE (a)-[:R]->(:B)
      RETURN a.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: EXISTS over a variable-length pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:M)-[:R]->(:C)
      """
    And having executed:
      """
      CREATE (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R*1..3]->(:C) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: EXISTS result feeding an aggregate
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2}), (:A {id: 3})-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (a:A)
      WITH a, EXISTS((a)-[:R]->(:B)) AS has
      RETURN has, count(*) AS n ORDER BY has
      """
    Then the result should be, in order:
      | has   | n |
      | false | 1 |
      | true  | 2 |

  Scenario: nested negation — NOT NOT pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A) WHERE NOT (NOT (a)-[:R]->(:B)) RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: pattern predicate referencing a WITH-computed property alias
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1, k: 5})-[:R]->(:B {k: 5})
      """
    And having executed:
      """
      CREATE (:A {id: 2, k: 7})-[:R]->(:B {k: 8})
      """
    When executing query:
      """
      MATCH (a:A)
      WITH a, a.k AS want
      MATCH (a)-[:R]->(b:B)
      WHERE b.k = want
      RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: EXISTS on an anonymous start node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (b:B) WHERE ()-[:R]->(b) RETURN count(b) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: pattern predicate inside a list comprehension filter
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      WITH collect(a) AS as_
      RETURN size([x IN as_ WHERE (x)-[:R]->(:B)]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: EXISTS under XOR with a boolean property
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1, flag: true})-[:R]->(:B)
      """
    And having executed:
      """
      CREATE (:A {id: 2, flag: false})-[:R]->(:B), (:A {id: 3, flag: true})
      """
    When executing query:
      """
      MATCH (a:A) WHERE a.flag XOR (a)-[:R]->(:B)
      RETURN a.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 2  |
      | 3  |

  Scenario: semi-join keeps multiplicity of the outer rows
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {id: 1})-[:R]->(:B), (a)-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (a:A) WHERE (a)-[:R]->(:B) RETURN count(a) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: anti-join after OPTIONAL MATCH chain
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B), (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:OTHER]->(x)
      WITH a, x
      WHERE NOT (a)-[:R]->(:B)
      RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |
