Feature: Path expression corners (named paths, length/nodes/relationships,
  zero-length and bounded variable-length paths)

  Scenario: Single-node path has length zero
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})
      """
    When executing query:
      """
      MATCH p = (n:N) RETURN length(p) AS len, size(nodes(p)) AS nn
      """
    Then the result should be, in any order:
      | len | nn |
      | 0   | 1  |

  Scenario: One-hop path has length one
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:B {id: 2})
      """
    When executing query:
      """
      MATCH p = (:A)-[:R]->(:B)
      RETURN length(p) AS len, size(nodes(p)) AS nn, size(relationships(p)) AS nr
      """
    Then the result should be, in any order:
      | len | nn | nr |
      | 1   | 2  | 1  |

  Scenario: Zero-or-one var-length includes the zero-hop row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A {id: 1})-[:R*0..1]->(b)
      RETURN b.id AS b ORDER BY b
      """
    Then the result should be, in order:
      | b |
      | 1 |
      | 2 |

  Scenario: Var-length exact bound
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R]->(:N {id: 2})-[:R]->(:N {id: 3})-[:R]->(:N {id: 4})
      """
    When executing query:
      """
      MATCH (a:N {id: 1})-[:R*2]->(b)
      RETURN b.id AS b
      """
    Then the result should be, in any order:
      | b |
      | 3 |

  Scenario: Var-length range two to three
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R]->(:N {id: 2})-[:R]->(:N {id: 3})-[:R]->(:N {id: 4})
      """
    When executing query:
      """
      MATCH (a:N {id: 1})-[:R*2..3]->(b)
      RETURN b.id AS b ORDER BY b
      """
    Then the result should be, in order:
      | b |
      | 3 |
      | 4 |

  Scenario: Unbounded var-length from an anchor
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R]->(:N {id: 2})-[:R]->(:N {id: 3})
      """
    When executing query:
      """
      MATCH (a:N {id: 1})-[:R*]->(b)
      RETURN b.id AS b ORDER BY b
      """
    Then the result should be, in order:
      | b |
      | 2 |
      | 3 |

  Scenario: Var-length does not reuse a relationship in one path
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {id: 1})-[:R]->(b:N {id: 2}) CREATE (b)-[:R]->(a)
      """
    When executing query:
      """
      MATCH (s:N {id: 1})-[:R*2..2]->(e)
      RETURN e.id AS e
      """
    Then the result should be, in any order:
      | e |
      | 1 |

  Scenario: Named var-length path exposes its length
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R]->(:N {id: 2})-[:R]->(:N {id: 3})
      """
    When executing query:
      """
      MATCH p = (:N {id: 1})-[:R*1..2]->(b)
      RETURN b.id AS b, length(p) AS len ORDER BY b
      """
    Then the result should be, in order:
      | b | len |
      | 2 | 1   |
      | 3 | 2   |

  Scenario: Undirected var-length reaches both sides
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R]->(:N {id: 2}) CREATE (:N {id: 3})-[:R]->(:N {id: 1})
      """
    When executing query:
      """
      MATCH (a:N {id: 1})-[:R*1..1]-(b)
      RETURN b.id AS b ORDER BY b
      """
    Then the result should be, in order:
      | b |
      | 2 |
      | 3 |

  Scenario: Path through two relationship types
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:X]->(:B {id: 2})-[:Y]->(:C {id: 3})
      """
    When executing query:
      """
      MATCH p = (:A)-[:X]->()-[:Y]->(c:C)
      RETURN length(p) AS len, c.id AS c
      """
    Then the result should be, in any order:
      | len | c |
      | 2   | 3 |

  Scenario: Relationship property filter on a var-length hop
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R {w: 1}]->(:N {id: 2})-[:R {w: 9}]->(:N {id: 3})
      """
    When executing query:
      """
      MATCH (a:N {id: 1})-[r:R* {w: 1}]->(b)
      RETURN b.id AS b
      """
    Then the result should be, in any order:
      | b |
      | 2 |

  Scenario: shortestPath between two anchors
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {id: 1})-[:R]->(b:N {id: 2})-[:R]->(c:N {id: 3})
      CREATE (a)-[:R]->(c)
      """
    When executing query:
      """
      MATCH p = shortestPath((a:N {id: 1})-[:R*..4]->(c:N {id: 3}))
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 1   |

  Scenario: Two-hop pattern with shared middle node binds consistently
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R]->(m:M {id: 5}) CREATE (m)-[:R]->(:B {id: 9})
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(m:M)-[:R]->(b:B)
      RETURN a.id AS a, m.id AS m, b.id AS b
      """
    Then the result should be, in any order:
      | a | m | b |
      | 1 | 5 | 9 |

  Scenario: Cyclic pattern requires distinct relationships
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {id: 1})-[:R]->(a)
      """
    When executing query:
      """
      MATCH (x:N)-[r1:R]->(y:N)-[r2:R]->(z:N)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Pattern comprehension binds a path variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:H {n: 'h'})-[:R {w: 1}]->(:L {v: 1}), (a)-[:R {w: 2}]->(:L {v: 2})
      """
    When executing query:
      """
      MATCH (h:H) RETURN [p = (h)-[:R]->(l) | length(p)] AS ls
      """
    Then the result should be, in any order:
      | ls     |
      | [1, 1] |

  Scenario: Path-bound pattern comprehension with WHERE counts paths
    Given an empty graph
    And having executed:
      """
      CREATE (a:H {n: 'h'})-[:R {w: 1}]->(:L {v: 1}), (a)-[:R {w: 2}]->(:L {v: 2})
      """
    When executing query:
      """
      MATCH (h:H) RETURN size([p = (h)-[:R]->(l) WHERE l.v > 1 | p]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
