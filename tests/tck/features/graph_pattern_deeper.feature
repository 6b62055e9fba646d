Feature: Multi-clause graph patterns, bound variables, direction corners

  Scenario: Two MATCH clauses share a variable as a join
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {n: 'a'})-[:F]->(b:U {n: 'b'})-[:F]->(c:U {n: 'c'})
      """
    When executing query:
      """
      MATCH (x:U)-[:F]->(m:U)
      MATCH (m)-[:F]->(y:U)
      RETURN x.n AS x, y.n AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 'a' | 'c' |

  Scenario: Relationship variable reused across clauses binds by identity
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'})-[:F]->(:U {n: 'b'})
      """
    When executing query:
      """
      MATCH (a)-[r:F]->(b)
      MATCH (c)-[r:F]->(d)
      RETURN a.n AS an, c.n AS cn, d.n AS dn
      """
    Then the result should be, in any order:
      | an  | cn  | dn  |
      | 'a' | 'a' | 'b' |

  Scenario: Edge uniqueness applies within one MATCH but not across MATCHes
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'})-[:F {w: 1}]->(:U {n: 'b'})
      """
    When executing query:
      """
      MATCH (a)-[r1:F]->(b)
      MATCH (c)-[r2:F]->(d)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Same relationship twice in one pattern finds nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'})-[:F]->(:U {n: 'b'})
      """
    When executing query:
      """
      MATCH (a)-[r1:F]->(b), (c)-[r2:F]->(d)
      WHERE a.n = c.n
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Reversed arrow matches the same data
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'src'})-[:F]->(:U {n: 'dst'})
      """
    When executing query:
      """
      MATCH (a)<-[:F]-(b)
      RETURN a.n AS a, b.n AS b
      """
    Then the result should be, in any order:
      | a     | b     |
      | 'dst' | 'src' |

  Scenario: Bound node reused in a later pattern hop
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {n: 'hub'})-[:F]->(:U {n: 'x'}), (a)-[:F]->(:U {n: 'y'})
      """
    When executing query:
      """
      MATCH (h:U {n: 'hub'})
      MATCH (h)-[:F]->(t)
      RETURN t.n AS t ORDER BY t
      """
    Then the result should be, in order:
      | t   |
      | 'x' |
      | 'y' |

  Scenario: Triangle pattern closes on the first variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {n: 'a'})-[:F]->(b:U {n: 'b'})-[:F]->(c:U {n: 'c'})-[:F]->(a)
      """
    When executing query:
      """
      MATCH (x)-[:F]->(y)-[:F]->(z)-[:F]->(x)
      RETURN count(*) AS triangles
      """
    Then the result should be, in any order:
      | triangles |
      | 3         |

  Scenario: Multiple relationship types in one pattern hop
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {n: 'a'})-[:X]->(:U {n: 'x'}), (a)-[:Y]->(:U {n: 'y'}), (a)-[:Z]->(:U {n: 'z'})
      """
    When executing query:
      """
      MATCH (:U {n: 'a'})-[r:X|Y]->(t)
      RETURN t.n AS t, type(r) AS ty ORDER BY t
      """
    Then the result should be, in order:
      | t   | ty  |
      | 'x' | 'X' |
      | 'y' | 'Y' |

  Scenario: Untyped relationship matches every type
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {n: 'a'})-[:X]->(:U), (a)-[:Y]->(:U)
      """
    When executing query:
      """
      MATCH (:U {n: 'a'})-[r]->()
      RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Property predicate on the relationship in the pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {n: 'a'})-[:F {w: 1}]->(:U {n: 'x'}), (a)-[:F {w: 2}]->(:U {n: 'y'})
      """
    When executing query:
      """
      MATCH (:U {n: 'a'})-[:F {w: 2}]->(t)
      RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'y' |

  Scenario: Disconnected patterns in one MATCH form a cross product
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A {v: 2}), (:B {w: 10})
      """
    When executing query:
      """
      MATCH (a:A), (b:B)
      RETURN a.v AS v, b.w AS w ORDER BY v
      """
    Then the result should be, in order:
      | v | w  |
      | 1 | 10 |
      | 2 | 10 |

  Scenario: MATCH on a label that exists only via SET
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'})
      """
    And having executed:
      """
      MATCH (u:U) SET u:Extra
      """
    When executing query:
      """
      MATCH (e:Extra)
      RETURN e.n AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |

  Scenario: Anonymous relationship between named nodes counts paths not edges
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {n: 'a'}), (b:U {n: 'b'}), (a)-[:F]->(b), (a)-[:F]->(b)
      """
    When executing query:
      """
      MATCH (a:U {n: 'a'})-->(b:U {n: 'b'})
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Undirected pattern between two bound distinct nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:U {n: 'a'})-[:F]->(:U {n: 'b'})
      """
    When executing query:
      """
      MATCH (a:U {n: 'a'}), (b:U {n: 'b'})
      MATCH (a)-[r:F]-(b)
      RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Label predicate in WHERE instead of the pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A:Tagged {v: 1}), (:A {v: 2})
      """
    When executing query:
      """
      MATCH (n:A)
      WHERE n:Tagged
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
