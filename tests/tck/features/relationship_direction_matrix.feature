Feature: Relationship matching across directions and types (reference Match2)

  Background fixture: (a)-[:X]->(b), (b)-[:Y]->(a), (a)-[:X]->(c).

  Scenario: Outgoing typed match
    Given an empty graph
    And having executed:
      """
      CREATE (a:D {n: 'a'}), (b:D {n: 'b'}), (c:D {n: 'c'}),
             (a)-[:X]->(b), (b)-[:Y]->(a), (a)-[:X]->(c)
      """
    When executing query:
      """
      MATCH (:D {n: 'a'})-[:X]->(t) RETURN t.n AS t ORDER BY t
      """
    Then the result should be, in order:
      | t   |
      | 'b' |
      | 'c' |

  Scenario: Incoming typed match
    Given an empty graph
    And having executed:
      """
      CREATE (a:D {n: 'a'}), (b:D {n: 'b'}),
             (a)-[:X]->(b), (b)-[:Y]->(a)
      """
    When executing query:
      """
      MATCH (:D {n: 'a'})<-[:Y]-(s) RETURN s.n AS s
      """
    Then the result should be, in any order:
      | s   |
      | 'b' |

  Scenario: Undirected match over mixed directions
    Given an empty graph
    And having executed:
      """
      CREATE (a:D {n: 'a'}), (b:D {n: 'b'}),
             (a)-[:X]->(b), (b)-[:Y]->(a)
      """
    When executing query:
      """
      MATCH (:D {n: 'a'})-[r]-(o) RETURN type(r) AS t, o.n AS o ORDER BY t
      """
    Then the result should be, in order:
      | t   | o   |
      | 'X' | 'b' |
      | 'Y' | 'b' |

  Scenario: Wrong-direction typed match finds nothing
    Given an empty graph
    And having executed:
      """
      CREATE (a:D {n: 'a'})-[:X]->(:D {n: 'b'})
      """
    When executing query:
      """
      MATCH (:D {n: 'a'})<-[:X]-(s) RETURN count(s) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Type alternation respects direction
    Given an empty graph
    And having executed:
      """
      CREATE (a:D {n: 'a'}), (b:D {n: 'b'}),
             (a)-[:X]->(b), (b)-[:Y]->(a)
      """
    When executing query:
      """
      MATCH (:D {n: 'a'})-[r:X|Y]->(t) RETURN type(r) AS ty
      """
    Then the result should be, in any order:
      | ty  |
      | 'X' |

  Scenario: Undirected type alternation finds both
    Given an empty graph
    And having executed:
      """
      CREATE (a:D {n: 'a'}), (b:D {n: 'b'}),
             (a)-[:X]->(b), (b)-[:Y]->(a)
      """
    When executing query:
      """
      MATCH (:D {n: 'a'})-[r:X|Y]-(t) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Relationship variable exposes endpoints via startNode endNode
    Given an empty graph
    And having executed:
      """
      CREATE (:D {n: 'src'})-[:X]->(:D {n: 'dst'})
      """
    When executing query:
      """
      MATCH ()-[r:X]->()
      RETURN startNode(r).n AS s, endNode(r).n AS e
      """
    Then the result should be, in any order:
      | s     | e     |
      | 'src' | 'dst' |

  Scenario: startNode follows storage direction even on reversed match
    Given an empty graph
    And having executed:
      """
      CREATE (:D {n: 'src'})-[:X]->(:D {n: 'dst'})
      """
    When executing query:
      """
      MATCH (a)<-[r:X]-(b)
      RETURN a.n AS a, startNode(r).n AS s
      """
    Then the result should be, in any order:
      | a     | s     |
      | 'dst' | 'src' |

  Scenario: Two-hop alternation across different types
    Given an empty graph
    And having executed:
      """
      CREATE (a:D {n: 'a'})-[:X]->(b:D {n: 'b'}), (b)-[:Y]->(c:D {n: 'c'})
      """
    When executing query:
      """
      MATCH (:D {n: 'a'})-[:X]->()-[:Y]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'c' |

  Scenario: Relationship property read with direction reversed
    Given an empty graph
    And having executed:
      """
      CREATE (:D {n: 'a'})-[:X {w: 7}]->(:D {n: 'b'})
      """
    When executing query:
      """
      MATCH (:D {n: 'b'})<-[r:X]-() RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 7 |
