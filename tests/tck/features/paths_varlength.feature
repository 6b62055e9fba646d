Feature: Named paths, var-length bounds, path functions (TCK clauses/match-path)

  Scenario: Named path length counts relationships
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})-[:T]->(:P {name: 'b'})-[:T]->(:P {name: 'c'})
      """
    When executing query:
      """
      MATCH p = (x:P {name: 'a'})-[:T]->()-[:T]->()
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 2   |

  Scenario: Exact hop count var-length
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})-[:T]->(c:P {name: 'c'})-[:T]->(d:P {name: 'd'})
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:T*2..2]->(y)
      RETURN y.name AS y
      """
    Then the result should be, in any order:
      | y   |
      | 'c' |

  Scenario: Unbounded var-length reaches the whole chain
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})-[:T]->(c:P {name: 'c'})
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:T*]->(y)
      RETURN y.name AS y ORDER BY y
      """
    Then the result should be, in order:
      | y   |
      | 'b' |
      | 'c' |

  Scenario: Var-length respects direction
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (x:P {name: 'b'})-[:T*1..2]->(y)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Undirected var-length explores both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      CREATE (c:P {name: 'c'})-[:T]->(b)
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:T*1..2]-(y)
      RETURN y.name AS y ORDER BY y
      """
    Then the result should be, in order:
      | y   |
      | 'b' |
      | 'c' |

  Scenario: Var-length binds the relationship list size
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})-[:T]->(c:P {name: 'c'})
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[rs:T*1..2]->(y)
      RETURN y.name AS y, size(rs) AS hops ORDER BY hops
      """
    Then the result should be, in order:
      | y   | hops |
      | 'b' | 1    |
      | 'c' | 2    |

  Scenario: nodes() of a named path lists all nodes in order
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})-[:T]->(:P {name: 'b'})
      """
    When executing query:
      """
      MATCH p = (x:P {name: 'a'})-[:T]->(y)
      RETURN size(nodes(p)) AS n, size(relationships(p)) AS r
      """
    Then the result should be, in any order:
      | n | r |
      | 2 | 1 |

  Scenario: Multiple relationship types expand over the union
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
      CREATE (a)-[:X]->(b), (a)-[:Y]->(c)
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:X|Y]->(y)
      RETURN y.name AS y ORDER BY y
      """
    Then the result should be, in order:
      | y   |
      | 'b' |
      | 'c' |

  Scenario: Relationship variable binds properties
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:T {w: 5}]->(:B)
      """
    When executing query:
      """
      MATCH (:A)-[r:T]->(:B) RETURN r.w AS w, type(r) AS t
      """
    Then the result should be, in any order:
      | w | t   |
      | 5 | 'T' |

  Scenario: startNode and endNode follow the stored direction
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})-[:T]->(:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (x)-[r:T]-(y)
      WHERE x.name = 'b'
      RETURN startNode(r).name AS s, endNode(r).name AS e
      """
    Then the result should be, in any order:
      | s   | e   |
      | 'a' | 'b' |

  Scenario: Two var-length hops in one pattern stay edge-disjoint
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (x)-[:T*1..1]->(y), (s)-[:T*1..1]->(t)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Var-length into an already-bound node variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      CREATE (b)-[:T]->(a)
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[:T*2..2]->(a)
      RETURN a.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |

  Scenario: shortestPath returns a minimal-hop path
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
      CREATE (a)-[:T]->(b), (b)-[:T]->(c), (a)-[:T]->(c)
      """
    When executing query:
      """
      MATCH p = shortestPath((x:P {name: 'a'})-[:T*..4]->(y:P {name: 'c'}))
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 1   |

  Scenario: EXISTS pattern predicate filters rows
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(:Q), (b:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) WHERE EXISTS { (p)-[:T]->(:Q) }
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |

  Scenario: NOT pattern predicate anti-filters rows
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(:Q), (b:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) WHERE NOT (p)-[:T]->()
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
