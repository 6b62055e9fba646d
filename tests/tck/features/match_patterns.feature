Feature: MATCH pattern semantics (TCK clauses/match corners)

  Scenario: Relationship isomorphism forbids reusing an edge in one pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (x)-[r1:T]->(y), (s)-[r2:T]->(t)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Node reuse across patterns is allowed
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      CREATE (a)-[:U]->(b)
      """
    When executing query:
      """
      MATCH (x)-[:T]->(y), (x)-[:U]->(y)
      RETURN x.name AS x, y.name AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 'a' | 'b' |

  Scenario: Undirected match returns both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (x:P)-[:T]-(y:P) RETURN x.name AS x, y.name AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 'a' | 'b' |
      | 'b' | 'a' |

  Scenario: Undirected self-loop matches exactly once
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})
      CREATE (a)-[:T]->(a)
      """
    When executing query:
      """
      MATCH (x:P)-[:T]-(y:P) RETURN x.name AS x, y.name AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 'a' | 'a' |

  Scenario: Directed self-loop matches once
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})
      CREATE (a)-[:T]->(a)
      """
    When executing query:
      """
      MATCH (x:P)-[:T]->(y:P) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Anonymous nodes multiply matches
    Given an empty graph
    And having executed:
      """
      CREATE (a:A), (b:B {v: 1}), (c:B {v: 2})
      CREATE (a)-[:T]->(b), (a)-[:T]->(c)
      """
    When executing query:
      """
      MATCH (:A)-[:T]->(b:B) RETURN b.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |

  Scenario: Inline property map filters the scan
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x', v: 1}), (:P {name: 'y', v: 2})
      """
    When executing query:
      """
      MATCH (p:P {name: 'x'}) RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: Inline property with null never matches
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'x'}), (:P)
      """
    When executing query:
      """
      MATCH (p:P {name: null}) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Multiple labels in pattern require all labels
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {name: 'ab'}), (:A {name: 'a'})
      """
    When executing query:
      """
      MATCH (n:A:B) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'ab' |

  Scenario: labels returns all labels of a multi-label node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'x'})
      """
    And having executed:
      """
      MATCH (n:A) SET n:B
      """
    When executing query:
      """
      MATCH (n:A) RETURN labels(n) AS ls
      """
    Then the result should be, in any order:
      | ls         |
      | ['A', 'B'] |

  Scenario: Var-length path includes both endpoints range
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})-[:T]->(c:P {name: 'c'})
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:T*1..2]->(y)
      RETURN y.name AS y ORDER BY y
      """
    Then the result should be, in order:
      | y   |
      | 'b' |
      | 'c' |

  Scenario: Zero-length var path binds the node itself
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:T*0..1]->(y)
      RETURN y.name AS y ORDER BY y
      """
    Then the result should be, in order:
      | y   |
      | 'a' |
      | 'b' |

  Scenario: Var-length with property predicate applies to every edge
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
      CREATE (a)-[:T {w: 1}]->(b), (b)-[:T {w: 9}]->(c)
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:T* {w: 1}]->(y)
      RETURN y.name AS y
      """
    Then the result should be, in any order:
      | y   |
      | 'b' |

  Scenario: Var-length cycle does not revisit an edge
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})
      CREATE (b)-[:T]->(a)
      """
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:T*1..4]->(y)
      RETURN y.name AS y ORDER BY y
      """
    Then the result should be, in order:
      | y   |
      | 'a' |
      | 'b' |

  Scenario: OPTIONAL MATCH binds nulls when no match
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:Q {name: 'b'}), (c:P {name: 'c'})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:T]->(q:Q)
      RETURN p.name AS p, q.name AS q ORDER BY p
      """
    Then the result should be, in order:
      | p   | q    |
      | 'a' | 'b'  |
      | 'c' | null |

  Scenario: OPTIONAL MATCH WHERE folds into the optional side
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(:Q {v: 1})
      CREATE (a)-[:T]->(:Q {v: 5})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:T]->(q:Q) WHERE q.v > 3
      RETURN p.name AS p, q.v AS v
      """
    Then the result should be, in any order:
      | p   | v |
      | 'a' | 5 |

  Scenario: OPTIONAL MATCH WHERE referencing an outer value variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a', t: 3})-[:T]->(:Q {v: 1})
      CREATE (a)-[:T]->(:Q {v: 5})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p, p.t AS t
      OPTIONAL MATCH (p)-[:T]->(q:Q) WHERE q.v > t
      RETURN p.name AS p, q.v AS v
      """
    Then the result should be, in any order:
      | p   | v |
      | 'a' | 5 |

  Scenario: MATCH after OPTIONAL MATCH null does not explode
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:T]->(q)
      RETURN p.name AS p, q IS NULL AS qnull
      """
    Then the result should be, in any order:
      | p   | qnull |
      | 'a' | true  |

  Scenario: Plain DELETE of a connected node is an error
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})-[:T]->(:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:A) DELETE a
      """
    Then an error should be raised

  Scenario: DETACH DELETE removes the node and its edges
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})-[:T]->(:B {name: 'b'})
      """
    And having executed:
      """
      MATCH (a:A) DETACH DELETE a
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN count(r) AS edges
      """
    Then the result should be, in any order:
      | edges |
      | 0     |
