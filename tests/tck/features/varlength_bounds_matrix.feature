Feature: Variable-length pattern bounds matrix

  Scenario: zero-or-one hop includes the start node
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R]->(:N {k: 2})
      """
    When executing query:
      """
      MATCH (a:N {k: 1})-[:R*0..1]->(x) RETURN x.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 1 |
      | 2 |

  Scenario: exactly zero hops binds the start node only
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R]->(:N {k: 2})
      """
    When executing query:
      """
      MATCH (a:N {k: 1})-[:R*0..0]->(x) RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: fixed length two
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R]->(:N {k: 2})
      """
    And having executed:
      """
      MATCH (b:N {k: 2}) CREATE (b)-[:R]->(:N {k: 3})
      """
    When executing query:
      """
      MATCH (a:N {k: 1})-[:R*2]->(x) RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 3 |

  Scenario: unbounded star reaches the whole chain
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R]->(:N {k: 2})
      """
    And having executed:
      """
      MATCH (b:N {k: 2}) CREATE (b)-[:R]->(:N {k: 3})
      """
    When executing query:
      """
      MATCH (a:N {k: 1})-[:R*]->(x) RETURN x.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 2 |
      | 3 |

  Scenario: minimum beyond the chain yields nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R]->(:N {k: 2})
      """
    When executing query:
      """
      MATCH (a:N {k: 1})-[:R*3..5]->(x) RETURN x.k AS k
      """
    Then the result should be empty

  Scenario: path length reflects hop count
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R]->(:N {k: 2})
      """
    And having executed:
      """
      MATCH (b:N {k: 2}) CREATE (b)-[:R]->(:N {k: 3})
      """
    When executing query:
      """
      MATCH p = (a:N {k: 1})-[:R*1..2]->(x) RETURN length(p) AS l ORDER BY l
      """
    Then the result should be, in order:
      | l |
      | 1 |
      | 2 |

  Scenario: the relationship list variable sizes like the hop count
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})-[:R]->(:N {k: 2})
      """
    And having executed:
      """
      MATCH (b:N {k: 2}) CREATE (b)-[:R]->(:N {k: 3})
      """
    When executing query:
      """
      MATCH (a:N {k: 1})-[rs:R*1..2]->(x) RETURN size(rs) AS s ORDER BY s
      """
    Then the result should be, in order:
      | s |
      | 1 |
      | 2 |

  Scenario: a cycle is traversed once per distinct edge
    Given an empty graph
    And having executed:
      """
      CREATE (a:C {k: 1})-[:R]->(b:C {k: 2})
      """
    And having executed:
      """
      MATCH (a:C {k: 1}), (b:C {k: 2}) CREATE (b)-[:R]->(a)
      """
    When executing query:
      """
      MATCH (a:C {k: 1})-[:R*1..4]->(x) RETURN x.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 1 |
      | 2 |

  Scenario: zero-length pattern between distinct bound nodes fails
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1}), (:N {k: 9})
      """
    When executing query:
      """
      MATCH (a:N {k: 1}), (b:N {k: 9})
      MATCH (a)-[:R*0..0]->(b)
      RETURN a.k AS k
      """
    Then the result should be empty

  Scenario: undirected var-length explores both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (:M {k: 1})-[:R]->(:M {k: 2})
      """
    And having executed:
      """
      MATCH (m:M {k: 2}) CREATE (:M {k: 3})-[:R]->(m)
      """
    When executing query:
      """
      MATCH (a:M {k: 2})-[:R*1]-(x) RETURN x.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 1 |
      | 3 |

  Scenario: var-length with per-edge property filter applies to every hop
    Given an empty graph
    And having executed:
      """
      CREATE (:V {k: 1})-[:R {ok: true}]->(:V {k: 2})
      """
    And having executed:
      """
      MATCH (v:V {k: 2}) CREATE (v)-[:R {ok: false}]->(:V {k: 3})
      """
    When executing query:
      """
      MATCH (a:V {k: 1})-[:R*1..3 {ok: true}]->(x) RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: multiple types alternate freely inside one var-length
    Given an empty graph
    And having executed:
      """
      CREATE (:W {k: 1})-[:A]->(:W {k: 2})
      """
    And having executed:
      """
      MATCH (w:W {k: 2}) CREATE (w)-[:B]->(:W {k: 3})
      """
    When executing query:
      """
      MATCH (a:W {k: 1})-[:A|B*1..2]->(x) RETURN x.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 2 |
      | 3 |

  Scenario: terminal label filters only the endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 1})-[:R]->(:Mid {k: 2})
      """
    And having executed:
      """
      MATCH (m:Mid) CREATE (m)-[:R]->(:T {k: 3})
      """
    When executing query:
      """
      MATCH (a:S)-[:R*1..3]->(x:T) RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 3 |
