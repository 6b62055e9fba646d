Feature: DELETE / REMOVE deep matrix (edges, relabeling, recreate cycles)

  Scenario: deleting a relationship keeps its endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:DA {id: 1})-[:R]->(:DB {id: 2})
      """
    And having executed:
      """
      MATCH (:DA)-[r:R]->(:DB) DELETE r
      """
    When executing query:
      """
      MATCH (n) WITH count(n) AS nodes
      OPTIONAL MATCH ()-[r]->()
      RETURN nodes, count(r) AS edges
      """
    Then the result should be, in any order:
      | nodes | edges |
      | 2     | 0     |

  Scenario: detach delete removes all incident edges both directions
    Given an empty graph
    And having executed:
      """
      CREATE (:H1 {id: 1})-[:R]->(h:Hub {id: 0}), (h)-[:R]->(:H1 {id: 2})
      """
    And having executed:
      """
      MATCH (h:Hub) DETACH DELETE h
      """
    When executing query:
      """
      MATCH (n) WITH count(n) AS nodes
      OPTIONAL MATCH ()-[r]->()
      RETURN nodes, count(r) AS edges
      """
    Then the result should be, in any order:
      | nodes | edges |
      | 2     | 0     |

  Scenario: delete only matched relationships of one type
    Given an empty graph
    And having executed:
      """
      CREATE (a:T1 {id: 1})-[:KEEP]->(b:T1 {id: 2}), (a)-[:DROP]->(b)
      """
    And having executed:
      """
      MATCH ()-[r:DROP]->() DELETE r
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN type(r) AS t
      """
    Then the result should be, in any order:
      | t      |
      | 'KEEP' |

  Scenario: remove property then match by its absence
    Given an empty graph
    And having executed:
      """
      CREATE (:RP {id: 1, flag: true}), (:RP {id: 2, flag: true})
      """
    And having executed:
      """
      MATCH (r:RP {id: 1}) REMOVE r.flag
      """
    When executing query:
      """
      MATCH (r:RP) WHERE r.flag IS NULL RETURN r.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: remove label then the node no longer matches it
    Given an empty graph
    And having executed:
      """
      CREATE (:L1:L2 {id: 1})
      """
    And having executed:
      """
      MATCH (n:L2) REMOVE n:L2
      """
    When executing query:
      """
      MATCH (n:L2) WITH count(n) AS l2s
      MATCH (n:L1) RETURN l2s, count(n) AS l1s
      """
    Then the result should be, in any order:
      | l2s | l1s |
      | 0   | 1   |

  Scenario: delete then recreate with the same key in a later statement
    Given an empty graph
    And having executed:
      """
      CREATE (:RC {k: 1, gen: 'first'})
      """
    And having executed:
      """
      MATCH (r:RC {k: 1}) DELETE r
      """
    And having executed:
      """
      CREATE (:RC {k: 1, gen: 'second'})
      """
    When executing query:
      """
      MATCH (r:RC) RETURN r.gen AS gen, count(*) AS n
      """
    Then the result should be, in any order:
      | gen      | n |
      | 'second' | 1 |

  Scenario: deleting an already-deleted-by-pattern row set is a no-op
    Given an empty graph
    And having executed:
      """
      CREATE (:NO {id: 1})
      """
    And having executed:
      """
      MATCH (n:Missing) DELETE n
      """
    When executing query:
      """
      MATCH (n:NO) RETURN count(n) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: detach delete filtered subset leaves the rest intact
    Given an empty graph
    And having executed:
      """
      UNWIND range(1, 5) AS i CREATE (:S5 {id: i})
      """
    And having executed:
      """
      MATCH (a:S5), (b:S5) WHERE b.id = a.id + 1 CREATE (a)-[:N]->(b)
      """
    And having executed:
      """
      MATCH (s:S5) WHERE s.id % 2 = 0 DETACH DELETE s
      """
    When executing query:
      """
      MATCH (s:S5) WITH count(s) AS nodes
      OPTIONAL MATCH ()-[r:N]->()
      RETURN nodes, count(r) AS edges
      """
    Then the result should be, in any order:
      | nodes | edges |
      | 3     | 0     |

  Scenario: remove a missing property is a no-op
    Given an empty graph
    And having executed:
      """
      CREATE (:NP {id: 1})
      """
    And having executed:
      """
      MATCH (n:NP) REMOVE n.never_there
      """
    When executing query:
      """
      MATCH (n:NP) RETURN n.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: set to null removes the property like REMOVE
    Given an empty graph
    And having executed:
      """
      CREATE (:SN {id: 1, temp: 'x'})
      """
    And having executed:
      """
      MATCH (n:SN) SET n.temp = null
      """
    When executing query:
      """
      MATCH (n:SN) RETURN n.temp IS NULL AS gone, size(keys(n)) AS nk
      """
    Then the result should be, in any order:
      | gone | nk |
      | true | 1  |

  Scenario: delete relationships found through an undirected match
    Given an empty graph
    And having executed:
      """
      CREATE (:U1 {id: 1})-[:R]->(:U1 {id: 2})
      """
    And having executed:
      """
      MATCH (:U1 {id: 2})-[r:R]-() DELETE r
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: detach delete everything empties the graph
    Given an empty graph
    And having executed:
      """
      CREATE (:G1)-[:R]->(:G2)-[:R]->(:G3)
      """
    And having executed:
      """
      MATCH (n) DETACH DELETE n
      """
    When executing query:
      """
      OPTIONAL MATCH (n)
      RETURN count(n) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: remove then re-add the same label
    Given an empty graph
    And having executed:
      """
      CREATE (:Flip {id: 1})
      """
    And having executed:
      """
      MATCH (f:Flip) SET f:State REMOVE f:State SET f:State
      """
    When executing query:
      """
      MATCH (f:State) RETURN f.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: delete a node bound through WITH
    Given an empty graph
    And having executed:
      """
      CREATE (:W1 {id: 1}), (:W1 {id: 2})
      """
    And having executed:
      """
      MATCH (w:W1) WITH w ORDER BY w.id LIMIT 1 DELETE w
      """
    When executing query:
      """
      MATCH (w:W1) RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |
