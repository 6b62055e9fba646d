Feature: Path function deep matrix (nodes/relationships/length across shapes)

  Scenario: single-node path has length zero and one node
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})
      """
    When executing query:
      """
      MATCH p = (n:N)
      RETURN length(p) AS len, size(nodes(p)) AS nn, size(relationships(p)) AS nr
      """
    Then the result should be, in any order:
      | len | nn | nr |
      | 0   | 1  | 0  |

  Scenario: one-hop path counts
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})-[:R]->(:N {id: 2})
      """
    When executing query:
      """
      MATCH p = (:N {id: 1})-[:R]->(:N {id: 2})
      RETURN length(p) AS len, size(nodes(p)) AS nn
      """
    Then the result should be, in any order:
      | len | nn |
      | 1   | 2  |

  Scenario: var-length path lengths vary per row
    Given an empty graph
    And having executed:
      """
      CREATE (:C {id: 1})-[:R]->(:C {id: 2})-[:R]->(:C {id: 3})
      """
    When executing query:
      """
      MATCH p = (:C {id: 1})-[:R*1..2]->(x)
      RETURN length(p) AS len ORDER BY len
      """
    Then the result should be, in order:
      | len |
      | 1   |
      | 2   |

  Scenario: comprehension over static path nodes reads properties
    Given an empty graph
    And having executed:
      """
      CREATE (:Q {name: 'a'})-[:R]->(:Q {name: 'b'})
      """
    When executing query:
      """
      MATCH p = (:Q {name: 'a'})-[:R]->(:Q {name: 'b'})
      RETURN [n IN nodes(p) | n.name] AS names
      """
    Then the result should be, in any order:
      | names      |
      | ['a', 'b'] |

  Scenario: comprehension over var-length path relationships
    Given an empty graph
    And having executed:
      """
      CREATE (:V {id: 1})-[:R {w: 5}]->(:V {id: 2})-[:R {w: 7}]->(:V {id: 3})
      """
    When executing query:
      """
      MATCH p = (:V {id: 1})-[:R*2]->(:V {id: 3})
      RETURN [r IN relationships(p) | r.w] AS ws
      """
    Then the result should be, in any order:
      | ws     |
      | [5, 7] |

  Scenario: UNWIND path nodes feeds further matching
    Given an empty graph
    And having executed:
      """
      CREATE (a:W {id: 1})-[:R]->(b:W {id: 2})
      """
    And having executed:
      """
      MATCH (b:W {id: 2}) CREATE (b)-[:TAG]->(:T {name: 'x'})
      """
    When executing query:
      """
      MATCH p = (:W {id: 1})-[:R]->(:W)
      UNWIND nodes(p) AS n
      MATCH (n)-[:TAG]->(t:T)
      RETURN t.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'x'  |

  Scenario: startNode and endNode of a matched relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:S {id: 1})-[:R]->(:S {id: 2})
      """
    When executing query:
      """
      MATCH (a:S)-[r:R]->(b:S)
      RETURN startNode(r) = a AS s_ok, endNode(r) = b AS e_ok
      """
    Then the result should be, in any order:
      | s_ok | e_ok |
      | true | true |

  Scenario: length of a named undirected path
    Given an empty graph
    And having executed:
      """
      CREATE (:U {id: 1})-[:R]->(:U {id: 2})
      """
    When executing query:
      """
      MATCH p = (:U {id: 2})-[:R]-(:U {id: 1})
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 1   |

  Scenario: path through three hops collects interior nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:T3 {id: 1})-[:R]->(:T3 {id: 2})-[:R]->(:T3 {id: 3})-[:R]->(:T3 {id: 4})
      """
    When executing query:
      """
      MATCH p = (:T3 {id: 1})-[:R*3]->(:T3 {id: 4})
      UNWIND nodes(p) AS n
      RETURN n.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |
      | 3  |
      | 4  |

  Scenario: two named paths in one MATCH are independent
    Given an empty graph
    And having executed:
      """
      CREATE (:P2 {id: 1})-[:R]->(:P2 {id: 2})
      """
    And having executed:
      """
      CREATE (:P2 {id: 3})-[:S]->(:P2 {id: 4})
      """
    When executing query:
      """
      MATCH p = (:P2 {id: 1})-[:R]->(), q = (:P2 {id: 3})-[:S]->()
      RETURN length(p) + length(q) AS total
      """
    Then the result should be, in any order:
      | total |
      | 2     |

  Scenario: quantifier over path nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:QF {v: 5})-[:R]->(:QF {v: 10})
      """
    When executing query:
      """
      MATCH p = (:QF)-[:R]->(:QF)
      RETURN all(n IN nodes(p) WHERE n.v >= 5) AS all_ok,
             any(n IN nodes(p) WHERE n.v > 8) AS any_big,
             single(n IN nodes(p) WHERE n.v = 5) AS one_five
      """
    Then the result should be, in any order:
      | all_ok | any_big | one_five |
      | true   | true    | true     |

  Scenario: reduce over path relationship properties
    Given an empty graph
    And having executed:
      """
      CREATE (:RD {id: 1})-[:R {w: 2}]->(:RD {id: 2})-[:R {w: 3}]->(:RD {id: 3})
      """
    When executing query:
      """
      MATCH p = (:RD {id: 1})-[r1:R]->(:RD {id: 2})-[r2:R]->(:RD {id: 3})
      RETURN reduce(acc = 0, r IN relationships(p) | acc + r.w) AS total,
             reduce(a2 = 0, w IN [x IN relationships(p) | x.w] | a2 + w)
             AS total2
      """
    Then the result should be, in any order:
      | total | total2 |
      | 5     | 5      |

  Scenario: zero-length var path yields the start node only
    Given an empty graph
    And having executed:
      """
      CREATE (:Z {id: 1})
      """
    When executing query:
      """
      MATCH p = (:Z {id: 1})-[:R*0..0]->(x)
      RETURN length(p) AS len, size(nodes(p)) AS nn
      """
    Then the result should be, in any order:
      | len | nn |
      | 0   | 1  |

  Scenario: path inside a pattern comprehension projects lengths
    Given an empty graph
    And having executed:
      """
      CREATE (h:H {id: 1})-[:R]->(:H {id: 2}), (h)-[:R]->(:H {id: 3})
      """
    When executing query:
      """
      MATCH (h:H {id: 1})
      RETURN size([(h)-[:R]->(x) | x.id]) AS fanout
      """
    Then the result should be, in any order:
      | fanout |
      | 2      |

  Scenario: head and last of path node lists
    Given an empty graph
    And having executed:
      """
      CREATE (:HL {id: 1})-[:R]->(:HL {id: 2})-[:R]->(:HL {id: 3})
      """
    When executing query:
      """
      MATCH p = (:HL {id: 1})-[:R*2]->(:HL {id: 3})
      UNWIND [head(nodes(p))] AS first
      UNWIND [last(nodes(p))] AS final
      MATCH (f) WHERE f = first
      MATCH (l) WHERE l = final
      RETURN f.id AS first_id, l.id AS last_id
      """
    Then the result should be, in any order:
      | first_id | last_id |
      | 1        | 3       |
