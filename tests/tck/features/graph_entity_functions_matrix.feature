Feature: Graph entity function matrix (labels/type/properties/keys/id/endpoints)

  Scenario: labels of a single-label node
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'a'})
      """
    When executing query:
      """
      MATCH (p:Person) RETURN labels(p) AS l
      """
    Then the result should be, in any order:
      | l          |
      | ['Person'] |

  Scenario: labels after adding a second label
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'a'})
      """
    And having executed:
      """
      MATCH (p:Person) SET p:Admin
      """
    When executing query:
      """
      MATCH (p:Person)
      UNWIND labels(p) AS l
      RETURN l ORDER BY l
      """
    Then the result should be, in order:
      | l        |
      | 'Admin'  |
      | 'Person' |

  Scenario: type of each relationship
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {id: 1})-[:KNOWS]->(:N {id: 2}), (a)-[:LIKES]->(:N {id: 3})
      """
    When executing query:
      """
      MATCH (:N {id: 1})-[r]->()
      RETURN type(r) AS t ORDER BY t
      """
    Then the result should be, in order:
      | t       |
      | 'KNOWS' |
      | 'LIKES' |

  Scenario: properties of a node is its full map
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 'x'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN properties(p) AS m
      """
    Then the result should be, in any order:
      | m             |
      | {a: 1, b: 'x'} |

  Scenario: properties of a relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1})-[:R {w: 2, tag: 'e'}]->(:P {id: 2})
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN properties(r) AS m
      """
    Then the result should be, in any order:
      | m                |
      | {w: 2, tag: 'e'} |

  Scenario: keys of a node lists its property names
    Given an empty graph
    And having executed:
      """
      CREATE (:K {b: 1, a: 2})
      """
    When executing query:
      """
      MATCH (k:K)
      UNWIND keys(k) AS key
      RETURN key ORDER BY key
      """
    Then the result should be, in order:
      | key |
      | 'a' |
      | 'b' |

  Scenario: keys skips null-valued properties
    Given an empty graph
    And having executed:
      """
      CREATE (:K2 {a: 1}), (:K2 {b: 2})
      """
    When executing query:
      """
      MATCH (k:K2)
      RETURN size(keys(k)) AS n ORDER BY n
      """
    Then the result should be, in order:
      | n |
      | 1 |
      | 1 |

  Scenario: id is stable within a query and distinct per node
    Given an empty graph
    And having executed:
      """
      CREATE (:I {v: 1}), (:I {v: 2})
      """
    When executing query:
      """
      MATCH (a:I), (b:I)
      WHERE a.v < b.v
      RETURN id(a) = id(a) AS self_eq, id(a) = id(b) AS cross_eq
      """
    Then the result should be, in any order:
      | self_eq | cross_eq |
      | true    | false    |

  Scenario: startNode endNode on a reversed match still follow the arrow
    Given an empty graph
    And having executed:
      """
      CREATE (:E1 {id: 1})-[:R]->(:E1 {id: 2})
      """
    When executing query:
      """
      MATCH (b:E1)<-[r:R]-(a:E1)
      MATCH (s) WHERE s = startNode(r)
      MATCH (e) WHERE e = endNode(r)
      RETURN s.id AS sid, e.id AS eid
      """
    Then the result should be, in any order:
      | sid | eid |
      | 1   | 2   |

  Scenario: properties of a map value is the map itself
    Given an empty graph
    When executing query:
      """
      RETURN properties({x: 1, y: 'z'}) AS m
      """
    Then the result should be, in any order:
      | m             |
      | {x: 1, y: 'z'} |

  Scenario: keys of a map literal
    Given an empty graph
    When executing query:
      """
      WITH keys({z: 1, a: 2}) AS ks
      UNWIND ks AS k
      RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'z' |

  Scenario: labels and type of nulls are null
    Given an empty graph
    When executing query:
      """
      WITH null AS x
      RETURN labels(x) IS NULL AS l, type(x) IS NULL AS t,
             properties(x) IS NULL AS p, keys(x) IS NULL AS k
      """
    Then the result should be, in any order:
      | l    | t    | p    | k    |
      | true | true | true | true |

  Scenario: exists on a property distinguishes set from unset
    Given an empty graph
    And having executed:
      """
      CREATE (:EP {v: 1}), (:EP)
      """
    When executing query:
      """
      MATCH (e:EP)
      RETURN e.v IS NOT NULL AS has ORDER BY has
      """
    Then the result should be, in order:
      | has   |
      | false |
      | true  |

  Scenario: counting label members after relabeling
    Given an empty graph
    And having executed:
      """
      CREATE (:Old {id: 1}), (:Old {id: 2})
      """
    And having executed:
      """
      MATCH (o:Old {id: 1}) SET o:New REMOVE o:Old
      """
    When executing query:
      """
      MATCH (o:Old) WITH count(o) AS olds
      MATCH (n:New) RETURN olds, count(n) AS news
      """
    Then the result should be, in any order:
      | olds | news |
      | 1    | 1    |

  Scenario: properties map is usable for dynamic access
    Given an empty graph
    And having executed:
      """
      CREATE (:D {alpha: 10})
      """
    When executing query:
      """
      MATCH (d:D)
      WITH properties(d) AS m
      RETURN m['alpha'] AS v
      """
    Then the result should be, in any order:
      | v  |
      | 10 |

  Scenario: size of keys equals size of properties map
    Given an empty graph
    And having executed:
      """
      CREATE (:SZ {a: 1, b: 2, c: 3})
      """
    When executing query:
      """
      MATCH (s:SZ)
      RETURN size(keys(s)) AS nk
      """
    Then the result should be, in any order:
      | nk |
      | 3  |

  Scenario: node equality is identity not property equality
    Given an empty graph
    And having executed:
      """
      CREATE (:Tw {v: 1}), (:Tw {v: 1})
      """
    When executing query:
      """
      MATCH (a:Tw), (b:Tw)
      RETURN count(*) AS pairs,
             sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS same
      """
    Then the result should be, in any order:
      | pairs | same |
      | 4     | 2    |

  Scenario: relationship equality is identity across separate MATCHes
    Given an empty graph
    And having executed:
      """
      CREATE (a:RQ)-[:R {w: 1}]->(b:RQ), (a)-[:R {w: 1}]->(b)
      """
    When executing query:
      """
      MATCH ()-[r1:R]->()
      MATCH ()-[r2:R]->()
      RETURN count(*) AS pairs,
             sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS same
      """
    Then the result should be, in any order:
      | pairs | same |
      | 4     | 2    |

  Scenario: relationship isomorphism excludes self-pairs within one MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (a:RQ)-[:R {w: 1}]->(b:RQ), (a)-[:R {w: 1}]->(b)
      """
    When executing query:
      """
      MATCH ()-[r1:R]->(), ()-[r2:R]->()
      RETURN count(*) AS pairs
      """
    Then the result should be, in any order:
      | pairs |
      | 2     |

  Scenario: randomUUID produces unique well-formed ids
    Given an empty graph
    When executing query:
      """
      WITH randomUUID() AS u1, randomUUID() AS u2
      RETURN u1 = u2 AS same, size(u1) AS len
      """
    Then the result should be, in any order:
      | same  | len |
      | false | 36  |
