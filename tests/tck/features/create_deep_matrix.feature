Feature: CREATE deep matrix (multi-element patterns, computed properties)

  Scenario: one CREATE with a two-hop path creates three nodes two rels
    Given an empty graph
    And having executed:
      """
      CREATE (:CA {id: 1})-[:R1]->(:CB {id: 2})-[:R2]->(:CC {id: 3})
      """
    When executing query:
      """
      MATCH (n) WITH count(n) AS nodes
      MATCH ()-[r]->()
      RETURN nodes, count(r) AS rels
      """
    Then the result should be, in any order:
      | nodes | rels |
      | 3     | 2    |

  Scenario: comma-separated patterns share bound variables
    Given an empty graph
    And having executed:
      """
      CREATE (a:Hub {id: 0}), (a)-[:S]->(:Leaf {id: 1}), (a)-[:S]->(:Leaf {id: 2})
      """
    When executing query:
      """
      MATCH (:Hub)-[:S]->(l:Leaf) RETURN count(l) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: CREATE with computed property expressions
    Given an empty graph
    And having executed:
      """
      UNWIND [2, 3] AS i CREATE (:CP {sq: i * i, label_text: 'n' + toString(i)})
      """
    When executing query:
      """
      MATCH (c:CP) RETURN c.sq AS sq, c.label_text AS t ORDER BY sq
      """
    Then the result should be, in order:
      | sq | t    |
      | 4  | 'n2' |
      | 9  | 'n3' |

  Scenario: CREATE from UNWIND of maps
    Given an empty graph
    And having executed:
      """
      UNWIND [{name: 'a', score: 1}, {name: 'b', score: 2}] AS row
      CREATE (:Player {name: row.name, score: row.score})
      """
    When executing query:
      """
      MATCH (p:Player) RETURN p.name AS name, p.score AS score ORDER BY name
      """
    Then the result should be, in order:
      | name | score |
      | 'a'  | 1     |
      | 'b'  | 2     |

  Scenario: CREATE node then relationship to it in later clause
    Given an empty graph
    And having executed:
      """
      CREATE (:Exist {id: 1})
      """
    And having executed:
      """
      MATCH (e:Exist)
      CREATE (e)-[:OWNS]->(:Item {sku: 'x'})
      """
    When executing query:
      """
      MATCH (:Exist)-[:OWNS]->(i:Item) RETURN i.sku AS sku
      """
    Then the result should be, in any order:
      | sku |
      | 'x' |

  Scenario: CREATE multiple labels on one node
    Given an empty graph
    And having executed:
      """
      CREATE (:L1:L2:L3 {id: 1})
      """
    When executing query:
      """
      MATCH (n:L2)
      UNWIND labels(n) AS l
      RETURN l ORDER BY l
      """
    Then the result should be, in order:
      | l    |
      | 'L1' |
      | 'L2' |
      | 'L3' |

  Scenario: CREATE with list property values
    Given an empty graph
    And having executed:
      """
      CREATE (:LP {nums: [1, 2, 3], tags: ['a', 'b']})
      """
    When executing query:
      """
      MATCH (l:LP) RETURN l.nums AS nums, size(l.tags) AS nt
      """
    Then the result should be, in any order:
      | nums      | nt |
      | [1, 2, 3] | 2  |

  Scenario: CREATE returning the created node in the same query
    Given an empty graph
    When executing query:
      """
      CREATE (n:Ret {v: 10})
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 10 |

  Scenario: CREATE relationship with properties returning them
    Given an empty graph
    When executing query:
      """
      CREATE (:RA {id: 1})-[r:REL {w: 5, tag: 'e'}]->(:RB {id: 2})
      RETURN r.w AS w, type(r) AS t
      """
    Then the result should be, in any order:
      | w | t     |
      | 5 | 'REL' |

  Scenario: CREATE per row multiplies by incoming cardinality
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 3] AS i CREATE (:Seed {id: i})
      """
    And having executed:
      """
      MATCH (s:Seed) CREATE (:Copy {of: s.id})
      """
    When executing query:
      """
      MATCH (c:Copy) RETURN count(c) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: CREATE a self-loop relationship
    Given an empty graph
    And having executed:
      """
      CREATE (a:Self {id: 1})-[:LOOP]->(a)
      """
    When executing query:
      """
      MATCH (a:Self)-[r:LOOP]->(b:Self)
      RETURN a = b AS same
      """
    Then the result should be, in any order:
      | same |
      | true |

  Scenario: CREATE with a boolean and float property preserves types
    Given an empty graph
    And having executed:
      """
      CREATE (:TP {flag: true, ratio: 0.25})
      """
    When executing query:
      """
      MATCH (t:TP) RETURN t.flag AS f, t.ratio AS r
      """
    Then the result should be, in any order:
      | f    | r    |
      | true | 0.25 |

  Scenario: CREATE incoming-direction relationship stores the arrow direction
    Given an empty graph
    And having executed:
      """
      CREATE (:In {id: 1})<-[:POINTS]-(:In {id: 2})
      """
    When executing query:
      """
      MATCH (a:In)-[:POINTS]->(b:In)
      RETURN a.id AS src, b.id AS dst
      """
    Then the result should be, in any order:
      | src | dst |
      | 2   | 1   |

  Scenario: CREATE with property referencing another created variable
    Given an empty graph
    When executing query:
      """
      CREATE (a:Anchor {v: 7})
      CREATE (b:Derived {doubled: a.v * 2})
      RETURN b.doubled AS d
      """
    Then the result should be, in any order:
      | d  |
      | 14 |

  Scenario: created nodes visible to a later MATCH in the same query
    Given an empty graph
    When executing query:
      """
      CREATE (:Vis {id: 1})
      WITH 1 AS one
      MATCH (v:Vis)
      RETURN v.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |
