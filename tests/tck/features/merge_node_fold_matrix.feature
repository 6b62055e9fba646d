Feature: MERGE node matrix (ON CREATE folding, multi-key, sequencing)

  Scenario: ON CREATE with constant values lands on created nodes only
    Given an empty graph
    And having executed:
      """
      CREATE (:M {k: 1, seen: 99})
      """
    And having executed:
      """
      UNWIND [1, 2] AS i MERGE (m:M {k: i}) ON CREATE SET m.seen = 0
      """
    When executing query:
      """
      MATCH (m:M) RETURN m.k AS k, m.seen AS seen ORDER BY k
      """
    Then the result should be, in order:
      | k | seen |
      | 1 | 99   |
      | 2 | 0    |

  Scenario: ON CREATE referencing the merged node's own key
    Given an empty graph
    And having executed:
      """
      UNWIND [3, 4] AS i MERGE (m:M {k: i}) ON CREATE SET m.dbl = m.k * 2
      """
    When executing query:
      """
      MATCH (m:M) RETURN m.k AS k, m.dbl AS dbl ORDER BY k
      """
    Then the result should be, in order:
      | k | dbl |
      | 3 | 6   |
      | 4 | 8   |

  Scenario: ON CREATE referencing an outer variable still applies
    Given an empty graph
    And having executed:
      """
      UNWIND [{k: 1, tag: 'a'}, {k: 2, tag: 'b'}] AS row
      MERGE (m:M {k: row.k}) ON CREATE SET m.tag = row.tag
      """
    When executing query:
      """
      MATCH (m:M) RETURN m.k AS k, m.tag AS tag ORDER BY k
      """
    Then the result should be, in order:
      | k | tag |
      | 1 | 'a' |
      | 2 | 'b' |

  Scenario: ON MATCH and ON CREATE both present fire on disjoint sets
    Given an empty graph
    And having executed:
      """
      CREATE (:M {k: 1})
      """
    And having executed:
      """
      UNWIND [1, 2] AS i MERGE (m:M {k: i})
      ON MATCH SET m.status = 'old' ON CREATE SET m.status = 'new'
      """
    When executing query:
      """
      MATCH (m:M) RETURN m.k AS k, m.status AS status ORDER BY k
      """
    Then the result should be, in order:
      | k | status |
      | 1 | 'old'  |
      | 2 | 'new'  |

  Scenario: multi-key MERGE distinguishes composite keys
    Given an empty graph
    And having executed:
      """
      UNWIND [{a: 1, b: 'x'}, {a: 1, b: 'y'}, {a: 1, b: 'x'}] AS pair
      MERGE (:MK {a: pair.a, b: pair.b})
      """
    When executing query:
      """
      MATCH (m:MK) RETURN count(m) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: repeated MERGE in one statement binds the same node
    Given an empty graph
    When executing query:
      """
      MERGE (a:S1 {k: 1})
      MERGE (b:S1 {k: 1})
      RETURN a = b AS same
      """
    Then the result should be, in any order:
      | same |
      | true |

  Scenario: MERGE after WITH on an aggregate key
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 1, 2] AS i CREATE (:Src {g: i})
      """
    And having executed:
      """
      MATCH (s:Src) WITH s.g AS g, count(*) AS n
      MERGE (m:Agg {g: g}) ON CREATE SET m.n = n
      """
    When executing query:
      """
      MATCH (m:Agg) RETURN m.g AS g, m.n AS n ORDER BY g
      """
    Then the result should be, in order:
      | g | n |
      | 1 | 2 |
      | 2 | 1 |

  Scenario: MERGE with a null key raises
    Given an empty graph
    And having executed:
      """
      CREATE (:NK {v: 1}), (:NK)
      """
    When executing query:
      """
      MATCH (s:NK) MERGE (:T {k: s.v})
      """
    Then an error should be raised

  Scenario: merged node is bound for later clauses in the same query
    Given an empty graph
    When executing query:
      """
      MERGE (m:B1 {k: 7})
      SET m.extra = m.k + 1
      RETURN m.k AS k, m.extra AS extra
      """
    Then the result should be, in any order:
      | k | extra |
      | 7 | 8     |

  Scenario: MERGE inside UNWIND sees in-statement creations
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 1, 1] AS i MERGE (:Once {k: i})
      """
    When executing query:
      """
      MATCH (o:Once) RETURN count(o) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: ON CREATE SET multiple properties in one clause
    Given an empty graph
    And having executed:
      """
      MERGE (m:MP {k: 1}) ON CREATE SET m.a = 1, m.b = 'two', m.c = true
      """
    When executing query:
      """
      MATCH (m:MP) RETURN m.a AS a, m.b AS b, m.c AS c
      """
    Then the result should be, in any order:
      | a | b     | c    |
      | 1 | 'two' | true |

  Scenario: MERGE matching an existing node binds its other properties
    Given an empty graph
    And having executed:
      """
      CREATE (:EX {k: 5, other: 'kept'})
      """
    When executing query:
      """
      MERGE (m:EX {k: 5})
      RETURN m.other AS other
      """
    Then the result should be, in any order:
      | other  |
      | 'kept' |

  Scenario: boolean and string keys merge exactly
    Given an empty graph
    And having executed:
      """
      MERGE (:BK {flag: true, name: 'x'})
      """
    And having executed:
      """
      MERGE (:BK {flag: true, name: 'x'})
      """
    And having executed:
      """
      MERGE (:BK {flag: false, name: 'x'})
      """
    When executing query:
      """
      MATCH (b:BK) RETURN count(b) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: ON MATCH increments across repeated runs
    Given an empty graph
    And having executed:
      """
      MERGE (c:Cnt {k: 1}) ON CREATE SET c.hits = 0
      """
    And having executed:
      """
      MERGE (c:Cnt {k: 1}) ON MATCH SET c.hits = c.hits + 1
      """
    And having executed:
      """
      MERGE (c:Cnt {k: 1}) ON MATCH SET c.hits = c.hits + 1
      """
    When executing query:
      """
      MATCH (c:Cnt) RETURN c.hits AS hits
      """
    Then the result should be, in any order:
      | hits |
      | 2    |

  Scenario: MERGE key computed from an expression
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 3, 4] AS i MERGE (:Mod {r: i % 2})
      """
    When executing query:
      """
      MATCH (m:Mod) RETURN m.r AS r ORDER BY r
      """
    Then the result should be, in order:
      | r |
      | 0 |
      | 1 |
