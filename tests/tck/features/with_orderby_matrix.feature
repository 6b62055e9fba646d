Feature: WITH ... ORDER BY matrix (reference WithOrderBy1-4)

  Re-authors the semantic space of the reference's certified
  clauses/with-orderBy suites: ordering in a WITH pipeline by alias, by
  underlying expression, by aggregate, with SKIP/LIMIT, DISTINCT, null
  placement, and ordering feeding later clauses.

  Scenario: order by projected alias ascending
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x AS y ORDER BY y
      RETURN collect(y) AS ys
      """
    Then the result should be, in any order:
      | ys |
      | [1, 2, 3] |

  Scenario: order by underlying variable still in scope
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x * 10 AS y ORDER BY x DESC
      RETURN collect(y) AS ys
      """
    Then the result should be, in any order:
      | ys |
      | [30, 20, 10] |

  Scenario: order by expression over the alias
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x AS y ORDER BY y * -1
      RETURN collect(y) AS ys
      """
    Then the result should be, in any order:
      | ys |
      | [3, 2, 1] |

  Scenario: order by aggregate alias
    Given an empty graph
    When executing query:
      """
      UNWIND [['a', 1], ['b', 3], ['a', 2], ['c', 1]] AS r
      WITH r[0] AS k, sum(r[1]) AS s ORDER BY s DESC, k
      RETURN collect(k) AS ks
      """
    Then the result should be, in any order:
      | ks |
      | ['a', 'b', 'c'] |

  Scenario: order by with limit keeps top rows
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 3, 9, 1, 7] AS x
      WITH x ORDER BY x DESC LIMIT 2
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs |
      | [9, 7] |

  Scenario: order by with skip drops leading rows
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 3, 9, 1, 7] AS x
      WITH x ORDER BY x SKIP 3
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs |
      | [7, 9] |

  Scenario: order by with skip and limit windows the middle
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 3, 9, 1, 7] AS x
      WITH x ORDER BY x SKIP 1 LIMIT 3
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs |
      | [3, 5, 7] |

  Scenario: ascending order puts nulls last
    Given an empty graph
    When executing query:
      """
      UNWIND [3, null, 1] AS x
      WITH x ORDER BY x
      RETURN x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 3 |
      | null |

  Scenario: descending order puts nulls first
    Given an empty graph
    When executing query:
      """
      UNWIND [3, null, 1] AS x
      WITH x ORDER BY x DESC
      RETURN x
      """
    Then the result should be, in order:
      | x |
      | null |
      | 3 |
      | 1 |

  Scenario: with distinct then order by
    Given an empty graph
    When executing query:
      """
      UNWIND [2, 1, 2, 3, 1] AS x
      WITH DISTINCT x ORDER BY x DESC
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs |
      | [3, 2, 1] |

  Scenario: ordered with limit feeds a later unwind
    Given an empty graph
    When executing query:
      """
      UNWIND [4, 2, 8] AS x
      WITH x ORDER BY x DESC LIMIT 1
      UNWIND range(1, x / 2) AS y
      RETURN collect(y) AS ys
      """
    Then the result should be, in any order:
      | ys |
      | [1, 2, 3, 4] |

  Scenario: order by two keys mixed directions
    Given an empty graph
    When executing query:
      """
      UNWIND [['a', 2], ['b', 1], ['a', 1], ['b', 2]] AS r
      WITH r[0] AS k, r[1] AS v ORDER BY k ASC, v DESC
      RETURN collect(k + toString(v)) AS rows
      """
    Then the result should be, in any order:
      | rows |
      | ['a2', 'a1', 'b2', 'b1'] |

  Scenario: order by string values
    Given an empty graph
    When executing query:
      """
      UNWIND ['pear', 'apple', 'Fig'] AS s
      WITH s ORDER BY s
      RETURN collect(s) AS ss
      """
    Then the result should be, in any order:
      | ss |
      | ['Fig', 'apple', 'pear'] |

  Scenario: order by over node property pipeline
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2, name: 'b'}), (:P {v: 1, name: 'a'}),
             (:P {v: 3, name: 'c'})
      """
    When executing query:
      """
      MATCH (n:P)
      WITH n ORDER BY n.v DESC LIMIT 2
      RETURN collect(n.name) AS names
      """
    Then the result should be, in any order:
      | names |
      | ['c', 'b'] |

  Scenario: order survives a property projection after ordering entities
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P {v: 1}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (n:P)
      WITH n ORDER BY n.v
      WITH n.v AS v
      RETURN collect(v) AS vs
      """
    Then the result should be, in any order:
      | vs |
      | [1, 2, 3] |

  Scenario: order by inside WITH then aggregate in RETURN
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x ORDER BY x LIMIT 2
      RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s |
      | 3 |

  Scenario: order by an expression not in the projection
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2, w: 30}), (:P {v: 1, w: 10}), (:P {v: 3, w: 20})
      """
    When executing query:
      """
      MATCH (n:P)
      WITH n.v AS v, n ORDER BY n.w
      RETURN collect(v) AS vs
      """
    Then the result should be, in any order:
      | vs |
      | [1, 3, 2] |

  Scenario: chained ordered WITH clauses, last order wins
    Given an empty graph
    When executing query:
      """
      UNWIND [2, 3, 1] AS x
      WITH x ORDER BY x DESC
      WITH x ORDER BY x ASC
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs |
      | [1, 2, 3] |

  Scenario: order by boolean values
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false, true] AS b
      WITH b ORDER BY b
      RETURN collect(b) AS bs
      """
    Then the result should be, in any order:
      | bs |
      | [false, true, true] |

  Scenario: order by list values lexicographic
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 3], [1, 2], [0, 9]] AS l
      WITH l ORDER BY l
      RETURN collect(l) AS ls
      """
    Then the result should be, in any order:
      | ls |
      | [[0, 9], [1, 2], [1, 3]] |

  Scenario: limit zero yields no rows but later aggregate still runs
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      WITH x ORDER BY x LIMIT 0
      RETURN count(x) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: skip past the end yields no rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x
      WITH x ORDER BY x SKIP 5
      RETURN count(x) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: order by alias of a renamed variable feeding a match
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})-[:R]->(:Q {w: 10}),
             (:P {v: 2})-[:R]->(:Q {w: 20})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p AS q ORDER BY q.v DESC
      MATCH (q)-[:R]->(t:Q)
      RETURN t.w AS w ORDER BY w
      """
    Then the result should be, in order:
      | w |
      | 10 |
      | 20 |

  Scenario: order by on aggregate then having-style filter
    Given an empty graph
    When executing query:
      """
      UNWIND [['a', 1], ['b', 3], ['a', 2], ['b', 4], ['c', 1]] AS r
      WITH r[0] AS k, sum(r[1]) AS s ORDER BY s DESC
      WHERE s > 2
      RETURN collect(k) AS ks
      """
    Then the result should be, in any order:
      | ks |
      | ['b', 'a'] |

  Scenario: order by temporal values
    Given an empty graph
    When executing query:
      """
      UNWIND [date('2021-03-01'), date('2020-12-31'), date('2021-01-15')] AS d
      WITH d ORDER BY d
      RETURN collect(toString(d)) AS ds
      """
    Then the result should be, in any order:
      | ds |
      | ['2020-12-31', '2021-01-15', '2021-03-01'] |

  Scenario: order by inside an optional pipeline keeps null rows
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (n:P)
      OPTIONAL MATCH (n)-[:R]->(m)
      WITH n, m ORDER BY n.v DESC
      RETURN collect(n.v) AS vs, collect(m) AS ms
      """
    Then the result should be, in any order:
      | vs | ms |
      | [2, 1] | [] |
