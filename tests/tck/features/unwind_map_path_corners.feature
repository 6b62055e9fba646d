Feature: UNWIND corners — maps, paths, nesting, null/empty sources

  Scenario: UNWIND null produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND null AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND an empty list produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND [] AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND a list containing null keeps the null row
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN x
      """
    Then the result should be, in any order:
      | x    |
      | 1    |
      | null |
      | 2    |

  Scenario: UNWIND a nested list yields list rows
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [3], []] AS l RETURN l, size(l) AS n
      ORDER BY n
      """
    Then the result should be, in order:
      | l      | n |
      | []     | 0 |
      | [3]    | 1 |
      | [1, 2] | 2 |

  Scenario: double UNWIND flattens two levels
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [3, 4]] AS l
      UNWIND l AS x
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |
      | 3 |
      | 4 |

  Scenario: UNWIND of a list of maps projects map fields
    Given an empty graph
    When executing query:
      """
      UNWIND [{name: 'a', v: 1}, {name: 'b', v: 2}] AS row
      RETURN row.name AS name, row.v AS v ORDER BY name
      """
    Then the result should be, in order:
      | name | v |
      | 'a'  | 1 |
      | 'b'  | 2 |

  Scenario: UNWIND keys of a map
    Given an empty graph
    When executing query:
      """
      UNWIND keys({b: 1, a: 2}) AS k RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'b' |

  Scenario: UNWIND nodes of a named path
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1})-[:R]->(:P {id: 2})-[:R]->(:P {id: 3})
      """
    When executing query:
      """
      MATCH p = (:P {id: 1})-[:R*2]->(:P {id: 3})
      UNWIND nodes(p) AS n
      RETURN n.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |
      | 3  |

  Scenario: UNWIND relationships of a named path
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1})-[:R {w: 10}]->(:P {id: 2})-[:R {w: 20}]->(:P {id: 3})
      """
    When executing query:
      """
      MATCH p = (:P {id: 1})-[:R*2]->(:P {id: 3})
      UNWIND relationships(p) AS r
      RETURN r.w AS w ORDER BY w
      """
    Then the result should be, in order:
      | w  |
      | 10 |
      | 20 |

  Scenario: UNWIND a collect roundtrip preserves multiplicity
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2] AS x
      WITH collect(x) AS xs
      UNWIND xs AS y
      RETURN y ORDER BY y
      """
    Then the result should be, in order:
      | y |
      | 1 |
      | 1 |
      | 2 |

  Scenario: UNWIND after ORDER BY LIMIT sees only surviving rows
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x ORDER BY x LIMIT 2
      UNWIND [x, x * 10] AS y
      RETURN y ORDER BY y
      """
    Then the result should be, in order:
      | y  |
      | 1  |
      | 2  |
      | 10 |
      | 20 |

  Scenario: UNWIND range with positive step
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 7, 3) AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 4 |
      | 7 |

  Scenario: UNWIND range with negative step counts down
    Given an empty graph
    When executing query:
      """
      UNWIND range(5, 1, -2) AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 3 |
      | 5 |

  Scenario: UNWIND empty range when bounds cross
    Given an empty graph
    When executing query:
      """
      UNWIND range(5, 1) AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND cartesian of two lists
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS a
      UNWIND ['x', 'y'] AS b
      RETURN a, b ORDER BY a, b
      """
    Then the result should be, in order:
      | a | b   |
      | 1 | 'x' |
      | 1 | 'y' |
      | 2 | 'x' |
      | 2 | 'y' |

  Scenario: UNWIND result participates in aggregation grouping
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 1, 3, 2, 1] AS x
      RETURN x, count(*) AS n ORDER BY x
      """
    Then the result should be, in order:
      | x | n |
      | 1 | 3 |
      | 2 | 2 |
      | 3 | 1 |

  Scenario: UNWIND of a list parameter
    Given an empty graph
    And parameters are:
      | xs | [10, 20] |
    When executing query:
      """
      UNWIND $xs AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x  |
      | 10 |
      | 20 |

  Scenario: UNWIND of a list-of-maps parameter
    Given an empty graph
    And parameters are:
      | rows | [{k: 1}, {k: 2}] |
    When executing query:
      """
      UNWIND $rows AS r RETURN r.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 1 |
      | 2 |

  Scenario: UNWIND a slice expression
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4][1..3] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 2 |
      | 3 |

  Scenario: UNWIND the tail of a list
    Given an empty graph
    When executing query:
      """
      UNWIND tail([1, 2, 3]) AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 2 |
      | 3 |

  Scenario: UNWIND inside a write pipeline creates per element
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 2, 3] AS i CREATE (:W {id: i})
      """
    When executing query:
      """
      MATCH (w:W) RETURN count(w) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: UNWIND of a comprehension over path nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:Q {id: 1, v: 5})-[:R]->(:Q {id: 2, v: 7})
      """
    When executing query:
      """
      MATCH p = (:Q {id: 1})-[:R]->(:Q {id: 2})
      UNWIND [n IN nodes(p) | n.v] AS v
      RETURN v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 5 |
      | 7 |

  Scenario: UNWIND null-returning expression of missing property
    Given an empty graph
    And having executed:
      """
      CREATE (:U {id: 1})
      """
    When executing query:
      """
      MATCH (u:U) UNWIND u.nolist AS x RETURN x
      """
    Then the result should be empty

  Scenario: UNWIND preserves duplicate map rows
    Given an empty graph
    When executing query:
      """
      UNWIND [{a: 1}, {a: 1}] AS m RETURN m.a AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |
      | 1 |

  Scenario: size of the unwound list equals produced row count
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3, 4] AS l
      UNWIND l AS x
      RETURN count(x) AS n, size(l) AS s
      """
    Then the result should be, in any order:
      | n | s |
      | 4 | 4 |
