Feature: WITH scoping deep matrix (shadowing, visibility, expression aliases)

  Scenario: WITH narrows scope to the projected names
    Given an empty graph
    When executing query:
      """
      WITH 1 AS a, 2 AS b
      WITH a
      RETURN a
      """
    Then the result should be, in any order:
      | a |
      | 1 |

  Scenario: referencing a dropped variable after WITH is an error
    Given an empty graph
    When executing query:
      """
      WITH 1 AS a, 2 AS b
      WITH a
      RETURN b
      """
    Then a SyntaxError should be raised

  Scenario: alias shadowing replaces the old value
    Given an empty graph
    When executing query:
      """
      WITH 1 AS x
      WITH x + 10 AS x
      WITH x * 2 AS x
      RETURN x
      """
    Then the result should be, in any order:
      | x  |
      | 22 |

  Scenario: expression aliases become plain values downstream
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      WITH i * i AS sq
      WHERE sq > 2
      RETURN sq ORDER BY sq
      """
    Then the result should be, in order:
      | sq |
      | 4  |
      | 9  |

  Scenario: WITH star keeps everything and adds aliases
    Given an empty graph
    When executing query:
      """
      WITH 1 AS a
      WITH *, a + 1 AS b
      RETURN a, b
      """
    Then the result should be, in any order:
      | a | b |
      | 1 | 2 |

  Scenario: node variable carried through multiple WITH hops
    Given an empty graph
    And having executed:
      """
      CREATE (:WN {id: 1, v: 5})
      """
    When executing query:
      """
      MATCH (n:WN)
      WITH n
      WITH n, n.v AS v
      WITH n, v * 2 AS dbl
      RETURN n.id AS id, dbl
      """
    Then the result should be, in any order:
      | id | dbl |
      | 1  | 10  |

  Scenario: WITH DISTINCT dedups the projected tuple only
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 'a'], [1, 'b'], [1, 'a']] AS p
      WITH DISTINCT p[0] AS x, p[1] AS y
      RETURN x, y ORDER BY y
      """
    Then the result should be, in order:
      | x | y   |
      | 1 | 'a' |
      | 1 | 'b' |

  Scenario: ORDER BY inside WITH orders before SKIP LIMIT
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 3, 1, 4, 2] AS x
      WITH x ORDER BY x SKIP 1 LIMIT 2
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs     |
      | [2, 3] |

  Scenario: aggregation inside WITH groups by the other projections
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 'a', v: 1}, {g: 'a', v: 2}, {g: 'b', v: 3}] AS r
      WITH r.g AS g, sum(r.v) AS s
      RETURN g, s ORDER BY g
      """
    Then the result should be, in order:
      | g   | s |
      | 'a' | 3 |
      | 'b' | 3 |

  Scenario: WHERE between two WITHs filters on the middle projection
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      WITH x, x % 2 AS parity
      WHERE parity = 0
      WITH x
      RETURN collect(x) AS evens
      """
    Then the result should be, in any order:
      | evens  |
      | [2, 4] |

  Scenario: renaming a node variable keeps entity powers
    Given an empty graph
    And having executed:
      """
      CREATE (:RN {id: 1})-[:R]->(:RN {id: 2})
      """
    When executing query:
      """
      MATCH (n:RN {id: 1})
      WITH n AS m
      MATCH (m)-[:R]->(x)
      RETURN x.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: scalar subexpression alias used twice downstream
    Given an empty graph
    When executing query:
      """
      WITH 3 AS n
      RETURN n + n AS twice, n * n AS square
      """
    Then the result should be, in any order:
      | twice | square |
      | 6     | 9      |

  Scenario: WITH creates a cartesian context for a second MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:X1 {id: 1}), (:X1 {id: 2}), (:Y1 {id: 10})
      """
    When executing query:
      """
      MATCH (x:X1)
      WITH x
      MATCH (y:Y1)
      RETURN count(*) AS combos
      """
    Then the result should be, in any order:
      | combos |
      | 2      |

  Scenario: list alias unwound after WITH
    Given an empty graph
    When executing query:
      """
      WITH [1, 2] + [3] AS l
      UNWIND l AS x
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |
      | 3 |

  Scenario: chained aggregates aggregate the previous aggregate
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 'a', v: 1}, {g: 'a', v: 2}, {g: 'b', v: 3}] AS r
      WITH r.g AS g, sum(r.v) AS s
      RETURN count(g) AS groups, sum(s) AS total
      """
    Then the result should be, in any order:
      | groups | total |
      | 2      | 6     |

  Scenario: LIMIT in WITH bounds later expansion
    Given an empty graph
    And having executed:
      """
      UNWIND range(1, 10) AS i CREATE (:LL {id: i})
      """
    When executing query:
      """
      MATCH (l:LL)
      WITH l ORDER BY l.id LIMIT 3
      RETURN collect(l.id) AS ids
      """
    Then the result should be, in any order:
      | ids       |
      | [1, 2, 3] |

  Scenario: parameter visible through every WITH
    Given an empty graph
    And parameters are:
      | p | 7 |
    When executing query:
      """
      WITH 1 AS a
      WITH a
      RETURN a + $p AS r
      """
    Then the result should be, in any order:
      | r |
      | 8 |

  Scenario: boolean alias drives a later CASE
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 5] AS x
      WITH x, x > 3 AS big
      RETURN x, CASE WHEN big THEN 'B' ELSE 's' END AS c ORDER BY x
      """
    Then the result should be, in order:
      | x | c   |
      | 1 | 's' |
      | 5 | 'B' |
