Feature: Deep WITH pipelines: shadowing, re-aggregation, scope

  Scenario: Alias shadows the original variable
    Given an empty graph
    When executing query:
      """
      WITH 1 AS x
      WITH x + 1 AS x
      WITH x * 10 AS x
      RETURN x
      """
    Then the result should be, in any order:
      | x  |
      | 20 |

  Scenario: Aggregate of an aggregate via two WITHs
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 2, 3] AS x
      WITH x, count(*) AS cnt
      RETURN max(cnt) AS maxcnt, count(x) AS distinct_vals
      """
    Then the result should be, in any order:
      | maxcnt | distinct_vals |
      | 3      | 3             |

  Scenario: WITH keeps only projected variables
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

  Scenario: Referencing a dropped variable is an error
    Given an empty graph
    When executing query:
      """
      WITH 1 AS a, 2 AS b
      WITH a
      RETURN b
      """
    Then a SyntaxError should be raised

  Scenario: WITH star carries everything forward
    Given an empty graph
    When executing query:
      """
      WITH 1 AS a, 2 AS b
      WITH *
      RETURN a + b AS s
      """
    Then the result should be, in any order:
      | s |
      | 3 |

  Scenario: WITH star plus a new alias
    Given an empty graph
    When executing query:
      """
      WITH 2 AS a
      WITH *, a * a AS sq
      RETURN a, sq
      """
    Then the result should be, in any order:
      | a | sq |
      | 2 | 4  |

  Scenario: HAVING via WITH WHERE on the aggregate
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 3, 3, 3] AS x
      WITH x, count(*) AS c
      WHERE c > 1
      RETURN x, c ORDER BY x
      """
    Then the result should be, in order:
      | x | c |
      | 1 | 2 |
      | 3 | 3 |

  Scenario: WITH DISTINCT then ORDER BY LIMIT then aggregate
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 5, 3, 3, 1] AS x
      WITH DISTINCT x
      WITH x ORDER BY x LIMIT 2
      RETURN collect(x) AS l
      """
    Then the result should be, in any order:
      | l      |
      | [1, 3] |

  Scenario: UNWIND of a collected list after WITH
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH collect(x) AS xs
      UNWIND xs AS y
      RETURN y ORDER BY y
      """
    Then the result should be, in order:
      | y |
      | 1 |
      | 2 |
      | 3 |

  Scenario: MATCH after aggregating WITH
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      UNWIND [10, 20] AS x
      WITH sum(x) AS total
      MATCH (p:P)
      RETURN p.v AS v, total ORDER BY v
      """
    Then the result should be, in order:
      | v | total |
      | 1 | 30    |
      | 2 | 30    |

  Scenario: WITH expression feeding a later predicate
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      WITH x, x % 2 = 0 AS even
      WHERE even
      RETURN collect(x) AS evens
      """
    Then the result should be, in any order:
      | evens  |
      | [2, 4] |

  Scenario: Chained aggregation regroups at each WITH
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 'a', s: 'x', v: 1}, {g: 'a', s: 'y', v: 2}, {g: 'b', s: 'x', v: 3}] AS m
      WITH m.g AS g, m.s AS s, sum(m.v) AS sv
      WITH g, count(s) AS subgroups, sum(sv) AS total
      RETURN g, subgroups, total ORDER BY g
      """
    Then the result should be, in order:
      | g   | subgroups | total |
      | 'a' | 2         | 3     |
      | 'b' | 1         | 3     |

  Scenario: ORDER BY in WITH does not leak its sort column
    Given an empty graph
    When executing query:
      """
      UNWIND [{a: 2, b: 'x'}, {a: 1, b: 'y'}] AS m
      WITH m.b AS b ORDER BY m.a
      RETURN collect(b) AS l
      """
    Then the result should be, in any order:
      | l          |
      | ['y', 'x'] |

  Scenario: SKIP in WITH offsets before the next stage
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      WITH x ORDER BY x SKIP 2
      RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s |
      | 7 |

  Scenario: Three-stage pipeline with mixed clause kinds
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 10) AS x
      WITH x WHERE x % 2 = 0
      WITH collect(x) AS evens
      UNWIND evens AS e
      WITH e WHERE e > 4
      RETURN sum(e) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 24 |
