Feature: Aggregation null and empty-group matrix

  Scenario: count star counts null rows, count expr skips them
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 3] AS x
      RETURN count(*) AS stars, count(x) AS vals
      """
    Then the result should be, in any order:
      | stars | vals |
      | 3     | 2    |

  Scenario: sum avg min max skip nulls
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 3] AS x
      RETURN sum(x) AS s, avg(x) AS a, min(x) AS mn, max(x) AS mx
      """
    Then the result should be, in any order:
      | s | a   | mn | mx |
      | 4 | 2.0 | 1  | 3  |

  Scenario: aggregates over all-null input are null except count
    Given an empty graph
    When executing query:
      """
      UNWIND [null, null] AS x
      RETURN count(x) AS c, sum(x) AS s, avg(x) AS a, min(x) AS mn,
             collect(x) AS coll
      """
    Then the result should be, in any order:
      | c | s | a    | mn   | coll |
      | 0 | 0 | null | null | []   |

  Scenario: aggregates with zero input rows
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nothing)
      RETURN count(n) AS c, count(*) AS stars, collect(n.v) AS coll
      """
    Then the result should be, in any order:
      | c | stars | coll |
      | 0 | 0     | []   |

  Scenario: sum over zero rows is zero
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nothing)
      RETURN sum(n.v) AS s
      """
    Then the result should be, in any order:
      | s |
      | 0 |

  Scenario: grouped aggregate keeps null as its own group key
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 'a', v: 1}, {g: null, v: 2}, {g: 'a', v: 3}, {g: null, v: 4}] AS r
      RETURN r.g AS g, sum(r.v) AS s ORDER BY g
      """
    Then the result should be, in order:
      | g    | s |
      | 'a'  | 4 |
      | null | 6 |

  Scenario: count distinct skips nulls
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, null, 2, null] AS x
      RETURN count(DISTINCT x) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: sum distinct adds each value once
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 3] AS x
      RETURN sum(DISTINCT x) AS s, avg(DISTINCT x) AS a
      """
    Then the result should be, in any order:
      | s | a   |
      | 6 | 2.0 |

  Scenario: collect distinct preserves one copy per value
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 3, 2, 1] AS x
      WITH collect(DISTINCT x) AS xs
      UNWIND xs AS y
      RETURN y ORDER BY y
      """
    Then the result should be, in order:
      | y |
      | 1 |
      | 2 |
      | 3 |

  Scenario: avg of integers is a float
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x
      RETURN avg(x) AS a
      """
    Then the result should be, in any order:
      | a   |
      | 1.5 |

  Scenario: min max over strings use lexicographic order
    Given an empty graph
    When executing query:
      """
      UNWIND ['pear', 'apple', 'fig'] AS s
      RETURN min(s) AS mn, max(s) AS mx
      """
    Then the result should be, in any order:
      | mn      | mx     |
      | 'apple' | 'pear' |

  Scenario: min max over temporals
    Given an empty graph
    When executing query:
      """
      UNWIND [date('2024-05-01'), date('2023-01-01'), date('2024-01-01')] AS d
      RETURN toString(min(d)) AS mn, toString(max(d)) AS mx
      """
    Then the result should be, in any order:
      | mn           | mx           |
      | '2023-01-01' | '2024-05-01' |

  Scenario: multiple aggregates share one implicit group
    Given an empty graph
    And having executed:
      """
      UNWIND [{g: 'x', v: 1}, {g: 'x', v: 2}, {g: 'y', v: 10}] AS r
      CREATE (:Row {g: r.g, v: r.v})
      """
    When executing query:
      """
      MATCH (r:Row)
      RETURN r.g AS g, count(*) AS n, sum(r.v) AS s, min(r.v) AS mn,
             max(r.v) AS mx, round(avg(r.v), 1) AS a
      ORDER BY g
      """
    Then the result should be, in order:
      | g   | n | s  | mn | mx | a   |
      | 'x' | 2 | 3  | 1  | 2  | 1.5 |
      | 'y' | 1 | 10 | 10 | 10 | 10.0 |

  Scenario: aggregate of an expression with nulls inside
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, null] AS x
      RETURN sum(x * 2) AS s, count(x * 2) AS c
      """
    Then the result should be, in any order:
      | s | c |
      | 6 | 2 |

  Scenario: percentileDisc picks an actual value
    Given an empty graph
    When executing query:
      """
      UNWIND [10, 20, 30, 40, 50] AS x
      RETURN percentileDisc(x, 0.5) AS median, percentileDisc(x, 0.0) AS lo,
             percentileDisc(x, 1.0) AS hi
      """
    Then the result should be, in any order:
      | median | lo | hi |
      | 30     | 10 | 50 |

  Scenario: percentileCont interpolates
    Given an empty graph
    When executing query:
      """
      UNWIND [10, 20] AS x
      RETURN percentileCont(x, 0.5) AS median
      """
    Then the result should be, in any order:
      | median |
      | 15.0   |

  Scenario: aggregation after WITH filter sees only surviving rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4, 5] AS x
      WITH x WHERE x > 2
      RETURN count(x) AS n, sum(x) AS s
      """
    Then the result should be, in any order:
      | n | s  |
      | 3 | 12 |

  Scenario: WITH aggregate then WHERE on it acts as HAVING
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 'a', v: 1}, {g: 'a', v: 2}, {g: 'b', v: 1}] AS r
      WITH r.g AS g, count(*) AS n
      WHERE n > 1
      RETURN g, n
      """
    Then the result should be, in any order:
      | g   | n |
      | 'a' | 2 |

  Scenario: aggregation grouped by a boolean expression
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4, 5, null] AS x
      RETURN x > 3 AS big, count(*) AS n ORDER BY big
      """
    Then the result should be, in order:
      | big   | n |
      | false | 3 |
      | true  | 2 |
      | null  | 1 |

  Scenario: collect of list values builds a list of lists
    Given an empty graph
    When executing query:
      """
      UNWIND [[1], [2, 3]] AS l
      RETURN collect(l) AS lol
      """
    Then the result should be, in any order:
      | lol              |
      | [[1], [2, 3]]    |

  Scenario: ordered collect honors a preceding WITH ORDER BY
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x ORDER BY x DESC
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs        |
      | [3, 2, 1] |

  Scenario: count on optional-match misses is zero per group
    Given an empty graph
    And having executed:
      """
      CREATE (:G {id: 1})-[:H]->(:M), (:G {id: 2})
      """
    When executing query:
      """
      MATCH (g:G)
      OPTIONAL MATCH (g)-[:H]->(m:M)
      RETURN g.id AS id, count(m) AS n ORDER BY id
      """
    Then the result should be, in order:
      | id | n |
      | 1  | 1 |
      | 2  | 0 |

  Scenario: sum of only nulls is zero even under coalesce
    Given an empty graph
    When executing query:
      """
      UNWIND [null, null] AS x
      RETURN coalesce(sum(x), -1) AS s, coalesce(min(x), -1) AS mn
      """
    Then the result should be, in any order:
      | s | mn |
      | 0 | -1 |

  Scenario: distinct rows before aggregation via WITH DISTINCT
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2] AS x
      WITH DISTINCT x
      RETURN count(x) AS n, sum(x) AS s
      """
    Then the result should be, in any order:
      | n | s |
      | 2 | 3 |

  Scenario: min and max of mixed numeric flavors
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2.5, 2] AS x
      RETURN min(x) AS mn, max(x) AS mx
      """
    Then the result should be, in any order:
      | mn | mx  |
      | 1  | 2.5 |
