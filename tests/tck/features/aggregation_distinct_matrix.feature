Feature: DISTINCT aggregation matrix

  Scenario: count distinct vs plain count
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 2, 3, 3, 3] AS x
      RETURN count(x) AS n, count(DISTINCT x) AS d
      """
    Then the result should be, in any order:
      | n | d |
      | 6 | 3 |

  Scenario: sum distinct adds each value once
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 5, 7] AS x RETURN sum(DISTINCT x) AS s, sum(x) AS t
      """
    Then the result should be, in any order:
      | s  | t  |
      | 12 | 17 |

  Scenario: collect distinct preserves one copy
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2] AS x
      WITH x ORDER BY x
      RETURN collect(DISTINCT x) AS v
      """
    Then the result should be, in any order:
      | v      |
      | [1, 2] |

  Scenario: avg distinct
    Given an empty graph
    When executing query:
      """
      UNWIND [2, 2, 4] AS x RETURN avg(DISTINCT x) AS a
      """
    Then the result should be, in any order:
      | a   |
      | 3.0 |

  Scenario: distinct over strings
    Given an empty graph
    When executing query:
      """
      UNWIND ['a', 'b', 'a'] AS s RETURN count(DISTINCT s) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: distinct ignores nulls like plain aggregates
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 1, null] AS x
      RETURN count(DISTINCT x) AS c, sum(DISTINCT x) AS s
      """
    Then the result should be, in any order:
      | c | s |
      | 1 | 1 |

  Scenario: count of only nulls is zero but count star counts rows
    Given an empty graph
    When executing query:
      """
      UNWIND [null, null] AS x RETURN count(x) AS cx, count(*) AS cs
      """
    Then the result should be, in any order:
      | cx | cs |
      | 0  | 2  |

  Scenario: distinct aggregation per group
    Given an empty graph
    And having executed:
      """
      CREATE (:E {g: 'a', v: 1}), (:E {g: 'a', v: 1}), (:E {g: 'a', v: 2}),
             (:E {g: 'b', v: 5})
      """
    When executing query:
      """
      MATCH (e:E)
      RETURN e.g AS g, count(DISTINCT e.v) AS d ORDER BY g
      """
    Then the result should be, in order:
      | g   | d |
      | 'a' | 2 |
      | 'b' | 1 |

  Scenario: multiple aggregates mix distinct and plain
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2] AS x
      RETURN count(x) AS c, count(DISTINCT x) AS d, sum(x) AS s,
             sum(DISTINCT x) AS sd
      """
    Then the result should be, in any order:
      | c | d | s | sd |
      | 3 | 2 | 4 | 3  |

  Scenario: min max unaffected by distinct
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 3, 1] AS x
      RETURN min(DISTINCT x) AS mn, max(DISTINCT x) AS mx
      """
    Then the result should be, in any order:
      | mn | mx |
      | 1  | 3  |

  Scenario: aggregate over zero rows yields one summary row
    Given an empty graph
    When executing query:
      """
      MATCH (z:Nope) RETURN count(z) AS c, sum(z.v) AS s, collect(z) AS l
      """
    Then the result should be, in any order:
      | c | s | l  |
      | 0 | 0 | [] |

  Scenario: grouped aggregate over zero rows yields no rows
    Given an empty graph
    When executing query:
      """
      MATCH (z:Nope) RETURN z.g AS g, count(*) AS n
      """
    Then the result should be empty

  Scenario: distinct list values compare whole lists
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [1, 2], [3]] AS l RETURN count(DISTINCT l) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: RETURN DISTINCT across multiple columns
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 'a'], [1, 'a'], [1, 'b']] AS r
      RETURN DISTINCT r[0] AS n, r[1] AS s ORDER BY n, s
      """
    Then the result should be, in order:
      | n | s   |
      | 1 | 'a' |
      | 1 | 'b' |
