Feature: Aggregation over empty input and null-only groups

  Scenario: count over empty input is zero
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nope) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: sum over empty input is zero
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nope) RETURN sum(n.x) AS s
      """
    Then the result should be, in any order:
      | s |
      | 0 |

  Scenario: min max avg collect over empty input
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nope) RETURN min(n.x) AS mn, max(n.x) AS mx, avg(n.x) AS av, collect(n.x) AS l
      """
    Then the result should be, in any order:
      | mn   | mx   | av   | l  |
      | null | null | null | [] |

  Scenario: Grouped aggregation over empty input returns no rows
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nope) RETURN n.k AS k, count(*) AS c
      """
    Then the result should be empty

  Scenario: Aggregates skip null values but count star does not
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 3, null] AS x
      RETURN count(*) AS rows, count(x) AS vals, sum(x) AS s, avg(x) AS a
      """
    Then the result should be, in any order:
      | rows | vals | s | a   |
      | 4    | 2    | 4 | 2.0 |

  Scenario: collect skips nulls entirely
    Given an empty graph
    When executing query:
      """
      UNWIND [null, 1, null] AS x
      RETURN collect(x) AS l
      """
    Then the result should be, in any order:
      | l   |
      | [1] |

  Scenario: collect over only nulls is the empty list
    Given an empty graph
    When executing query:
      """
      UNWIND [null, null] AS x
      RETURN collect(x) AS l
      """
    Then the result should be, in any order:
      | l  |
      | [] |

  Scenario: count distinct ignores nulls
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, null, null] AS x
      RETURN count(DISTINCT x) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: min and max on strings are lexicographic
    Given an empty graph
    When executing query:
      """
      UNWIND ['pear', 'apple', 'fig'] AS s
      RETURN min(s) AS mn, max(s) AS mx
      """
    Then the result should be, in any order:
      | mn      | mx     |
      | 'apple' | 'pear' |

  Scenario: Grouping key that is null forms its own group
    Given an empty graph
    When executing query:
      """
      UNWIND [{k: 'a', v: 1}, {k: null, v: 2}, {k: null, v: 3}] AS m
      RETURN m.k AS k, sum(m.v) AS s ORDER BY s
      """
    Then the result should be, in order:
      | k    | s |
      | 'a'  | 1 |
      | null | 5 |

  Scenario: avg of integers is a float
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x RETURN avg(x) AS a
      """
    Then the result should be, in any order:
      | a   |
      | 1.5 |

  Scenario: sum of floats keeps float type
    Given an empty graph
    When executing query:
      """
      UNWIND [1.5, 2.5] AS x RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s   |
      | 4.0 |

  Scenario: Aggregation after WITH that filtered everything out
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      WITH x WHERE x > 100
      RETURN count(x) AS c, collect(x) AS l
      """
    Then the result should be, in any order:
      | c | l  |
      | 0 | [] |

  Scenario: min over mixed null and value groups
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 1, v: null}, {g: 1, v: 5}, {g: 2, v: null}] AS m
      RETURN m.g AS g, min(m.v) AS mn ORDER BY g
      """
    Then the result should be, in order:
      | g | mn   |
      | 1 | 5    |
      | 2 | null |

  Scenario: percentileDisc picks an actual element
    Given an empty graph
    When executing query:
      """
      UNWIND [10, 20, 30, 40] AS x
      RETURN percentileDisc(x, 0.5) AS p
      """
    Then the result should be, in any order:
      | p  |
      | 20 |

  Scenario: percentileCont interpolates
    Given an empty graph
    When executing query:
      """
      UNWIND [10, 20] AS x
      RETURN percentileCont(x, 0.5) AS p
      """
    Then the result should be, in any order:
      | p    |
      | 15.0 |
