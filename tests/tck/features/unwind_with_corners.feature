Feature: UNWIND and WITH pipeline corners (TCK Unwind / With)

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

  Scenario: UNWIND keeps duplicates
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 1 |
      | 2 |

  Scenario: UNWIND preserves null elements
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x    |
      | 1    |
      | 2    |
      | null |

  Scenario: Double UNWIND is a cross product per row
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x UNWIND ['a', 'b'] AS y
      RETURN x, y ORDER BY x, y
      """
    Then the result should be, in order:
      | x | y   |
      | 1 | 'a' |
      | 1 | 'b' |
      | 2 | 'a' |
      | 2 | 'b' |

  Scenario: UNWIND of a collected list round-trips
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 3}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) WITH collect(p.v) AS vs
      UNWIND vs AS v RETURN v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
      | 3 |

  Scenario: UNWIND range with arithmetic on the element
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 4) AS i WITH i WHERE i % 2 = 0
      RETURN i * 10 AS v ORDER BY v
      """
    Then the result should be, in order:
      | v  |
      | 20 |
      | 40 |

  Scenario: UNWIND a list expression from a variable
    Given an empty graph
    When executing query:
      """
      WITH [1, 2] AS base UNWIND base + [3] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |
      | 3 |

  Scenario: WITH DISTINCT dedups before the next stage
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 3] AS x WITH DISTINCT x
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |

  Scenario: WITH SKIP without ORDER BY still skips
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x WITH x ORDER BY x SKIP 2
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Standalone RETURN without MATCH
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 1 AS two, 'a' + 'b' AS ab
      """
    Then the result should be, in any order:
      | two | ab   |
      | 2   | 'ab' |

  Scenario: RETURN DISTINCT on literal rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2] AS x RETURN DISTINCT x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |

  Scenario: UNWIND after aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 3})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.g AS g, collect(p.v) AS vs
      UNWIND vs AS v
      RETURN g, v ORDER BY g, v
      """
    Then the result should be, in order:
      | g   | v |
      | 'a' | 1 |
      | 'a' | 2 |
      | 'b' | 3 |

  Scenario: WITH renames twice
    Given an empty graph
    When executing query:
      """
      WITH 1 AS a WITH a AS b WITH b AS c RETURN c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: UNWIND a list of maps and project fields
    Given an empty graph
    When executing query:
      """
      UNWIND [{k: 'a', v: 1}, {k: 'b', v: 2}] AS row
      RETURN row.k AS k, row.v AS v ORDER BY k
      """
    Then the result should be, in order:
      | k   | v |
      | 'a' | 1 |
      | 'b' | 2 |

  Scenario: List comprehension over an UNWIND element
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2, 3], [4, 5]] AS xs
      RETURN [x IN xs WHERE x > 1 | x * 2] AS ys ORDER BY ys[0]
      """
    Then the result should be, in order:
      | ys       |
      | [4, 6]   |
      | [8, 10]  |

  Scenario: ALL ANY NONE SINGLE quantifiers
    Given an empty graph
    When executing query:
      """
      RETURN all(x IN [1, 2] WHERE x > 0) AS a,
             any(x IN [1, 2] WHERE x > 1) AS b,
             none(x IN [1, 2] WHERE x > 5) AS c,
             single(x IN [1, 2] WHERE x = 2) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | true | true | true | true |

  Scenario: reduce accumulates in order
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = '', s IN ['a', 'b', 'c'] | acc + s) AS joined
      """
    Then the result should be, in any order:
      | joined |
      | 'abc'  |
