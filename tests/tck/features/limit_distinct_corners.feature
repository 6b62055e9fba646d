Feature: SKIP LIMIT DISTINCT and UNION corner cases

  Scenario: LIMIT zero returns no rows
    Given an empty graph
    And having executed:
      """
      CREATE (:Z {v: 1}), (:Z {v: 2})
      """
    When executing query:
      """
      MATCH (z:Z) RETURN z.v AS v LIMIT 0
      """
    Then the result should be empty

  Scenario: SKIP past the end returns no rows
    Given an empty graph
    And having executed:
      """
      CREATE (:S1 {v: 1}), (:S1 {v: 2})
      """
    When executing query:
      """
      MATCH (s:S1) RETURN s.v AS v ORDER BY v SKIP 10
      """
    Then the result should be empty

  Scenario: SKIP zero is identity
    Given an empty graph
    And having executed:
      """
      CREATE (:S2 {v: 1}), (:S2 {v: 2})
      """
    When executing query:
      """
      MATCH (s:S2) RETURN s.v AS v ORDER BY v SKIP 0
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |

  Scenario: LIMIT larger than the result keeps all rows
    Given an empty graph
    And having executed:
      """
      CREATE (:S3 {v: 1}), (:S3 {v: 2})
      """
    When executing query:
      """
      MATCH (s:S3) RETURN s.v AS v ORDER BY v LIMIT 99
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |

  Scenario: DISTINCT collapses duplicate nulls to one row
    Given an empty graph
    And having executed:
      """
      CREATE (:D1 {v: 1}), (:D1), (:D1)
      """
    When executing query:
      """
      MATCH (d:D1) RETURN DISTINCT d.v AS v
      """
    Then the result should be, in any order:
      | v    |
      | 1    |
      | null |

  Scenario: DISTINCT on list values compares element-wise
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [1, 2], [2, 1]] AS l
      RETURN DISTINCT l
      """
    Then the result should be, in any order:
      | l      |
      | [1, 2] |
      | [2, 1] |

  Scenario: WITH DISTINCT then count
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 3] AS x
      WITH DISTINCT x
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |

  Scenario: SKIP and LIMIT page through an ordered stream
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 10) AS x
      RETURN x ORDER BY x SKIP 3 LIMIT 3
      """
    Then the result should be, in order:
      | x |
      | 4 |
      | 5 |
      | 6 |

  Scenario: UNION deduplicates rows across arms
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS v RETURN v
      UNION
      UNWIND [2, 3] AS v RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
      | 3 |

  Scenario: UNION ALL keeps within-arm duplicates too
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1] AS v RETURN v
      UNION ALL
      UNWIND [1] AS v RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 1 |
      | 1 |

  Scenario: UNION with mismatched column names is an error
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS a
      UNION
      RETURN 2 AS b
      """
    Then a SyntaxError should be raised

  Scenario: LIMIT applies after DISTINCT
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 3, 3] AS x
      RETURN DISTINCT x ORDER BY x LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |

  Scenario: WITH SKIP LIMIT window feeds the next clause
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 9) AS x
      WITH x ORDER BY x SKIP 2 LIMIT 4
      RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 18 |

  Scenario: ORDER BY with secondary key breaks primary ties
    Given an empty graph
    When executing query:
      """
      UNWIND [{a: 1, b: 2}, {a: 1, b: 1}, {a: 0, b: 9}] AS m
      RETURN m.a AS a, m.b AS b ORDER BY a, b
      """
    Then the result should be, in order:
      | a | b |
      | 0 | 9 |
      | 1 | 1 |
      | 1 | 2 |
