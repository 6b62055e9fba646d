Feature: UNION deep matrix (dedup, alignment, composition)

  Scenario: UNION dedups identical rows across branches
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS v UNION RETURN 1 AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: UNION ALL keeps duplicates
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS v UNION ALL RETURN 1 AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 1 |

  Scenario: three-way UNION dedups globally
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS v UNION RETURN 2 AS v UNION RETURN 1 AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |

  Scenario: UNION of multi-row branches
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

  Scenario: UNION ALL preserves branch multiplicities
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

  Scenario: UNION with mismatched column names raises
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS a UNION RETURN 2 AS b
      """
    Then a SyntaxError should be raised

  Scenario: UNION of matches over different labels
    Given an empty graph
    And having executed:
      """
      CREATE (:UA {name: 'x'}), (:UB {name: 'y'}), (:UB {name: 'x'})
      """
    When executing query:
      """
      MATCH (a:UA) RETURN a.name AS name
      UNION
      MATCH (b:UB) RETURN b.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'x'  |
      | 'y'  |

  Scenario: UNION dedups null rows too
    Given an empty graph
    When executing query:
      """
      RETURN null AS v UNION RETURN null AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: UNION of different value types keeps both
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS v UNION RETURN 'one' AS v
      """
    Then the result should be, in any order:
      | v     |
      | 1     |
      | 'one' |

  Scenario: UNION branches with aggregates
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN sum(x) AS v
      UNION ALL
      UNWIND [10] AS x RETURN sum(x) AS v
      """
    Then the result should be, in any order:
      | v  |
      | 6  |
      | 10 |

  Scenario: UNION feeding a count through a follow-up query
    Given an empty graph
    And having executed:
      """
      CREATE (:CU {v: 1}), (:CU {v: 2})
      """
    When executing query:
      """
      MATCH (c:CU) RETURN c.v AS v
      UNION
      UNWIND [2, 3] AS v RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
      | 3 |

  Scenario: UNION with multiple output columns dedups whole rows
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 'a'], [1, 'b']] AS p RETURN p[0] AS x, p[1] AS y
      UNION
      UNWIND [[1, 'a']] AS p RETURN p[0] AS x, p[1] AS y
      """
    Then the result should be, in any order:
      | x | y   |
      | 1 | 'a' |
      | 1 | 'b' |

  Scenario: UNION ALL of empty and non-empty branches
    Given an empty graph
    When executing query:
      """
      MATCH (n:NoSuch) RETURN n.v AS v
      UNION ALL
      RETURN 42 AS v
      """
    Then the result should be, in any order:
      | v  |
      | 42 |

  Scenario: UNION of list-valued columns
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] AS l UNION RETURN [1, 2] AS l UNION RETURN [3] AS l
      """
    Then the result should be, in any order:
      | l      |
      | [1, 2] |
      | [3]    |

  Scenario: UNION with boolean columns
    Given an empty graph
    When executing query:
      """
      RETURN true AS b UNION RETURN false AS b UNION RETURN true AS b
      """
    Then the result should be, in any order:
      | b     |
      | true  |
      | false |
