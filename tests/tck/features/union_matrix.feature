Feature: UNION / UNION ALL matrix

  Scenario: UNION deduplicates identical rows
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

  Scenario: three-branch UNION chain
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS v UNION RETURN 2 AS v UNION RETURN 1 AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |

  Scenario: UNION over MATCH branches
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:B {v: 2})
      """
    When executing query:
      """
      MATCH (a:A) RETURN a.v AS v UNION MATCH (b:B) RETURN b.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |

  Scenario: column names must align
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS a UNION RETURN 2 AS b
      """
    Then a SyntaxError should be raised

  Scenario: UNION dedup compares whole rows
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS a, 'x' AS b UNION RETURN 1 AS a, 'y' AS b
      """
    Then the result should be, in any order:
      | a | b   |
      | 1 | 'x' |
      | 1 | 'y' |

  Scenario: UNION with nulls dedups null rows
    Given an empty graph
    When executing query:
      """
      RETURN null AS v UNION RETURN null AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: UNION ALL across empty branch
    Given an empty graph
    When executing query:
      """
      MATCH (z:Nope) RETURN z.v AS v UNION ALL RETURN 7 AS v
      """
    Then the result should be, in any order:
      | v |
      | 7 |

  Scenario: mixed aggregation branches
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x RETURN sum(x) AS v UNION RETURN 3 AS v
      """
    Then the result should be, in any order:
      | v |
      | 3 |

  Scenario: UNION of write-free branches leaves graph untouched
    Given an empty graph
    And having executed:
      """
      CREATE (:K {v: 1})
      """
    When executing query:
      """
      MATCH (k:K) RETURN k.v AS v UNION MATCH (k:K) RETURN k.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
