Feature: UNION corners (TCK Union)

  Scenario: UNION dedups identical rows
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS x UNION RETURN 1 AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |

  Scenario: UNION ALL keeps duplicates
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS x UNION ALL RETURN 1 AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 1 |

  Scenario: UNION of three branches
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS x UNION RETURN 2 AS x UNION RETURN 1 AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 2 |

  Scenario: UNION with mismatched column names is an error
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS x UNION RETURN 2 AS y
      """
    Then a SyntaxError should be raised

  Scenario: UNION over MATCH branches
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'}), (:B {name: 'b'}), (:B {name: 'a'})
      """
    When executing query:
      """
      MATCH (n:A) RETURN n.name AS name
      UNION
      MATCH (n:B) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |

  Scenario: UNION ALL over MATCH branches keeps both copies
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'}), (:B {name: 'a'})
      """
    When executing query:
      """
      MATCH (n:A) RETURN n.name AS name
      UNION ALL
      MATCH (n:B) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'a'  |

  Scenario: UNION with different expressions same alias
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 1 AS v UNION RETURN 4 / 2 AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: UNION branch with WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 5})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.v > 3 RETURN p.v AS v
      UNION
      RETURN 0 AS v
      """
    Then the result should be, in any order:
      | v |
      | 5 |
      | 0 |

  Scenario: UNION null and value rows are distinct
    Given an empty graph
    When executing query:
      """
      RETURN null AS x UNION RETURN 1 AS x UNION RETURN null AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |
      | 1    |

  Scenario: UNION of string branches
    Given an empty graph
    When executing query:
      """
      UNWIND ['a', 'b'] AS s RETURN s
      UNION
      UNWIND ['b', 'c'] AS s RETURN s
      """
    Then the result should be, in any order:
      | s   |
      | 'a' |
      | 'b' |
      | 'c' |
