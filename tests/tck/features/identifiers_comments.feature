Feature: Escaped identifiers, string escapes, comments

  Scenario: Backticked variable label and property names
    Given an empty graph
    And having executed:
      """
      CREATE (`odd name`:`My Label` {`weird key`: 1})
      """
    When executing query:
      """
      MATCH (n:`My Label`) RETURN n.`weird key` AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: Escaped quotes inside string literals
    Given an empty graph
    When executing query:
      """
      RETURN 'it\'s' AS s, "dq\"q" AS d
      """
    Then the result should be, in any order:
      | s       | d      |
      | 'it\'s' | 'dq"q' |

  Scenario: Unicode escape sequences decode
    Given an empty graph
    When executing query:
      """
      RETURN 'é' AS e, size('é') AS n
      """
    Then the result should be, in any order:
      | e   | n |
      | 'é' | 1 |

  Scenario: Line comments are ignored
    Given an empty graph
    When executing query:
      """
      // leading comment
      RETURN 1 AS x // trailing comment
      """
    Then the result should be, in any order:
      | x |
      | 1 |

  Scenario: Block comments are ignored midline
    Given an empty graph
    When executing query:
      """
      RETURN /* one */ 1 /* two */ + 2 AS x
      """
    Then the result should be, in any order:
      | x |
      | 3 |

  Scenario: Newline and tab escapes
    Given an empty graph
    When executing query:
      """
      RETURN size('a\tb') AS tabbed, size('a\nb') AS lined
      """
    Then the result should be, in any order:
      | tabbed | lined |
      | 3      | 3     |

  Scenario: Backslash literal
    Given an empty graph
    When executing query:
      """
      RETURN size('a\\b') AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: Keywords are case insensitive
    Given an empty graph
    When executing query:
      """
      match (n) return count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Labels are case sensitive
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {v: 1})
      """
    When executing query:
      """
      MATCH (n:person) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |
