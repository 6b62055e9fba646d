Feature: ORDER BY null placement and mixed-direction sorts

  Scenario: Ascending sort puts nulls last
    Given an empty graph
    When executing query:
      """
      UNWIND [3, null, 1] AS x
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x    |
      | 1    |
      | 3    |
      | null |

  Scenario: Descending sort puts nulls first
    Given an empty graph
    When executing query:
      """
      UNWIND [3, null, 1] AS x
      RETURN x ORDER BY x DESC
      """
    Then the result should be, in order:
      | x    |
      | null |
      | 3    |
      | 1    |

  Scenario: Multi-key sort with mixed directions
    Given an empty graph
    When executing query:
      """
      UNWIND [{a: 1, b: 'x'}, {a: 1, b: 'y'}, {a: 2, b: 'x'}] AS m
      RETURN m.a AS a, m.b AS b ORDER BY a DESC, b ASC
      """
    Then the result should be, in order:
      | a | b   |
      | 2 | 'x' |
      | 1 | 'x' |
      | 1 | 'y' |

  Scenario: Sort on booleans false before true
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false, true] AS b
      RETURN b ORDER BY b
      """
    Then the result should be, in order:
      | b     |
      | false |
      | true  |
      | true  |

  Scenario: Sort on an expression not in the projection
    Given an empty graph
    When executing query:
      """
      UNWIND ['bbb', 'a', 'cc'] AS s
      RETURN s ORDER BY size(s)
      """
    Then the result should be, in order:
      | s     |
      | 'a'   |
      | 'cc'  |
      | 'bbb' |

  Scenario: Sort by alias defined in the projection
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 3, 2] AS x
      RETURN x * 10 AS y ORDER BY y DESC
      """
    Then the result should be, in order:
      | y  |
      | 30 |
      | 20 |
      | 10 |

  Scenario: Null property sort keys group at the end ascending
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', rank: 2}), (:P {name: 'b'}), (:P {name: 'c', rank: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS name ORDER BY p.rank, p.name
      """
    Then the result should be, in order:
      | name |
      | 'c'  |
      | 'a'  |
      | 'b'  |

  Scenario: ORDER BY with SKIP and LIMIT composes after sorting
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 3, 1, 4, 2] AS x
      RETURN x ORDER BY x SKIP 1 LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 2 |
      | 3 |

  Scenario: Sort on lists is element-wise
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [1, 1], [0, 9]] AS l
      RETURN l ORDER BY l
      """
    Then the result should be, in order:
      | l      |
      | [0, 9] |
      | [1, 1] |
      | [1, 2] |

  Scenario: Shorter list prefix sorts first
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [1]] AS l
      RETURN l ORDER BY l
      """
    Then the result should be, in order:
      | l      |
      | [1]    |
      | [1, 2] |

  Scenario: ORDER BY inside WITH feeds ordered collect
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x ORDER BY x DESC
      RETURN collect(x) AS l
      """
    Then the result should be, in any order:
      | l         |
      | [3, 2, 1] |

  Scenario: Sort strings case sensitively
    Given an empty graph
    When executing query:
      """
      UNWIND ['b', 'A', 'a', 'B'] AS s
      RETURN s ORDER BY s
      """
    Then the result should be, in order:
      | s   |
      | 'A' |
      | 'B' |
      | 'a' |
      | 'b' |

  Scenario: Sort by two expressions over the same variable
    Given an empty graph
    When executing query:
      """
      UNWIND ['ab', 'b', 'aa', 'c'] AS s
      RETURN s ORDER BY size(s) DESC, s
      """
    Then the result should be, in order:
      | s    |
      | 'aa' |
      | 'ab' |
      | 'b'  |
      | 'c'  |
