Feature: ORDER BY with projection and aliasing (reference WithOrderBy1-4)

  Scenario: Order by an alias that shadows a different expression
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      WITH x AS y, 4 - x AS x
      RETURN y, x ORDER BY x
      """
    Then the result should be, in order:
      | y | x |
      | 3 | 1 |
      | 2 | 2 |
      | 1 | 3 |

  Scenario: Order by expression over an alias
    Given an empty graph
    When executing query:
      """
      UNWIND ['bb', 'a', 'ccc'] AS s
      WITH s AS word
      RETURN word ORDER BY size(word) DESC
      """
    Then the result should be, in order:
      | word  |
      | 'ccc' |
      | 'bb'  |
      | 'a'   |

  Scenario: Order by combines alias and original variable
    Given an empty graph
    And having executed:
      """
      CREATE (:OA {g: 'a', v: 2}), (:OA {g: 'a', v: 1}), (:OA {g: 'b', v: 3})
      """
    When executing query:
      """
      MATCH (n:OA)
      WITH n.g AS grp, n
      RETURN grp, n.v AS v ORDER BY grp, n.v DESC
      """
    Then the result should be, in order:
      | grp | v |
      | 'a' | 2 |
      | 'a' | 1 |
      | 'b' | 3 |

  Scenario: Order by an aggregate alias
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 3, 3, 3] AS x
      RETURN x, count(*) AS c ORDER BY c DESC, x
      """
    Then the result should be, in order:
      | x | c |
      | 3 | 3 |
      | 1 | 2 |
      | 2 | 1 |

  Scenario: Order by an aggregate expression not in the projection
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 3, 3, 3] AS x
      RETURN x ORDER BY count(*) DESC, x
      """
    Then the result should be, in order:
      | x |
      | 3 |
      | 1 |
      | 2 |

  Scenario: Order by arithmetic over two projected columns
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 9], [5, 2], [3, 3]] AS p
      RETURN p[0] AS a, p[1] AS b ORDER BY a + b DESC
      """
    Then the result should be, in order:
      | a | b |
      | 1 | 9 |
      | 5 | 2 |
      | 3 | 3 |

  Scenario: WITH ORDER BY LIMIT then further projection
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 1, 4, 2, 3] AS x
      WITH x ORDER BY x DESC LIMIT 3
      WITH x * 10 AS big ORDER BY big
      RETURN collect(big) AS l
      """
    Then the result should be, in any order:
      | l            |
      | [30, 40, 50] |

  Scenario: Order by a CASE expression
    Given an empty graph
    When executing query:
      """
      UNWIND ['b', 'z', 'a'] AS s
      RETURN s ORDER BY CASE s WHEN 'z' THEN 0 ELSE 1 END, s
      """
    Then the result should be, in order:
      | s   |
      | 'z' |
      | 'a' |
      | 'b' |

  Scenario: Order by a function of an incoming node variable after projection
    Given an empty graph
    And having executed:
      """
      CREATE (:OB {name: 'Bob'}), (:OB {name: 'Al'})
      """
    When executing query:
      """
      MATCH (n:OB)
      WITH n.name AS name ORDER BY size(n.name)
      RETURN collect(name) AS l
      """
    Then the result should be, in any order:
      | l             |
      | ['Al', 'Bob'] |

  Scenario: Ties preserve the later sort key
    Given an empty graph
    When executing query:
      """
      UNWIND [['a', 2], ['b', 1], ['a', 1]] AS r
      RETURN r[0] AS k, r[1] AS v ORDER BY k, v
      """
    Then the result should be, in order:
      | k   | v |
      | 'a' | 1 |
      | 'a' | 2 |
      | 'b' | 1 |
