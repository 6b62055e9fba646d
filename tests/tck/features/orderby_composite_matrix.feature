Feature: ORDER BY composite keys, expressions, and pagination

  Scenario: two sort keys with mixed directions
    Given an empty graph
    And having executed:
      """
      CREATE (:E {g: 'a', v: 2}), (:E {g: 'a', v: 1}), (:E {g: 'b', v: 9})
      """
    When executing query:
      """
      MATCH (e:E) RETURN e.g AS g, e.v AS v ORDER BY g ASC, v DESC
      """
    Then the result should be, in order:
      | g   | v |
      | 'a' | 2 |
      | 'a' | 1 |
      | 'b' | 9 |

  Scenario: order by an expression not in the projection
    Given an empty graph
    And having executed:
      """
      CREATE (:E {v: 3}), (:E {v: -5})
      """
    When executing query:
      """
      MATCH (e:E) RETURN e.v AS v ORDER BY abs(e.v)
      """
    Then the result should be, in order:
      | v  |
      | 3  |
      | -5 |

  Scenario: order by alias defined in RETURN
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x RETURN x * 10 AS big ORDER BY big
      """
    Then the result should be, in order:
      | big |
      | 10  |
      | 20  |
      | 30  |

  Scenario: order by string vs number columns independently
    Given an empty graph
    When executing query:
      """
      UNWIND [['b', 1], ['a', 2]] AS r
      RETURN r[0] AS s, r[1] AS n ORDER BY s
      """
    Then the result should be, in order:
      | s   | n |
      | 'a' | 2 |
      | 'b' | 1 |

  Scenario: skip and limit paginate a sorted stream
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 10) AS x RETURN x ORDER BY x SKIP 3 LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 4 |
      | 5 |

  Scenario: skip past the end yields empty
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x RETURN x ORDER BY x SKIP 9
      """
    Then the result should be empty

  Scenario: limit zero yields empty
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x RETURN x LIMIT 0
      """
    Then the result should be empty

  Scenario: order by boolean puts false before true ascending
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false] AS b RETURN b ORDER BY b
      """
    Then the result should be, in order:
      | b     |
      | false |
      | true  |

  Scenario: descending nulls come first
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN x ORDER BY x DESC
      """
    Then the result should be, in order:
      | x    |
      | null |
      | 2    |
      | 1    |

  Scenario: order by applies after aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (:E {g: 'a'}), (:E {g: 'a'}), (:E {g: 'b'})
      """
    When executing query:
      """
      MATCH (e:E) RETURN e.g AS g, count(*) AS n ORDER BY n DESC, g
      """
    Then the result should be, in order:
      | g   | n |
      | 'a' | 2 |
      | 'b' | 1 |

  Scenario: order by inside WITH feeds ordered collect
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS x
      WITH x ORDER BY x DESC
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs        |
      | [3, 2, 1] |

  Scenario: order by temporal values
    Given an empty graph
    When executing query:
      """
      UNWIND [date('2024-05-01'), date('2023-01-01')] AS d
      RETURN toString(d) AS s ORDER BY d
      """
    Then the result should be, in order:
      | s            |
      | '2023-01-01' |
      | '2024-05-01' |

  Scenario: limit with expression value
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 5) AS x RETURN x ORDER BY x LIMIT 2 + 1
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |
      | 3 |
