Feature: Parameter deep matrix (shapes, usage positions)

  Scenario: scalar parameters of each primitive type
    Given an empty graph
    And parameters are:
      | i | 7      |
      | f | 2.5    |
      | s | 'text' |
      | b | true   |
    When executing query:
      """
      RETURN $i AS i, $f AS f, $s AS s, $b AS b
      """
    Then the result should be, in any order:
      | i | f   | s      | b    |
      | 7 | 2.5 | 'text' | true |

  Scenario: null parameter propagates as null
    Given an empty graph
    And parameters are:
      | p | null |
    When executing query:
      """
      RETURN $p IS NULL AS isnull, $p + 1 IS NULL AS arith
      """
    Then the result should be, in any order:
      | isnull | arith |
      | true   | true  |

  Scenario: list parameter used with IN and size
    Given an empty graph
    And parameters are:
      | xs | [1, 2, 3] |
    When executing query:
      """
      RETURN 2 IN $xs AS has, size($xs) AS n, $xs[0] AS first
      """
    Then the result should be, in any order:
      | has  | n | first |
      | true | 3 | 1     |

  Scenario: map parameter field access
    Given an empty graph
    And parameters are:
      | conf | {limit: 2, name: 'top'} |
    When executing query:
      """
      RETURN $conf.limit AS lim, $conf.name AS name
      """
    Then the result should be, in any order:
      | lim | name  |
      | 2   | 'top' |

  Scenario: parameter in a node property match position
    Given an empty graph
    And having executed:
      """
      CREATE (:PP {k: 5, v: 'hit'}), (:PP {k: 6, v: 'miss'})
      """
    And parameters are:
      | key | 5 |
    When executing query:
      """
      MATCH (p:PP {k: $key}) RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v     |
      | 'hit' |

  Scenario: parameter inside WHERE comparison
    Given an empty graph
    And having executed:
      """
      UNWIND [1, 5, 9] AS i CREATE (:PW {v: i})
      """
    And parameters are:
      | min | 4 |
    When executing query:
      """
      MATCH (p:PW) WHERE p.v > $min RETURN p.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 5 |
      | 9 |

  Scenario: parameter as SKIP and LIMIT values
    Given an empty graph
    And parameters are:
      | s | 1 |
      | l | 2 |
    When executing query:
      """
      UNWIND [10, 20, 30, 40] AS x
      WITH x ORDER BY x
      RETURN x SKIP $s LIMIT $l
      """
    Then the result should be, in order:
      | x  |
      | 20 |
      | 30 |

  Scenario: parameter list of maps drives creation
    Given an empty graph
    And parameters are:
      | rows | [{id: 1}, {id: 2}] |
    When executing query:
      """
      UNWIND $rows AS row
      CREATE (f:FromParam {id: row.id})
      RETURN count(f) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: parameter concatenated into strings
    Given an empty graph
    And parameters are:
      | name | 'world' |
    When executing query:
      """
      RETURN 'hello ' + $name AS greeting
      """
    Then the result should be, in any order:
      | greeting      |
      | 'hello world' |

  Scenario: missing parameter is a compile error
    Given an empty graph
    When executing query:
      """
      RETURN $never_bound AS x
      """
    Then an error should be raised

  Scenario: same parameter used twice stays consistent
    Given an empty graph
    And parameters are:
      | v | 3 |
    When executing query:
      """
      RETURN $v + $v AS twice, $v * $v AS square
      """
    Then the result should be, in any order:
      | twice | square |
      | 6     | 9      |

  Scenario: parameter in a list literal
    Given an empty graph
    And parameters are:
      | x | 5 |
    When executing query:
      """
      RETURN [1, $x, 10] AS l
      """
    Then the result should be, in any order:
      | l          |
      | [1, 5, 10] |

  Scenario: nested map parameter deep access
    Given an empty graph
    And parameters are:
      | cfg | {outer: {inner: 42}} |
    When executing query:
      """
      RETURN $cfg.outer.inner AS v
      """
    Then the result should be, in any order:
      | v  |
      | 42 |

  Scenario: parameter driving a CASE branch
    Given an empty graph
    And parameters are:
      | mode | 'strict' |
    When executing query:
      """
      RETURN CASE $mode WHEN 'strict' THEN 1 ELSE 0 END AS flag
      """
    Then the result should be, in any order:
      | flag |
      | 1    |

  Scenario: boolean parameter in WHERE position
    Given an empty graph
    And parameters are:
      | on | false |
    When executing query:
      """
      UNWIND [1, 2] AS x
      WITH x WHERE $on
      RETURN count(x) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |
