Feature: Parameter handling corners (scalar, list, map parameters; missing
  parameter errors — reference params resolution)

  Scenario: Scalar parameter in WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 5})
      """
    And parameters are:
      | min | 3 |
    When executing query:
      """
      MATCH (p:P) WHERE p.v > $min RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 5 |

  Scenario: String parameter in a predicate
    Given an empty graph
    And parameters are:
      | name | 'bob' |
    When executing query:
      """
      RETURN $name + '!' AS greeting
      """
    Then the result should be, in any order:
      | greeting |
      | 'bob!'   |

  Scenario: List parameter with IN
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 3})
      """
    And parameters are:
      | wanted | [1, 3] |
    When executing query:
      """
      MATCH (p:P) WHERE p.v IN $wanted RETURN p.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 3 |

  Scenario: List parameter with UNWIND
    Given an empty graph
    And parameters are:
      | xs | [10, 20] |
    When executing query:
      """
      UNWIND $xs AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x  |
      | 10 |
      | 20 |

  Scenario: Map parameter field access
    Given an empty graph
    And parameters are:
      | conf | {limit: 2, tag: 'x'} |
    When executing query:
      """
      RETURN $conf.limit AS lim, $conf.tag AS tag
      """
    Then the result should be, in any order:
      | lim | tag |
      | 2   | 'x' |

  Scenario: Missing parameter is an error
    Given an empty graph
    When executing query:
      """
      RETURN $nope AS x
      """
    Then a SyntaxError should be raised

  Scenario: Null parameter propagates
    Given an empty graph
    And parameters are:
      | v | null |
    When executing query:
      """
      RETURN $v AS x, $v IS NULL AS isnull
      """
    Then the result should be, in any order:
      | x    | isnull |
      | null | true   |

  Scenario: Parameter in SKIP and LIMIT positions
    Given an empty graph
    And parameters are:
      | k | 2 |
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x RETURN x ORDER BY x LIMIT $k
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |

  Scenario: Parameter inside a list literal
    Given an empty graph
    And parameters are:
      | v | 7 |
    When executing query:
      """
      RETURN [1, $v, 3] AS xs
      """
    Then the result should be, in any order:
      | xs        |
      | [1, 7, 3] |

  Scenario: Boolean parameter in WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (:P {on: true}), (:P {on: false})
      """
    And parameters are:
      | flag | true |
    When executing query:
      """
      MATCH (p:P) WHERE p.on = $flag RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Parameter used twice
    Given an empty graph
    And parameters are:
      | n | 5 |
    When executing query:
      """
      RETURN $n + $n AS dbl, $n * $n AS sq
      """
    Then the result should be, in any order:
      | dbl | sq |
      | 10  | 25 |

  Scenario: Float parameter arithmetic
    Given an empty graph
    And parameters are:
      | rate | 1.5 |
    When executing query:
      """
      RETURN 10 * $rate AS scaled
      """
    Then the result should be, in any order:
      | scaled |
      | 15.0   |
