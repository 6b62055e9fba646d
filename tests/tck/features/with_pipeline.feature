Feature: WITH pipelines, aggregation chaining, misc corners

  Scenario: Aggregate of an aggregate via two WITHs
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 5})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.g AS g, sum(p.v) AS s
      RETURN max(s) AS biggest
      """
    Then the result should be, in any order:
      | biggest |
      | 5       |

  Scenario: WITH star keeps all variables and adds one
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH *, p.v * 10 AS big
      RETURN p.v AS v, big
      """
    Then the result should be, in any order:
      | v | big |
      | 2 | 20  |

  Scenario: UNWIND after aggregation re-expands
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH collect(p.v) AS vs
      UNWIND vs AS v
      RETURN v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |

  Scenario: WITH LIMIT bounds before the next clause multiplies
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p ORDER BY p.v LIMIT 2
      UNWIND [1, 2] AS x
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 4 |

  Scenario: count star after WITH DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a'}), (:P {g: 'a'}), (:P {g: 'b'})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH DISTINCT p.g AS g
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Expression on an aggregate in RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN sum(p.v) * 10 AS s10
      """
    Then the result should be, in any order:
      | s10 |
      | 30  |

  Scenario: Grouping by two keys
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 'x'}), (:P {a: 1, b: 'x'}), (:P {a: 1, b: 'y'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a, p.b AS b, count(*) AS c ORDER BY b
      """
    Then the result should be, in order:
      | a | b   | c |
      | 1 | 'x' | 2 |
      | 1 | 'y' | 1 |

  Scenario: Standalone RETURN without MATCH
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 1 AS two, 'x' AS s
      """
    Then the result should be, in any order:
      | two | s   |
      | 2   | 'x' |

  Scenario: RETURN a literal map
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1, nested: {b: 'x'}} AS m
      """
    Then the result should be, in any order:
      | m                         |
      | {a: 1, nested: {b: 'x'}} |

  Scenario: Map projection from parameters
    Given an empty graph
    And parameters are:
      | lo | 2 |
      | hi | 4 |
    When executing query:
      """
      UNWIND range($lo, $hi) AS x RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s |
      | 9 |

  Scenario: CALL db.labels lists created labels
    Given an empty graph
    And having executed:
      """
      CREATE (:Zebra), (:Apple)
      """
    When executing query:
      """
      CALL db.labels()
      """
    Then the result should be, in any order:
      | label   |
      | 'Apple' |
      | 'Zebra' |

  Scenario: Scalar subquery shape via size of pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'})
      CREATE (a)-[:T]->(b), (a)-[:T]->(a)
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS name, size([(p)-[:T]->() | 1]) AS fanout
      ORDER BY name
      """
    Then the result should be, in order:
      | name | fanout |
      | 'a'  | 2      |
      | 'b'  | 0      |

  Scenario: ORDER BY inside WITH then aggregate keeps deterministic collect
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'x', v: 3}), (:P {g: 'x', v: 1}), (:P {g: 'y', v: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p ORDER BY p.v
      RETURN p.g AS g, collect(p.v) AS vs ORDER BY g
      """
    Then the result should be, in order:
      | g   | vs     |
      | 'x' | [1, 3] |
      | 'y' | [2]    |

  Scenario: Boolean expressions in RETURN without WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 5})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN p.v > 3 AS gt, p.v IN [4, 5] AS inn, NOT p.v = 5 AS ne
      """
    Then the result should be, in any order:
      | gt   | inn  | ne    |
      | true | true | false |

  Scenario: Nested function composition
    Given an empty graph
    When executing query:
      """
      RETURN toUpper(left(reverse('hello'), 2)) AS x
      """
    Then the result should be, in any order:
      | x    |
      | 'OL' |

  Scenario: keys of a node sorts property names
    Given an empty graph
    And having executed:
      """
      CREATE (:P {b: 1, a: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      UNWIND keys(p) AS k
      RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'b' |
