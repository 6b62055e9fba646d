Feature: SKIP/LIMIT edge cases and projection corners

  Scenario: LIMIT 0 returns no rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN x LIMIT 0
      """
    Then the result should be empty

  Scenario: SKIP beyond the row count returns empty
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x RETURN x ORDER BY x SKIP 10
      """
    Then the result should be empty

  Scenario: SKIP plus LIMIT select a middle page
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 10) AS x RETURN x ORDER BY x SKIP 3 LIMIT 3
      """
    Then the result should be, in order:
      | x |
      | 4 |
      | 5 |
      | 6 |

  Scenario: LIMIT larger than result keeps all rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x RETURN x ORDER BY x LIMIT 99
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |

  Scenario: DISTINCT then LIMIT
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 3] AS x RETURN DISTINCT x ORDER BY x LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |

  Scenario: ORDER BY DESC with SKIP
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 3, 9, 1] AS x RETURN x ORDER BY x DESC SKIP 1 LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 5 |
      | 3 |

  Scenario: Projection alias reuse in ORDER BY with SKIP LIMIT
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 30}), (:P {v: 10}), (:P {v: 20})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v * 2 AS dbl ORDER BY dbl SKIP 1
      """
    Then the result should be, in order:
      | dbl |
      | 40  |
      | 60  |

  Scenario: WITH LIMIT then further expansion
    Given an empty graph
    And having executed:
      """
      CREATE (:U {id: 1})-[:F]->(:U {id: 2})
      CREATE (:U {id: 3})-[:F]->(:U {id: 4})
      """
    When executing query:
      """
      MATCH (u:U) WITH u ORDER BY u.id LIMIT 1
      MATCH (u)-[:F]->(v:U)
      RETURN u.id AS u, v.id AS v
      """
    Then the result should be, in any order:
      | u | v |
      | 1 | 2 |

  Scenario: Multiple ORDER BY keys mixed directions
    Given an empty graph
    And having executed:
      """
      CREATE (:R {a: 1, b: 'x'}), (:R {a: 1, b: 'y'}), (:R {a: 2, b: 'x'})
      """
    When executing query:
      """
      MATCH (r:R) RETURN r.a AS a, r.b AS b ORDER BY a DESC, b ASC
      """
    Then the result should be, in order:
      | a | b   |
      | 2 | 'x' |
      | 1 | 'x' |
      | 1 | 'y' |

  Scenario: RETURN star keeps projected aliases
    Given an empty graph
    When executing query:
      """
      WITH 1 AS one, 'a' AS letter RETURN *
      """
    Then the result should be, in any order:
      | one | letter |
      | 1   | 'a'    |

  Scenario: Deep map access chain
    Given an empty graph
    When executing query:
      """
      WITH {outer: {inner: {v: 42}}} AS m
      RETURN m.outer.inner.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 42 |

  Scenario: Map bracket access with computed key string
    Given an empty graph
    When executing query:
      """
      WITH {ab: 7} AS m, 'a' AS p
      RETURN m[p + 'b'] AS v
      """
    Then the result should be, in any order:
      | v |
      | 7 |
