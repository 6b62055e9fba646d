Feature: DISTINCT semantics over values, nodes, and nulls

  Scenario: DISTINCT keeps a single null row
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 1, null] AS x
      RETURN DISTINCT x ORDER BY x
      """
    Then the result should be, in order:
      | x    |
      | 1    |
      | null |

  Scenario: DISTINCT on node identity not property equality
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(DISTINCT p) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: DISTINCT on a projected property deduplicates by value
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN DISTINCT p.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |

  Scenario: DISTINCT over multiple columns is row-wise
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 'a'], [1, 'b'], [1, 'a']] AS r
      RETURN DISTINCT r[0] AS n, r[1] AS s ORDER BY n, s
      """
    Then the result should be, in order:
      | n | s   |
      | 1 | 'a' |
      | 1 | 'b' |

  Scenario: DISTINCT on lists compares deep values
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [1, 2], [2, 1]] AS l
      RETURN DISTINCT l ORDER BY l
      """
    Then the result should be, in order:
      | l      |
      | [1, 2] |
      | [2, 1] |

  Scenario: DISTINCT on maps compares deep values
    Given an empty graph
    When executing query:
      """
      UNWIND [{a: 1}, {a: 1}, {a: 2}] AS m
      RETURN DISTINCT m.a AS a ORDER BY a
      """
    Then the result should be, in order:
      | a |
      | 1 |
      | 2 |

  Scenario: WITH DISTINCT applies before the next clause
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1, 2, 2, 3] AS x
      WITH DISTINCT x
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |

  Scenario: collect DISTINCT deduplicates inside the aggregate
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 1, 3, 2] AS x
      WITH x ORDER BY x
      RETURN collect(DISTINCT x) AS l
      """
    Then the result should be, in any order:
      | l         |
      | [1, 2, 3] |

  Scenario: sum DISTINCT adds each value once
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 5, 7] AS x
      RETURN sum(DISTINCT x) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 12 |

  Scenario: Integer and float of equal value deduplicate as one
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 1.0] AS x
      RETURN count(DISTINCT x) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: DISTINCT relationship identity
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {n: 'a'})-[:R {w: 1}]->(b:P {n: 'b'}), (a)-[:R {w: 1}]->(b)
      """
    When executing query:
      """
      MATCH (:P {n: 'a'})-[r:R]->(:P) RETURN count(DISTINCT r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: DISTINCT star rows after cross product
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A {v: 1}), (:B {w: 9})
      """
    When executing query:
      """
      MATCH (a:A), (b:B) RETURN DISTINCT a.v AS v, b.w AS w
      """
    Then the result should be, in any order:
      | v | w |
      | 1 | 9 |
