Feature: COLLECT shapes matrix (entities, maps, nesting, ordering)

  Scenario: collect node properties grouped by another column
    Given an empty graph
    And having executed:
      """
      UNWIND [{g: 'a', v: 2}, {g: 'a', v: 1}, {g: 'b', v: 3}] AS r
      CREATE (:CS {g: r.g, v: r.v})
      """
    When executing query:
      """
      MATCH (c:CS)
      WITH c ORDER BY c.v
      RETURN c.g AS g, collect(c.v) AS vs ORDER BY g
      """
    Then the result should be, in order:
      | g   | vs     |
      | 'a' | [1, 2] |
      | 'b' | [3]    |

  Scenario: collect maps
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      WITH i ORDER BY i
      RETURN collect({idx: i, sq: i * i}) AS ms
      """
    Then the result should be, in any order:
      | ms                               |
      | [{idx: 1, sq: 1}, {idx: 2, sq: 4}] |

  Scenario: collect inside a map result
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      RETURN {n: count(i), xs: collect(i)} AS summary
      """
    Then the result should be, in any order:
      | summary                 |
      | {n: 3, xs: [1, 2, 3]}   |

  Scenario: collect then index the result
    Given an empty graph
    When executing query:
      """
      UNWIND [10, 20, 30] AS x
      WITH x ORDER BY x
      WITH collect(x) AS xs
      RETURN xs[1] AS mid, xs[-1] AS last
      """
    Then the result should be, in any order:
      | mid | last |
      | 20  | 30   |

  Scenario: collect into a comprehension pipeline
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      WITH collect(x) AS xs
      RETURN [y IN xs WHERE y % 2 = 0 | y * 10] AS evens
      """
    Then the result should be, in any order:
      | evens    |
      | [20, 40] |

  Scenario: collect of lists nests one level
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      WITH i ORDER BY i
      RETURN collect([i, i * 2]) AS pairs
      """
    Then the result should be, in any order:
      | pairs            |
      | [[1, 2], [2, 4]] |

  Scenario: collect distinct of grouped duplicates
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 1, v: 'x'}, {g: 1, v: 'x'}, {g: 1, v: 'y'}] AS r
      WITH r.g AS g, collect(DISTINCT r.v) AS vs
      UNWIND vs AS v
      RETURN g, v ORDER BY v
      """
    Then the result should be, in order:
      | g | v   |
      | 1 | 'x' |
      | 1 | 'y' |

  Scenario: size of a collect equals the group count
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      RETURN size(collect(x)) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: collect skips nulls entirely
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2, null] AS x
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs     |
      | [1, 2] |

  Scenario: unwound collect round trip preserves grouping
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 'a', v: 1}, {g: 'b', v: 2}, {g: 'a', v: 3}] AS r
      WITH r.g AS g, collect(r.v) AS vs
      UNWIND vs AS v
      RETURN g, sum(v) AS total ORDER BY g
      """
    Then the result should be, in order:
      | g   | total |
      | 'a' | 4     |
      | 'b' | 2     |

  Scenario: collect in WITH then filter groups by list size
    Given an empty graph
    When executing query:
      """
      UNWIND [{g: 1, v: 1}, {g: 1, v: 2}, {g: 2, v: 9}] AS r
      WITH r.g AS g, collect(r.v) AS vs
      WHERE size(vs) > 1
      RETURN g, vs
      """
    Then the result should be, in any order:
      | g | vs     |
      | 1 | [1, 2] |

  Scenario: descending ordered collect
    Given an empty graph
    When executing query:
      """
      UNWIND [2, 3, 1] AS x
      WITH x ORDER BY x DESC
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs        |
      | [3, 2, 1] |

  Scenario: collect strings then join
    Given an empty graph
    When executing query:
      """
      UNWIND ['b', 'a', 'c'] AS s
      WITH s ORDER BY s
      WITH collect(s) AS parts
      RETURN reduce(acc = '', p IN parts | acc + p) AS joined
      """
    Then the result should be, in any order:
      | joined |
      | 'abc'  |

  Scenario: empty group collect after filtering everything out
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x
      WITH x WHERE x > 10
      RETURN collect(x) AS xs, count(*) AS n
      """
    Then the result should be, in any order:
      | xs | n |
      | [] | 0 |

  Scenario: collect pattern comprehension results per row
    Given an empty graph
    And having executed:
      """
      CREATE (a:CPC {id: 1})-[:R]->(:CX {v: 5}), (a)-[:R]->(:CX {v: 7})
      """
    When executing query:
      """
      MATCH (a:CPC)
      WITH [(a)-[:R]->(x) | x.v] AS vs
      UNWIND vs AS v
      RETURN v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 5 |
      | 7 |
