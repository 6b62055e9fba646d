Feature: Multi-stage WITH aggregation chains (aggregate of aggregate,
  HAVING-style filters between stages)

  Scenario: Aggregate of an aggregate across two WITH stages
    Given an empty graph
    And having executed:
      """
      CREATE (:S {g: 'a', v: 1}), (:S {g: 'a', v: 2}),
             (:S {g: 'b', v: 10}), (:S {g: 'c', v: 5})
      """
    When executing query:
      """
      MATCH (s:S) WITH s.g AS g, sum(s.v) AS total
      RETURN max(total) AS biggest, min(total) AS smallest, count(*) AS groups
      """
    Then the result should be, in any order:
      | biggest | smallest | groups |
      | 10      | 3        | 3      |

  Scenario: HAVING-style filter between aggregation stages
    Given an empty graph
    And having executed:
      """
      CREATE (:S {g: 'a', v: 1}), (:S {g: 'a', v: 2}), (:S {g: 'b', v: 10})
      """
    When executing query:
      """
      MATCH (s:S) WITH s.g AS g, count(*) AS n WHERE n >= 2
      RETURN g, n
      """
    Then the result should be, in any order:
      | g   | n |
      | 'a' | 2 |

  Scenario: Three chained aggregation stages
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 12) AS x
      WITH x % 3 AS g, collect(x) AS xs
      WITH g, size(xs) AS n
      RETURN sum(n) AS total, count(*) AS groups
      """
    Then the result should be, in any order:
      | total | groups |
      | 12    | 3      |

  Scenario: Aggregation keyed by expression
    Given an empty graph
    When executing query:
      """
      UNWIND range(1, 10) AS x
      RETURN x % 2 = 0 AS even, count(*) AS c ORDER BY even
      """
    Then the result should be, in order:
      | even  | c |
      | false | 5 |
      | true  | 5 |

  Scenario: collect a map per group
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.g AS g, collect(p.v) AS vs
      RETURN g, size(vs) AS n, reduce(acc = 0, v IN vs | acc + v) AS sum
      """
    Then the result should be, in any order:
      | g   | n | sum |
      | 'a' | 2 | 3   |

  Scenario: Count per group then global average of counts
    Given an empty graph
    And having executed:
      """
      CREATE (:E {u: 'x'}), (:E {u: 'x'}), (:E {u: 'x'}), (:E {u: 'y'})
      """
    When executing query:
      """
      MATCH (e:E) WITH e.u AS u, count(*) AS n
      RETURN avg(n) AS mean
      """
    Then the result should be, in any order:
      | mean |
      | 2.0  |

  Scenario: DISTINCT before aggregation changes the count
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) WITH DISTINCT p.v AS v
      RETURN count(*) AS c, sum(v) AS s
      """
    Then the result should be, in any order:
      | c | s |
      | 2 | 3 |

  Scenario: Aggregate inside arithmetic inside RETURN
    Given an empty graph
    When executing query:
      """
      UNWIND [2, 4, 6] AS x
      RETURN sum(x) / count(*) AS mean_int, 100 - sum(x) AS rest
      """
    Then the result should be, in any order:
      | mean_int | rest |
      | 4        | 88   |

  Scenario: Grouped aggregation then ORDER BY aggregate LIMIT
    Given an empty graph
    And having executed:
      """
      CREATE (:O {k: 'a', v: 5}), (:O {k: 'a', v: 5}), (:O {k: 'b', v: 30}),
             (:O {k: 'c', v: 1})
      """
    When executing query:
      """
      MATCH (o:O) RETURN o.k AS k, sum(o.v) AS total
      ORDER BY total DESC LIMIT 2
      """
    Then the result should be, in order:
      | k   | total |
      | 'b' | 30    |
      | 'a' | 10    |

  Scenario: Zero-group aggregation after filtering everything
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.v > 100
      WITH p.g AS g, count(*) AS n
      RETURN g, n
      """
    Then the result should be empty

  Scenario: min max over grouped strings with ties
    Given an empty graph
    And having executed:
      """
      CREATE (:W {g: 1, s: 'b'}), (:W {g: 1, s: 'a'}), (:W {g: 2, s: 'z'})
      """
    When executing query:
      """
      MATCH (w:W) RETURN w.g AS g, min(w.s) AS lo, max(w.s) AS hi ORDER BY g
      """
    Then the result should be, in order:
      | g | lo  | hi  |
      | 1 | 'a' | 'b' |
      | 2 | 'z' | 'z' |
